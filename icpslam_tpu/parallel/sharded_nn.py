"""Query-sharded nearest-neighbor search over a device mesh.

Splits the query cloud across devices (the map/target is replicated);
each shard runs the blocked-matmul NN kernel locally — no cross-device
traffic beyond the initial sharding. This is the scan-vs-sharded-map
building block (SURVEY.md §2.3 "data parallel within scan").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from icpslam_tpu.ops import nn as nn_ops


def nearest_neighbors(
    query: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = "dp",
    block: int = 1024,
) -> nn_ops.NNResult:
    """Exact 1-NN with queries sharded over ``axis``. Query count must be
    divisible by the mesh size (pad upstream with masked points)."""
    n = mesh.shape[axis]
    Q = query.shape[0]
    if Q % n != 0:
        raise ValueError(f"query count {Q} not divisible by mesh size {n}")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    def run(q, t, tm):
        res = nn_ops.nearest_neighbors(q, t, tm, block=block)
        return res.idx, res.dist2

    idx, d2 = run(query, target, target_mask)
    return nn_ops.NNResult(idx=idx, dist2=d2)
