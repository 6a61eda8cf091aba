"""Schur-complement (block-elimination) linear solver for the pose graph.

The BASELINE north star calls for "distributed Gauss-Newton with
Schur-complement reduction": partition the nodes into D contiguous chunks
(chunk ↔ device), eliminate each chunk's *interior* nodes locally, solve
the small reduced system over the *separator* nodes globally, and
back-substitute locally. For keyframe graphs the separator set — nodes
touched by chunk-crossing edges (sequential edges at chunk boundaries +
loop closures) — is tiny, so the expensive dense factorization shrinks
from (6K)³ to D parallel (6K/D)³ eliminations plus one (6·S)³ reduced
solve.

Static-shape formulation (everything jit-compatible):

- the separator set is *capped* at a static ``sep_capacity`` S; the slots
  are filled with true separators first (stable argsort of the separator
  mask) and padded with arbitrary non-separator nodes. Padding is
  *exactness-preserving*: a node kept in the reduced system is simply not
  eliminated — any superset of the true separators yields the same
  solution. Only ``n_sep > S`` is invalid, reported via the ``ok`` flag.
- chunk elimination works on masked dense blocks: the eliminated block of
  the chunk matrix is inverted behind an identity-padded mask, so no
  dynamic compaction is needed.

Decomposition used: ``H = blockdiag(A_c) + C`` where ``A_c`` are the
chunk-diagonal blocks (all diagonal contributions + intra-chunk
couplings) and ``C`` the inter-chunk couplings. ``C`` touches only
separator rows/columns by construction, so eliminating non-separator
nodes never involves it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SchurResult(NamedTuple):
    delta: jnp.ndarray   # (K, 6) solution of H x = b
    ok: jnp.ndarray      # bool: separator capacity was sufficient
    n_sep: jnp.ndarray   # int32 true separator count


def separator_mask(
    edge_i: jnp.ndarray,
    edge_j: jnp.ndarray,
    edge_valid: jnp.ndarray,
    K: int,
    chunk_size: int,
) -> jnp.ndarray:
    """(K,) bool: nodes incident to a chunk-crossing valid edge."""
    ci = edge_i // chunk_size
    cj = edge_j // chunk_size
    cross = edge_valid & (ci != cj)
    m = jnp.zeros((K,), bool)
    m = m.at[edge_i].max(cross)
    m = m.at[edge_j].max(cross)
    return m


def chunk_eliminate(Ac, bc, ec):
    """Eliminate the masked (interior) rows of one chunk-diagonal block.

    ``Ac``: (n, n) chunk matrix, ``bc``: (n,) rhs, ``ec``: (n,) bool mask
    of eliminated rows. The interior block is inverted behind an
    identity-padded mask so no dynamic compaction is needed. Returns the
    local Schur complement onto the kept rows, the reduced rhs, and the
    factors needed for back-substitution. Shared by the single-device
    vmapped solver below and the shard_map distributed solver
    (``parallel/dist_graph._sharded_schur_delta``).
    """
    e_r = ec[:, None]
    e_c = ec[None, :]
    # interior system behind an identity-padded mask
    M = jnp.where(e_r & e_c, Ac, 0.0) + jnp.diag((~ec).astype(Ac.dtype))
    Minv = jnp.linalg.inv(M)
    A_se = jnp.where((~e_r) & e_c, Ac, 0.0)   # kept rows, elim cols
    A_es = jnp.where(e_r & (~e_c), Ac, 0.0)   # elim rows, kept cols
    A_ss = jnp.where((~e_r) & (~e_c), Ac, 0.0)
    T = Minv @ A_es                            # (n, n)
    Sc = A_ss - A_se @ T                       # Schur onto kept rows
    be = jnp.where(ec, bc, 0.0)
    bs = jnp.where(~ec, bc, 0.0) - A_se @ (Minv @ be)
    return Sc, bs, Minv, A_es


def back_substitute(Minv_c, A_es_c, bc, ec, ds):
    """Recover the eliminated rows of one chunk given the kept solution
    ``ds`` scattered into the chunk layout."""
    be = jnp.where(ec, bc, 0.0)
    rhs = be - jnp.where(ec, A_es_c @ ds, 0.0)
    return Minv_c @ rhs


def schur_solve(
    H: jnp.ndarray,       # (K, 6, K, 6) regularized, PD
    b: jnp.ndarray,       # (K, 6)
    sep_mask: jnp.ndarray,  # (K,) bool from separator_mask
    chunk_size: int,
    sep_capacity: int,
) -> SchurResult:
    """Solve H x = b by chunked block elimination. ``chunk_size`` must
    divide K; ``sep_capacity`` is the static separator budget."""
    K = b.shape[0]
    D = K // chunk_size
    if D * chunk_size != K:
        raise ValueError(f"chunk_size {chunk_size} must divide K={K}")
    S = sep_capacity
    n = 6 * chunk_size

    n_sep = jnp.sum(sep_mask.astype(jnp.int32))
    ok = n_sep <= S

    # keep-set: true separators first, padded with arbitrary other nodes
    order = jnp.argsort(~sep_mask, stable=True)  # separators first
    sep_idx = order[:S]                           # (S,) static
    rank = jnp.zeros((K,), jnp.int32).at[order].set(jnp.arange(K, dtype=jnp.int32))
    elim = rank >= S                              # (K,) eliminated nodes

    # chunk-diagonal blocks A_c and the cross part C = H - blockdiag(A)
    H6 = H.reshape(D, chunk_size, 6, D, chunk_size, 6)
    dd = jnp.arange(D)
    A = H6[dd, :, :, dd, :, :]                    # (D, Kc, 6, Kc, 6)
    A = A.reshape(D, n, n)
    b_c = b.reshape(D, n)
    elim_c = jnp.repeat(elim.reshape(D, chunk_size), 6, axis=1)  # (D, n)

    Sc, bs, Minv, A_es = jax.vmap(chunk_eliminate)(A, b_c, elim_c)

    # reduced system over the keep-set: blockdiag(Sc) + cross couplings
    # (cross = H with its chunk-diagonal zeroed; touches separators only)
    R_full = jnp.zeros_like(H6)
    R_full = R_full.at[dd, :, :, dd, :, :].set(
        Sc.reshape(D, chunk_size, 6, chunk_size, 6)
    )
    cross = H6.at[dd, :, :, dd, :, :].set(0.0)
    R_full = (R_full + cross).reshape(K, 6, K, 6)
    b_red_full = bs.reshape(K, 6)

    R = R_full[sep_idx][:, :, sep_idx, :].reshape(S * 6, S * 6)
    b_red = b_red_full[sep_idx].reshape(S * 6)
    chol = jax.scipy.linalg.cho_factor(R + 1e-9 * jnp.eye(S * 6, dtype=R.dtype))
    x_s = jax.scipy.linalg.cho_solve(chol, b_red).reshape(S, 6)

    # scatter kept solution, then back-substitute eliminated nodes per chunk
    delta = jnp.zeros((K, 6), b.dtype).at[sep_idx].set(x_s)
    delta_c = delta.reshape(D, n)

    x_e = jax.vmap(back_substitute)(Minv, A_es, b_c, elim_c, delta_c)  # (D, n)
    delta_c = jnp.where(elim_c, x_e, delta_c)
    return SchurResult(delta=delta_c.reshape(K, 6), ok=ok, n_sep=n_sep)
