"""Speed-of-light accounting for the hot path (BASELINE.md: "speed-of-
light per chip"; VERDICT r2 item 4).

Analytic FLOP / bytes-moved models for each pipeline stage at the bench
shapes, divided by measured stage times to yield achieved GB/s and
GFLOP/s against the v5e's peaks. The models are *minimum-traffic*
derivations from the algorithms (not profiler counters): they bound what
a perfect implementation would move/compute, so ``frac_hbm`` /
``frac_mxu`` read as "fraction of the roofline actually achieved" and a
small number means the stage is bound by something else (reported in
``bound``) — at scan sizes (8-32k points) that is usually VPU issue rate
or XLA sort latency, not bandwidth.

v5e peaks (public): 197 bf16 TFLOP/s MXU, 819 GB/s HBM. f32 matmuls at
``Precision.HIGHEST`` run ~6 bf16 passes (≈33 TFLOP/s effective); HIGH is
3 passes (≈66). The VPU's f32 throughput is not published; derived from
lane geometry (8×128 lanes × 2 FLOP (FMA) × ~1.5 GHz × 4 units ≈ 12
TFLOP/s) and labeled approximate.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

V5E = dict(
    hbm_gbps=819.0,
    mxu_bf16_tflops=197.0,
    mxu_f32_highest_tflops=197.0 / 6.0,
    mxu_f32_high_tflops=197.0 / 3.0,
    vpu_f32_tflops_approx=12.0,
)

_F32 = 4  # bytes


def _stage(flops: float, bytes_: float, bound: str, note: str) -> dict:
    return {"flops": flops, "bytes": bytes_, "bound": bound, "note": note}


def nn_pairs_model(n: int, m: int, sweeps: float = 1.0) -> dict:
    """Fused VPU 1-NN (ops/pallas/nn_kernel v3): per (query, target) pair
    the subtraction form costs ~11 VPU ops (3 sub + 3 mul + 2 add +
    packed min/argmin select chain). Minimum HBM traffic per sweep: read
    both clouds once (the kernel keeps outputs + query tile in VMEM and
    streams target tiles; each target tile is re-read once per query
    tile, captured by the (n/bq) factor)."""
    bq = 1024.0
    reread = max(n / bq, 1.0)
    return _stage(
        flops=11.0 * n * m * sweeps,
        bytes_=(n * 3 * _F32 + reread * m * 4 * _F32) * sweeps,
        bound="vpu-issue",
        note=f"{n}x{m} fused VPU 1-NN, {sweeps:.1f} sweeps",
    )


def voxel_filter_model(raw: int) -> dict:
    """Sort-based voxel downsample: one lexsort of `raw` (key, payload)
    records dominates. XLA's TPU sort is a multi-pass merge; traffic
    ~ 2·raw·record·log2(raw)."""
    rec = 16.0
    passes = math.log2(max(raw, 2))
    return _stage(
        flops=raw * passes * 4,  # compare/permute ops, not FMA flops
        bytes_=2.0 * raw * rec * passes,
        bound="sort-latency",
        note=f"packed-key sort of {raw} records (~{passes:.0f} merge passes)",
    )


def covariance_model(n: int, k: int) -> dict:
    """GICP covariances: k-NN via approx_max_k over a blocked N×N distance
    matmul (HIGH precision, 3 bf16 passes) + (k·27·N) moment accumulation
    + 3×3 eigendecomposition per point (~250 flops)."""
    matmul = 2.0 * 3 * n * n * 3  # cross-term, 3 passes
    topk = 2.0 * n * n            # compare/select
    moments = 27.0 * k * n + 250.0 * n
    block = 512.0
    bytes_ = (n / block) * n * 3 * _F32 + n * (3 + 6) * _F32
    return _stage(
        flops=matmul + topk + moments,
        bytes_=bytes_,
        bound="mxu-f32-high",
        note=f"kNN(k={k}) matmul + moments at N={n}",
    )


def icp_model(n: int, m: int, iterations: float, plane: bool,
              per_iter_nn: bool = True) -> dict:
    """GICP GN step: optional per-iteration NN sweep + SoA assembly
    (~200 VPU flops/point for the fused 27-accumulator plane path,
    ~60 for Kabsch) + one 6×6 solve (negligible)."""
    assembly = (200.0 if plane else 60.0) * n * iterations
    out = _stage(0.0, 0.0, "vpu-issue", "")
    if per_iter_nn:
        nn = nn_pairs_model(n, m, sweeps=iterations)
        out["flops"] = nn["flops"] + assembly
        out["bytes"] = nn["bytes"] + iterations * n * 15 * _F32
        out["note"] = f"{iterations:.1f} iters x ({nn['note']} + GN assembly)"
    else:
        out["flops"] = assembly
        out["bytes"] = iterations * n * 15 * _F32
        out["note"] = f"{iterations:.1f} fixed-correspondence GN iters at N={n}"
    return out


def scan_to_map_model(n: int, map_fill: int, iterations: float, plane: bool,
                      fixed_corr: bool) -> dict:
    """Refinement = one map-NN query (against the live fill, via
    valid_len tile skipping) + the mapping ICP + one dedup/insert pass."""
    q = nn_pairs_model(n, max(map_fill, n))
    reg = icp_model(n, n, iterations, plane, per_iter_nn=not fixed_corr)
    insert = _stage(10.0 * n, 2.0 * n * 12 * _F32, "hbm", "append insert")
    return _stage(
        q["flops"] + reg["flops"] + insert["flops"],
        q["bytes"] + reg["bytes"] + insert["bytes"],
        "vpu-issue" if not fixed_corr else "map-query+assembly",
        f"map NN at fill {map_fill} + {reg['note']}",
    )


def achieved(model: dict, ms: float) -> dict:
    """Fill in achieved rates + roofline fractions for a measured time."""
    s = ms / 1e3
    gflops = model["flops"] / s / 1e9
    gbps = model["bytes"] / s / 1e9
    peak_flops = {
        "mxu-f32-high": V5E["mxu_f32_high_tflops"],
        "mxu-f32-highest": V5E["mxu_f32_highest_tflops"],
        "mxu-bf16": V5E["mxu_bf16_tflops"],
    }.get(model["bound"], V5E["vpu_f32_tflops_approx"])
    return {
        "ms": round(ms, 3),
        "gflops": round(gflops, 1),
        "gbps": round(gbps, 2),
        "frac_hbm": round(gbps / V5E["hbm_gbps"], 4),
        "frac_compute": round(gflops / (peak_flops * 1e3), 4),
        "bound": model["bound"],
        "note": model["note"],
    }


def stage_rooflines(
    stage_ms: Dict[str, float],
    raw_points: int,
    n_points: int,
    covariance_knn: int,
    odo_iterations: float,
    map_iterations: float,
    map_fill: int,
    plane: bool = True,
    mapping_fixed_corr: bool = True,
) -> Dict[str, dict]:
    """Roofline report for the bench's per-stage timings."""
    models = {
        "voxel_filter": voxel_filter_model(raw_points),
        "covariances": covariance_model(n_points, covariance_knn),
        "icp_odometry": icp_model(n_points, n_points, odo_iterations, plane),
        "scan_to_map_refine": scan_to_map_model(
            n_points, map_fill, map_iterations, plane, mapping_fixed_corr
        ),
    }
    return {
        name: achieved(models[name], ms)
        for name, ms in stage_ms.items()
        if name in models
    }
