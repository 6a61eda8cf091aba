"""Typed configuration for the SLAM pipeline.

One frozen dataclass replaces the reference's three-tier ROS parameter
system (YAML ``/root/reference/config/icpslam.yaml:1-31`` + launch args +
in-code defaults) and *promotes every hidden hard constant to config*
(SURVEY.md §5.6): the keyframe gate (``icpslam.h:36``), ICP knobs
(``icp_odometer.h:62-65``, ``octree_mapper.h:53-56``), and the robot-odom
pose gate (``robot_odometer.h:40``).

Defaults follow the YAML values where YAML and code defaults disagree
(voxel leaf 0.2 not 0.05; map resolution 0.2 not 0.5), since YAML is what
the reference actually runs with via its launch file.

The config is hashable and contains only static python values, so it can be
passed as a ``static_argnum`` to jitted step functions; capacities
(``max_points`` etc.) fix the padded array shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    """Registration knobs shared by scan-to-scan and scan-to-map ICP.

    Mirrors PCL GICP configuration at ``icp_odometer.cpp:188-199`` /
    ``octree_mapper.cpp:104-115``.
    """

    max_iterations: int = 10          # icp_odometer.h:65 (odometry)
    max_correspondence_distance: float = 1.0  # icp_odometer.h:63
    # early-exit threshold on the se(3) twist norm of the per-iteration
    # update (NOT PCL's matrix-element epsilon, icp_odometer.h:64 = 1e-6).
    # 1e-4 ≈ 0.1 mm / 0.006° — far below sensor noise and still tighter
    # than PCL GICP's own rotation-epsilon default (2e-3); measured
    # equal-or-better ATE with ~1.2 fewer ICP iterations per scan.
    transformation_epsilon: float = 1e-4
    fitness_threshold: float = 20.0   # hardcoded accept gate, icp_odometer.cpp:201
    # GICP covariance regularization (PCL uses epsilon-inflated plane covs)
    # 'knn': PCL-style k nearest neighbors (default — smoother normals,
    # lets ICP early-exit); 'radius': fixed-radius moment statistics in
    # one fused Pallas pass (cheaper per call; normals are noisier at the
    # radius cutoff, which tends to cost ICP iterations). With
    # covariance_sigma > 0 the radius pass applies a Gaussian distance
    # taper — near neighbors dominate like in kNN mode, at radius cost.
    covariance_mode: str = "knn"
    covariance_radius: float = 0.5   # meters (~2.5 voxel leaves)
    covariance_sigma: float = 0.0    # Gaussian taper σ for radius mode (0 = hard cutoff)
    covariance_knn: int = 10
    covariance_epsilon: float = 1e-3
    # 'point' (Kabsch point-to-point) or 'plane' (GICP-style plane-to-plane GN)
    mode: str = "plane"
    # re-run the NN correspondence search every n-th ICP iteration and
    # reuse the matches (re-evaluated at the updated pose) in between.
    # 1 = PCL-parity (fresh matches every iteration). Measured on a v5e
    # chip (bench.py --refresh): >1 is *slower* (203-208 vs 240 scans/s)
    # — the fused Pallas NN kernel is cheap enough that skipping sweeps
    # loses to the stricter epsilon exit (a small step against stale
    # matches can't end the loop, so iterations grow). Kept as a knob
    # for CPU/interpret runs where NN dominates.
    correspondence_refresh: int = 1
    # True: fitness from an extra correspondence pass at the final pose
    # (exact PCL getFitnessScore semantics); False (default): reuse the
    # last iteration's correspondences — one GN step stale, saves a full
    # NN sweep per registration. Measured: identical trajectories on the
    # bench workload (the stale score only feeds the coarse `< 20` gate).
    exact_fitness: bool = False
    # Huber robust-loss scale in meters (0 disables robust weighting)
    huber_delta: float = 0.5


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    # --- frames (icpslam.yaml:6-10); informational, used by IO adapters ---
    map_frame: str = "map"
    odom_frame: str = "odom"
    robot_frame: str = "base_link"
    laser_frame: str = "laser"

    # --- sensor extrinsic: pose of the laser in the robot frame, applied
    # to every raw scan at ingest — the reference's per-cloud tf transform
    # (icp_odometer.cpp:162-174). Static (t xyz, q wxyz) so the identity
    # case compiles to nothing.
    laser_extrinsic_t: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    laser_extrinsic_q: Tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0)

    # --- front-end odometry ---
    num_clouds_skip: int = 0          # icpslam.yaml:13
    voxel_leaf_size: float = 0.2      # icpslam.yaml:14
    icp_odometry: IcpConfig = dataclasses.field(default_factory=IcpConfig)
    # in-loop motion de-skew (no INS): > 0 enables it inside the odometry
    # step. Sweep fractions derive from point azimuth (cloud/deskew.py);
    # the filtered cloud handed to mapping is de-skewed. 0 (default)
    # compiles the whole path out — the reference has no de-skew at all;
    # the INS-measured alternative stays at ingest (runner --deskew).
    # The value is the round count ONLY for deskew_mode='alternate'
    # (re-skew ↔ register repeats; 2 suffice); 'coupled' and 'joint'
    # solve in one registration and treat any value > 0 as on.
    deskew_rounds: int = 0
    # 'coupled' (default, DESIGN §14): register the raw smeared sweeps
    # directly — the previous sweep is warped by the very transform
    # being solved (its smear IS the measured inter-scan motion) and the
    # current sweep by the same transform under one-step constant
    # velocity (ops/skew_icp.coupled_deskew_icp; optionally freed via
    # deskew_free_twist below). 'joint' (12-DoF free sweep twist with a
    # CV prior) and 'alternate' (re-skew ↔ re-register rounds) are the
    # measured-inferior attempts, kept for comparison (DESIGN §14 table).
    deskew_mode: str = "coupled"
    # information of the prior pulling the estimated sweep twist toward
    # its constant-velocity seed (per mille of the correspondence count;
    # ops/skew_icp.py) — keeps the pose/twist split well-posed where
    # scene geometry or u-coverage under-constrains it. 100 is the
    # measured optimum for free-twist mode on the 500-pose physics proxy
    # (w=1: 5.6 m ATE, 8: 0.69, 20: 0.57, 50: 0.38, 100: 0.33, 200:
    # 0.34 — the azimuth-correlated pose/twist split needs a stiff
    # anchor everywhere except where the data truly demands a split)
    deskew_prior_weight: float = 100.0
    # Huber scale (twist-norm units, m+rad mixed) for the free-twist
    # relative prior: 0 (default) = plain quadratic; > 0 IRLS-downweights
    # the prior once the twist deviates beyond the scale. Measured on the
    # 500-pose physics proxy (weight 100): robustifying DESTABILIZES —
    # delta 0.05 -> ATE 4.6, delta 0.3 -> see DESIGN §14 — the weakened
    # prior feeds the azimuth-degeneracy runaway it exists to prevent.
    # Kept as a knob with the negative result documented.
    deskew_prior_huber: float = 0.0
    # coupled mode: free the SOURCE sweep twist as 6 extra unknowns with
    # a relative prior toward the solved transform, instead of tying it
    # by constant velocity — lifts the one modeling assumption left,
    # which fails at step velocity changes (instant corners). See
    # ops/skew_icp.coupled_deskew_icp(free_source_twist=...).
    deskew_free_twist: bool = False
    # automatic prior stiffness (VERDICT r4 weak #4: mode choice was
    # manual): gate the free-twist prior weight on the rotation magnitude
    # of the CURRENT pose iterate INSIDE the registration
    # (ops/skew_icp.prior_weight_at) — straights get a stiff prior
    # (deskew_auto_straight_weight: best measured on gentle segments)
    # and turns the corner-tuned deskew_prior_weight. The in-loop gate
    # is lag-free: the pose is unconstrained by the twist prior, so a
    # corner shows in the estimate within 1-2 GN iterations and the
    # prior relaxes within the same solve. One default mode for both
    # regimes; no per-run flag tuning. Only with deskew_free_twist.
    # DEFAULT OFF — measured and rejected at scale (r5): the latched
    # in-loop gate meets both short-run targets (gentle 60-pose 0.018,
    # corner 500-pose 0.38) but ANY stiffness-on-straights accumulates
    # azimuth-correlated bias over long missions, monotone in the
    # straight weight (2000-scan tree: w=100 fixed 0.54 / 400 1.16 /
    # 2000 gated 14.3-248) — the "tie is best on straights" result only
    # holds on short gentle horizons. Fixed w=100 is the robust
    # all-regime default.
    deskew_auto_prior: bool = False
    # rad of current-iterate rotation above which the prior relaxes to
    # deskew_prior_weight (urban 10 Hz: straights ~0.001 rad/scan, turns
    # ~0.14). NOTE the gate must be in-loop: a scan-level gate on the
    # last ACCEPTED transform lags corner entries and measured divergent
    # on long missions (2000-scan tree ATE 14.3 at straight weight 2000,
    # 1.16 at 400 — vs 0.54 fixed; the in-loop gate fixes the class).
    deskew_auto_turn_threshold: float = 0.02
    deskew_auto_straight_weight: float = 2000.0

    # --- mapping ---
    map_resolution: float = 0.2       # octree_resolution, icpslam.yaml:17
    icp_mapping: IcpConfig = dataclasses.field(
        default_factory=lambda: IcpConfig(max_iterations=30)  # octree_mapper.h:56
    )
    # map-NN search radius in voxels (1 → 3^3 neighborhood)
    map_nn_radius: int = 1
    # scan-to-map refinement reuses the map-NN pairing for ALL its ICP
    # iterations (source point i ↔ its map NN at the raw pose) instead of
    # re-searching the NN cloud per iteration (PCL semantics). The
    # initial pairing is exact by construction and the refinement
    # correction is sub-voxel, so quality is preserved while every
    # per-iteration NN sweep disappears — the mapping ICP's dominant
    # cost. False restores per-iteration re-matching.
    mapping_fixed_correspondences: bool = True
    # with fixed correspondences: total map-query+register rounds allowed
    # when the correction is large (mean scan-point displacement
    # > map_resolution/10, scan_to_map.py). Round 1 always
    # runs; extra rounds re-query the REAL map at the corrected pose
    # (strictly better than the reference re-matching within its stale
    # NN cloud) and only execute when the correction magnitude says the
    # pairing was computed at a meaningfully wrong pose.
    mapping_requery_rounds: int = 3
    # 'point': append-only map + exact brute-force NN (Pallas/MXU — faster
    # AND more accurate than the reference's approx octree descent on TPU)
    # 'voxel': sorted voxel hash with 3^3-neighborhood approx lookups
    # 'sharded': the voxel map spatially sharded across a device mesh
    #   (map_shards devices; pass the mesh to slam_step) — map capacity
    #   scales with devices, insert is communication-free, NN reduces
    #   over the mesh (SURVEY §5.7; parallel/sharded_map.py)
    map_backend: str = "point"
    # device count for map_backend='sharded' (static so state shapes are
    # config-derived; must equal the mesh size passed to slam_step)
    map_shards: int = 1
    # what a FULL map does with new geometry (point backend):
    # 'none' (default) — drop new points and count them in `overflow`
    #   (the reset-on-optimize cadence keeps the map far from capacity in
    #   normal operation, so drops should never happen — a nonzero
    #   counter is a sizing signal);
    # 'ring' — overwrite the OLDEST map points instead (FIFO eviction):
    #   a long mission with reset_map_on_optimize=False keeps absorbing
    #   recent geometry forever and `overflow` counts evictions. The
    #   reference has neither — its octree grows without bound
    #   (octree_mapper.cpp:63-70).
    map_eviction: str = "none"
    # ablation / odometry-only mode: skip scan-to-map refinement entirely
    # (the reference's refine call, icpslam.cpp:135). The map stays empty
    # in this mode (refinement is its only growth path); checkpoint
    # re-rendering from keyframes still reconstructs one.
    enable_scan_to_map: bool = True

    # --- keyframes & graph (icpslam.h:36-37, icpslam.yaml:20-23) ---
    keyframe_distance: float = 0.3    # KFS_DIST_THRESH, icpslam.h:36
    keyframes_window: int = 4         # optimize cadence, icpslam.yaml:23
    # 6-diagonals of the information matrices (icpslam.yaml:20-22)
    icp_information: Tuple[float, ...] = (100.0, 100.0, 100.0, 100.0, 100.0, 100.0)
    # derive sequential-edge information matrices from the registration
    # itself: the final Gauss-Newton Hessian JᵀWJ of the scan-to-map (or
    # odometry) ICP, rescaled so its mean diagonal matches
    # icp_information's (relative anisotropy from the measurement,
    # overall weight vs loop/wheel edges still configured). The reference
    # fakes this with fixed diagonals (icpslam.cpp:28-40) while its
    # Pose6DOF carries a covariance everywhere (pose6DOF.h:15-126); here
    # the per-keyframe covariance (inverse information) is stored in the
    # keyframe store and threaded to exports. False keeps the reference's
    # fixed diagonals.
    adaptive_information: bool = False
    odometry_information: Tuple[float, ...] = (10.0, 10.0, 10.0, 10.0, 10.0, 10.0)
    loop_information: Tuple[float, ...] = (100.0, 100.0, 100.0, 100.0, 100.0, 100.0)
    # loop closures: the reference *intends* these (README.md:14-20, marker
    # heuristic |id1-id2| > 2 at icpslam.cpp:263) but never adds edges; we
    # implement them properly (SURVEY.md §7.4).
    enable_loop_closure: bool = True
    loop_closure_radius: float = 3.0
    loop_closure_min_id_gap: int = 3
    # top-k radius candidates proposed per new keyframe; every candidate
    # that passes verification contributes a loop edge
    loop_closure_candidates: int = 2
    # verification registration mode: 'point' (Kabsch) or 'plane' (GICP)
    loop_closure_icp_mode: str = "point"
    # consistency gate: fraction of source points that must find a
    # correspondence at the verified pose (0 disables)
    loop_closure_min_inlier_ratio: float = 0.3
    # verify candidates as ONE vmapped batched registration instead of a
    # serial lax.scan of full ICPs (VERDICT r3 weak #1: the serial scan
    # sat on the keyframe critical path). All k candidate ICPs share every
    # NN sweep as a batched kernel launch; out-of-radius candidates are
    # gated out of the edge add (their lanes compute but cost no extra
    # wall-clock — the batch is latency-bound, not FLOP-bound). False
    # restores the serial scan (which skips out-of-radius registrations
    # at runtime — only useful where batching is unavailable).
    loop_closure_vectorized: bool = True
    # graph solver: 'gn' or 'lm' — honors the reference's pluggable-backend
    # intent (launch/icpslam.launch:14-15 'g2o|gtsam' arg)
    graph_solver: str = "lm"
    # LM iterations per windowed solve. The window cadence means each
    # solve starts near-converged (corrections land over subsequent
    # windows), so 3 measures identical ATE to 5 on the urban proxy AND
    # the loop-closure drift-rescue scenario (0.054 vs 0.053 m tail
    # drift) while cutting the late-mission solve cost 40%.
    graph_solver_iterations: int = 3
    # linear solver inside GN/LM: 'direct' (dense-block Cholesky — with
    # bucketing below it solves at the live size: 3.9 ms at 30 live
    # keyframes vs 42 ms at full 512 capacity on v5e), 'pcg' (matrix-free
    # block-Jacobi CG — wins at full capacity, ~2x direct at K=512, and
    # scales with edges not capacity²), 'schur' (chunked elimination), or
    # 'auto' (default: per-bucket direct up to K=256, PCG above — young
    # graphs get the cheap factorization, late-mission solves the ~2x
    # faster CG; VERDICT r2 item 7).
    # 'dist-direct' / 'dist-pcg' / 'dist-schur' / 'dist-auto' run the SAME
    # windowed solve edge-sharded across the device mesh passed to
    # slam_step (parallel/dist_graph.py): per-edge linearization and
    # assembly split over devices, reduced with psum over ICI — the
    # reference's one blocking g2o call (icpslam.cpp:171) living on the
    # mesh. Requires a mesh; trajectory-identical to the replicated
    # solver (tests/test_sharded_slam.py). Incremental *window* solves
    # (graph_incremental below) stay local even in dist mode: a 6W×6W
    # window system is latency-bound, not compute-bound — distributing it
    # would put two psums on the critical path for no FLOP relief.
    graph_linear_solver: str = "auto"
    # incremental back-end (iSAM-style partial updates under static
    # shapes): between loop closures the windowed optimize solves only the
    # last graph_window nodes, conditioned EXACTLY on the frozen prefix
    # (edges into the prefix become unary priors; pose_graph.py
    # ``optimize_window``). New global information — any loop-closure edge
    # since the last solve — triggers a full-graph solve. No new
    # measurement touches the prefix between loop closures, so quality is
    # preserved while the late-mission solve cost stays O(window³) instead
    # of O(live_nodes³) (VERDICT r3 weak #1). For missions that fit in
    # graph_window the two paths are numerically identical.
    graph_incremental: bool = True
    graph_window: int = 64
    # capacity bucketing for the in-pipeline solve: lax.switch over
    # power-of-two keyframe prefixes (>= graph_bucket_min), so a young
    # graph solves at its own size instead of full capacity (SURVEY §7.4
    # bucketed capacities). Each bucket compiles once.
    graph_bucketing: bool = True
    graph_bucket_min: int = 64
    # pipelined back-end (SURVEY §2.3 'pipeline parallel'): slam_step
    # skips the inline solve; the driver dispatches it asynchronously on
    # a graph snapshot and folds the correction back a few scans later
    # (pipeline/deferred.py). The reference's mainLoop blocks instead.
    defer_optimization: bool = False

    # --- wheel / external odometry fusion (robot_odometer.cpp) ---
    wheel_odom_pose_gate: float = 0.1  # POSE_DIST_THRESH, robot_odometer.h:40
    enable_wheel_odom_edges: bool = False  # dead code in reference; optional here

    # what a FULL keyframe store does with a new keyframe:
    # 'marginalize' (default) — evict the most redundant frozen keyframe
    #   first (graph/marginalize.py): its edges are re-homed to its
    #   predecessor with covariance-correct SE(3) composition, so the
    #   graph keeps its information while the slot is reused. Missions
    #   outlive max_keyframes — new nodes and loop closures keep coming
    #   forever (the static-shape answer to the reference's unbounded
    #   std::vector growth, icpslam.cpp:88). Evictions are counted in
    #   KeyframeStore.evictions.
    # 'none' — the pre-r5 hard stop: the store freezes at capacity (no
    #   new nodes or loop closures; tracking continues on odometry +
    #   scan-to-map).
    keyframe_eviction: str = "marginalize"
    # never evict the gauge anchor (node 0) or the last N live keyframes
    # (the active odometry/loop-closure trail)
    keyframe_protect_recent: int = 8
    # redundancy-score penalty (meters) per incident loop edge — loop
    # anchors carry global information and are kept unless very redundant
    keyframe_loop_edge_penalty: float = 10.0

    # --- static capacities (TPU padded shapes) ---
    max_points: int = 8192            # downsampled points per scan
    max_raw_points: int = 131072      # raw scan capacity before voxel filter
    max_map_points: int = 262144      # voxel-map capacity
    max_keyframes: int = 512
    max_edges: int = 2048

    # --- visualization markers (icpslam.yaml:27-31) — consumed by the
    # HTML viewer (viz/html.py): node point size / edge line width scale
    # with the reference's marker scales, and explicitly configured
    # colors override the viewer defaults (the id-proportional ramp
    # stays when the colors are left at the reference defaults — it is
    # the richer rendering of the same intent, icpslam.cpp:260-275).
    marker_scale_nodes: float = 0.1           # icpslam.yaml:27
    marker_scale_edges: float = 0.05          # icpslam.yaml:28
    icp_nodes_markers_color: Tuple[float, ...] = (0.0, 1.0, 0.0, 1.0)
    odom_nodes_markers_color: Tuple[float, ...] = (0.0, 0.5, 0.5, 1.0)
    edges_markers_color: Tuple[float, ...] = (0.0, 0.0, 1.0, 1.0)

    # --- behavior toggles ---
    publish_map_transform: bool = True  # icpslam.yaml:24
    reset_map_on_optimize: bool = True  # icpslam.cpp:170 contract
    verbosity: int = 1                  # leveled logging, §5.5
    # expose per-scan intermediate clouds (filtered scan + map-NN cloud)
    # in SlamOutput.debug — the offline analog of the reference's
    # verbosity-gated debug topics (icp_odometer.cpp:212-219,
    # octree_mapper.cpp:160-168); static, so the default compiles to
    # nothing. Consumed by the runner's --debug-dump.
    collect_debug: bool = False

    # --- numerics ---
    dtype: str = "float32"

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)

    @property
    def has_laser_extrinsic(self) -> bool:
        """True when a non-identity laser→robot extrinsic is configured
        (static Python check — the identity case costs nothing under jit)."""
        return self.laser_extrinsic_t != (0.0, 0.0, 0.0) or self.laser_extrinsic_q != (
            1.0, 0.0, 0.0, 0.0,
        )


# reference yaml key → SlamConfig field (config/icpslam.yaml:1-31)
_REFERENCE_KEY_ALIASES = {
    "verbosity_level": "verbosity",
    "octree_resolution": "map_resolution",
    "icp_information_matrix": "icp_information",
    "wheel_odom_information_matrix": "odometry_information",
    "loop_information_matrix": "loop_information",
}
# unused frame key — accepted and ignored (the world frame is never
# referenced by the reference's own code either). The marker-styling
# keys are REAL config since r4 (viz/html.py honors them).
_REFERENCE_IGNORED_KEYS = {"world_frame"}


def from_dict(data: dict, **overrides) -> SlamConfig:
    """Build a SlamConfig from a plain dict.

    Accepts this framework's field names (with ``icp_odometry`` /
    ``icp_mapping`` as nested dicts) AND the reference's original yaml
    keys (``config/icpslam.yaml`` — e.g. ``octree_resolution``,
    ``icp_information_matrix``), so the reference's config file loads
    unchanged. Unknown keys raise (typo safety — the ROS param server
    silently ignored them; we don't).
    """
    fields = {f.name for f in dataclasses.fields(SlamConfig)}
    kw = {}
    for key, val in data.items():
        key = _REFERENCE_KEY_ALIASES.get(key, key)
        if key in _REFERENCE_IGNORED_KEYS:
            continue
        if key not in fields:
            raise KeyError(f"unknown config key '{key}'")
        if key in ("icp_odometry", "icp_mapping"):
            if not isinstance(val, dict):
                raise TypeError(f"{key} must be a mapping of IcpConfig fields")
            icp_fields = {f.name for f in dataclasses.fields(IcpConfig)}
            bad = set(val) - icp_fields
            if bad:
                raise KeyError(f"unknown {key} keys {sorted(bad)}")
            val = IcpConfig(**val)
        elif isinstance(val, list):
            val = tuple(float(x) for x in val)
        kw[key] = val
    kw.update(overrides)
    return SlamConfig(**kw)


def from_yaml(path: str, **overrides) -> SlamConfig:
    """Load a SlamConfig from a YAML file — the typed replacement for the
    reference's ROS parameter tier (``launch/icpslam.launch:12`` loading
    ``config/icpslam.yaml``). The reference's own yaml loads as-is (key
    aliases above); ``overrides`` play the role of launch-arg overrides.
    """
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return from_dict(data, **overrides)


def _to_plain(x):
    if isinstance(x, tuple):
        return [_to_plain(v) for v in x]
    if isinstance(x, dict):
        return {k: _to_plain(v) for k, v in x.items()}
    return x


def save_yaml(config: SlamConfig, path: str) -> None:
    """Write a config as YAML (round-trips through ``from_yaml``)."""
    import yaml

    d = _to_plain(dataclasses.asdict(config))
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)


def kitti_config(**overrides) -> SlamConfig:
    """Velodyne/urban-scale operating point (KITTI and the KITTI-proxy
    synthetic sequence). The reference's room-scale yaml defaults don't
    transfer to 80 m-range scans — this promotes the velodyne guidance it
    does give (``config/icpslam.yaml:13`` '20 for velodyne' cloud
    skipping becomes unnecessary here: the TPU pipeline keeps up at 10 Hz)
    and scales the geometric knobs to urban motion:

    - voxel leaf 0.4 m (KITTI-typical downsample, ~8-16k pts/scan)
    - correspondence distance 2.0 m (inter-scan motion ~0.8-3 m)
    - keyframe gate 2.0 m, loop radius 15 m with a wide id gap
    - capacities sized for 80 m range urban scans
    """
    cfg = SlamConfig(
        voxel_leaf_size=0.4,
        map_resolution=0.4,
        icp_odometry=IcpConfig(
            mode="plane", max_iterations=10,
            max_correspondence_distance=2.0, huber_delta=1.0,
        ),
        icp_mapping=IcpConfig(
            mode="plane", max_iterations=30,
            max_correspondence_distance=2.0, huber_delta=1.0,
        ),
        keyframe_distance=2.0,
        loop_closure_radius=15.0,
        loop_closure_min_id_gap=20,
        loop_closure_candidates=2,
        max_points=8192,
        max_raw_points=131072,
        max_map_points=262144,
        max_keyframes=512,
        max_edges=2048,
    )
    return cfg.replace(**overrides) if overrides else cfg


def tiny_config(**overrides) -> SlamConfig:
    """Small-capacity config for tests and compile-check dry runs."""
    cfg = SlamConfig(
        max_points=256,
        max_raw_points=1024,
        max_map_points=4096,
        max_keyframes=32,
        max_edges=128,
    )
    return cfg.replace(**overrides) if overrides else cfg
