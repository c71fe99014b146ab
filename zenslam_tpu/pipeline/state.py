"""SLAM state as fixed-capacity masked pytrees.

This replaces the reference's pointer-rich data model (SURVEY.md §7):
- frame inheritance chain sensor⊂processed⊂tracked⊂estimated
  (`frame/processed.h`, `frame/tracked.h`, `frame/estimated.h`)  →  FeatureTable
- `types::map<T>` keyed by monotone global feature index (`types/map.h:23-100`)
  →  landmark SLOT indices (`lm_idx` int32 into LandmarkMap) + stable `track_id`
- `point3d_cloud` (map + nanoflann KD-tree, `types/point3d_cloud.h`)
  →  LandmarkMap arrays; neighbor queries are masked brute-force (map ≤ 10⁴,
     one (N,M) distance matrix is MXU food — no tree needed)

All tables are (capacity, …) arrays + validity masks so every per-frame
computation has static shapes under jit/scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SlamConfig(NamedTuple):
    """Static configuration (python ints/floats — hashable for jit closure).

    Defaults mirror the reference's options (`all_options.h:35-156`,
    `zenslam_options/options/tumvi.yaml`) where applicable.
    """

    # capacities
    max_keypoints: int = 512
    max_landmarks: int = 8192
    # image / pyramid
    pyramid_levels: int = 3
    # CLAHE preprocessing (`processor.cpp:25-39`, clip 4.0 `processor.h:38`;
    # off by default like the reference's baseline run)
    use_clahe: bool = False
    clahe_clip: float = 4.0
    # detection  (`detection_options.h`: cell 16, FAST)
    cell_size: int = 16
    fast_threshold: float = 10.0 / 255.0
    # 3x3 quadratic peak interpolation on the dense score plane at
    # grid-select time (≡ cv::cornerSubPix in the reference's parallel
    # detector, `keypoint_detector_parallel.cpp:160-170`): detections feed
    # stereo transfer and triangulation directly, so integer quantization
    # otherwise propagates into depth. Applies to every score family
    # (FAST/Harris/DoG) — they share the grid selector.
    subpixel_detect: bool = True
    # how often a TRACKED feature's descriptor is recomputed at its current
    # position: 1 = every frame (default — maximum match quality), N =
    # every N frames of track age (new detections always computed; the
    # Pallas ORB kernel then block-skips ~(1-1/N) of the table via its
    # `needs` compaction, worth ~25 fps at 1024² where the measured quality
    # cost is nil). The reference freezes descriptors at detection
    # (`keypoint_detector_simple.cpp` describes only fresh keypoints) —
    # measured here ANY staleness (even refresh=2) triples drift on a
    # rotation-heavy 240p orbit: this pipeline's temporal-rematch and
    # landmark-association matchers do real per-frame work with current
    # appearance, which is partly why its tracking quality beats the
    # reference's 38% KLT survival. Keep 1 unless profiling a
    # translation-dominant high-res deployment.
    describe_refresh: int = 1
    detect_border: int = 16
    # tracking   (`tracking_options.h`: klt window, fb check). klt_iters is
    # the UNROLLED Newton iteration count on the Pallas path (measured: cost
    # is ~1 ms/iter; 5 iterations land within 1e-3 px of the converged
    # while-loop result — see ops/lk_pallas.py docstring) and the fixed
    # masked-convergence count on the XLA fallback.
    klt_radius: int = 10
    klt_iters: int = 5
    # Pallas-path iteration schedule: coarse levels only need to land within
    # the next level's convergence radius, which 3 Newton steps achieve
    # (measured <2e-2 px drift vs the uniform schedule on the tracking
    # parity scenes); the finest level keeps klt_iters for subpixel accuracy.
    klt_coarse_iters: int = 3
    # fwd-bwd consistency: the backward track starts AT the forward solution
    # (init flow = -fwd flow), already inside the finest level's convergence
    # basin, so it refines only the finest k levels (0 = full pyramid).
    klt_bwd_levels: int = 1
    fb_threshold: float = 1.0
    epipolar_threshold: float = 2.0
    landmark_match_distance: int = 64  # hamming
    # ORB backend: "auto" = Pallas tile-sampler on TPU, XLA gather
    # elsewhere; "xla" forces the gather path (A/B debugging)
    orb_backend: str = "auto"
    # landmark association frustum cull (≡ `is_in_frustum`
    # `matching_utils.cpp:106-130` + 50 m map search radius
    # `tracking_options.h:14`)
    landmark_search_radius: float = 50.0
    frustum_margin: float = 20.0
    # temporal descriptor re-acquisition (`matching_utils.cpp:441-563`
    # match_temporal): when KLT loses a landmark-bearing track, its previous
    # descriptor is matched against the current detections under an
    # essential-matrix (epipolar) gate from the predicted relative pose
    use_temporal_rematch: bool = True
    temporal_match_epipolar: float = 3.0
    # triangulation (`triangulation_options` defaults: min_disparity 2.0,
    # reprojection 1.0, depth [1, 50])
    min_depth: float = 0.5
    max_depth: float = 50.0
    reprojection_threshold: float = 1.0
    min_disparity: float = 2.0
    # pose estimation (`pnp_options`, `rigid_options`, `essential_options`)
    pnp_threshold: float = 3.0
    pnp_iters: int = 128
    rigid_threshold: float = 0.05
    rigid_iters: int = 128
    min_inliers: int = 4
    # 2D-2D essential fallback with median-norm scale recovery
    # (`point_estimator.cpp:233-296`) — cascade method 3
    use_essential_fallback: bool = True
    essential_threshold: float = 1.5
    essential_iters: int = 128
    # confidence-weighted fusion across the cascade's successful methods
    # (≡ `pose_fusion.cpp:154-288`; the reference computes this only in
    # tests — here it is a first-class cascade mode)
    use_pose_fusion: bool = False
    # keyframe   (`keyframe_options`)
    kf_min_frames: int = 5
    kf_max_frames: int = 30
    kf_min_translation: float = 0.15
    kf_min_rotation_deg: float = 10.0
    kf_min_tracked_ratio: float = 0.6
    kf_min_inliers: int = 20
    # landmark refinement
    landmark_ema: float = 0.0  # 0 = keep first triangulation (reference map::insert semantics)
    # detector / descriptor family ≡ the reference's detector factory
    # (`keypoint_detector_simple.cpp:8-36`: FAST/ORB/SIFT detector ×
    # ORB/SIFT/FREAK descriptor). Two families here: the binary path
    # (FAST + ORB-256, Hamming) and the float path (multi-scale Harris +
    # SIFT-128, L2 matmul matcher). Back-end consumers (keyframe DB, BoW,
    # loop closure) always see binary codes — float descriptors are
    # LSH-binarized at the snapshot boundary (`ops/match.lsh_binarize`).
    detector: str = "fast"          # "fast" | "harris" | "dog"
    descriptor: str = "orb"         # "orb" | "sift" | "freak"
    harris_threshold: float = 1e-7
    dog_threshold: float = 0.008    # DoG contrast gate (Lowe 0.03/edge 10 at
                                    # [0,1] intensities; lower here — grid
                                    # selection caps density anyway)
    float_match_distance: float = 0.55  # L2 accept gate (unit-norm SIFT)
    # IMU preintegration backend ≡ the reference integrator façade's method
    # field (`integrator.h:39-44` / `integrator.cpp:158-216`):
    # "basalt" (per-sample manifold scan), "lpm" (linear continuous-time
    # resample), "ugpm" (GP posterior resample — denoises noisy IMUs)
    imu_method: str = "basalt"
    # Allan-variance noise densities ≡ the Kalibr `imu_config.yaml` fields the
    # reference parses (`calibration/imu_calibration.h:21-67`). Loaded from
    # `folder.imu_calibration_file` by the app (io/calibration.parse_imu_config)
    # and consumed twice: the preintegration covariance propagation
    # (imu/preintegration.py) and the covariance-weighted inertial candidate
    # in pose fusion (estimation/cascade.py).
    imu_gyro_noise: float = 1.6e-4        # rad/s/√Hz
    imu_accel_noise: float = 2.8e-3      # m/s²/√Hz
    imu_gyro_bias_walk: float = 1.9e-5   # rad/s²/√Hz
    imu_accel_bias_walk: float = 8.6e-4  # m/s³/√Hz
    # LK implementation: None = auto (Pallas kernel on TPU, scanned XLA on CPU)
    use_pallas_lk: bool | None = None
    # keylines (`slam_options::use_keylines`, `keyline_detector.cpp`,
    # `keyline_tracker.cpp`, `line_estimator.cpp` — the reference's line
    # subsystem; off by default like the reference's tumvi config)
    use_keylines: bool = False
    max_keylines: int = 64
    max_line_landmarks: int = 1024
    line_min_length: float = 16.0
    line_max_length: float = 200.0
    line_match_distance: int = 96     # hamming, line-BRIEF is less peaked than ORB
    line_mag_threshold: float = 0.06
    line_epipolar_min_deg: float = 45.0  # direction-vs-epipolar gate (45°-135°)


class FeatureTable(NamedTuple):
    """Left-canonical per-frame feature table (capacity N = max_keypoints)."""

    xy: jnp.ndarray         # (N, 2) float32 — left-image pixels
    uv_r: jnp.ndarray       # (N, 2) float32 — right-image pixels (stereo transfer)
    stereo_ok: jnp.ndarray  # (N,) bool
    desc: jnp.ndarray       # (N, 8) uint32 ORB-256 packed, or (N, 128)
                            # float32 when cfg.descriptor == "sift"
    lm_idx: jnp.ndarray     # (N,) int32 — slot into LandmarkMap, -1 = none
    track_id: jnp.ndarray   # (N,) int32 — stable global feature id (monotone)
    age: jnp.ndarray        # (N,) int32 — frames tracked
    valid: jnp.ndarray      # (N,) bool


class LineTable(NamedTuple):
    """Left-canonical per-frame keyline table (capacity L = max_keylines).
    ≡ the reference's keyline set in `frame::tracked` (`types/keyline.h`)."""

    ep: jnp.ndarray         # (L, 2, 2) float32 — endpoints in the left image
    ep_r: jnp.ndarray       # (L, 2, 2) float32 — right-image endpoints
    stereo_ok: jnp.ndarray  # (L,) bool
    desc: jnp.ndarray       # (L, 8) uint32 — line-BRIEF packed
    lm_idx: jnp.ndarray     # (L,) int32 — slot into Line3dMap, -1 = none
    track_id: jnp.ndarray   # (L,) int32
    age: jnp.ndarray        # (L,) int32
    valid: jnp.ndarray      # (L,) bool


class Line3dMap(NamedTuple):
    """World 3D line-segment table (capacity M = max_line_landmarks).
    ≡ `types/line3d_cloud` (`types/line3d_cloud.h`)."""

    xyz: jnp.ndarray        # (M, 2, 3) float32 — world endpoint pair
    desc: jnp.ndarray       # (M, 8) uint32
    valid: jnp.ndarray      # (M,) bool
    last_seen: jnp.ndarray  # (M,) int32
    n_obs: jnp.ndarray      # (M,) int32


class LandmarkMap(NamedTuple):
    """World landmark table (capacity M = max_landmarks)."""

    xyz: jnp.ndarray        # (M, 3) float32 — world coordinates
    desc: jnp.ndarray       # descriptor at creation (shape follows family)
    valid: jnp.ndarray      # (M,) bool
    last_seen: jnp.ndarray  # (M,) int32 — frame index of last observation
    n_obs: jnp.ndarray      # (M,) int32 — number of observations
    # slot REUSE counter: bumps every time LRU eviction recycles the slot.
    # Keyframe snapshots record the generation they observed, so stale slot
    # references (old keyframes pointing at recycled slots) are detectable —
    # the reference's monotone global indices can never be recycled
    # (`types/map.h`), this is the fixed-capacity equivalent of that safety.
    generation: jnp.ndarray  # (M,) int32
    # intensity sampled at triangulation ≡ the per-point BGR sampling of
    # `mapping/triangulator.cpp:74-103` (the sensor here is grayscale) —
    # what makes the exported point cloud renderable (analysis/scene_export)
    color: jnp.ndarray       # (M,) float32 in [0, 1]


class VioState(NamedTuple):
    """Visual-inertial state carried across frames.

    ≡ the reference's slam_thread-owned IMU machinery: inertial_predictor
    velocity/gravity state (`inertial_predictor.h:16-74`), gravity_estimator
    sample buffer (`gravity_estimator.cpp:6-134`), and the integrator's bias
    carry-over (`integrator.cpp:184-215`)."""

    v_world: jnp.ndarray       # (3,) body velocity in world frame
    gravity_w: jnp.ndarray     # (3,) current gravity estimate (world)
    gravity_ok: jnp.ndarray    # () bool — enough samples accepted
    bias_gyro: jnp.ndarray     # (3,)
    bias_accel: jnp.ndarray    # (3,)
    # gravity-estimator sample ring (component-median, `gravity_estimator.cpp`)
    grav_samples: jnp.ndarray  # (C, 3)
    grav_valid: jnp.ndarray    # (C,) bool
    grav_next: jnp.ndarray     # () int32
    # 3-pose history of the body (p in world, R_wb) + interval dt and mean
    # specific force, for the central-difference VO-acceleration sample
    hist_p: jnp.ndarray        # (3, 3) oldest-first body positions
    hist_R_wb: jnp.ndarray     # (3, 3, 3)
    hist_dt: jnp.ndarray       # (2,) dt between consecutive history poses
    hist_f: jnp.ndarray        # (2, 3) mean specific force per interval
    hist_n: jnp.ndarray        # () int32 — number of valid history poses


def init_vio(gravity_capacity: int = 64) -> VioState:
    return VioState(
        v_world=jnp.zeros(3, jnp.float32),
        gravity_w=jnp.zeros(3, jnp.float32),
        gravity_ok=jnp.asarray(False),
        bias_gyro=jnp.zeros(3, jnp.float32),
        bias_accel=jnp.zeros(3, jnp.float32),
        grav_samples=jnp.zeros((gravity_capacity, 3), jnp.float32),
        grav_valid=jnp.zeros(gravity_capacity, bool),
        grav_next=jnp.asarray(0, jnp.int32),
        hist_p=jnp.zeros((3, 3), jnp.float32),
        hist_R_wb=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (3, 1, 1)),
        hist_dt=jnp.zeros(2, jnp.float32),
        hist_f=jnp.zeros((2, 3), jnp.float32),
        hist_n=jnp.asarray(0, jnp.int32),
    )


class MotionModel(NamedTuple):
    """Constant-ACCELERATION kinematic model with EMA smoothing
    ≡ `motion_predictor.cpp:5-38`: velocity/acceleration in the relative-pose
    delta space (translation + Rodrigues angular), each update averaging the
    new observation with the running estimate ((new + old)/2, the reference's
    EMA), prediction = vel + ½·acc per frame. With acc == 0 this degenerates
    to the constant-velocity model. Applied on the left-camera pose T_cw as
    a LEFT delta: T_pred = Δ ∘ T_cw."""

    vel: jnp.ndarray      # (3,)  translational delta / frame
    acc: jnp.ndarray      # (3,)
    vel_ang: jnp.ndarray  # (3,)  axis-angle delta / frame
    acc_ang: jnp.ndarray  # (3,)
    n_updates: jnp.ndarray  # () int32 — prediction engages after the first


class SlamState(NamedTuple):
    features: FeatureTable
    lmap: LandmarkMap
    lines: LineTable
    line_map: Line3dMap
    # current left-camera pose, world->cam
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    motion: MotionModel
    # keyframe bookkeeping (`keyframe_selector.cpp:14-55` state)
    last_kf_R: jnp.ndarray
    last_kf_t: jnp.ndarray
    frames_since_kf: jnp.ndarray  # () int32
    frame_idx: jnp.ndarray        # () int32
    next_track_id: jnp.ndarray    # () int32
    next_line_id: jnp.ndarray     # () int32
    # previous-frame left pyramid: RAGGED tuple of per-level arrays (see
    # ops.lk.build_ragged_pyramid_pair; bf16 on the Pallas path)
    prev_pyr_l: tuple
    rng_key: jnp.ndarray
    vio: VioState


class FrameTelemetry(NamedTuple):
    """Per-frame counters/quality — the `frame/counts.h` + pose record that
    feeds the CSV writer (`frame/writer.cpp:16-110`)."""

    n_tracked: jnp.ndarray
    n_detected: jnp.ndarray
    n_stereo: jnp.ndarray
    n_triangulated: jnp.ndarray
    n_pose_inliers: jnp.ndarray
    pose_method: jnp.ndarray
    pose_ok: jnp.ndarray
    tracked_ratio: jnp.ndarray
    is_keyframe: jnp.ndarray
    map_size: jnp.ndarray
    n_lines: jnp.ndarray
    n_line_triangulated: jnp.ndarray
    line_map_size: jnp.ndarray
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray


_TEL_N_SCALARS = 13  # fields before R_cw/t_cw


@jax.jit
def pack_telemetry(tel: FrameTelemetry):
    """Flatten a FrameTelemetry to ONE (25,) f32 device vector.

    Every separate ``int()``/``float()``/``np.asarray()`` on a jax scalar is
    a full device→host round trip — ~25 ms over the axon TPU tunnel — and a
    naive per-field telemetry read costs 15+ of them per frame (measured
    ~215 ms/frame of pure readback latency in the app). Packing on device
    makes the whole per-frame host handoff a single transfer."""
    scalars = jnp.stack([jnp.asarray(f, jnp.float32)
                         for f in tel[:_TEL_N_SCALARS]])
    return jnp.concatenate([
        scalars, tel.R_cw.reshape(-1).astype(jnp.float32),
        tel.t_cw.astype(jnp.float32)])


def unpack_telemetry(vec) -> FrameTelemetry:
    """Host-side inverse of pack_telemetry: numpy-leaf FrameTelemetry
    (reads like the device one, but every field access is free)."""
    import numpy as np

    v = np.asarray(vec)
    k = _TEL_N_SCALARS
    return FrameTelemetry(*v[:k], R_cw=v[k:k + 9].reshape(3, 3),
                          t_cw=v[k + 9:k + 12])


def empty_desc(cfg: SlamConfig, n: int):
    """Descriptor storage for the active family: packed binary or float."""
    if cfg.descriptor == "sift":
        return jnp.zeros((n, 128), jnp.float32)
    return jnp.zeros((n, 8), jnp.uint32)


def empty_features(cfg: SlamConfig) -> FeatureTable:
    n = cfg.max_keypoints
    return FeatureTable(
        xy=jnp.zeros((n, 2), jnp.float32),
        uv_r=jnp.zeros((n, 2), jnp.float32),
        stereo_ok=jnp.zeros(n, bool),
        desc=empty_desc(cfg, n),
        lm_idx=jnp.full(n, -1, jnp.int32),
        track_id=jnp.full(n, -1, jnp.int32),
        age=jnp.zeros(n, jnp.int32),
        valid=jnp.zeros(n, bool),
    )


def empty_lines(cfg: SlamConfig) -> LineTable:
    n = cfg.max_keylines
    return LineTable(
        ep=jnp.zeros((n, 2, 2), jnp.float32),
        ep_r=jnp.zeros((n, 2, 2), jnp.float32),
        stereo_ok=jnp.zeros(n, bool),
        desc=jnp.zeros((n, 8), jnp.uint32),
        lm_idx=jnp.full(n, -1, jnp.int32),
        track_id=jnp.full(n, -1, jnp.int32),
        age=jnp.zeros(n, jnp.int32),
        valid=jnp.zeros(n, bool),
    )


def empty_line_map(cfg: SlamConfig) -> Line3dMap:
    m = cfg.max_line_landmarks
    return Line3dMap(
        xyz=jnp.zeros((m, 2, 3), jnp.float32),
        desc=jnp.zeros((m, 8), jnp.uint32),
        valid=jnp.zeros(m, bool),
        last_seen=jnp.full(m, -1, jnp.int32),
        n_obs=jnp.zeros(m, jnp.int32),
    )


def empty_landmarks(cfg: SlamConfig) -> LandmarkMap:
    m = cfg.max_landmarks
    return LandmarkMap(
        xyz=jnp.zeros((m, 3), jnp.float32),
        desc=empty_desc(cfg, m),
        valid=jnp.zeros(m, bool),
        last_seen=jnp.full(m, -1, jnp.int32),
        n_obs=jnp.zeros(m, jnp.int32),
        generation=jnp.zeros(m, jnp.int32),
        color=jnp.zeros(m, jnp.float32),
    )


def resolve_use_pallas(cfg: SlamConfig) -> bool:
    """Whether the Pallas LK kernel is active (None = auto by backend).
    Also decides the pyramid storage dtype (bf16 on the kernel path)."""
    if cfg.use_pallas_lk is None:
        return jax.default_backend() not in ("cpu",)
    return cfg.use_pallas_lk


def pyramid_dtype(cfg: SlamConfig):
    return jnp.bfloat16 if resolve_use_pallas(cfg) else jnp.float32


def init_state(cfg: SlamConfig, image_shape, seed: int = 0) -> SlamState:
    from zenslam_tpu.ops.lk import empty_ragged_pyramid

    H, W = image_shape
    return SlamState(
        features=empty_features(cfg),
        lmap=empty_landmarks(cfg),
        lines=empty_lines(cfg),
        line_map=empty_line_map(cfg),
        R_cw=jnp.eye(3, dtype=jnp.float32),
        t_cw=jnp.zeros(3, jnp.float32),
        motion=MotionModel(
            vel=jnp.zeros(3, jnp.float32),
            acc=jnp.zeros(3, jnp.float32),
            vel_ang=jnp.zeros(3, jnp.float32),
            acc_ang=jnp.zeros(3, jnp.float32),
            n_updates=jnp.asarray(0, jnp.int32),
        ),
        last_kf_R=jnp.eye(3, dtype=jnp.float32),
        last_kf_t=jnp.zeros(3, jnp.float32),
        frames_since_kf=jnp.asarray(0, jnp.int32),
        frame_idx=jnp.asarray(0, jnp.int32),
        next_track_id=jnp.asarray(0, jnp.int32),
        next_line_id=jnp.asarray(0, jnp.int32),
        prev_pyr_l=empty_ragged_pyramid(H, W, cfg.pyramid_levels,
                                        pyramid_dtype(cfg)),
        rng_key=jax.random.PRNGKey(seed),
        vio=init_vio(),
    )
