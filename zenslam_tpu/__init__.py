"""zenslam_tpu — a TPU-native stereo visual-inertial SLAM framework.

Re-implements the capabilities of the reference C++ system (vinodkhare/zenslam)
as an arrays-first JAX/XLA/Pallas framework:

- ``geometry``   — SO(3)/SE(3) Lie ops, camera models, rectification, triangulation
- ``ops``        — device kernels: image pyramid, FAST/ORB, Hamming matcher (MXU),
                   pyramidal Lucas-Kanade, batched RANSAC primitives
- ``frontend``   — detection / tracking / stereo association over masked feature tables
- ``estimation`` — PnP / essential / rigid pose estimators + fusion cascade
- ``imu``        — SO(3)-manifold preintegration, gravity estimation, predictors
- ``backend``    — windowed & Schur bundle adjustment, pose graph, keyframe DB, BoW
- ``parallel``   — device-mesh sharded bundle adjustment (pjit/shard_map + psum)
- ``pipeline``   — the per-frame jitted SLAM step and the host runner
- ``io``         — dataset readers, Kalibr calibration, telemetry CSV
- ``eval``       — ATE / RPE trajectory metrics

Design stance (vs. the reference, see SURVEY.md §7): fixed-capacity masked
tables instead of pointer-rich maps, pure jitted stage functions instead of
threads, ``lax.scan`` over frames for offline throughput, fixed-iteration
vmapped RANSAC instead of adaptive early-exit loops.
"""

import jax as _jax

# SLAM geometry is dominated by tiny (3x3/4x4/6x6) matmuls whose accuracy the
# whole pipeline leans on; default TPU bf16 matmul passes are NOT acceptable
# there. Hot image/matcher kernels opt into low precision explicitly
# (bf16 inputs / per-op precision), so this global costs nothing where it
# matters for speed.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache — OPT-IN via ZENSLAM_CACHE_DIR: TPU compiles
# in this environment are slow (remote AOT service), so the TPU entry
# scripts (bench.py, profile_*.py, e2e_fulldress.py) enable it; the offline
# workers wire their own shared dir (parallel/offline.py). It must NOT be on
# by default: serializing the largest multi-device CPU executables for the
# cache write segfaults the process (observed deterministically on the
# 8-virtual-device test suite's full-system program — jax 0.8/tsl zstd
# path), which would take down any unsuspecting CPU run.
import os as _os

_cache_dir = _os.environ.get("ZENSLAM_CACHE_DIR", "")
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

__version__ = "0.1.0"
