"""orbslam3lib_tpu — a TPU-native visual(-inertial) SLAM engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
Lynx-MR/orbslam3lib (ORB-SLAM3 with a Hexagon-DSP front end). See SURVEY.md
at the repo root for the structural map of the reference this build follows.
"""

__version__ = "0.1.0"

# SLAM geometry (triangulation, pose/BA normal equations, Sim3 solves) is
# numerically fragile in the bf16 passes TPUs use for f32 matmuls by default:
# on-device mono initialization fails outright at DEFAULT precision and works
# at HIGHEST (verified on v5e). Exact-integer descriptor paths (Hamming bit
# dots, BoW descent) pin precision=DEFAULT locally — bit counts <= 256 are
# exact in bf16 — so this global only upgrades the precision-critical math.
import os as _os

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: first compiles through the TPU tunnel are
# slow (20-40 s/graph); cache them on disk so tests/bench re-runs are warm.
# CPU is EXCLUDED: XLA:CPU AOT cache entries record host machine features
# and reload with mismatches (observed "+prefer-no-scatter not supported"
# warnings followed by wrong numerics under pytest).
if _os.environ.get("ORBSLAM3_TPU_NO_COMPILE_CACHE") != "1" \
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu":
    try:
        _cache = _os.path.join(_os.path.dirname(__file__), _os.pardir, ".jax_cache")
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags: fine, just slower
        pass
