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
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
