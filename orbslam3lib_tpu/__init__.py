"""orbslam3lib_tpu — a TPU-native visual(-inertial) SLAM engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
Lynx-MR/orbslam3lib (ORB-SLAM3 with a Hexagon-DSP front end). See SURVEY.md
at the repo root for the structural map of the reference this build follows.
"""

__version__ = "0.1.0"
