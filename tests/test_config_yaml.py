"""ORB-SLAM3 YAML settings parity (Settings.cc:144-177 key naming,
cv::FileStorage opencv-matrix blocks)."""
import numpy as np

from orbslam3lib_tpu.config import from_yaml

TUMVI_STYLE = """%YAML:1.0
---
File.version: "1.0"
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.978
Camera1.fy: 190.973
Camera1.cx: 254.932
Camera1.cy: 256.897
Camera1.k1: 0.00348
Camera1.k2: 0.000715
Camera1.k3: -0.0020532
Camera1.k4: 0.000202
Camera2.fx: 190.44
Camera2.fy: 190.44
Camera2.cx: 252.59
Camera2.cy: 254.99
Camera2.k1: 0.0034
Camera2.k2: 0.0007
Camera2.k3: -0.002
Camera2.k4: 0.0002
Camera.width: 512
Camera.height: 512
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.9999,0.0008,0.014,0.101,
        -0.0008,0.9999,-0.0025,-0.002,
        -0.014,0.0025,0.9998,-0.001,
         0.0,0.0,0.0,1.0]
IMU.T_b_c1: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [-0.999, -0.008, 0.007, 0.047,
          0.008, -0.999, -0.003, -0.047,
          0.007, -0.003, 0.999, -0.0068,
          0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 0.00016
IMU.NoiseAcc: 0.0028
IMU.Frequency: 200.0
ORBextractor.nFeatures: 1500
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
"""

EUROC_PINHOLE = """%YAML:1.0
Camera.type: "PinHole"
Camera.fx: 435.2
Camera.fy: 435.2
Camera.cx: 367.4
Camera.cy: 252.2
Camera.width: 752
Camera.height: 480
Camera.bf: 47.9
ThDepth: 35.0
ORBextractor.nFeatures: 1200
"""


def test_tumvi_kb8_config(tmp_path):
    p = tmp_path / "tumvi.yaml"
    p.write_text(TUMVI_STYLE)
    cfg = from_yaml(str(p))
    assert cfg.camera.model == "kannala_brandt8"
    assert cfg.camera.fx == 190.978
    assert cfg.camera.k == (0.00348, 0.000715, -0.0020532, 0.000202)
    assert cfg.camera2 is not None and cfg.camera2.fx == 190.44
    assert cfg.stereo.fisheye
    np.testing.assert_allclose(cfg.stereo.baseline, 0.10102, atol=1e-4)
    R_lr, t_lr = cfg.stereo_extrinsics
    np.testing.assert_allclose(t_lr, [0.101, -0.002, -0.001], atol=1e-6)
    assert abs(R_lr[0, 2] - 0.014) < 1e-6
    assert cfg.imu.t_bc == (0.047, -0.047, -0.0068)
    assert cfg.imu.noise_gyro == 0.00016
    assert cfg.orb.max_kp == 1500
    assert cfg.orb.fast_threshold == 20.0


def test_euroc_pinhole_config(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_PINHOLE)
    cfg = from_yaml(str(p))
    assert cfg.camera.model == "pinhole"
    assert not cfg.stereo.fisheye
    assert cfg.camera.width == 752
    np.testing.assert_allclose(cfg.stereo.baseline, 47.9 / 435.2, rtol=1e-6)
    assert cfg.stereo.depth_factor == 35.0
    assert cfg.orb.max_kp == 1200
