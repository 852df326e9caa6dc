"""End-to-end tests for monocular and stereo-inertial modes on the
synthetic corridor (SURVEY.md BASELINE configs 1 and 3)."""
import numpy as np
import pytest
import jax.numpy as jnp

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse
from orbslam3lib_tpu.io.synthetic import render_stereo_sequence, synth_imu
from orbslam3lib_tpu.tracking.tracker import OK, Tracker

pytestmark = pytest.mark.slow  # e2e tier: excluded from the smoke run


def base_config(rig) -> SlamConfig:
    cfg = SlamConfig()
    cfg.map.max_kf = 64
    cfg.map.max_mp = 4096
    cfg.orb.max_kp = 384
    cfg.orb.target_features = 300
    cfg.orb.fast_threshold = 12.0
    cfg.tracker.min_init_features = 150
    cfg.ba.max_points = 1024
    cfg.ba.window_size = 6
    cfg.camera.fx, cfg.camera.fy = rig.fx, rig.fy
    cfg.camera.cx, cfg.camera.cy = rig.cx, rig.cy
    cfg.camera.width, cfg.camera.height = rig.width, rig.height
    cfg.stereo.baseline = rig.baseline
    return cfg


@pytest.fixture(scope="module")
def sequence():
    frames, rig, world = render_stereo_sequence(n_frames=40, dt=1.0 / 15.0, seed=5)
    return frames, rig


class TestMonocular:
    def test_mono_tracks_with_scale_ambiguity(self, sequence):
        frames, rig = sequence
        cfg = base_config(rig)
        tracker = Tracker(cfg, sensor="mono", enable_loop_closing=False)
        for img_pair, _, ts in frames:
            tracker.process_frame(img_pair[0], ts)
        assert tracker.state == OK
        assert tracker.stats["n_kf"] >= 2
        est = tracker.trajectory_centers()
        assert len(est) > 25
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        # mono: align with scale (Sim3 Umeyama)
        ate = ate_rmse(est, gt, with_scale=True)
        assert ate < 0.08, f"mono ATE {ate:.4f} m"


class TestStereoInertial:
    def test_imu_initializes_and_tracks(self, sequence):
        frames, rig = sequence
        cfg = base_config(rig)
        cfg.use_imu = True
        tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
        prev_ts = None
        for img_pair, _, ts in frames:
            if prev_ts is not None:
                gyro, acc, dts = synth_imu(prev_ts, ts, freq=200.0)
                if len(dts):
                    tracker.feed_imu(gyro, acc, dts)
            tracker.process_frame(img_pair, ts)
            prev_ts = ts
        assert tracker.state == OK
        assert tracker.imu_ready, "IMU never initialized"
        assert tracker.stats["track_fail"] == 0
        est = tracker.trajectory_centers()
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        ate = ate_rmse(est, gt)
        assert ate < 0.08, f"VI ATE {ate:.4f} m"
        # bias estimates should stay small (unbiased synthetic IMU)
        bg, ba = tracker.imu_bias
        assert float(jnp.linalg.norm(bg)) < 0.05
