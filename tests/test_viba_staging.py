"""Staged full visual-inertial BA (VIBA1/VIBA2, LocalMapping.cc:206-248
equivalent) and the timestamp-jump guard rails (Tracking.cc:1871-1909)."""
import numpy as np
import pytest

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse
from orbslam3lib_tpu.io.synthetic import render_stereo_sequence, synth_imu
from orbslam3lib_tpu.tracking.tracker import NOT_INITIALIZED, OK, Tracker


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


class TestVIBAStaging:
    def test_viba1_runs_and_keeps_accuracy(self):
        # 60 frames at 8 FPS spans 7.5 s; IMU initializes ~1.5 s in, so
        # t_init crosses the 5 s VIBA1 staging point near the end
        frames, rig, _ = render_stereo_sequence(n_frames=60, dt=0.125, seed=5)
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
        assert tracker.imu_ready
        assert tracker._viba_stage >= 1, "VIBA1 never ran"
        est = tracker.trajectory_centers()
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        ate = ate_rmse(est, gt)
        assert ate < 0.08, f"VI ATE after VIBA1 {ate:.4f} m"


class TestTimestampGuards:
    @pytest.fixture(scope="class")
    def sequence(self):
        return render_stereo_sequence(n_frames=16, dt=1.0 / 15.0, seed=5)

    def test_backwards_timestamp_resets_map(self, sequence):
        frames, rig, _ = sequence
        cfg = base_config(rig)
        tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
        for img_pair, _, ts in frames[:8]:
            tracker.process_frame(img_pair, ts)
        assert tracker.state == OK
        # a frame from the past: active map must be reset (then re-init
        # happens immediately on the same stereo frame)
        img_pair, _, ts = frames[8]
        tracker.process_frame(img_pair, frames[0][2] - 1.0)
        assert tracker.stats["n_resets"] == 1
        assert int(tracker.map.n_kf) <= 1

    def test_forward_jump_small_map_resets(self, sequence):
        frames, rig, _ = sequence
        cfg = base_config(rig)
        tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
        for img_pair, _, ts in frames[:6]:
            tracker.process_frame(img_pair, ts)
        assert tracker.state == OK
        assert int(tracker.map.n_kf) <= 10
        img_pair, _, ts = frames[6]
        tracker.process_frame(img_pair, ts + 5.0)   # > 1 s gap, small map
        assert tracker.stats["n_resets"] == 1
