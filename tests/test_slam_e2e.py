"""End-to-end stereo SLAM on the synthetic corridor: the minimum slice of
SURVEY.md §7 step 3 — extraction -> stereo depth -> tracking -> keyframing ->
local BA -> trajectory, gated on ATE against exact ground truth."""
import numpy as np
import pytest
import jax.numpy as jnp

from orbslam3lib_tpu.config import MapConfig, SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse, rpe_rmse
from orbslam3lib_tpu.io.synthetic import StereoRig, render_stereo_sequence
from orbslam3lib_tpu.tracking.tracker import OK, StereoTracker

pytestmark = pytest.mark.slow  # e2e tier: excluded from the smoke run


def small_config() -> SlamConfig:
    cfg = SlamConfig()
    cfg.map.max_kf = 64
    cfg.map.max_mp = 4096
    cfg.orb.max_kp = 384
    cfg.orb.target_features = 300
    cfg.orb.fast_threshold = 12.0
    cfg.tracker.min_init_features = 150
    cfg.ba.max_points = 1024
    cfg.ba.window_size = 6
    return cfg


@pytest.fixture(scope="module")
def sequence():
    frames, rig, world = render_stereo_sequence(n_frames=40, dt=1.0 / 15.0, seed=5)
    return frames, rig


class TestStereoSlamE2E:
    def test_tracks_sequence(self, sequence):
        frames, rig = sequence
        cfg = small_config()
        cfg.camera.fx, cfg.camera.fy = rig.fx, rig.fy
        cfg.camera.cx, cfg.camera.cy = rig.cx, rig.cy
        cfg.camera.width, cfg.camera.height = rig.width, rig.height
        cfg.stereo.baseline = rig.baseline

        tracker = StereoTracker(cfg)
        states = []
        for img_pair, (R_gt, t_gt), ts in frames:
            out = tracker.process_frame(img_pair, ts)
            states.append(out)

        assert tracker.state == OK
        assert tracker.stats["n_kf"] >= 2
        assert tracker.stats["track_fail"] == 0, states

        est = tracker.trajectory_centers()
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        ate = ate_rmse(est, gt)
        # ground truth spans ~2m; sub-5cm ATE proves the full loop works
        assert ate < 0.05, f"ATE {ate:.4f} m"
        rpe = rpe_rmse(est, gt)
        assert rpe < 0.02, f"RPE {rpe:.4f} m"

    def test_map_grows_and_stays_bounded(self, sequence):
        frames, rig = sequence
        cfg = small_config()
        cfg.camera.fx, cfg.camera.fy = rig.fx, rig.fy
        cfg.camera.cx, cfg.camera.cy = rig.cx, rig.cy
        cfg.stereo.baseline = rig.baseline
        tracker = StereoTracker(cfg)
        for img_pair, _, ts in frames[:20]:
            tracker.process_frame(img_pair, ts)
        n_mp = int(tracker.map.n_mp)
        n_kf = int(tracker.map.n_kf)
        assert 0 < n_kf <= cfg.map.max_kf
        assert 0 < n_mp <= cfg.map.max_mp
