"""Background LocalMapping/LoopClosing thread (SURVEY.md §2.4 P2): the
tracker keeps tracking while mapping runs off-thread, and the result matches
the synchronous pipeline's quality."""
import pytest

import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse
from orbslam3lib_tpu.io.synthetic import render_stereo_sequence
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


class TestAsyncMapping:
    def test_stereo_async_matches_sync_quality(self):
        frames, rig, world = render_stereo_sequence(30, dt=1.0 / 15.0, seed=5)
        cfg = base_config(rig)
        tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=False,
                          async_mapping=True)
        assert tracker._mapper_thread is not None
        for img_pair, _, ts in frames:
            tracker.process_frame(img_pair, ts)
        tracker.wait_mapping_idle()
        assert tracker.state == OK
        assert tracker.stats["n_kf"] >= 2
        est = tracker.trajectory_centers()
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        ate = ate_rmse(est, gt)
        assert ate < 0.06, f"async ATE {ate:.4f} m"
        tracker.shutdown_mapping()
        assert tracker._mapper_thread is None

    def test_mapper_survives_errors(self):
        frames, rig, world = render_stereo_sequence(6, dt=1.0 / 15.0, seed=5)
        cfg = base_config(rig)
        tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=False,
                          async_mapping=True)
        # poison one pipeline call: the thread must log and keep going
        orig = tracker._mapping_pipeline
        calls = {"n": 0}

        def flaky(kid):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected")
            return orig(kid)

        tracker._mapping_pipeline = flaky
        for img_pair, _, ts in frames:
            tracker.process_frame(img_pair, ts)
        tracker.wait_mapping_idle()
        assert calls["n"] >= 1
        assert tracker._mapper_thread.is_alive()
        tracker.shutdown_mapping()
