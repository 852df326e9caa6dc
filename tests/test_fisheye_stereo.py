"""Two-camera fisheye (KB8) stereo path: matching + triangulation unit test
and an end-to-end SLAM run (the reference's production AHB path,
Frame::ComputeStereoFishEyeMatches + KannalaBrandt8::TriangulateMatches)."""
import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.config import CameraConfig, SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse
from orbslam3lib_tpu.io.synthetic import StereoRig, render_stereo_sequence
from orbslam3lib_tpu.tracking.matching import match_fisheye_stereo
from orbslam3lib_tpu.tracking.tracker import OK, Tracker
from orbslam3lib_tpu.utils import cameras

RNG = np.random.default_rng(23)
KB8 = jnp.asarray([285.0, 285.0, 320.0, 200.0, 0.02, -0.01, 0.003, 0.0],
                  dtype=jnp.float32)


class TestFisheyeMatching:
    def test_triangulation_recovers_depth(self):
        N = 200
        # depth capped at 4.5 m: the reference's parallax gate
        # (cosParallax < 0.9998) cuts off around z ~ baseline/0.02 = 5.5 m
        pts = RNG.uniform([-2, -1.5, 1.0], [2, 1.5, 4.5],
                          size=(N, 3)).astype(np.float32)
        baseline = 0.11
        R_lr = np.eye(3, dtype=np.float32)
        t_lr = np.array([baseline, 0, 0], np.float32)
        uv_l = np.asarray(cameras.kb8_project(KB8, jnp.asarray(pts)))
        p_r = pts - t_lr  # x_r = R_lr^T (x_l - t_lr)
        uv_r = np.asarray(cameras.kb8_project(KB8, jnp.asarray(p_r)))
        descs = RNG.integers(0, 2, size=(N, 256)).astype(np.int8)
        perm = RNG.permutation(N)  # shuffle right features

        bf = 285.0 * baseline
        u_r, depth = match_fisheye_stereo(
            jnp.asarray(uv_l), jnp.asarray(descs), jnp.ones(N, bool),
            jnp.asarray(uv_r[perm]), jnp.asarray(descs[perm]),
            jnp.ones(N, bool), KB8, KB8,
            jnp.asarray(R_lr), jnp.asarray(t_lr), bf=bf)
        depth = np.asarray(depth)
        ok = depth > 0
        assert ok.sum() > N * 0.8
        err = np.abs(depth[ok] - pts[ok, 2]) / pts[ok, 2]
        assert np.median(err) < 0.01, np.median(err)
        # virtual disparity coordinate consistent
        u_r = np.asarray(u_r)
        np.testing.assert_allclose(u_r[ok], uv_l[ok, 0] - bf / depth[ok],
                                   rtol=1e-4)

    def test_bad_matches_rejected(self):
        # descriptors that match but geometry that cannot triangulate
        N = 50
        pts = RNG.uniform([-1, -1, 2], [1, 1, 6], size=(N, 3)).astype(np.float32)
        uv_l = np.asarray(cameras.kb8_project(KB8, jnp.asarray(pts)))
        uv_r = uv_l + RNG.uniform(-80, 80, uv_l.shape).astype(np.float32)
        descs = RNG.integers(0, 2, size=(N, 256)).astype(np.int8)
        u_r, depth = match_fisheye_stereo(
            jnp.asarray(uv_l), jnp.asarray(descs), jnp.ones(N, bool),
            jnp.asarray(uv_r), jnp.asarray(descs), jnp.ones(N, bool),
            KB8, KB8, jnp.eye(3), jnp.asarray([0.11, 0, 0]), bf=31.35)
        # random right positions: almost everything fails the reproj gates
        assert (np.asarray(depth) > 0).mean() < 0.2


class TestFisheyeSLAM:
    def test_e2e_kb8_stereo(self):
        rig = StereoRig(fx=285.0, fy=285.0, model="kannala_brandt8",
                        k=(0.02, -0.01, 0.003, 0.0))
        frames, rig, world = render_stereo_sequence(30, rig=rig,
                                                    dt=1.0 / 15.0, seed=3)

        cfg = SlamConfig()
        cfg.camera = CameraConfig(model="kannala_brandt8", fx=285.0, fy=285.0,
                                  cx=320.0, cy=200.0, k=(0.02, -0.01, 0.003, 0.0))
        cfg.stereo.fisheye = True
        cfg.stereo.baseline = rig.baseline
        cfg.map.max_kf = 64
        cfg.map.max_mp = 4096
        cfg.orb.max_kp = 384
        cfg.orb.target_features = 300
        cfg.orb.fast_threshold = 12.0
        cfg.ba.max_points = 1024
        cfg.ba.window_size = 6
        cfg.tracker.min_init_features = 150
        tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
        for img_pair, _, ts in frames:
            tracker.process_frame(img_pair, ts)
        assert tracker.state == OK
        est = tracker.trajectory_centers()
        assert len(est) > 20
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        ate = ate_rmse(est, gt)
        assert ate < 0.10, f"fisheye stereo ATE {ate:.4f} m"
