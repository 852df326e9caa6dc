"""System facade, EuRoC loader, checkpointing, trajectory writers."""
import os
import numpy as np
import pytest
import jax.numpy as jnp

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse
from orbslam3lib_tpu.io.euroc import EurocSequence, write_minimal_sequence
from orbslam3lib_tpu.io.synthetic import render_stereo_sequence, synth_imu
from orbslam3lib_tpu.models.serialization import load_atlas, load_map, save_atlas, save_map
from orbslam3lib_tpu.system import SENSOR_RGBD, SENSOR_STEREO, System
from orbslam3lib_tpu.tracking.tracker import OK

pytestmark = pytest.mark.slow  # e2e tier: excluded from the smoke run


def small_cfg(rig):
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
    return render_stereo_sequence(n_frames=25, dt=1.0 / 15.0, seed=5)


class TestSystem:
    def test_sync_stereo_pipeline(self, sequence, tmp_path):
        frames, rig, world = sequence
        sys_ = System(small_cfg(rig), SENSOR_STEREO, enable_loop_closing=False)
        for img_pair, _, ts in frames:
            sys_.track_stereo(img_pair, ts)
        assert sys_.get_tracking_state() == OK
        info = sys_.map_info()
        assert info["n_kf"] >= 2 and info["n_mp"] > 100
        p = str(tmp_path / "traj.txt")
        sys_.save_trajectory_tum(p)
        lines = open(p).read().strip().splitlines()
        assert len(lines) == len(frames)
        assert len(lines[0].split()) == 8
        sys_.save_trajectory_kitti(str(tmp_path / "kitti.txt"))
        assert len(open(tmp_path / "kitti.txt").read().strip().splitlines()) == len(frames)
        sys_.shutdown()

    def test_async_pipeline_with_backpressure(self, sequence):
        frames, rig, world = sequence
        poses = []
        sys_ = System(small_cfg(rig), SENSOR_STEREO, use_pipeline=True,
                      enable_loop_closing=False,
                      pose_callback=lambda R, t, ts, out: poses.append(ts))
        import time
        for img_pair, _, ts in frames:
            sys_.track_stereo(img_pair, ts)
            time.sleep(0.01)
        sys_.wait_idle(timeout=60.0)
        sys_.shutdown()
        # under heavy load most frames drop (by design, System.cc:356-360);
        # the pipeline must keep running and state must remain sane
        assert len(poses) >= 3, len(poses)
        assert sys_._dropped + len(poses) <= len(frames)
        assert sys_.get_tracking_state() in (OK, 0, 2)

    def test_rgbd_mode(self, sequence):
        frames, rig, world = sequence
        cfg = small_cfg(rig)
        sys_ = System(cfg, SENSOR_RGBD, enable_loop_closing=False)
        # build depth maps analytically from the renderer's geometry: use
        # stereo disparity ground truth via rendering? simpler: constant
        # plane depth is wrong; instead run a few frames with synthetic
        # depth from the left camera's ray-cast (approximate via stereo
        # tracker would be circular). Use the corridor's known geometry:
        rng = np.random.default_rng(0)
        for img_pair, (R, t), ts in frames[:6]:
            # cheap proxy depth: project world walls — here we just use the
            # stereo pair to create a depth map via block disparity is
            # overkill; instead verify the API path runs and initializes
            # with a plausible constant-depth map + noise
            depth_map = np.full((rig.height, rig.width), 4.0, np.float32)
            sys_.track_rgbd(img_pair[0], depth_map, ts)
        # with a flat (wrong) depth map we still exercise init + tracking API
        assert sys_.map_info()["n_kf"] >= 1
        sys_.shutdown()


class TestCheckpoint:
    def test_map_roundtrip(self, sequence, tmp_path):
        frames, rig, world = sequence
        sys_ = System(small_cfg(rig), SENSOR_STEREO, enable_loop_closing=False)
        for img_pair, _, ts in frames[:10]:
            sys_.track_stereo(img_pair, ts)
        m = sys_.tracker.map
        p = str(tmp_path / "map.npz")
        save_map(m, p)
        m2 = load_map(p)
        np.testing.assert_array_equal(np.asarray(m.kf_R), np.asarray(m2.kf_R))
        np.testing.assert_array_equal(np.asarray(m.kf_mp), np.asarray(m2.kf_mp))
        assert int(m2.n_kf) == int(m.n_kf)

    def test_atlas_roundtrip_resume(self, sequence, tmp_path):
        frames, rig, world = sequence
        cfg = small_cfg(rig)
        sys_ = System(cfg, SENSOR_STEREO, enable_loop_closing=False)
        for img_pair, _, ts in frames[:12]:
            sys_.track_stereo(img_pair, ts)
        p = str(tmp_path / "atlas.npz")
        sys_.save_atlas(p)
        sys2 = System(cfg, SENSOR_STEREO, enable_loop_closing=False)
        sys2.load_atlas(p)
        assert sys2.map_info() == sys_.map_info()


class TestEurocLoader:
    def test_roundtrip_asl_format(self, tmp_path, sequence):
        frames, rig, world = sequence
        root = str(tmp_path / "seq")
        imgs_l = [f[0][0] for f in frames[:6]]
        imgs_r = [f[0][1] for f in frames[:6]]
        tss = [f[2] for f in frames[:6]]
        # fabricate imu rows + gt rows
        gyro, acc, dts = synth_imu(tss[0], tss[-1], freq=100.0)
        t_imu = np.cumsum(dts) + tss[0]
        imu = np.concatenate([t_imu[:, None], gyro, acc], axis=1)
        gt = np.asarray([[ts, *( -f[1][0].T @ f[1][1]), 1, 0, 0, 0]
                         for f, ts in zip(frames[:6], tss)])
        write_minimal_sequence(root, imgs_l, tss, imgs_r, imu, gt)

        seq = EurocSequence(root)
        assert len(seq) == 6
        got = list(seq.frames())
        assert got[0][0].shape == (2, rig.height, rig.width)
        np.testing.assert_allclose(got[0][0][0], imgs_l[0], atol=1.0)
        # imu chunks cover the gaps
        n_imu = sum(len(c[2]) for _, _, c in got if c is not None)
        assert n_imu > 0
        gtc = seq.gt_centers_at(np.asarray(tss))
        assert gtc.shape == (6, 3)

    def test_runs_slam_from_disk(self, tmp_path, sequence):
        frames, rig, world = sequence
        root = str(tmp_path / "seq2")
        write_minimal_sequence(root, [f[0][0] for f in frames],
                               [f[2] for f in frames],
                               [f[0][1] for f in frames])
        seq = EurocSequence(root)
        sys_ = System(small_cfg(rig), SENSOR_STEREO, enable_loop_closing=False)
        for imgs, ts, imu in seq.frames():
            sys_.track_stereo(imgs, ts)
        assert sys_.get_tracking_state() == OK
        est = sys_.tracker.trajectory_centers()
        gt = np.stack([-f[1][0].T @ f[1][1] for f in frames[-len(est):]])
        assert ate_rmse(est, gt) < 0.06
