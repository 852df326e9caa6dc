"""Camera-IMU extrinsic (T_bc) correctness: a stereo-inertial run with a
ROTATED, lever-armed body frame must initialize and track as well as the
identity-extrinsic rig (ImuCamPose semantics, reference G2oTypes.h:74;
EuRoC's T_BS is a ~90-degree rotation, so identity-only support silently
breaks on real rigs). Also covers per-KF inertial state storage
(KeyFrame.h:206-216) and the bias random-walk covariance block of the
15x15 preintegration covariance (ImuTypes.h:159-168)."""
import numpy as np
import pytest
import jax.numpy as jnp

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse
from orbslam3lib_tpu.io.synthetic import render_stereo_sequence, synth_imu
from orbslam3lib_tpu.tracking import imu as imu_mod
from orbslam3lib_tpu.tracking.tracker import OK, Tracker

pytestmark = pytest.mark.slow  # e2e tier: excluded from the smoke run

# a 90-degree rotation about z plus a 10 cm lever arm (EuRoC-like severity)
R_BC = np.array([[0.0, -1.0, 0.0],
                 [1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0]], np.float32)
T_BC = np.array([0.08, -0.03, 0.05], np.float32)


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
    cfg.use_imu = True
    return cfg


@pytest.fixture(scope="module")
def sequence():
    frames, rig, world = render_stereo_sequence(n_frames=40, dt=1.0 / 15.0,
                                                seed=5)
    return frames, rig


def run_vi(frames, rig, R_bc=None, t_bc=None):
    cfg = base_config(rig)
    if R_bc is not None:
        cfg.imu.R_bc = tuple(np.asarray(R_bc).reshape(-1).tolist())
        cfg.imu.t_bc = tuple(np.asarray(t_bc).tolist())
    tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
    prev_ts = None
    for img_pair, _, ts in frames:
        if prev_ts is not None:
            gyro, acc, dts = synth_imu(prev_ts, ts, freq=200.0,
                                       R_bc=R_bc, t_bc=t_bc)
            if len(dts):
                tracker.feed_imu(gyro, acc, dts)
        tracker.process_frame(img_pair, ts)
        prev_ts = ts
    tracker.finish()
    return tracker


class TestBodyCamExtrinsic:
    def test_predict_state_rotated_rig(self):
        """Dead-reckoning through T_bc must reproduce the analytic camera
        pose (PredictStateIMU, Tracking.cc:1791)."""
        from orbslam3lib_tpu.io.synthetic import corridor_pose_at
        t0, t1 = 1.0, 1.4
        gyro, acc, dts = synth_imu(t0, t1, freq=200.0, R_bc=R_BC, t_bc=T_BC)
        pre = imu_mod.integrate(
            imu_mod.empty_preintegrated(), jnp.asarray(gyro),
            jnp.asarray(acc), jnp.asarray(dts),
            jnp.ones(len(dts), bool), 0.0, 0.0)
        R_bc, t_bc = jnp.asarray(R_BC), jnp.asarray(T_BC)
        # camera Tcw at t0 / velocity of the BODY at t0
        R_wc0, c0 = corridor_pose_at(np.asarray([t0]))
        Rcw0 = jnp.asarray(R_wc0[0].T.astype(np.float32))
        tcw0 = -Rcw0 @ jnp.asarray(c0[0].astype(np.float32))
        eps = 1e-4
        Rwb_m, pb_m = imu_mod.body_from_cam(Rcw0, tcw0, R_bc, t_bc)
        # body velocity by finite difference of the body trajectory
        def body_p(tq):
            R_wc, c = corridor_pose_at(np.asarray([tq]))
            R_wb = R_wc[0] @ np.asarray(R_BC, np.float64).T
            return c[0] - R_wb @ np.asarray(T_BC, np.float64)
        v0 = jnp.asarray(((body_p(t0 + eps) - body_p(t0 - eps)) /
                          (2 * eps)).astype(np.float32))
        R2, v2, p2 = imu_mod.predict_state(Rwb_m, v0, pb_m, pre,
                                           jnp.zeros(3), jnp.zeros(3))
        Rcw2, tcw2 = imu_mod.cam_from_body(R2, p2, R_bc, t_bc)
        # ground truth camera pose at t1
        R_wc1, c1 = corridor_pose_at(np.asarray([t1]))
        c2_est = np.asarray(-(Rcw2.T @ tcw2))
        assert np.linalg.norm(c2_est - c1[0]) < 5e-3
        assert np.abs(np.asarray(Rcw2) - R_wc1[0].T).max() < 5e-3

    def test_tracks_with_rotated_extrinsic(self, sequence):
        frames, rig = sequence
        tr = run_vi(frames, rig, R_bc=R_BC, t_bc=T_BC)
        assert tr.state == OK
        assert tr.imu_ready, "IMU never initialized with rotated T_bc"
        assert tr.stats["track_fail"] == 0
        est = tr.trajectory_centers()
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        ate = ate_rmse(est, gt)
        assert ate < 0.08, f"VI ATE with rotated T_bc {ate:.4f} m"
        bg, ba = tr.imu_bias
        assert float(jnp.linalg.norm(bg)) < 0.05

    def test_keyframes_carry_inertial_state(self, sequence):
        frames, rig = sequence
        tr = run_vi(frames, rig, R_bc=R_BC, t_bc=T_BC)
        assert tr.imu_ready
        kf_v = np.asarray(tr.map.kf_v)
        valid = np.asarray(tr.map.kf_valid)
        speeds = np.linalg.norm(kf_v[valid], axis=-1)
        # the corridor run moves at ~0.8 m/s: stored velocities must be
        # populated and in a plausible range for late keyframes
        assert (speeds > 1e-6).sum() >= 3
        assert speeds.max() < 3.0

    def test_bias_walk_covariance_grows(self):
        gyro, acc, dts = synth_imu(0.0, 0.5, freq=200.0)
        pre = imu_mod.integrate(
            imu_mod.empty_preintegrated(), jnp.asarray(gyro),
            jnp.asarray(acc), jnp.asarray(dts), jnp.ones(len(dts), bool),
            0.01, 0.1, walk_g=1e-3, walk_a=1e-2)
        cb = np.asarray(pre.cov_bias)
        T = float(pre.dt)
        np.testing.assert_allclose(np.diag(cb)[:3], 1e-6 * T, rtol=1e-3)
        np.testing.assert_allclose(np.diag(cb)[3:], 1e-4 * T, rtol=1e-3)
        # cross blocks stay zero (reference ImuTypes.cc: block-diagonal)
        assert np.abs(cb[:3, 3:]).max() == 0.0
