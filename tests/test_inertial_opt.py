"""Visual-inertial optimization tests on the synthetic trajectory."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.io.synthetic import corridor_pose_at, synth_imu
from orbslam3lib_tpu.tracking import imu
from orbslam3lib_tpu.tracking.inertial_opt import (
    InertialFrameState, inertial_init_optimization, pose_inertial_optimization)
from orbslam3lib_tpu.tracking.pose_opt import PoseObs
from orbslam3lib_tpu.utils import cameras, lie
from tests.test_imu import gt_state

RNG = np.random.default_rng(31)
CAM = jnp.asarray([300.0, 300.0, 320.0, 200.0], dtype=jnp.float32)


def state_at(t) -> InertialFrameState:
    R_wb, v, p = gt_state(t)
    R = R_wb.T.astype(np.float32)
    tt = (-R @ p).astype(np.float32)
    return InertialFrameState(R=jnp.asarray(R), t=jnp.asarray(tt),
                              v=jnp.asarray(v), bg=jnp.zeros(3), ba=jnp.zeros(3))


def make_obs(t, n=200, noise_px=0.4):
    st = state_at(t)
    Rwc, c = lie.se3_inverse(st.R, st.t)
    p_c = RNG.uniform([-2, -1.5, 2], [2, 1.5, 10], size=(n, 3)).astype(np.float32)
    p_w = np.asarray(lie.se3_apply(Rwc, c, jnp.asarray(p_c)))
    uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
    uv += RNG.normal(0, noise_px, uv.shape).astype(np.float32)
    return PoseObs(
        p_world=jnp.asarray(p_w), uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones(n, jnp.float32),
        u_right=jnp.zeros(n, jnp.float32), is_stereo=jnp.zeros(n, bool),
        valid=jnp.ones(n, bool))


def preint(t0, t1, **kw):
    gyro, acc, dts = synth_imu(t0, t1, freq=200.0, **kw)
    return imu.integrate(imu.empty_preintegrated(), jnp.asarray(gyro),
                         jnp.asarray(acc), jnp.asarray(dts),
                         jnp.ones(len(dts), bool), jnp.float32(1e-3),
                         jnp.float32(1e-2))


class TestPoseInertialOpt:
    def test_converges_from_imu_prediction(self):
        t0, t1 = 1.0, 1.1
        anchor = state_at(t0)
        pre = preint(t0, t1)
        # start from dead-reckoned prediction + perturbation
        R1, p1 = lie.se3_inverse(anchor.R, anchor.t)
        R2p, v2p, p2p = imu.predict_state(R1, anchor.v, p1, pre,
                                          jnp.zeros(3), jnp.zeros(3))
        Rcw = R2p.T
        tcw = -Rcw @ p2p
        dxi = jnp.asarray((RNG.normal(size=6) * 0.01).astype(np.float32))
        dR, dt = lie.se3_exp(dxi)
        Rp, tp = lie.se3_compose(dR, dt, Rcw, tcw)
        cur0 = InertialFrameState(R=Rp, t=tp, v=v2p, bg=jnp.zeros(3), ba=jnp.zeros(3))

        obs = make_obs(t1)
        st, inl, n_inl, _ = pose_inertial_optimization(cur0, anchor, pre, obs, CAM)
        gt = state_at(t1)
        dRe = np.asarray(st.R).T @ np.asarray(gt.R)
        ang = np.arccos(np.clip((np.trace(dRe) - 1) / 2, -1, 1))
        assert ang < 3e-3, ang
        assert np.linalg.norm(np.asarray(st.t) - np.asarray(gt.t)) < 2e-2
        assert np.linalg.norm(np.asarray(st.v) - np.asarray(gt.v)) < 0.1
        assert int(n_inl) > 180

    def test_bias_observable(self):
        """With a gyro-biased IMU stream, the optimizer should absorb the
        error into its bias estimate rather than the pose."""
        t0, t1 = 1.0, 1.2
        bg_true = np.array([0.02, -0.01, 0.03], dtype=np.float32)
        anchor = state_at(t0)
        pre = preint(t0, t1, bg=bg_true)
        gt = state_at(t1)
        cur0 = InertialFrameState(R=gt.R, t=gt.t, v=gt.v,
                                  bg=jnp.zeros(3), ba=jnp.zeros(3))
        obs = make_obs(t1, n=300, noise_px=0.2)
        st, inl, n_inl, _ = pose_inertial_optimization(cur0, anchor, pre, obs, CAM)
        # pose should stay near truth
        assert np.linalg.norm(np.asarray(st.t) - np.asarray(gt.t)) < 3e-2
        # estimated gyro bias should move toward the true bias
        assert np.linalg.norm(np.asarray(st.bg) - bg_true) < np.linalg.norm(bg_true)

    def test_marginalization_prior_carries_information(self):
        """ConstraintPoseImu (G2oTypes.h:706): with few/poor visual
        observations, a frame solved WITH the previous frame's marginal
        prior must stay closer to the prior chain than one solved without
        (the prior carries the accumulated certainty)."""
        t0, t1 = 1.0, 1.05
        anchor = state_at(t0)
        pre = preint(t0, t1)
        gt1 = state_at(t1)
        # first frame: strong observations -> accurate state + its Hessian
        obs1 = make_obs(t1, n=300, noise_px=0.2)
        st1, _, n1, H1 = pose_inertial_optimization(
            state_at(t1), anchor, pre, obs1, CAM)
        assert int(n1) > 250
        # second frame at t2 with WEAK vision (heavy noise, few points):
        t2 = 1.1
        pre2 = preint(t1, t2)
        obs2 = make_obs(t2, n=12, noise_px=3.0)
        gt2 = state_at(t2)
        start = InertialFrameState(R=gt2.R, t=gt2.t, v=gt2.v,
                                   bg=jnp.zeros(3), ba=jnp.zeros(3))
        from orbslam3lib_tpu.tracking.inertial_opt import \
            pose_inertial_optimization_last_frame
        st_no, _, _, _ = pose_inertial_optimization(
            start, st1, pre2, obs2, CAM)
        st_pr, _, _, _ = pose_inertial_optimization_last_frame(
            start, st1, H1, pre2, obs2, CAM)
        # the prior ties the solution down: biases must not run away
        d_no = float(jnp.linalg.norm(st_no.bg - st1.bg)
                     + jnp.linalg.norm(st_no.ba - st1.ba))
        d_pr = float(jnp.linalg.norm(st_pr.bg - st1.bg)
                     + jnp.linalg.norm(st_pr.ba - st1.ba))
        assert d_pr <= d_no + 1e-6, (d_pr, d_no)
        # and the pose stays sane
        assert float(jnp.linalg.norm(st_pr.t - gt2.t)) < 0.2


class TestInertialInit:
    def test_recovers_gravity_and_bias(self):
        ts = np.arange(0.5, 3.6, 0.25)
        bg_true = np.array([0.01, -0.015, 0.02], dtype=np.float32)
        K = len(ts)
        kf_R = np.zeros((K, 3, 3), np.float32)
        kf_t = np.zeros((K, 3), np.float32)
        for i, t in enumerate(ts):
            st = state_at(float(t))
            kf_R[i] = np.asarray(st.R)
            kf_t[i] = np.asarray(st.t)
        pres = [preint(float(ts[i]), float(ts[i + 1]), bg=bg_true)
                for i in range(K - 1)]
        pres_stack = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *pres)
        R_wg, bg, ba, s, v = inertial_init_optimization(
            jnp.asarray(kf_R), jnp.asarray(kf_t), jnp.ones(K, bool),
            pres_stack, jnp.ones(K - 1, bool))
        # gravity already aligned in this synthetic world -> R_wg ~ identity
        ang = np.arccos(np.clip((np.trace(np.asarray(R_wg)) - 1) / 2, -1, 1))
        assert ang < 0.05, ang
        np.testing.assert_allclose(np.asarray(bg), bg_true, atol=3e-3)
        # velocities should match ground truth
        for i, t in enumerate(ts[:-1]):
            _, v_gt, _ = gt_state(float(t))
            assert np.linalg.norm(np.asarray(v[i]) - v_gt) < 0.1, (i, v[i], v_gt)
