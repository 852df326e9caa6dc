"""IMU preintegration tests: dead-reckoning accuracy against the analytic
trajectory, bias-Jacobian correctness, residual consistency."""
import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.io.synthetic import GRAVITY_W, corridor_pose_at, synth_imu
from orbslam3lib_tpu.tracking import imu
from orbslam3lib_tpu.utils import lie


def gt_state(t):
    """R_wb, v_w, p_w at time t (body == camera frame)."""
    R_cw, c_w = corridor_pose_at(np.array([t]))
    eps = 1e-4
    _, p_hi = corridor_pose_at(np.array([t + eps]))
    _, p_lo = corridor_pose_at(np.array([t - eps]))
    v = (p_hi[0].astype(np.float64) - p_lo[0]) / (2 * eps)
    return R_cw[0], v.astype(np.float32), c_w[0]


def preintegrate_span(t0, t1, assumed_bg=np.zeros(3), assumed_ba=np.zeros(3), **kw):
    """Integrate synthetic IMU over (t0, t1]; kw goes to synth_imu (e.g.
    bg=... to bias the measurements), assumed_* set the linearization bias."""
    gyro, acc, dts = synth_imu(t0, t1, freq=200.0, **kw)
    pre = imu.empty_preintegrated(jnp.asarray(assumed_bg, dtype=jnp.float32),
                                  jnp.asarray(assumed_ba, dtype=jnp.float32))
    return imu.integrate(pre, jnp.asarray(gyro), jnp.asarray(acc),
                         jnp.asarray(dts), jnp.ones(len(dts), bool),
                         jnp.float32(1e-3), jnp.float32(1e-2))


class TestPreintegration:
    def test_dead_reckoning_matches_truth(self):
        t0, t1 = 1.0, 1.5
        pre = preintegrate_span(t0, t1)
        R1, v1, p1 = gt_state(t0)
        R2, v2, p2 = gt_state(t1)
        R2e, v2e, p2e = imu.predict_state(
            jnp.asarray(R1), jnp.asarray(v1), jnp.asarray(p1), pre,
            jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(p2e), p2, atol=2e-3)
        np.testing.assert_allclose(np.asarray(v2e), v2, atol=5e-3)
        dR = np.asarray(R2e).T @ R2
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 2e-3

    def test_residual_zero_at_truth(self):
        t0, t1 = 0.5, 1.0
        pre = preintegrate_span(t0, t1)
        R1, v1, p1 = gt_state(t0)
        R2, v2, p2 = gt_state(t1)
        r = imu.inertial_residual(
            jnp.asarray(R1), jnp.asarray(v1), jnp.asarray(p1),
            jnp.asarray(R2), jnp.asarray(v2), jnp.asarray(p2),
            jnp.zeros(3), jnp.zeros(3), pre)
        assert float(jnp.linalg.norm(r)) < 1e-2

    def test_bias_jacobian_first_order(self):
        """corrected_deltas(bg+db) should match re-preintegration with bg+db."""
        t0, t1 = 1.0, 1.4
        db = np.array([0.004, -0.006, 0.005], dtype=np.float32)
        pre0 = preintegrate_span(t0, t1)
        pre_b = preintegrate_span(t0, t1, bg=db)   # measurements include bias
        # preintegrating biased measurements with zero assumed bias, then
        # correcting by -db, should match the unbiased integration
        dR, dV, dP = imu.corrected_deltas(pre_b, jnp.asarray(db), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(dV), np.asarray(pre0.dV), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dP), np.asarray(pre0.dP), atol=2e-3)
        dRr = np.asarray(dR).T @ np.asarray(pre0.dR)
        ang = np.arccos(np.clip((np.trace(dRr) - 1) / 2, -1, 1))
        assert ang < 2e-3

    def test_gravity_only_when_static(self):
        """Integrating pure-gravity measurements (static body) yields zero
        rotation and the classic 1/2 g t^2 position delta in predict."""
        n = 100
        dt = 0.005
        gyro = jnp.zeros((n, 3))
        acc = jnp.tile(jnp.asarray(-GRAVITY_W, dtype=jnp.float32), (n, 1))
        pre = imu.integrate(imu.empty_preintegrated(), gyro, acc,
                            jnp.full(n, dt), jnp.ones(n, bool),
                            jnp.float32(1e-3), jnp.float32(1e-2))
        R2, v2, p2 = imu.predict_state(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                                       pre, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(v2), 0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(p2), 0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(R2), np.eye(3), atol=1e-6)

    def test_covariance_grows(self):
        pre = preintegrate_span(0.0, 0.5, sigma_g=1e-3, sigma_a=1e-2)
        cov = np.asarray(pre.cov)
        assert np.all(np.linalg.eigvalsh(cov) > -1e-10)
        assert np.trace(cov) > 0
