"""Convergence tests for motion-only pose optimization on synthetic data."""
import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.tracking.pose_opt import PoseObs, pose_optimization
from orbslam3lib_tpu.utils import cameras, lie

RNG = np.random.default_rng(11)
CAM = jnp.asarray([450.0, 450.0, 320.0, 240.0], dtype=jnp.float32)


def make_problem(n=256, noise_px=0.5, outlier_frac=0.0, stereo=False, bf=45.0):
    p_w = RNG.uniform([-4, -3, 4], [4, 3, 12], size=(n, 3)).astype(np.float32)
    xi_true = (RNG.normal(size=6) * 0.2).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi_true))
    p_c = np.asarray(lie.se3_apply(R, t, jnp.asarray(p_w)))
    uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
    uv += RNG.normal(size=uv.shape).astype(np.float32) * noise_px
    n_out = int(n * outlier_frac)
    if n_out:
        uv[:n_out] += RNG.uniform(30, 80, size=(n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
    u_right = uv[:, 0] - bf / p_c[:, 2] + RNG.normal(size=n).astype(np.float32) * noise_px
    obs = PoseObs(
        p_world=jnp.asarray(p_w),
        uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones(n, dtype=jnp.float32),
        u_right=jnp.asarray(u_right.astype(np.float32)),
        is_stereo=jnp.full(n, stereo),
        valid=jnp.ones(n, dtype=bool),
    )
    return (R, t), obs


def pose_error(R_est, t_est, R_true, t_true):
    dR = np.asarray(R_est).T @ np.asarray(R_true)
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    dt = np.linalg.norm(np.asarray(t_est) - np.asarray(t_true))
    return ang, dt


class TestPoseOptimization:
    def test_converges_from_perturbed_init(self):
        (R, t), obs = make_problem()
        dxi = jnp.asarray((RNG.normal(size=6) * 0.05).astype(np.float32))
        dR, dt = lie.se3_exp(dxi)
        R0, t0 = lie.se3_compose(dR, dt, R, t)
        R1, t1, inl, n_inl = pose_optimization(R0, t0, obs, CAM)
        ang, terr = pose_error(R1, t1, R, t)
        assert ang < 2e-3 and terr < 2e-2, (ang, terr)
        assert int(n_inl) > 240

    def test_rejects_outliers(self):
        (R, t), obs = make_problem(outlier_frac=0.25, noise_px=0.3)
        dxi = jnp.asarray((RNG.normal(size=6) * 0.03).astype(np.float32))
        dR, dt = lie.se3_exp(dxi)
        R0, t0 = lie.se3_compose(dR, dt, R, t)
        R1, t1, inl, n_inl = pose_optimization(R0, t0, obs, CAM)
        ang, terr = pose_error(R1, t1, R, t)
        assert ang < 5e-3 and terr < 5e-2, (ang, terr)
        inl = np.asarray(inl)
        assert inl[:64].mean() < 0.1   # outliers flagged
        assert inl[64:].mean() > 0.9   # inliers kept

    def test_stereo_residuals(self):
        (R, t), obs = make_problem(stereo=True, noise_px=0.3)
        dxi = jnp.asarray((RNG.normal(size=6) * 0.05).astype(np.float32))
        dR, dt = lie.se3_exp(dxi)
        R0, t0 = lie.se3_compose(dR, dt, R, t)
        R1, t1, inl, n_inl = pose_optimization(R0, t0, obs, CAM, bf=45.0)
        ang, terr = pose_error(R1, t1, R, t)
        assert ang < 2e-3 and terr < 2e-2, (ang, terr)

    def test_respects_validity_mask(self):
        (R, t), obs = make_problem(n=128)
        # corrupt invalid entries wildly; they must not affect the solution
        bad_uv = obs.uv.at[100:].add(500.0)
        obs = obs._replace(uv=bad_uv, valid=obs.valid.at[100:].set(False))
        R1, t1, inl, n_inl = pose_optimization(R, t, obs, CAM)
        ang, terr = pose_error(R1, t1, R, t)
        assert ang < 1e-3 and terr < 1e-2
