"""Synthetic bundle-adjustment convergence tests (Schur-complement LM)."""
import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.mapping.local_ba import BAProblem, bundle_adjust
from orbslam3lib_tpu.utils import cameras, lie

RNG = np.random.default_rng(23)
CAM = jnp.asarray([450.0, 450.0, 320.0, 240.0], dtype=jnp.float32)


def make_ba_problem(n_cams=6, n_pts=200, noise_px=0.4, pose_noise=0.02,
                    pt_noise=0.05, n_fixed=2, outlier_frac=0.0):
    """Cameras on an arc looking at a point cloud; first n_fixed cams fixed."""
    pts = RNG.uniform([-4, -3, 6], [4, 3, 14], size=(n_pts, 3)).astype(np.float32)
    cam_R_true, cam_t_true = [], []
    for i in range(n_cams):
        xi = np.zeros(6, dtype=np.float32)
        xi[0] = 0.4 * i          # translate along x
        xi[4] = 0.02 * i         # slight yaw
        R, t = lie.se3_exp(jnp.asarray(xi))
        cam_R_true.append(np.array(R))
        cam_t_true.append(np.array(t))
    cam_R_true = np.stack(cam_R_true)
    cam_t_true = np.stack(cam_t_true)

    # all points observed by all cameras
    e_cam = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    e_pt = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    p_c = np.einsum("eij,ej->ei", cam_R_true[e_cam], pts[e_pt]) + cam_t_true[e_cam]
    uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
    uv += RNG.normal(size=uv.shape).astype(np.float32) * noise_px
    n_out = int(len(uv) * outlier_frac)
    if n_out:
        idx = RNG.choice(len(uv), n_out, replace=False)
        uv[idx] += RNG.uniform(25, 60, size=(n_out, 2)).astype(np.float32)

    # perturb non-fixed cameras and all points
    cam_R0, cam_t0 = cam_R_true.copy(), cam_t_true.copy()
    for i in range(n_fixed, n_cams):
        dxi = (RNG.normal(size=6) * pose_noise).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(dxi))
        R2, t2 = lie.se3_compose(dR, dt, jnp.asarray(cam_R0[i]), jnp.asarray(cam_t0[i]))
        cam_R0[i], cam_t0[i] = np.array(R2), np.array(t2)
    pts0 = pts + RNG.normal(size=pts.shape).astype(np.float32) * pt_noise

    prob = BAProblem(
        cam_R=jnp.asarray(cam_R0), cam_t=jnp.asarray(cam_t0),
        cam_fixed=jnp.asarray([i < n_fixed for i in range(n_cams)]),
        cam_valid=jnp.ones(n_cams, dtype=bool),
        points=jnp.asarray(pts0), pt_valid=jnp.ones(n_pts, dtype=bool),
        e_cam=jnp.asarray(e_cam), e_pt=jnp.asarray(e_pt),
        e_uv=jnp.asarray(uv.astype(np.float32)),
        e_inv_sigma2=jnp.ones(len(e_cam), dtype=jnp.float32),
        e_u_right=jnp.zeros(len(e_cam), dtype=jnp.float32),
        e_stereo=jnp.zeros(len(e_cam), dtype=bool),
        e_valid=jnp.ones(len(e_cam), dtype=bool),
    )
    return prob, (cam_R_true, cam_t_true, pts)


def reproj_rmse(cam_R, cam_t, pts, prob):
    p_c = np.einsum("eij,ej->ei", np.asarray(cam_R)[np.asarray(prob.e_cam)],
                    np.asarray(pts)[np.asarray(prob.e_pt)]) + \
        np.asarray(cam_t)[np.asarray(prob.e_cam)]
    uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
    err = np.linalg.norm(uv - np.asarray(prob.e_uv), axis=-1)
    return float(np.sqrt((err ** 2).mean()))


class TestBundleAdjust:
    def test_reduces_reprojection_error(self):
        prob, truth = make_ba_problem()
        rmse0 = reproj_rmse(prob.cam_R, prob.cam_t, prob.points, prob)
        R, t, pts, inl = bundle_adjust(prob, CAM)
        rmse1 = reproj_rmse(R, t, pts, prob)
        assert rmse1 < 1.0, (rmse0, rmse1)   # down to ~noise level
        assert rmse1 < rmse0 / 3

    def test_recovers_poses(self):
        prob, (R_true, t_true, pts_true) = make_ba_problem(pose_noise=0.03)
        R, t, pts, inl = bundle_adjust(prob, CAM)
        for i in range(2, 6):
            dR = np.asarray(R)[i].T @ R_true[i]
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            assert ang < 3e-3, (i, ang)
            assert np.linalg.norm(np.asarray(t)[i] - t_true[i]) < 2e-2

    def test_fixed_cameras_unchanged(self):
        prob, _ = make_ba_problem()
        R, t, pts, inl = bundle_adjust(prob, CAM)
        np.testing.assert_array_equal(np.asarray(R)[:2], np.asarray(prob.cam_R)[:2])
        np.testing.assert_array_equal(np.asarray(t)[:2], np.asarray(prob.cam_t)[:2])

    def test_outlier_edges_gated(self):
        prob, _ = make_ba_problem(outlier_frac=0.1)
        R, t, pts, inl = bundle_adjust(prob, CAM)
        rmse_in = reproj_rmse(R, t, pts, prob)
        inl = np.asarray(inl)
        assert inl.mean() > 0.8
        # inlier-only rmse should be small
        assert rmse_in < 25  # dominated by the 10% outliers
