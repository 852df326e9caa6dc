"""Two-view reconstruction (monocular init) tests."""
import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.mapping.twoview import reconstruct_two_views
from orbslam3lib_tpu.utils import cameras, lie

RNG = np.random.default_rng(91)
CAM = jnp.asarray([300.0, 300.0, 320.0, 200.0], dtype=jnp.float32)


def make_pair(n=300, baseline=0.3, noise=0.3, outlier_frac=0.05, planar=False):
    if planar:
        p = RNG.uniform([-3, -2, 6], [3, 2, 6.01], size=(n, 3)).astype(np.float32)
    else:
        p = RNG.uniform([-3, -2, 4], [3, 2, 12], size=(n, 3)).astype(np.float32)
    xi = np.zeros(6, np.float32)
    xi[0] = -baseline          # cam2 translated +x in world => t = -R c
    xi[4] = 0.05               # slight rotation
    R21, t21 = lie.se3_exp(jnp.asarray(xi))
    p2 = np.array(lie.se3_apply(R21, t21, jnp.asarray(p)))
    uv1 = np.array(cameras.pinhole_project(CAM, jnp.asarray(p)))
    uv2 = np.array(cameras.pinhole_project(CAM, jnp.asarray(p2)))
    uv1 += RNG.normal(0, noise, uv1.shape).astype(np.float32)
    uv2 += RNG.normal(0, noise, uv2.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    if n_out:
        uv2[:n_out] += RNG.uniform(20, 80, (n_out, 2)).astype(np.float32)
    valid = ((uv1 > 0) & (uv1 < [640, 400])).all(1) & \
            ((uv2 > 0) & (uv2 < [640, 400])).all(1)
    return p, (np.asarray(R21), np.asarray(t21)), uv1, uv2, valid


class TestTwoView:
    def test_recovers_motion(self):
        p, (R21, t21), uv1, uv2, valid = make_pair()
        out = reconstruct_two_views(jnp.asarray(uv1), jnp.asarray(uv2),
                                    jnp.asarray(valid), CAM)
        assert bool(out["success"]), int(out["n_good"])
        Re = np.asarray(out["R"])
        dR = Re.T @ R21
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.01, ang
        # translation up to scale
        te = np.asarray(out["t"])
        t_dir = t21 / np.linalg.norm(t21)
        assert min(np.linalg.norm(te - t_dir), np.linalg.norm(te + t_dir)) < 0.05

    def test_triangulated_structure(self):
        p, (R21, t21), uv1, uv2, valid = make_pair(outlier_frac=0.0)
        out = reconstruct_two_views(jnp.asarray(uv1), jnp.asarray(uv2),
                                    jnp.asarray(valid), CAM)
        ok = np.asarray(out["tri_ok"])
        assert ok.sum() > len(p) * 0.6
        p3d = np.asarray(out["p3d"])[ok]
        p_true = p[ok]
        # up-to-scale: compare after median-depth normalization
        s = np.median(p_true[:, 2]) / np.median(p3d[:, 2])
        # depth noise ~ z^2/(f b) * sigma*sqrt(2) ~ 0.67 m at z=12
        err = np.linalg.norm(p3d * s - p_true, axis=1)
        assert np.median(err) < 0.35, np.median(err)

    def test_planar_scene_prefers_H(self):
        p, _, uv1, uv2, valid = make_pair(planar=True, outlier_frac=0.0)
        out = reconstruct_two_views(jnp.asarray(uv1), jnp.asarray(uv2),
                                    jnp.asarray(valid), CAM)
        assert float(out["ratio_H"]) > 0.45
