"""Camera model tests: projection round trips + Jacobians vs autodiff."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.utils import cameras

RNG = np.random.default_rng(1)

PINHOLE_PARAMS = jnp.asarray([458.654, 457.296, 367.215, 248.375], dtype=jnp.float32)
# TUM-VI-like fisheye
KB8_PARAMS = jnp.asarray(
    [190.978, 190.973, 254.931, 256.897, 0.00348, 0.000715, -0.00205, 0.000202],
    dtype=jnp.float32,
)


def random_points(n, fov=0.8):
    d = RNG.normal(size=(n, 3)) * np.array([fov, fov, 0.3])
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    return (d * RNG.uniform(1.0, 10.0, size=(n, 1))).astype(np.float32)


class TestPinhole:
    def test_roundtrip(self):
        p = jnp.asarray(random_points(128))
        uv = cameras.pinhole_project(PINHOLE_PARAMS, p)
        ray = cameras.pinhole_unproject(PINHOLE_PARAMS, uv)
        ratio = p / ray  # each row should be constant = depth
        np.testing.assert_allclose(
            np.asarray(ratio), np.asarray(ratio[:, 2:3]).repeat(3, 1), rtol=1e-4
        )

    def test_jacobian_vs_autodiff(self):
        p = jnp.asarray(random_points(32))
        J = cameras.pinhole_project_jac(PINHOLE_PARAMS, p)
        J_ad = jax.vmap(jax.jacfwd(lambda q: cameras.pinhole_project(PINHOLE_PARAMS, q)))(p)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), rtol=1e-3, atol=1e-3)


class TestKB8:
    def test_roundtrip(self):
        p = jnp.asarray(random_points(128, fov=1.2))
        uv = cameras.kb8_project(KB8_PARAMS, p)
        ray = cameras.kb8_unproject(KB8_PARAMS, uv)
        # ray has z=1; compare direction
        d1 = np.asarray(p / jnp.linalg.norm(p, axis=-1, keepdims=True))
        d2 = np.asarray(ray / jnp.linalg.norm(ray, axis=-1, keepdims=True))
        np.testing.assert_allclose(d1, d2, atol=1e-3)

    def test_jacobian_vs_autodiff(self):
        p = jnp.asarray(random_points(32, fov=1.0))
        J = cameras.kb8_project_jac(KB8_PARAMS, p)
        J_ad = jax.vmap(jax.jacfwd(lambda q: cameras.kb8_project(KB8_PARAMS, q)))(p)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), rtol=2e-3, atol=2e-3)

    def test_on_axis(self):
        p = jnp.asarray([[0.0, 0.0, 2.0]], dtype=jnp.float32)
        uv = np.asarray(cameras.kb8_project(KB8_PARAMS, p))
        np.testing.assert_allclose(uv[0], np.asarray(KB8_PARAMS[2:4]), atol=1e-3)


class TestTriangulation:
    def test_two_view(self):
        # world points ahead of both cameras; cam2 translated along x (stereo)
        p_w = random_points(64)
        R12 = np.eye(3, dtype=np.float32)
        t12 = np.array([0.11, 0.0, 0.0], dtype=np.float32)  # baseline
        # rays: cam1 at origin, cam2 at t12 (x_1 = R12 x_2 + t12)
        ray1 = p_w
        p_c2 = (p_w - t12) @ R12  # R12^T (p - t) with R12 = I
        ray2 = p_c2
        p3d, cosp, z1, z2 = cameras.triangulate_two_view(
            jnp.asarray(ray1), jnp.asarray(ray2), jnp.asarray(R12)[None].repeat(64, 0),
            jnp.asarray(t12)[None].repeat(64, 0),
        )
        np.testing.assert_allclose(np.asarray(p3d), p_w, rtol=1e-3, atol=1e-3)
        assert np.all(np.asarray(z1) > 0) and np.all(np.asarray(z2) > 0)
        assert np.all(np.asarray(cosp) < 1.0)
