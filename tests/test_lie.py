"""Golden tests for the Lie-group substrate against scipy.spatial.transform."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsp

import jax
import jax.numpy as jnp

from orbslam3lib_tpu.utils import lie

RNG = np.random.default_rng(0)


def random_rotvecs(n, scale=2.5):
    return RNG.normal(size=(n, 3)) * scale / 3.0


class TestSO3:
    def test_exp_matches_scipy(self):
        w = random_rotvecs(64).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_ref = Rsp.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_small_angle(self):
        w = np.array([[1e-10, 0, 0], [0, 0, 0]], dtype=np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_log_roundtrip(self):
        w = random_rotvecs(64).astype(np.float32)
        # keep |w| < pi for unique log
        norm = np.linalg.norm(w, axis=-1, keepdims=True)
        w = w * np.minimum(norm, 3.0) / np.maximum(norm, 1e-9)
        w2 = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=2e-4)

    def test_quat_roundtrip(self):
        w = random_rotvecs(64).astype(np.float32)
        R = Rsp.from_rotvec(w).as_matrix().astype(np.float32)
        q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R)))
        R2 = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_right_jacobian_fd(self):
        """Jr: exp(w + dw) ~ exp(w) exp(Jr(w) dw)."""
        w = np.array([0.3, -0.2, 0.5], dtype=np.float64)
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w, dtype=jnp.float32)))
        for i in range(3):
            dw = np.zeros(3)
            dw[i] = 1e-5
            lhs = Rsp.from_rotvec(w + dw).as_matrix()
            rhs = Rsp.from_rotvec(w).as_matrix() @ Rsp.from_rotvec(Jr @ dw).as_matrix()
            np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_jr_inv(self):
        w = random_rotvecs(16).astype(np.float32)
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
        Jri = np.asarray(lie.so3_right_jacobian_inv(jnp.asarray(w)))
        prod = Jr @ Jri
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = (RNG.normal(size=(32, 6)) * 0.8).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=2e-4)

    def test_compose_inverse(self):
        xi = (RNG.normal(size=(8, 6)) * 0.5).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)

    def test_apply(self):
        xi = (RNG.normal(size=(6,)) * 0.5).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        p = RNG.normal(size=(10, 3)).astype(np.float32)
        out = np.asarray(lie.se3_apply(R, t, jnp.asarray(p)))
        ref = p @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSim3:
    def test_exp_reduces_to_se3_when_sigma0(self):
        xi7 = np.zeros((4, 7), dtype=np.float32)
        xi7[:, :6] = (RNG.normal(size=(4, 6)) * 0.5).astype(np.float32)
        R, t, s = lie.sim3_exp(jnp.asarray(xi7))
        R2, t2 = lie.se3_exp(jnp.asarray(xi7[:, :6]))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)

    def test_compose_inverse(self):
        xi = (RNG.normal(size=(7,)) * 0.4).astype(np.float32)
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)

    def test_scale_action(self):
        xi = np.zeros(7, dtype=np.float32)
        xi[6] = np.log(2.0)
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        np.testing.assert_allclose(float(s), 2.0, atol=1e-5)
        p = np.array([1.0, 2.0, 3.0], dtype=np.float32)
        out = np.asarray(lie.sim3_apply(R, t, s, jnp.asarray(p)))
        np.testing.assert_allclose(out, 2.0 * p, atol=1e-4)
