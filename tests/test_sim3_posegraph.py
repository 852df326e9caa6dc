"""Sim3 solver + pose-graph optimizer tests (loop-closing math)."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.mapping.pose_graph import optimize_pose_graph, relative_sim3
from orbslam3lib_tpu.mapping.sim3 import horn_sim3, optimize_sim3, sim3_ransac
from orbslam3lib_tpu.utils import cameras, lie

RNG = np.random.default_rng(61)
CAM = jnp.asarray([300.0, 300.0, 320.0, 200.0], dtype=jnp.float32)


def make_sim3_problem(n=150, outlier_frac=0.2, s_true=1.15):
    p2 = RNG.uniform([-2, -1.5, 3], [2, 1.5, 9], size=(n, 3)).astype(np.float32)
    xi = np.zeros(7, dtype=np.float32)
    xi[:6] = (RNG.normal(size=6) * 0.2).astype(np.float32)
    xi[6] = np.log(s_true)
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    p1 = np.array(lie.sim3_apply(R, t, s, jnp.asarray(p2)))
    p1 += RNG.normal(0, 0.005, p1.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    if n_out:
        p1[:n_out] += RNG.uniform(0.5, 2.0, (n_out, 3)).astype(np.float32)
    uv1 = np.array(cameras.pinhole_project(CAM, jnp.asarray(p1)))
    uv2 = np.array(cameras.pinhole_project(CAM, jnp.asarray(p2)))
    return (np.asarray(R), np.asarray(t), float(s)), p1, p2, uv1, uv2, n_out


class TestSim3:
    def test_horn_exact(self):
        (R, t, s), p1, p2, _, _, _ = make_sim3_problem(outlier_frac=0.0)
        Re, te, se = horn_sim3(jnp.asarray(p1), jnp.asarray(p2),
                               jnp.ones(len(p1)))
        assert abs(float(se) - s) < 0.01
        np.testing.assert_allclose(np.asarray(Re), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(te), t, atol=2e-2)

    def test_ransac_with_outliers(self):
        (R, t, s), p1, p2, uv1, uv2, n_out = make_sim3_problem()
        Re, te, se, inl, n_inl = sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(len(p1), bool), CAM)
        assert int(n_inl) > len(p1) * 0.6
        assert abs(float(se) - s) < 0.05
        inl = np.asarray(inl)
        assert inl[:n_out].mean() < 0.2     # outliers rejected

    def test_optimize_refines(self):
        (R, t, s), p1, p2, uv1, uv2, n_out = make_sim3_problem(outlier_frac=0.1)
        # perturb the true transform as init
        dxi = np.zeros(7, np.float32)
        dxi[:6] = (RNG.normal(size=6) * 0.02).astype(np.float32)
        dR, dt_, ds = lie.sim3_exp(jnp.asarray(dxi))
        R0, t0, s0 = lie.sim3_compose(dR, dt_, ds, jnp.asarray(R),
                                      jnp.asarray(t), jnp.float32(s))
        Re, te, se, inl, n_inl = optimize_sim3(
            R0, t0, s0, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(len(p1), bool), CAM)
        assert abs(float(se) - s) < 0.02
        dRe = np.asarray(Re).T @ R
        ang = np.arccos(np.clip((np.trace(dRe) - 1) / 2, -1, 1))
        assert ang < 0.01, ang


class TestPoseGraph:
    def _chain_problem(self, K=12, drift=0.02, mode="sim3"):
        """Sequential chain with drifted poses + one loop edge closing the
        chain back to the (fixed) first keyframe."""
        R_true, t_true, s_true = [], [], []
        for i in range(K):
            xi = np.zeros(7, np.float32)
            xi[0] = 0.5 * i
            xi[4] = 0.1 * i     # yaw-ish drift
            R, t, s = lie.sim3_exp(jnp.asarray(xi))
            R_true.append(np.asarray(R)); t_true.append(np.asarray(t))
            s_true.append(1.0)
        R_true = np.stack(R_true); t_true = np.stack(t_true)
        s_true = np.asarray(s_true, np.float32)

        # drifted estimates: accumulate error along the chain
        R_est, t_est, s_est = [R_true[0]], [t_true[0]], [1.0]
        for i in range(1, K):
            xi = np.zeros(7, np.float32)
            xi[:6] = (RNG.normal(size=6) * drift).astype(np.float32)
            if mode == "sim3":
                xi[6] = RNG.normal() * drift
            dR, dt, ds = lie.sim3_exp(jnp.asarray(xi))
            Rrel, trel, srel = relative_sim3(
                jnp.asarray(R_true[i]), jnp.asarray(t_true[i]), jnp.float32(1.0),
                jnp.asarray(R_true[i - 1]), jnp.asarray(t_true[i - 1]), jnp.float32(1.0))
            Rn, tn, sn = lie.sim3_compose(dR, dt, ds, Rrel, trel, srel)
            R2, t2, s2 = lie.sim3_compose(Rn, tn, sn, jnp.asarray(R_est[-1]),
                                          jnp.asarray(t_est[-1]), jnp.float32(s_est[-1]))
            R_est.append(np.asarray(R2)); t_est.append(np.asarray(t2))
            s_est.append(float(s2))
        R_est = np.stack(R_est); t_est = np.stack(t_est)
        s_est = np.asarray(s_est, np.float32)

        # edges: sequential (from TRUE relatives) + loop edge K-1 -> 0
        ei, ej, eR, et, es = [], [], [], [], []
        for i in range(1, K):
            Rr, tr, sr = relative_sim3(
                jnp.asarray(R_true[i]), jnp.asarray(t_true[i]), jnp.float32(1.0),
                jnp.asarray(R_true[i - 1]), jnp.asarray(t_true[i - 1]), jnp.float32(1.0))
            ei.append(i - 1); ej.append(i)
            eR.append(np.asarray(Rr)); et.append(np.asarray(tr)); es.append(float(sr))
        Rr, tr, sr = relative_sim3(
            jnp.asarray(R_true[K - 1]), jnp.asarray(t_true[K - 1]), jnp.float32(1.0),
            jnp.asarray(R_true[0]), jnp.asarray(t_true[0]), jnp.float32(1.0))
        ei.append(0); ej.append(K - 1)
        eR.append(np.asarray(Rr)); et.append(np.asarray(tr)); es.append(float(sr))

        # NOTE edge direction: S_ij measures S_j * S_i^-1? Our residual is
        # log(S_meas * inv(S_j S_i^-1)); edges store S_j S_i^-1.
        return (R_true, t_true, s_true), (R_est, t_est, s_est), \
            (np.asarray(ei, np.int32), np.asarray(ej, np.int32),
             np.stack(eR), np.stack(et), np.asarray(es, np.float32))

    def test_corrects_drift(self):
        truth, est, edges = self._chain_problem()
        R_true, t_true, s_true = truth
        R_est, t_est, s_est = est
        ei, ej, eR, et, es = edges
        K = len(R_true)
        fixed = np.zeros(K, bool); fixed[0] = True
        Rf, tf, sf = optimize_pose_graph(
            jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_est),
            jnp.ones(K, bool), jnp.asarray(fixed),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eR),
            jnp.asarray(et), jnp.asarray(es), jnp.ones(len(ei), bool))
        err_before = np.linalg.norm(t_est - t_true, axis=1).max()
        err_after = np.linalg.norm(np.asarray(tf) - t_true, axis=1).max()
        assert err_after < err_before * 0.3, (err_before, err_after)
        np.testing.assert_allclose(np.asarray(sf), 1.0, atol=0.02)
