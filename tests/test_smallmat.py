"""Oracle tests for the closed-form small-matrix kernels (utils/smallmat.py)
against NumPy LAPACK — the dual-implementation pattern of SURVEY.md §4."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.utils import cameras
from orbslam3lib_tpu.utils.smallmat import adjugate4, inv3, smallest_eigvec4_psd


class TestInv3:
    def test_matches_lapack(self):
        rng = np.random.default_rng(0)
        A = rng.normal(0, 1, (512, 3, 3)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 2.0 * np.eye(3, dtype=np.float32)
        got = np.asarray(inv3(jnp.asarray(A)))
        want = np.linalg.inv(A)
        assert np.max(np.abs(got - want)) < 1e-4


class TestAdjugate4:
    def test_matches_det_times_inverse(self):
        rng = np.random.default_rng(1)
        A = rng.normal(0, 1, (256, 4, 4)).astype(np.float64)
        got = np.asarray(adjugate4(jnp.asarray(A)))  # f32 under default jax
        want = np.linalg.det(A)[:, None, None] * np.linalg.inv(A)
        rel = np.abs(got - want) / (np.abs(want) + 1.0)
        assert np.max(rel) < 1e-4


class TestSmallestEigvec:
    def test_matches_eigh_on_psd(self):
        rng = np.random.default_rng(2)
        B = rng.normal(0, 1, (256, 4, 4)).astype(np.float64)
        # PSD with a well-separated small eigenvalue (triangulation regime)
        M = B @ B.transpose(0, 2, 1)
        w, v = np.linalg.eigh(M)
        # push the smallest eigenvalue near zero (near-exact DLT data)
        M = M - (w[:, 0, None, None] * 0.999) * np.eye(4)
        w, v = np.linalg.eigh(M)
        got = np.asarray(smallest_eigvec4_psd(jnp.asarray(M)))
        want = v[:, :, 0]
        dot = np.abs(np.sum(got * want, axis=-1))  # f32 kernel vs f64 oracle
        assert np.min(dot) > 1 - 1e-4

    def test_triangulate_small_parallax(self):
        """triangulate_two_view (midpoint Gram solve) must stay accurate in
        the mapper's real regime — centimeter baselines against points
        meters away (~0.5-2 deg parallax) in f32 — where an A^T A
        eigen-solve conditions as sin^4(theta) and fails. Oracle: the f64
        NumPy SVD DLT on the same noiseless rays."""
        rng = np.random.default_rng(3)
        F = 512
        for baseline in (0.5, 0.05, 0.026):   # stereo .. orbit-neighbor KFs
            pts = rng.uniform([-3, -1.5, 2.5],
                              [3, 1.5, 8], (F, 3)).astype(np.float64)
            R2 = np.eye(3)
            t2 = np.array([-baseline, 0.0, 0.0])
            ray1 = pts / pts[:, 2:3]
            p_c2 = pts @ R2.T + t2
            ray2 = p_c2 / p_c2[:, 2:3]
            # R12/t12 convention: x_1 = R12 x_2 + t12 with cam2 at -t2
            R12 = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
            t12 = np.tile((-t2).astype(np.float32), (F, 1))
            p3d, cosp, z1, z2 = cameras.triangulate_two_view(
                jnp.asarray(ray1, jnp.float32), jnp.asarray(ray2, jnp.float32),
                jnp.asarray(R12), jnp.asarray(t12))
            err = np.linalg.norm(np.asarray(p3d) - pts, axis=-1)
            rel = err / np.linalg.norm(pts, axis=-1)
            # judge accuracy under the same parallax gate the mapper
            # applies (cos < 0.9998, local_mapping.py): below it the
            # geometry itself is unconstrained and points are culled
            gated = np.asarray(cosp) < 0.9998
            if gated.any():
                assert np.quantile(rel[gated], 0.99) < 1e-3, \
                    (baseline, rel[gated].max())
            # even ungated (sub-degree parallax, always culled), f32
            # midpoint stays within a few % — the f32 A^T A eigen-path
            # shows >10% in this regime
            assert np.quantile(rel, 0.99) < 5e-2, (baseline, rel.max())
            assert np.all(np.asarray(z1) > 0) and np.all(np.asarray(z2) > 0)
