"""Distributed BA over a virtual 8-device CPU mesh vs the single-device
solver (SURVEY.md §4: multi-host testable without a pod)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from orbslam3lib_tpu.mapping.local_ba import bundle_adjust
from orbslam3lib_tpu.parallel.dist_ba import dist_bundle_adjust, partition_problem
from tests.test_local_ba import CAM, make_ba_problem, reproj_rmse


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must force 8 virtual CPU devices"
    return Mesh(np.array(devs[:8]), ("mp",))


class TestDistBA:
    def test_matches_single_device(self, mesh8):
        prob, _ = make_ba_problem(n_cams=6, n_pts=192)
        R1, t1, pts1, _ = bundle_adjust(prob, CAM, n_iters=8)

        probd = partition_problem(prob, 8)
        Rd, td, ptsd, _ = dist_bundle_adjust(probd, CAM, mesh8, n_iters=8)
        rmse_single = reproj_rmse(R1, t1, pts1, prob)
        # evaluate dist result on the padded problem's valid entries
        n_pts = prob.points.shape[0]
        rmse_dist = reproj_rmse(Rd, td, np.asarray(ptsd)[:n_pts], prob)
        assert rmse_dist < 1.0, (rmse_single, rmse_dist)
        # same optimum within tolerance
        np.testing.assert_allclose(np.asarray(Rd), np.asarray(R1), atol=2e-4)
        np.testing.assert_allclose(np.asarray(td), np.asarray(t1), atol=2e-3)

    def test_partition_preserves_problem(self):
        prob, _ = make_ba_problem(n_cams=4, n_pts=100)
        pp = partition_problem(prob, 8)
        assert pp.points.shape[0] % 8 == 0
        assert pp.e_cam.shape[0] % 8 == 0
        # every original valid edge appears exactly once
        orig = set()
        for c, p, v in zip(np.asarray(prob.e_cam), np.asarray(prob.e_pt),
                           np.asarray(prob.e_valid)):
            if v:
                orig.add((int(c), int(p)))
        got = set()
        for c, p, v in zip(np.asarray(pp.e_cam), np.asarray(pp.e_pt),
                           np.asarray(pp.e_valid)):
            if v:
                got.add((int(c), int(p)))
        assert got == orig

    def test_edge_ownership_alignment(self):
        prob, _ = make_ba_problem(n_cams=4, n_pts=96)
        pp = partition_problem(prob, 8)
        per_pt = pp.points.shape[0] // 8
        per_e = pp.e_cam.shape[0] // 8
        e_pt = np.asarray(pp.e_pt)
        e_valid = np.asarray(pp.e_valid)
        for s in range(8):
            seg = e_pt[s * per_e:(s + 1) * per_e]
            segv = e_valid[s * per_e:(s + 1) * per_e]
            own = seg[segv]
            assert np.all((own >= s * per_pt) & (own < (s + 1) * per_pt)), s
