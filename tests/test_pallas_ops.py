"""Pallas TPU kernels vs their XLA/NumPy oracles (interpret mode on CPU).

Follows the reference's dual-implementation oracle pattern (SURVEY.md §4:
every HVX kernel has a scalar counterpart kept in-tree for A/B comparison) —
here every Pallas kernel is checked bit-exactly against the pure-XLA path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3lib_tpu.ops import fast
from orbslam3lib_tpu.ops.matcher import knn_match
from orbslam3lib_tpu.ops.pallas_fast import fast_scores_nms
from orbslam3lib_tpu.ops.pallas_matcher import knn_match_fused


@pytest.mark.parametrize("na,nb", [(64, 64), (300, 450), (512, 1024)])
def test_knn_match_fused_matches_oracle(na, nb):
    rng = np.random.default_rng(na * 1000 + nb)
    a = jnp.asarray((rng.random((na, 256)) < 0.5).astype(np.int8))
    b = jnp.asarray((rng.random((nb, 256)) < 0.5).astype(np.int8))
    av = jnp.asarray(rng.random(na) < 0.9)
    bv = jnp.asarray(rng.random(nb) < 0.9)

    best_p, d1_p, d2_p = knn_match_fused(a, b, av, bv, interpret=True)
    best_x, d1_x, d2_x = knn_match(a, b, av, bv)

    np.testing.assert_array_equal(np.asarray(best_p), np.asarray(best_x))
    np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_x))
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x))


def test_knn_match_fused_no_validity_masks():
    rng = np.random.default_rng(7)
    a = jnp.asarray((rng.random((100, 256)) < 0.5).astype(np.int8))
    b = jnp.asarray((rng.random((200, 256)) < 0.5).astype(np.int8))
    best_p, d1_p, d2_p = knn_match_fused(a, b, interpret=True)
    best_x, d1_x, d2_x = knn_match(a, b)
    np.testing.assert_array_equal(np.asarray(best_p), np.asarray(best_x))
    np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_x))
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x))


@pytest.mark.parametrize("h,w", [(400, 640), (80, 128), (100, 161)])
def test_fast_scores_nms_matches_oracle(h, w):
    rng = np.random.default_rng(h * 7 + w)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    got = np.asarray(fast_scores_nms(img, margin=21, interpret=True))
    want = np.asarray(fast.nms3x3(fast.fast_scores(img, margin=21)))
    np.testing.assert_array_equal(got, want)


def test_fast_scores_nms_small_margin():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (64, 128)).astype(np.float32))
    got = np.asarray(fast_scores_nms(img, margin=3, interpret=True))
    want = np.asarray(fast.nms3x3(fast.fast_scores(img, margin=3)))
    np.testing.assert_array_equal(got, want)
