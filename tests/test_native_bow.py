"""Native C++ BoW runtime vs the JAX oracle (models/vocabulary.py +
reloc.PlaceRecognition). Mirrors the reference's dual-implementation testing
pattern (SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3lib_tpu.models import vocabulary as vb
from orbslam3lib_tpu.tracking.reloc import PlaceRecognition, make_place_recognition

native = pytest.importorskip("orbslam3lib_tpu.native")
if native.load_library() is None:
    pytest.skip("native bow library unavailable", allow_module_level=True)

RNG = np.random.default_rng(11)
DESCS = RNG.integers(0, 2, size=(4000, 256)).astype(np.int8)
VOC = vb.train_vocabulary(DESCS[:1500], k=6, depth=3)


def test_descend_matches_jax():
    nv = native.NativeVocabulary(VOC)
    got = nv.word_ids(DESCS)
    want = np.asarray(vb.word_ids(VOC, jnp.asarray(DESCS)))
    np.testing.assert_array_equal(got, want)


def test_pack_descriptors_popcount():
    a = native.pack_descriptors(DESCS[:10])
    assert a.shape == (10, 4)
    # popcount of packed rows == sum of bits
    pc = np.array([bin(int(x)).count("1") for row in a for x in row]
                  ).reshape(10, 4).sum(1)
    np.testing.assert_array_equal(pc, DESCS[:10].sum(1))


def test_database_matches_jax():
    K, F = 30, 120
    pr = PlaceRecognition(VOC, K)
    nb = native.NativeBowDatabase(VOC, K)
    for k in range(K):
        d = DESCS[k * F:(k + 1) * F]
        v = RNG.random(F) < 0.9
        pr.add(k, jnp.asarray(d), jnp.asarray(v))
        nb.add(k, d, v)
    for q in [3, 17, 29]:
        d, v = DESCS[q * F:(q + 1) * F], np.ones(F, bool)
        ids_j, s_j = pr.query(jnp.asarray(d), jnp.asarray(v), n_best=5)
        ids_n, s_n = nb.query(d, v, n_best=5)
        np.testing.assert_array_equal(np.asarray(ids_j), ids_n)
        np.testing.assert_allclose(np.asarray(s_j), s_n, atol=1e-5)


def test_database_readd_and_exclude():
    K, F = 8, 100
    nb = native.NativeBowDatabase(VOC, K)
    for k in range(K):
        nb.add(k, DESCS[k * F:(k + 1) * F], np.ones(F, bool))
    assert nb.n_active == K
    # re-adding a keyframe replaces its postings (no double counting)
    nb.add(3, DESCS[3 * F:4 * F], np.ones(F, bool))
    assert nb.n_active == K
    s = nb.query_scores(DESCS[3 * F:4 * F], np.ones(F, bool))
    assert abs(s[3] - 1.0) < 1e-5
    ids, _ = nb.query(DESCS[3 * F:4 * F], np.ones(F, bool),
                      exclude_mask=np.arange(K) == 3, n_best=2)
    assert 3 not in ids


def test_factory_prefers_native(monkeypatch):
    db = make_place_recognition(VOC, 16)
    assert isinstance(db, native.NativeBowDatabase)
    assert db.voc is VOC
    monkeypatch.setenv("ORBSLAM3_TPU_NATIVE_BOW", "0")
    db2 = make_place_recognition(VOC, 16)
    assert isinstance(db2, PlaceRecognition)
