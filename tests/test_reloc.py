"""Vocabulary, PnP RANSAC, and relocalization tests."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.models import vocabulary as vb
from orbslam3lib_tpu.tracking.reloc import PlaceRecognition, pnp_ransac
from orbslam3lib_tpu.utils import cameras, lie

RNG = np.random.default_rng(51)
CAM = jnp.asarray([300.0, 300.0, 320.0, 200.0], dtype=jnp.float32)


def perturb_desc(d, n_flip):
    d = d.copy()
    for row in d:
        idx = RNG.choice(256, n_flip, replace=False)
        row[idx] ^= 1
    return d


class TestVocabulary:
    def test_train_and_descend(self):
        descs = RNG.integers(0, 2, size=(2000, 256)).astype(np.int8)
        voc = vb.train_vocabulary(descs, k=4, depth=3)
        assert voc.n_words == 64
        w = np.asarray(vb.word_ids(voc, jnp.asarray(descs[:100])))
        assert w.min() >= 0 and w.max() < 64
        # same descriptor maps to same word; similar ones usually agree
        w2 = np.asarray(vb.word_ids(voc, jnp.asarray(descs[:100])))
        np.testing.assert_array_equal(w, w2)

    def test_bow_similarity_ranks_same_scene_higher(self):
        base = RNG.integers(0, 2, size=(3000, 256)).astype(np.int8)
        voc = vb.train_vocabulary(base[:2000], k=4, depth=3)
        scene_a = base[:200]
        scene_a_again = perturb_desc(scene_a, 8)   # same scene, slight noise
        scene_b = base[1000:1200]                  # different scene
        va = vb.bow_from_descriptors(voc, jnp.asarray(scene_a), jnp.ones(200, bool))
        va2 = vb.bow_from_descriptors(voc, jnp.asarray(scene_a_again), jnp.ones(200, bool))
        vb_ = vb.bow_from_descriptors(voc, jnp.asarray(scene_b), jnp.ones(200, bool))
        db = jnp.stack([va2, vb_])
        s = np.asarray(vb.l1_scores(db, va))
        assert s[0] > s[1], s

    def test_save_load_roundtrip(self, tmp_path):
        descs = RNG.integers(0, 2, size=(500, 256)).astype(np.int8)
        voc = vb.train_vocabulary(descs, k=4, depth=2)
        p = str(tmp_path / "voc.npz")
        vb.save_vocabulary(voc, p)
        voc2 = vb.load_vocabulary(p)
        w1 = np.asarray(vb.word_ids(voc, jnp.asarray(descs[:50])))
        w2 = np.asarray(vb.word_ids(voc2, jnp.asarray(descs[:50])))
        np.testing.assert_array_equal(w1, w2)


class TestPnP:
    def test_recovers_pose(self):
        n = 200
        p_w = RNG.uniform([-3, -2, 3], [3, 2, 12], size=(n, 3)).astype(np.float32)
        xi = (RNG.normal(size=6) * 0.3).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        p_c = np.asarray(lie.se3_apply(R, t, jnp.asarray(p_w)))
        uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
        uv += RNG.normal(0, 0.5, uv.shape).astype(np.float32)
        # 20% outliers
        n_out = n // 5
        uv[:n_out] += RNG.uniform(30, 100, (n_out, 2)).astype(np.float32)
        Re, te, inl, n_inl = pnp_ransac(jnp.asarray(p_w), jnp.asarray(uv),
                                        jnp.ones(n, bool), CAM)
        assert int(n_inl) > n * 0.6
        dR = np.asarray(Re).T @ np.asarray(R)
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.02, ang
        assert np.linalg.norm(np.asarray(te) - np.asarray(t)) < 0.15

    def test_respects_validity(self):
        n = 100
        p_w = RNG.uniform([-3, -2, 3], [3, 2, 12], size=(n, 3)).astype(np.float32)
        uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_w)))
        valid = np.ones(n, bool)
        valid[50:] = False
        uv[50:] = 9999.0  # garbage in invalid region
        Re, te, inl, n_inl = pnp_ransac(jnp.asarray(p_w), jnp.asarray(uv),
                                        jnp.asarray(valid), CAM)
        assert not np.any(np.asarray(inl)[50:])
        assert np.linalg.norm(np.asarray(te)) < 0.05  # identity pose


class TestPlaceRecognition:
    def test_query_finds_revisit(self):
        descs = RNG.integers(0, 2, size=(4000, 256)).astype(np.int8)
        voc = vb.train_vocabulary(descs[:2000], k=4, depth=3)
        pr = PlaceRecognition(voc, max_kf=16)
        scenes = [RNG.integers(0, 2, size=(128, 256)).astype(np.int8)
                  for _ in range(5)]
        for i, s in enumerate(scenes):
            pr.add(i, jnp.asarray(s), jnp.ones(128, bool))
        q = perturb_desc(scenes[2], 10)
        ids, scores = pr.query(jnp.asarray(q), jnp.ones(128, bool), n_best=2)
        assert int(ids[0]) == 2
