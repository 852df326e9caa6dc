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


class TestTrackReferenceKF:
    """Direct coverage of the TrackReferenceKeyFrame fallback
    (Tracking.cc:2778) — it must run under jit with n_levels static and
    recover a pose from descriptor matches against the reference KF."""

    def _build_map_and_frame(self):
        import orbslam3lib_tpu.models.map_state as ms
        from orbslam3lib_tpu.ops.pattern import BIT_PATTERN_31  # noqa: F401

        F, n = 128, 100
        p_w = RNG.uniform([-3, -2, 4], [3, 2, 12], size=(n, 3)).astype(np.float32)
        desc = RNG.integers(0, 2, size=(F, 256)).astype(np.int8)
        # KF0 at identity observes the n landmarks in its first n slots
        uv0 = np.asarray(cameras.pinhole_project(CAM, jnp.asarray(p_w)))
        xy = np.zeros((F, 2), np.float32)
        xy[:n] = uv0
        valid = np.zeros(F, bool)
        valid[:n] = True
        m = ms.empty_map(max_kf=8, max_mp=512, n_feat=F)
        m, kf_id = ms.insert_keyframe(
            m, jnp.eye(3), jnp.zeros(3), 0.0, jnp.asarray(xy),
            jnp.zeros(F, jnp.int32), jnp.asarray(desc), jnp.asarray(valid),
            jnp.full(F, -1, jnp.int32), jnp.zeros(F, jnp.float32))
        want = jnp.asarray(valid)
        pad = np.zeros((F, 3), np.float32)
        pad[:n] = p_w
        normal = np.zeros((F, 3), np.float32)
        normal[:, 2] = -1.0
        m = ms.spawn_mappoints(
            m, kf_id, jnp.asarray(pad), jnp.asarray(desc), jnp.asarray(normal),
            jnp.full(F, 0.1, jnp.float32), jnp.full(F, 100.0, jnp.float32),
            want, jnp.arange(F))
        # current frame: same landmarks viewed from a translated pose
        xi = np.array([0.01, -0.02, 0.015, 0.15, -0.1, 0.2], np.float32)
        R_f, t_f = lie.se3_exp(jnp.asarray(xi))
        p_c = np.asarray(lie.se3_apply(R_f, t_f, jnp.asarray(p_w)))
        uv_f = np.asarray(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
        fxy = np.zeros((F, 2), np.float32)
        fxy[:n] = uv_f + RNG.normal(0, 0.3, uv_f.shape).astype(np.float32)
        return m, kf_id, R_f, t_f, fxy, desc, valid

    def test_recovers_pose_from_ref_kf(self):
        from orbslam3lib_tpu.tracking.reloc import track_reference_kf
        m, kf_id, R_f, t_f, fxy, desc, valid = self._build_map_and_frame()
        F = fxy.shape[0]
        # seed at a WRONG pose (motion model failed): identity
        R, t, n_inl = track_reference_kf(
            m, jnp.int32(int(kf_id)), jnp.eye(3), jnp.zeros(3),
            jnp.asarray(fxy), jnp.zeros(F, jnp.int32), jnp.asarray(desc),
            jnp.asarray(valid), jnp.zeros(F, jnp.float32),
            jnp.zeros(F, jnp.float32), jnp.zeros(F, jnp.float32), CAM,
            cam_model=cameras.PINHOLE, bf=0.0, n_levels=8)
        assert int(n_inl) >= 50, int(n_inl)
        dR = np.asarray(R).T @ np.asarray(R_f)
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.01, ang
        assert np.linalg.norm(np.asarray(t) - np.asarray(t_f)) < 0.05

    def test_jits_with_traced_kf_id(self):
        """n_levels is static; kf_id and poses are traced — the call must not
        raise TracerIntegerConversionError (the round-2 crash)."""
        from orbslam3lib_tpu.tracking.reloc import track_reference_kf
        m, kf_id, R_f, t_f, fxy, desc, valid = self._build_map_and_frame()
        F = fxy.shape[0]
        for nl in (4, 8):   # two distinct static signatures both compile
            R, t, n_inl = track_reference_kf(
                m, jnp.int32(int(kf_id)), jnp.eye(3), jnp.zeros(3),
                jnp.asarray(fxy), jnp.zeros(F, jnp.int32), jnp.asarray(desc),
                jnp.asarray(valid), jnp.zeros(F, jnp.float32),
                jnp.zeros(F, jnp.float32), jnp.zeros(F, jnp.float32), CAM,
                cam_model=cameras.PINHOLE, bf=0.0, n_levels=nl)
            assert np.isfinite(np.asarray(t)).all()


class TestRelocCandidateGating:
    """DetectRelocalizationCandidates (KeyFrameDatabase.cc): common-words
    ratio + covisibility-accumulated group scoring."""

    def test_groups_and_gating(self):
        import numpy as np
        import jax.numpy as jnp
        from orbslam3lib_tpu.models import map_state as ms
        from orbslam3lib_tpu.models import vocabulary as vb
        from orbslam3lib_tpu.tracking.reloc import (PlaceRecognition,
                                                    detect_reloc_candidates)
        rng = np.random.default_rng(9)
        F, P = 64, 256
        # two disjoint descriptor populations: region A and region B
        desc_a = rng.integers(0, 2, size=(F, 256)).astype(np.int8)
        desc_b = rng.integers(0, 2, size=(F, 256)).astype(np.int8)
        m = ms.empty_map(max_kf=16, max_mp=P, n_feat=F)
        fv = jnp.ones(F, bool)
        # region-A KFs (0,1,2) share landmarks 0..F-1 -> covisible group;
        # region-B KFs (3,4) share landmarks F..2F-1
        for i in range(3):
            assoc = jnp.asarray(np.arange(F, dtype=np.int32))
            m, _ = ms.insert_keyframe(
                m, jnp.eye(3), jnp.zeros(3), jnp.float32(i),
                jnp.zeros((F, 2)), jnp.zeros(F, jnp.int32),
                jnp.asarray(desc_a), fv, assoc, jnp.zeros(F))
        for i in range(2):
            assoc = jnp.asarray(np.arange(F, 2 * F, dtype=np.int32))
            m, _ = ms.insert_keyframe(
                m, jnp.eye(3), jnp.zeros(3), jnp.float32(3 + i),
                jnp.zeros((F, 2)), jnp.zeros(F, jnp.int32),
                jnp.asarray(desc_b), fv, assoc, jnp.zeros(F))
        mp_valid = np.zeros(P, bool); mp_valid[:2 * F] = True
        m = m._replace(mp_valid=jnp.asarray(mp_valid))
        voc = vb.train_vocabulary(np.concatenate([desc_a, desc_b]), k=4, depth=3)
        pr = PlaceRecognition(voc, max_kf=16)
        for i in range(5):
            pr.add(i, m.kf_desc[i], m.kf_feat_valid[i])
        # query with region-A descriptors: every returned candidate must be
        # a region-A keyframe, and the group is represented once
        q = vb.bow_from_descriptors(voc, jnp.asarray(desc_a), fv)
        ids, scores = detect_reloc_candidates(m, pr.bow_db, pr.active, q)
        ids = np.asarray(ids)
        assert ids[0] in (0, 1, 2), ids
        for i in ids:
            assert i < 0 or i in (0, 1, 2), ids
