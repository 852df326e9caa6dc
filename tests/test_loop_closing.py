"""Loop closing end-to-end on a synthetic drifted circular trajectory."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.mapping.loop_closing import (LoopCloser, essential_edges,
                                                  match_kf_landmarks)
from orbslam3lib_tpu.models import map_state as ms
from orbslam3lib_tpu.models import vocabulary as vb
from orbslam3lib_tpu.tracking.reloc import PlaceRecognition
from orbslam3lib_tpu.utils import cameras, lie

RNG = np.random.default_rng(71)
CAM = jnp.asarray([300.0, 300.0, 320.0, 200.0], dtype=jnp.float32)
F = 160
N_PTS = 360


def build_ring_world():
    """Landmarks on a cylinder wall; cameras on a circle looking outward."""
    ang = np.linspace(0, 2 * np.pi, N_PTS, endpoint=False)
    r_wall = 6.0
    pts = np.stack([r_wall * np.cos(ang),
                    RNG.uniform(-1.5, 1.5, N_PTS),
                    r_wall * np.sin(ang)], axis=1).astype(np.float32)
    descs = RNG.integers(0, 2, size=(N_PTS, 256)).astype(np.int8)
    return pts, descs


def kf_pose(theta, radius=2.0):
    """Camera at angle theta on a circle, looking radially outward."""
    c = np.array([radius * np.cos(theta), 0.0, radius * np.sin(theta)],
                 dtype=np.float32)
    fwd = np.array([np.cos(theta), 0.0, np.sin(theta)], dtype=np.float32)
    up = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_cw = np.stack([right, down, fwd], axis=1).astype(np.float32)
    R = R_cw.T
    t = -R @ c
    return R, t


def visible_subset(R, t, pts):
    p_c = pts @ R.T + t
    uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
    ok = (p_c[:, 2] > 1.0) & (uv[:, 0] > 5) & (uv[:, 0] < 635) & \
         (uv[:, 1] > 5) & (uv[:, 1] < 395)
    return ok, uv


class TestLoopClosing:
    def _build(self, n_kf=12, drift_per_kf=0.012):
        pts, descs = build_ring_world()
        m = ms.empty_map(max_kf=32, max_mp=1024, n_feat=F)
        thetas = np.linspace(0, 2 * np.pi, n_kf, endpoint=False)
        thetas = np.concatenate([thetas, [0.02]])  # last KF revisits start

        # landmark ids in the map: spawn all points up front via KF0
        true_poses, est_poses = [], []
        drift = np.zeros(6, np.float32)
        for i, th in enumerate(thetas):
            R, t = kf_pose(th)
            true_poses.append((R, t))
            if i > 0:
                drift += (RNG.normal(size=6) * drift_per_kf).astype(np.float32) * \
                    np.array([1, 1, 1, 0.3, 0.3, 0.3], np.float32)
            dR, dt = lie.se3_exp(jnp.asarray(drift))
            Re, te = lie.se3_compose(dR, dt, jnp.asarray(R), jnp.asarray(t))
            est_poses.append((np.asarray(Re), np.asarray(te)))

        first = np.full(N_PTS, -1, np.int32)
        dup_ids = {}   # revisit KF gets DUPLICATE landmarks (pre-loop reality:
                       # the revisited area is not re-associated — that is
                       # exactly what loop closing exists to fix)
        last = len(thetas) - 1
        for i, th in enumerate(thetas):
            R_true, t_true = true_poses[i]
            ok, uv = visible_subset(R_true, t_true, pts)
            sel = np.nonzero(ok)[0][:F]
            xy = np.zeros((F, 2), np.float32)
            desc = np.zeros((F, 256), np.int8)
            fv = np.zeros(F, bool)
            assoc = np.full(F, -1, np.int32)
            xy[:len(sel)] = uv[sel]
            desc[:len(sel)] = descs[sel]
            fv[:len(sel)] = True
            if i < last:
                assoc[:len(sel)] = sel  # landmark id == point id
                first[sel[first[sel] < 0]] = i
            else:
                ids = 500 + np.arange(len(sel), dtype=np.int32)
                assoc[:len(sel)] = ids
                dup_ids = {int(d): int(p) for d, p in zip(ids, sel)}
            Re, te = est_poses[i]
            m, kf_id = ms.insert_keyframe(
                m, jnp.asarray(Re), jnp.asarray(te), jnp.float32(i),
                jnp.asarray(xy), jnp.zeros(F, jnp.int32), jnp.asarray(desc),
                jnp.asarray(fv), jnp.asarray(assoc), jnp.zeros(F, jnp.float32))

        # register landmarks (positions from TRUE geometry, anchored at their
        # first observer's *estimated* frame like a drifted map would be)
        mp_pos = np.zeros((1024, 3), np.float32)
        mp_valid = np.zeros(1024, bool)
        mp_desc = np.zeros((1024, 256), np.int8)
        mp_first = np.full(1024, -1, np.int32)
        for p in range(N_PTS):
            if first[p] < 0:
                continue
            R_true, t_true = true_poses[first[p]]
            Re, te = est_poses[first[p]]
            p_cam = R_true @ pts[p] + t_true
            p_est = np.asarray(Re).T @ (p_cam - te)
            mp_pos[p] = p_est
            mp_valid[p] = True
            mp_desc[p] = descs[p]
            mp_first[p] = first[p]
        # duplicate landmarks of the revisit keyframe, anchored in ITS
        # drifted estimate
        for d, p in dup_ids.items():
            R_true, t_true = true_poses[last]
            Re, te = est_poses[last]
            p_cam = R_true @ pts[p] + t_true
            mp_pos[d] = np.asarray(Re).T @ (p_cam - te)
            mp_valid[d] = True
            mp_desc[d] = descs[p]
            mp_first[d] = last
        m = m._replace(mp_pos=jnp.asarray(mp_pos), mp_valid=jnp.asarray(mp_valid),
                       mp_desc=jnp.asarray(mp_desc), mp_first_kf=jnp.asarray(mp_first),
                       n_mp=jnp.int32(700))
        return m, true_poses, est_poses, descs

    def test_match_and_detect_loop(self):
        m, true_poses, est_poses, descs = self._build()
        n_kf = int(m.n_kf)
        p_a, p_b, uv_a, uv_b, valid, idx = match_kf_landmarks(
            m, jnp.int32(n_kf - 1), jnp.int32(0))
        assert int(jnp.sum(valid)) > 40
        # idx is aligned: matched slots carry the kf_b feature index
        assert bool(jnp.all((idx >= 0) == valid))

    def test_search_by_sim3_grows_matches(self):
        """SearchBySim3 (ORBmatcher.cc:1464 role): projecting through the
        RANSAC Sim3 recovers correspondences the descriptor ratio-test
        stage missed, and never loses the seeds."""
        from orbslam3lib_tpu.mapping import sim3 as sim3_mod
        from orbslam3lib_tpu.mapping.loop_closing import search_by_sim3
        m, *_ = self._build()
        n_kf = int(m.n_kf)
        # scale-invariance bounds consistent with the synthetic geometry:
        # anchor at the KF0 viewing distance, level 0, so predicted levels
        # land at 0 (the test features are all level 0)
        R0 = np.asarray(m.kf_R[0]); t0 = np.asarray(m.kf_t[0])
        c0 = -R0.T @ t0
        dist = np.linalg.norm(np.asarray(m.mp_pos) - c0, axis=1) + 1e-3
        m = m._replace(mp_max_dist=jnp.asarray(dist.astype(np.float32)),
                       mp_min_dist=jnp.asarray((dist / 5.0).astype(np.float32)))
        kf_cur, kf_old = n_kf - 1, 0
        p_a, p_b, uv_a, uv_b, valid, idx = match_kf_landmarks(
            m, jnp.int32(kf_cur), jnp.int32(kf_old))
        R12, t12, s12, inl, n_inl = sim3_mod.sim3_ransac(
            p_a, p_b, uv_a, uv_b, valid, CAM, fix_scale=False)
        assert int(n_inl) >= 10
        seeds = inl & valid
        _, _, _, _, grown = search_by_sim3(
            m, jnp.int32(kf_cur), jnp.int32(kf_old), R12, t12, s12, CAM,
            idx, seeds)
        # monotone growth: every seed kept, mutual projections added
        assert bool(jnp.all(jnp.where(seeds, grown, True)))
        assert int(jnp.sum(grown)) >= int(jnp.sum(seeds))
        # with NO seeds, the sim3 projection sweep alone finds matches
        _, _, _, _, pure = search_by_sim3(
            m, jnp.int32(kf_cur), jnp.int32(kf_old), R12, t12, s12, CAM,
            jnp.full_like(idx, -1), jnp.zeros_like(seeds))
        assert int(jnp.sum(pure)) >= 10, int(jnp.sum(pure))

    def test_loop_correction_reduces_error(self):
        m, true_poses, est_poses, descs = self._build()
        n_kf = int(m.n_kf)
        voc = vb.train_vocabulary(descs, k=4, depth=3)
        pr = PlaceRecognition(voc, max_kf=32)
        for i in range(n_kf):
            pr.add(i, m.kf_desc[i], m.kf_feat_valid[i])
        cfg = SlamConfig()
        lc = LoopCloser(cfg, pr, consistency_needed=1)
        lc.last_loop_kf = -999

        def pose_err(mm):
            errs = []
            for i in range(n_kf):
                R_true, t_true = true_poses[i]
                c_true = -R_true.T @ t_true
                R = np.asarray(mm.kf_R[i]); t = np.asarray(mm.kf_t[i])
                errs.append(np.linalg.norm(-R.T @ t - c_true))
            return np.asarray(errs)

        err_before = pose_err(m)
        m2 = lc.on_keyframe(m, n_kf - 1, CAM)
        assert lc.n_loops == 1, "loop not detected"
        err_after = pose_err(m2)
        # drift at the end of the chain should shrink substantially
        assert err_after[-1] < err_before[-1] * 0.5, (err_before[-1], err_after[-1])
        assert err_after.mean() < err_before.mean()
