"""Relocalization: BoW candidate retrieval + batched PnP RANSAC + pose refine.

TPU-native replacement for the reference's relocalization path
(/root/reference app/src/main/cpp/src/Tracking.cc:3670 Relocalization():
KeyFrameDatabase::DetectRelocalizationCandidates -> SearchByBoW ->
MLPnPsolver::iterate RANSAC -> PoseOptimization -> projection refine).

The sequential early-exit RANSAC of MLPnPsolver becomes a fully batched
hypothesis sweep (SURVEY.md §7 "RANSAC loops: batched hypothesis evaluation
vmapped over K hypotheses"): each hypothesis solves a 6-point DLT for the
projection matrix, decomposes it to (R, t), and all hypotheses score all
correspondences at once. The winner seeds the standard pose LM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import cameras, lie
from .pose_opt import PoseObs, pose_optimization


def _p6p_dlt(p3d: jnp.ndarray, xy_norm: jnp.ndarray):
    """Solve [R|t] from >=6 3D-2D correspondences (normalized camera coords)
    by DLT on the 3x4 projection matrix + orthonormalization.

    p3d (S,3), xy_norm (S,2). Returns (R (3,3), t (3,))."""
    S = p3d.shape[0]
    X = jnp.concatenate([p3d, jnp.ones((S, 1))], axis=1)       # (S,4)
    zeros = jnp.zeros((S, 4))
    u = xy_norm[:, 0:1]
    v = xy_norm[:, 1:2]
    rows_u = jnp.concatenate([X, zeros, -u * X], axis=1)        # (S,12)
    rows_v = jnp.concatenate([zeros, X, -v * X], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)               # (2S,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # sign: points must be in front -> mean depth positive
    depths = X @ P[2]
    sign = jnp.where(jnp.mean(depths) < 0, -1.0, 1.0)
    P = P * sign
    M = P[:, :3]
    # orthonormalize M -> R via SVD; scale = mean singular value
    U, D, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    Dfix = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.stack(
        [jnp.float32(1.0), jnp.float32(1.0), det]))
    R = U @ Dfix @ Vt
    scale = jnp.mean(D)
    t = P[:, 3] / jnp.maximum(scale, 1e-9)
    return R, t


@partial(jax.jit, static_argnames=("cam_model", "n_hyp", "sample_size"))
def pnp_ransac(p_world, uv, valid, cam_params, cam_model: int = cameras.PINHOLE,
               n_hyp: int = 128, sample_size: int = 6,
               inlier_px: float = 5.991 ** 0.5 * 2.0, seed: int = 0):
    """Batched PnP RANSAC. Returns (R, t, inlier_mask, n_inliers).

    All hypotheses are solved and scored in parallel (vmap); the best seeds
    nothing further here — callers refine with pose_optimization.
    """
    M = p_world.shape[0]
    key = jax.random.PRNGKey(seed)
    # sample with probability weighted by validity
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, M, shape=(n_hyp, sample_size), p=probs)

    xy_norm = cameras.unproject(cam_model, cam_params, uv)[..., :2]

    def solve(sample_idx):
        return _p6p_dlt(p_world[sample_idx], xy_norm[sample_idx])

    Rs, ts = jax.vmap(solve)(idx)                                # (H,3,3),(H,3)

    # score all hypotheses against all points
    p_c = jnp.einsum("hij,mj->hmi", Rs, p_world) + ts[:, None, :]
    uv_hat = cameras.project(cam_model, cam_params, p_c)
    err2 = jnp.sum((uv_hat - uv[None, :, :]) ** 2, axis=-1)      # (H,M)
    front = p_c[..., 2] > 0.05
    ok = (err2 < inlier_px ** 2) & front & valid[None, :]
    scores = jnp.sum(ok, axis=1)
    best = jnp.argmax(scores)
    return Rs[best], ts[best], ok[best], scores[best]


@partial(jax.jit, static_argnames=("cam_model", "min_inliers"))
def relocalize_against_kf(m_mp_pos, m_mp_valid, kf_mp_row, kf_desc, kf_feat_valid,
                          feat_xy, feat_desc, feat_valid, cam_params,
                          cam_model: int = cameras.PINHOLE,
                          min_inliers: int = 15):
    """One relocalization attempt against one candidate keyframe.

    Matches frame descriptors to the candidate KF's landmark-bearing features
    (SearchByBoW semantics, ratio 0.75), then PnP RANSAC + pose LM.
    Returns (R, t, n_inliers) — caller gates on n_inliers.
    """
    from .matching import match_descriptors_ratio

    F = kf_desc.shape[0]
    kf_has_mp = (kf_mp_row >= 0) & kf_feat_valid
    idx, ok = match_descriptors_ratio(feat_desc, feat_valid, kf_desc,
                                      kf_has_mp, th=100.0, ratio=0.75)
    mp_ids = kf_mp_row[jnp.clip(idx, 0, F - 1)]
    mp_ids_c = jnp.clip(mp_ids, 0, m_mp_pos.shape[0] - 1)
    good = ok & (mp_ids >= 0) & m_mp_valid[mp_ids_c]
    p_w = m_mp_pos[mp_ids_c]

    R0, t0, inl, n0 = pnp_ransac(p_w, feat_xy, good, cam_params,
                                 cam_model=cam_model)
    obs = PoseObs(p_world=p_w, uv=feat_xy,
                  inv_sigma2=jnp.ones(feat_xy.shape[0], jnp.float32),
                  u_right=jnp.zeros(feat_xy.shape[0], jnp.float32),
                  is_stereo=jnp.zeros(feat_xy.shape[0], bool),
                  valid=good & inl)
    R, t, inl2, n_inl = pose_optimization(R0, t0, obs, cam_params,
                                          cam_model=cam_model)
    return R, t, n_inl


def make_place_recognition(voc, max_kf: int, prefer_native: bool = True):
    """Factory: the native C++ inverted-file database when available (the
    reference's KeyFrameDatabase is host C++ — SURVEY.md §7 flags BoW descent
    as host-CPU work), else the dense JAX implementation. Both expose the
    same add()/query()/.voc contract and are oracle-tested against each
    other (tests/test_native_bow.py). Env ORBSLAM3_TPU_NATIVE_BOW=0 forces
    the JAX path."""
    import os
    if prefer_native and os.environ.get("ORBSLAM3_TPU_NATIVE_BOW", "1") != "0":
        try:
            from ..native import NativeBowDatabase, load_library
            if load_library() is not None:
                db = NativeBowDatabase(voc, max_kf)
                db.voc = voc
                return db
        except Exception:
            pass
    return PlaceRecognition(voc, max_kf)


class PlaceRecognition:
    """Dense BoW keyframe database (the KeyFrameDatabase equivalent).

    Holds a (max_kf, W) tf-idf matrix; add() on keyframe insert, query()
    returns top-N candidate keyframe ids by DBoW2 L1 score."""

    def __init__(self, voc, max_kf: int):
        from ..models import vocabulary as vb
        self.voc = voc
        self.vb = vb
        self.bow_db = jnp.zeros((max_kf, voc.n_words), jnp.float32)
        self.active = jnp.zeros(max_kf, bool)

    def add(self, kf_id: int, desc_bits, valid):
        v = self.vb.bow_from_descriptors(self.voc, desc_bits, valid)
        self.bow_db = self.bow_db.at[kf_id].set(v)
        self.active = self.active.at[kf_id].set(True)

    def query(self, desc_bits, valid, exclude_mask=None, n_best: int = 3):
        """Returns (ids (n_best,), scores (n_best,)) best-first."""
        q = self.vb.bow_from_descriptors(self.voc, desc_bits, valid)
        s = self.vb.l1_scores(self.bow_db, q)
        s = jnp.where(self.active, s, -1.0)
        if exclude_mask is not None:
            s = jnp.where(exclude_mask, -1.0, s)
        top_s, top_i = jax.lax.top_k(s, n_best)
        return top_i, top_s
