"""Association searches: projection matching and stereo matching.

TPU-native re-design of the reference's ORBmatcher
(/root/reference app/src/main/cpp/src/ORBmatcher.cc) and of the stereo
matchers in Frame.cc. The reference probes a 64x48 per-frame feature grid
cell by cell (GetFeaturesInArea, Frame.cc:673; SearchByProjection hot loop,
ORBmatcher.cc:1736-1792). On TPU the grid disappears: the spatial gate, the
level-compatibility gate and the descriptor distances are all computed as
dense masked (P, N) matrices — the descriptor term is one 256-deep MXU
matmul (ops/matcher.py) and the whole search is a handful of fused
elementwise passes. This is the `vmap over map points` equivalent of the
reference's SearchByProjectionThread sharding scaffold (SURVEY.md §2.4 P7).

Constants follow the reference: TH_HIGH=100, TH_LOW=50 (ORBmatcher.cc:36-38),
stereo descriptor gate (TH_HIGH+TH_LOW)/2=75 (Frame.cc:827 path) and the
fisheye kNN gate dist<70 (Frame.cc:1169-1177).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.matcher import BIG, hamming_matrix
from ..utils import cameras, lie
from ..ops.pyramid import scale_factors

TH_HIGH = 100.0
TH_LOW = 50.0
TH_STEREO_DESC = 75.0
TH_FISHEYE = 70.0
NN_RATIO_DEFAULT = 0.9


class ProjMatches(NamedTuple):
    """Result of a projection search over P landmarks vs N frame features.

    mp_feat (P,) int32 : matched feature slot per landmark (-1 = none)
    visible (P,) bool  : landmark passed the frustum gates (for mp_visible)
    """
    mp_feat: jnp.ndarray
    visible: jnp.ndarray


def _one_to_one(dist_pn: jnp.ndarray, cand_mask: jnp.ndarray):
    """Resolve the (P, N) candidate matrix to one-to-one matches.

    Per landmark pick its best feature; per feature keep only the landmark
    with the smallest distance among those that picked it (the reference
    resolves collisions by replacing worse matches in SearchByProjection).
    """
    d = jnp.where(cand_mask, dist_pn, BIG)
    best_feat = jnp.argmin(d, axis=1)                       # (P,)
    best_d = jnp.min(d, axis=1)
    has = best_d < BIG
    N = dist_pn.shape[1]
    # per-feature min over landmarks that chose it
    feat_min = jnp.full(N + 1, BIG).at[jnp.where(has, best_feat, N)].min(best_d)
    winner = has & (best_d <= feat_min[best_feat] + 1e-6)
    # break exact ties: keep lowest landmark index via cummin trick
    P = dist_pn.shape[0]
    order = jnp.where(winner, jnp.arange(P), P)
    first = jnp.full(N + 1, P).at[jnp.where(winner, best_feat, N)].min(order)
    winner = winner & (first[best_feat] == jnp.arange(P))
    return jnp.where(winner, best_feat, -1), has


def predicted_level(dist: jnp.ndarray, max_dist: jnp.ndarray,
                    n_levels: int = 8) -> jnp.ndarray:
    """MapPoint::PredictScale — level whose scale matches the viewing
    distance (log ratio against the per-level scale chain)."""
    sf = jnp.asarray(scale_factors(n_levels))
    ratio = jnp.clip(max_dist / jnp.maximum(dist, 1e-6), 1.0, None)
    lvl = jnp.argmin(jnp.abs(jnp.log(ratio[..., None]) - jnp.log(sf)[None, :]), axis=-1)
    return lvl.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cam_model", "img_w", "img_h", "n_levels"))
def search_by_projection(mp_pos, mp_desc, mp_valid, mp_normal, mp_min_dist,
                         mp_max_dist, R, t, cam_params, feat_xy, feat_level,
                         feat_desc, feat_valid, radius: jnp.ndarray,
                         cam_model: int = cameras.PINHOLE,
                         img_w: int = 640, img_h: int = 400,
                         th_desc: float = TH_HIGH, n_levels: int = 8,
                         check_view_angle: bool = True) -> ProjMatches:
    """Project landmarks into the frame and match to features.

    Semantics of ORBmatcher::SearchByProjection(Frame, vector<MapPoint*>)
    (ORBmatcher.cc:44) + Frame::isInFrustum (Frame.cc:528): depth>0, image
    bounds, scale-invariance distance window, viewing angle < 60 deg, search
    window radius * scale(predicted level), level gate within +-1, Hamming
    gate th_desc.
    """
    p_c = lie.se3_apply(R, t, mp_pos)            # (P,3)
    z = p_c[..., 2]
    uv = cameras.project(cam_model, cam_params, p_c)
    dist = jnp.linalg.norm(p_c, axis=-1)

    in_img = ((uv[..., 0] >= 0) & (uv[..., 0] < img_w)
              & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
    in_depth = z > 0.1
    in_range = (dist >= 0.8 * mp_min_dist) & (dist <= 1.2 * mp_max_dist)
    visible = mp_valid & in_img & in_depth & in_range
    if check_view_angle:
        # viewing dir in world frame: (p - cam_center)/dist vs stored normal
        Rw, cw = lie.se3_inverse(R, t)
        view = mp_pos - cw
        view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
        cosang = jnp.sum(view * mp_normal, axis=-1)
        visible = visible & (cosang > 0.5)

    lvl = predicted_level(dist, mp_max_dist, n_levels)
    sf = jnp.asarray(scale_factors(n_levels))
    r_scaled = radius * sf[lvl]                   # (P,)

    # spatial + level gates, (P, N)
    d2 = jnp.sum((uv[:, None, :] - feat_xy[None, :, :]) ** 2, axis=-1)
    spatial = d2 <= (r_scaled[:, None] ** 2)
    lvl_ok = (feat_level[None, :] >= lvl[:, None] - 1) & (
        feat_level[None, :] <= lvl[:, None] + 1)
    cand = spatial & lvl_ok & visible[:, None] & feat_valid[None, :]

    desc_d = hamming_matrix(mp_desc, feat_desc)
    cand = cand & (desc_d <= th_desc)
    mp_feat, _ = _one_to_one(desc_d, cand)
    return ProjMatches(mp_feat=mp_feat, visible=visible)


@partial(jax.jit, static_argnames=("n_levels",))
def match_rectified_stereo(xy_l, level_l, desc_l, valid_l,
                           xy_r, level_r, desc_r, valid_r,
                           bf: jnp.ndarray, min_z: jnp.ndarray,
                           n_levels: int = 8):
    """Rectified stereo matching: row-banded candidates + disparity window.

    Semantics of Frame::ComputeStereoMatches (Frame.cc:827-997): candidate
    right features within +-2*scale rows, disparity in (0, bf/min_z],
    descriptor gate (TH_HIGH+TH_LOW)/2. (The reference's 11x11 SAD sub-pixel
    refinement over the image pyramid is a follow-up refinement stage —
    descriptor-level matching dominates accuracy at SLAM scale.)

    Returns (u_right (N,), depth (N,)) with -1 / 0 for unmatched.
    """
    sf = jnp.asarray(scale_factors(n_levels))
    row_tol = 2.0 * sf[level_l]                             # (N,)
    dv = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    max_disp = bf / min_z
    cand = ((dv <= row_tol[:, None]) & (disp > 0.1) & (disp <= max_disp)
            & valid_l[:, None] & valid_r[None, :])
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    cand = cand & lvl_ok

    d = hamming_matrix(desc_l, desc_r)
    cand = cand & (d <= TH_STEREO_DESC)
    dm = jnp.where(cand, d, BIG)
    best = jnp.argmin(dm, axis=1)
    best_d = jnp.min(dm, axis=1)
    has = best_d < BIG
    u_r = jnp.where(has, xy_r[best, 0], -1.0)
    disparity = jnp.where(has, xy_l[:, 0] - u_r, 0.0)
    depth = jnp.where(has & (disparity > 0.1), bf / jnp.maximum(disparity, 0.1), 0.0)
    return u_r, depth


@partial(jax.jit, static_argnames=())
def match_descriptors_ratio(desc_a, valid_a, desc_b, valid_b,
                            th: float = TH_LOW, ratio: float = NN_RATIO_DEFAULT):
    """Plain descriptor kNN-2 with Lowe ratio + threshold (the
    SearchForInitialization / fisheye-stereo style gate). Returns
    (idx (Na,), ok (Na,))."""
    d = hamming_matrix(desc_a, desc_b, valid_a, valid_b)
    neg, idx2 = jax.lax.top_k(-d, 2)
    d1, d2 = -neg[:, 0], -neg[:, 1]
    ok = valid_a & (d1 <= th) & (d1 <= ratio * d2)
    return jnp.where(ok, idx2[:, 0], -1), ok
