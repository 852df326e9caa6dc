"""Map-level bundle adjustment: window gather/scatter + interruptible
global BA.

TPU-native equivalent of the reference's map-wide optimizations
(/root/reference app/src/main/cpp/src/Optimizer.cc:
GlobalBundleAdjustemnt:53 / BundleAdjustment:61, spawned from
LoopClosing::RunGlobalBundleAdjustment:2268 with the mbStopGBA abort flag
checked between iterations). The pointer-graph edge construction becomes a
fixed-shape gather of the MapState's (K, F) observation rows; the abort flag
becomes a host-side callable checked between jitted LM chunks — the same
interruptibility contract with none of the thread races the reference's
README warns about.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models import map_state as ms
from ..ops.pyramid import scale_factors
from ..utils import cameras
from .local_ba import BAProblem, bundle_adjust


def inv_sigma2(level, n_levels: int = 8):
    """Per-observation information weight 1/scale^2 (the reference's
    mvInvLevelSigma2, Frame.cc)."""
    sf = jnp.asarray(scale_factors(n_levels))
    s = sf[jnp.clip(level, 0, n_levels - 1)]
    return 1.0 / (s * s)


@partial(jax.jit, static_argnames=("bf", "cam_model", "n_ba_points", "n_iters"))
def map_window_ba(m: ms.MapState, window_ids, fixed_mask, cam_params,
                  bf: float, cam_model: int, n_ba_points: int, n_iters: int):
    """Gather a fixed-shape BA problem over a keyframe window, solve, scatter.

    window_ids (C,) int32 (-1 = empty slot), fixed_mask (C,) bool.
    Reference: LocalBundleAdjustment (Optimizer.cc:1124) — window KFs
    optimizable, anchors fixed, all their landmarks optimizable. With the
    window = all KFs this is GlobalBundleAdjustemnt (Optimizer.cc:53).
    """
    C = window_ids.shape[0]
    F = m.n_feat
    ids = jnp.clip(window_ids, 0, m.max_kf - 1)
    cam_ok = (window_ids >= 0) & m.kf_valid[ids]

    kf_mp_w = jnp.where((cam_ok[:, None]) & m.kf_feat_valid[ids],
                        m.kf_mp[ids], -1)                     # (C,F)
    # select up to n_ba_points observed landmarks
    flag = jnp.zeros(m.max_mp, jnp.float32).at[
        jnp.clip(kf_mp_w.reshape(-1), 0, m.max_mp - 1)].max(
        (kf_mp_w.reshape(-1) >= 0).astype(jnp.float32), mode="drop")
    flag = flag * m.mp_valid.astype(jnp.float32)
    sel_flag, sel_ids = jax.lax.top_k(flag, n_ba_points)
    pt_ok = sel_flag > 0
    inv = jnp.full(m.max_mp, -1, jnp.int32).at[sel_ids].set(
        jnp.arange(n_ba_points, dtype=jnp.int32))

    cc = jax.lax.broadcasted_iota(jnp.int32, (C, F), 0)
    e_pt_g = kf_mp_w.reshape(-1)
    e_pt = inv[jnp.clip(e_pt_g, 0, m.max_mp - 1)]
    e_valid = (e_pt_g >= 0) & (e_pt >= 0)
    e_cam = cc.reshape(-1)
    e_uv = m.kf_xy[ids].reshape(-1, 2)
    e_level = m.kf_level[ids].reshape(-1)
    e_depth = m.kf_depth[ids].reshape(-1)
    e_stereo = e_depth > 0.05
    z_safe = jnp.maximum(e_depth, 0.05)
    e_u_right = jnp.where(e_stereo, e_uv[:, 0] - bf / z_safe, 0.0)

    prob = BAProblem(
        cam_R=m.kf_R[ids], cam_t=m.kf_t[ids],
        cam_fixed=fixed_mask | (~cam_ok), cam_valid=cam_ok,
        points=m.mp_pos[sel_ids], pt_valid=pt_ok,
        e_cam=e_cam, e_pt=jnp.where(e_valid, e_pt, 0),
        e_uv=e_uv, e_inv_sigma2=inv_sigma2(e_level, 8),
        e_u_right=e_u_right, e_stereo=e_stereo, e_valid=e_valid,
    )
    cam_R, cam_t, points, e_inlier = bundle_adjust(
        prob, cam_params, cam_model=cam_model, bf=bf, n_iters=n_iters)

    # scatter back (only valid, non-fixed cams; valid points)
    upd_cam = cam_ok & (~fixed_mask)
    m = m._replace(
        kf_R=m.kf_R.at[ids].set(jnp.where(upd_cam[:, None, None], cam_R, m.kf_R[ids])),
        kf_t=m.kf_t.at[ids].set(jnp.where(upd_cam[:, None], cam_t, m.kf_t[ids])),
        mp_pos=m.mp_pos.at[sel_ids].set(jnp.where(pt_ok[:, None], points,
                                                  m.mp_pos[sel_ids])),
    )
    return m


def global_bundle_adjust(m: ms.MapState, cam_params, bf: float,
                         cam_model: int = cameras.PINHOLE,
                         n_iters: int = 10, chunk: int = 5,
                         n_ba_points: Optional[int] = None,
                         should_abort: Optional[Callable[[], bool]] = None
                         ) -> ms.MapState:
    """Full-map BA with host-checkable abort between LM chunks.

    Reference: RunGlobalBundleAdjustment (LoopClosing.cc:2268) spawns
    GlobalBundleAdjustemnt on a thread and polls mbStopGBA between
    iterations; here the LM schedule is split into jitted chunks with the
    abort callable polled in between (P2 in SURVEY.md §2.4). The first valid
    keyframe is the gauge anchor.
    """
    K = m.max_kf
    window_ids = jnp.where(m.kf_valid, jnp.arange(K, dtype=jnp.int32), -1)
    first = int(jnp.argmax(m.kf_valid.astype(jnp.int32)))
    fixed = jnp.zeros(K, bool).at[first].set(True)
    if n_ba_points is None:
        n_ba_points = int(m.max_mp)

    done = 0
    while done < n_iters:
        it = min(chunk, n_iters - done)
        m = map_window_ba(m, window_ids, fixed, cam_params, bf,
                          cam_model, n_ba_points, it)
        done += it
        if should_abort is not None and should_abort():
            break
    return m
