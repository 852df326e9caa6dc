"""Stereo tracker: per-frame front end + keyframing + synchronous local
mapping, orchestrated on the host with all math in a few jitted graphs.

TPU-native re-design of the reference's Tracking state machine
(/root/reference app/src/main/cpp/src/Tracking.cc:1847-2388 Track();
TrackWithMotionModel:2912; TrackLocalMap:3007; NeedNewKeyFrame:3125;
CreateNewKeyFrame:3277; StereoInitialization:2391) and of LocalMapping's
synchronous core (LocalMapping.cc:64-288). Mapping of concepts:

  reference                      ->  here
  ------------------------------------------------------------------
  motion-model projection search ->  stage-1 search_by_projection (r=7)
  TrackLocalMap                  ->  stage-2 search (r=3) + pose LM
  g2o PoseOptimization           ->  tracking/pose_opt.py (one jit)
  covisibility local-BA window   ->  temporal+covisible KF window gathered
                                     into a fixed-shape BAProblem
  MapPoint culling statistics    ->  mp_found / mp_visible array updates

The per-frame device work is three jitted calls (extract, track, [keyframe +
BA when a KF is spawned]); everything else is scalar host bookkeeping.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..mapping.local_ba import BAProblem, bundle_adjust
from ..models import map_state as ms
from ..ops.extractor import Features, ThresholdController, extract_orb_stereo
from ..ops.pyramid import scale_factors
from ..tracking import matching
from ..tracking.pose_opt import PoseObs, pose_optimization
from ..utils import cameras, lie

# Tracking states (Tracking.h eTrackingState)
NOT_INITIALIZED = 0
OK = 1
RECENTLY_LOST = 2
LOST = 3


def _inv_sigma2(level, n_levels):
    sf = jnp.asarray(scale_factors(n_levels))
    s = sf[jnp.clip(level, 0, n_levels - 1)]
    return 1.0 / (s * s)


@partial(jax.jit, static_argnames=("bf", "r_coarse", "r_fine", "cam_model",
                                   "img_w", "img_h", "n_levels",
                                   "pose_rounds", "pose_iters"))
def _track_two_stage(m: ms.MapState, R0, t0, feat_xy, feat_level, feat_desc,
                     feat_valid, u_right, depth, cam_params, bf: float,
                     r_coarse: float, r_fine: float,
                     cam_model: int, img_w: int, img_h: int,
                     n_levels: int, pose_rounds: int, pose_iters: int):
    """Two-stage projection search + pose optimization against the map.

    Returns (R, t, mp_feat (P,), inlier_per_mp (P,), n_inliers, visible)."""

    def one_stage(R, t, radius, rounds, iters):
        pm = matching.search_by_projection(
            m.mp_pos, m.mp_desc, m.mp_valid, m.mp_normal, m.mp_min_dist,
            m.mp_max_dist, R, t, cam_params, feat_xy, feat_level, feat_desc,
            feat_valid, radius, cam_model=cam_model, img_w=img_w, img_h=img_h,
            n_levels=n_levels)
        f = jnp.clip(pm.mp_feat, 0, feat_xy.shape[0] - 1)
        matched = pm.mp_feat >= 0
        d = depth[f]
        obs = PoseObs(
            p_world=m.mp_pos,
            uv=feat_xy[f],
            inv_sigma2=_inv_sigma2(feat_level[f], n_levels),
            u_right=jnp.where(d > 0, u_right[f], 0.0),
            is_stereo=matched & (d > 0),
            valid=matched,
        )
        R2, t2, inl, n_inl = pose_optimization(
            R, t, obs, cam_params, cam_model=cam_model, bf=bf,
            n_rounds=rounds, iters_per_round=iters)
        return R2, t2, pm, inl, n_inl

    R1, t1, _, _, _ = one_stage(R0, t0, r_coarse, pose_rounds, pose_iters)
    R2, t2, pm, inl, n_inl = one_stage(R1, t1, r_fine, pose_rounds, pose_iters)
    mp_feat = jnp.where(inl, pm.mp_feat, -1)
    return R2, t2, mp_feat, inl, jnp.sum((mp_feat >= 0).astype(jnp.int32)), pm.visible


@jax.jit
def _update_mp_stats(m: ms.MapState, visible, found):
    """found/visible ratio bookkeeping (MapPoint::IncreaseVisible/Found)."""
    return m._replace(
        mp_visible=m.mp_visible + visible.astype(jnp.float32),
        mp_found=m.mp_found + found.astype(jnp.float32),
    )


@partial(jax.jit, static_argnames=("cam_model", "n_levels"))
def _insert_kf_and_spawn(m: ms.MapState, R, t, ts, feat_xy, feat_level,
                         feat_desc, feat_valid, u_right, depth, mp_feat,
                         cam_params, close_depth, cam_model: int,
                         n_levels: int):
    """Insert a keyframe; bind tracked landmarks; spawn new close-stereo
    landmarks for unmatched features (CreateNewKeyFrame, Tracking.cc:3277)."""
    F = feat_xy.shape[0]
    # invert mp_feat (P,) -> per-feature landmark assoc (F,); unmatched
    # landmarks scatter to the out-of-bounds slot F and are dropped
    pidx = jnp.arange(m.max_mp, dtype=jnp.int32)
    tgt = jnp.where(mp_feat >= 0, mp_feat, F)
    assoc = jnp.full(F, -1, jnp.int32).at[tgt].set(pidx, mode="drop")

    m2, kf_id = ms.insert_keyframe(m, R, t, ts, feat_xy, feat_level, feat_desc,
                                   feat_valid, assoc, depth)

    # spawn stereo points for unmatched features: all closer than the
    # close-depth threshold, topped up with the nearest 100 beyond it
    # (CreateNewKeyFrame sorts by depth and keeps >=100, Tracking.cc:3277+)
    cand = feat_valid & (assoc < 0) & (depth > 0.05)
    d_sort = jnp.where(cand, depth, jnp.inf)
    nearest = jax.lax.top_k(-d_sort, min(100, F))[0]
    d100 = -nearest[-1]  # depth of the 100th-nearest candidate
    want = cand & ((depth < close_depth) | (depth <= d100))
    ray = cameras.unproject(cam_model, cam_params, feat_xy)      # z=1 rays
    p_cam = ray * depth[:, None]
    Rwc, c_w = lie.se3_inverse(R, t)
    p_w = lie.se3_apply(Rwc, c_w, p_cam)
    dist = jnp.linalg.norm(p_cam, axis=-1)
    normal = (p_w - c_w) / jnp.maximum(dist[:, None], 1e-9)
    sf = jnp.asarray(scale_factors(n_levels))
    lvl_s = sf[jnp.clip(feat_level, 0, n_levels - 1)]
    max_dist = dist * lvl_s
    min_dist = max_dist / sf[n_levels - 1]
    m3 = ms.spawn_mappoints(m2, kf_id, p_w, feat_desc, normal, min_dist,
                            max_dist, want, jnp.arange(F))
    return m3, kf_id


@partial(jax.jit, static_argnames=("cam_model", "n_ba_points", "n_iters"))
def _local_ba(m: ms.MapState, window_ids, fixed_mask, cam_params, bf,
              cam_model: int, n_ba_points: int, n_iters: int):
    """Gather a fixed-shape local BA problem from the map, solve, scatter back.

    window_ids (C,) int32 (-1 = empty slot), fixed_mask (C,) bool.
    Reference: LocalBundleAdjustment (Optimizer.cc:1124) — window KFs
    optimizable, anchors fixed, all their landmarks optimizable.
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
        e_uv=e_uv, e_inv_sigma2=_inv_sigma2(e_level, 8),
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


class StereoTracker:
    """Host-side orchestration of the full stereo SLAM loop."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        mc = cfg.map
        self.map = ms.empty_map(mc.max_kf, mc.max_mp, cfg.orb.max_kp)
        self.threshold = ThresholdController(
            target=cfg.orb.target_features, band=cfg.orb.threshold_band,
            t0=cfg.orb.fast_threshold)
        self.state = NOT_INITIALIZED
        self.pose: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None  # Tcw
        self.vel: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self.frame_id = 0
        self.last_kf_frame = -999
        self.last_kf_id = -1
        self.ref_kf_matches = 0
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.n_inliers_last = 0
        self.cam_params = jnp.asarray(cfg.camera.params)
        self.stats = {"n_kf": 0, "n_frames": 0, "track_fail": 0}

    # -- per-frame entry ----------------------------------------------------
    def process_frame(self, img_pair: np.ndarray, ts: float) -> dict:
        cfg = self.cfg
        feats = extract_orb_stereo(
            jnp.asarray(img_pair), jnp.float32(self.threshold.t),
            max_kp=cfg.orb.max_kp, n_levels=cfg.orb.n_levels)
        u_r, depth = matching.match_rectified_stereo(
            feats.xy[0], feats.level[0], feats.desc[0], feats.valid[0],
            feats.xy[1], feats.level[1], feats.desc[1], feats.valid[1],
            float(cfg.bf), float(cfg.stereo.min_z),
            n_levels=cfg.orb.n_levels)
        n_feat = int(feats.n_valid[0])
        self.threshold.update(n_feat)

        if self.state == NOT_INITIALIZED:
            out = self._initialize(feats, u_r, depth, ts, n_feat)
        else:
            out = self._track(feats, u_r, depth, ts, n_feat)

        self.frame_id += 1
        self.stats["n_frames"] += 1
        if self.pose is not None:
            R, t = self.pose
            self.trajectory.append((ts, np.array(R), np.array(t)))
        return out

    # -- initialization (StereoInitialization, Tracking.cc:2391) ------------
    def _initialize(self, feats: Features, u_r, depth, ts, n_feat) -> dict:
        cfg = self.cfg
        if n_feat < cfg.tracker.min_init_features:
            return {"state": self.state, "n_inliers": 0}
        R = jnp.eye(3, dtype=jnp.float32)
        t = jnp.zeros(3, dtype=jnp.float32)
        mp_feat0 = jnp.full(self.map.max_mp, -1, jnp.int32)
        # at initialization every positive-depth feature becomes a landmark
        # (StereoInitialization, Tracking.cc:2391: all z>0 points)
        self.map, kf_id = _insert_kf_and_spawn(
            self.map, R, t, jnp.float32(ts), feats.xy[0], feats.level[0],
            feats.desc[0], feats.valid[0], u_r, depth, mp_feat0,
            self.cam_params, jnp.float32(1e9),
            cam_model=cfg.camera.model_id, n_levels=cfg.orb.n_levels)
        self.pose = (R, t)
        self.vel = (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, dtype=jnp.float32))
        self.state = OK
        self.last_kf_frame = self.frame_id
        self.last_kf_id = int(kf_id)
        n_mp = int(self.map.n_mp)
        self.ref_kf_matches = n_mp
        self.stats["n_kf"] += 1
        return {"state": OK, "n_inliers": n_mp, "init": True}

    # -- per-frame tracking -------------------------------------------------
    def _track(self, feats: Features, u_r, depth, ts, n_feat) -> dict:
        cfg = self.cfg
        R_last, t_last = self.pose
        Rv, tv = self.vel
        R0, t0 = lie.se3_compose(Rv, tv, R_last, t_last)

        R, t, mp_feat, inl, n_inl, visible = _track_two_stage(
            self.map, R0, t0, feats.xy[0], feats.level[0], feats.desc[0],
            feats.valid[0], u_r, depth, self.cam_params, float(cfg.bf),
            float(cfg.tracker.match_radius_coarse),
            float(cfg.tracker.match_radius_fine),
            cam_model=cfg.camera.model_id, img_w=cfg.camera.width,
            img_h=cfg.camera.height, n_levels=cfg.orb.n_levels,
            pose_rounds=cfg.tracker.pose_rounds,
            pose_iters=cfg.tracker.pose_iters)
        n_inliers = int(n_inl)
        self.map = _update_mp_stats(self.map, visible, mp_feat >= 0)

        if n_inliers < cfg.tracker.min_inliers:
            # tracking failure: keep the prediction, flag state
            self.stats["track_fail"] += 1
            self.state = RECENTLY_LOST
            self.pose = (R0, t0)
            return {"state": self.state, "n_inliers": n_inliers}

        self.state = OK
        # velocity model update (Tcw_cur * Twc_last)
        Ri, ti = lie.se3_inverse(R_last, t_last)
        self.vel = lie.se3_compose(R, t, Ri, ti)
        self.pose = (R, t)
        self.n_inliers_last = n_inliers

        made_kf = False
        if self._need_new_keyframe(n_inliers, feats, mp_feat, depth):
            self._create_keyframe(feats, u_r, depth, mp_feat, ts, n_inliers)
            made_kf = True
        return {"state": OK, "n_inliers": n_inliers, "kf": made_kf}

    # -- keyframe policy (NeedNewKeyFrame, Tracking.cc:3125) ----------------
    def _need_new_keyframe(self, n_inliers, feats: Features, mp_feat, depth) -> bool:
        cfg = self.cfg
        if int(self.map.n_kf) >= self.map.max_kf - 1:
            return False
        frames_since = self.frame_id - self.last_kf_frame
        close_th = cfg.stereo.depth_factor * cfg.stereo.baseline
        # close-point pressure (c1c): tracked/untracked close features
        f_of_mp = np.asarray(mp_feat)
        tracked_slots = np.unique(f_of_mp[f_of_mp >= 0])
        d = np.asarray(depth)
        valid = np.asarray(feats.valid[0])
        close = valid & (d > 0.05) & (d < close_th)
        tracked_mask = np.zeros_like(valid)
        tracked_mask[tracked_slots] = True
        n_close_tracked = int((close & tracked_mask).sum())
        n_close_untracked = int((close & ~tracked_mask).sum())

        # decision ((c1a|c1b|c1c)&c2) per Tracking.cc:3269 (c1b's "mapper
        # idle" becomes a min-frame spacing since our mapper is synchronous)
        c1a = frames_since >= cfg.tracker.max_frames_between_kf
        c1b = frames_since >= max(cfg.tracker.min_frames_between_kf, 1)
        c1c = (n_close_tracked < cfg.tracker.close_tracked_th
               and n_close_untracked > cfg.tracker.close_untracked_th)
        c2 = (n_inliers < cfg.tracker.kf_ref_ratio * max(self.ref_kf_matches, 1)
              and n_inliers > 15)
        return bool(((c1a or c1b or c1c) and c2) or (c1c and c1b))

    # -- keyframe creation + local BA ---------------------------------------
    def _create_keyframe(self, feats: Features, u_r, depth, mp_feat, ts,
                         n_inliers):
        cfg = self.cfg
        R, t = self.pose
        close_depth = jnp.float32(cfg.stereo.depth_factor * cfg.stereo.baseline)
        self.map, kf_id = _insert_kf_and_spawn(
            self.map, R, t, jnp.float32(ts), feats.xy[0], feats.level[0],
            feats.desc[0], feats.valid[0], u_r, depth, mp_feat,
            self.cam_params, close_depth, cam_model=cfg.camera.model_id,
            n_levels=cfg.orb.n_levels)
        self.last_kf_frame = self.frame_id
        self.last_kf_id = int(kf_id)
        self.ref_kf_matches = max(n_inliers, 1)
        self.stats["n_kf"] += 1

        # local-mapping pipeline (LocalMapping::Run order, LocalMapping.cc:64):
        # cull young landmarks -> triangulate with covisible neighbors ->
        # fuse duplicates -> local BA -> cull redundant keyframes
        from ..mapping import local_mapping as lm
        kid = int(kf_id)
        self.map = lm.cull_mappoints(self.map, jnp.int32(kid))
        for nb in range(max(0, kid - 2), kid):
            self.map, n_new = lm.triangulate_pair(
                self.map, jnp.int32(kid), jnp.int32(nb), self.cam_params,
                cam_model=cfg.camera.model_id, n_levels=cfg.orb.n_levels)

        # synchronous local BA over the trailing window
        n_kf = int(self.map.n_kf)
        C = cfg.ba.window_size + cfg.ba.n_fixed
        ids = np.full(C, -1, np.int32)
        fixed = np.zeros(C, bool)
        lo = max(0, n_kf - cfg.ba.window_size)
        win = list(range(lo, n_kf))
        anchors = list(range(max(0, lo - cfg.ba.n_fixed), lo)) or [0]
        sel = anchors + win
        ids[:len(sel)] = sel
        fixed[:len(anchors)] = True
        if len(win) >= 2:
            self.map = _local_ba(
                self.map, jnp.asarray(ids), jnp.asarray(fixed),
                self.cam_params, jnp.float32(cfg.bf),
                cam_model=cfg.camera.model_id,
                n_ba_points=cfg.ba.max_points, n_iters=cfg.ba.n_iters)
            # refresh the tracker pose to the BA-refined latest KF pose
            self.pose = (self.map.kf_R[kf_id], self.map.kf_t[kf_id])

    # -- outputs ------------------------------------------------------------
    def trajectory_centers(self) -> np.ndarray:
        out = []
        for ts, R, t in self.trajectory:
            out.append(-R.T @ t)
        return np.stack(out) if out else np.zeros((0, 3))
