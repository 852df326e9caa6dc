"""Benchmarks on the attached device. Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline", ...} on stdout (breakdowns on
stderr).

Modes (argv[1], default `full_slam`):

  full_slam  — the headline: steady-state FULL SLAM throughput on a scene
               WITH a revisit. The camera orbits a textured room (360 deg /
               24 s): the first 240 deg populate a >=100-KF map, the
               measured steady-state windows carry the camera through the
               revisit of its starting views, so loop detection, Sim3
               verification, the essential-graph correction and the async
               GBA all run live inside the measured interval
               (LoopClosing.cc:90-309 run continuously in the reference's
               production path too). Reports throughput, loop count,
               detection-to-correction latency, frame-trajectory ATE (drifted
               odometry, never retro-corrected) vs keyframe ATE (loop-
               corrected map) and tunnel-immune device-only timings.
               Baseline: the reference's end-to-end 90 FPS on the Lynx-R1
               DSP (BASELINE.md).
  distorted  — full_slam on radtan-distorted raw stereo input (EuRoC-like
               coefficients) driven through the on-device rectification path
               (Settings.cc:177/485); gate: ATE within ~10% of the clean
               run (sidecar .bench_last_clean.json).
  frontend   — front-end-only device throughput (extraction + rectified
               stereo matching), the reference's DSP hot loops 1-3.
  dist       — distributed-BA scaling on a virtual 8-device CPU mesh.

Frames are cached in .bench_cache_<variant>.npz after the first run
(rendering is host-side NumPy and not part of any measured interval).
"""
import json
import os
import sys
import time

import numpy as np

N_POPULATE = 240          # frames 0..240 = 240 deg of the orbit
N_STEADY = 136            # 16 warmup + 3x40 measured (through the revisit)
N_WARM = 16
N_REPS = 3                # measurement windows (best-of)
DT = 1.0 / 15.0
PERIOD = 24.0             # seconds per 360-deg revolution
ROOT = os.path.dirname(os.path.abspath(__file__))
# EuRoC-like radial-tangential distortion (cf. tests/test_rectify.py)
DIST = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0)


def _make_rig(distorted: bool):
    from orbslam3lib_tpu.io.synthetic import StereoRig
    return StereoRig(dist=DIST) if distorted else StereoRig()


def _make_world():
    from orbslam3lib_tpu.io.synthetic import CorridorWorld
    return CorridorWorld(half_w=4.0, half_h=1.5, z0=-4.0, z1=4.0,
                         back_wall=True)


def _render_frames(n_frames, distorted: bool):
    from orbslam3lib_tpu.io.synthetic import orbit_trajectory
    rig = _make_rig(distorted)
    world = _make_world()
    R_l, c_l, ts = orbit_trajectory(n_frames, dt=DT, period=PERIOD,
                                    radius=0.5)
    rng = np.random.default_rng(0)
    imgs = np.zeros((n_frames, 2, rig.height, rig.width), np.uint8)
    for i in range(n_frames):
        c_r = c_l[i] + R_l[i] @ np.array([rig.baseline, 0, 0], np.float32)
        imgs[i, 0] = world.render(R_l[i], c_l[i], rig, rng=rng).astype(np.uint8)
        imgs[i, 1] = world.render(R_l[i], c_r, rig, rng=rng).astype(np.uint8)
    return imgs, ts.astype(np.float64), rig


def _render_params_key(distorted: bool):
    """Hash of everything that shapes the rendered frames; a cache rendered
    under different parameters must be invalidated."""
    import dataclasses
    import hashlib
    parts = [repr(dataclasses.asdict(_make_rig(distorted))),
             repr(dataclasses.asdict(_make_world())),
             f"orbit dt={DT!r} period={PERIOD!r} radius=0.5 seed=0"]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()


def _load_frames(n_frames, distorted: bool = False):
    cache = os.path.join(ROOT, ".bench_cache_dist.npz" if distorted
                         else ".bench_cache.npz")
    key = _render_params_key(distorted)
    if os.path.exists(cache):
        d = np.load(cache)
        if (d["imgs"].shape[0] >= n_frames
                and "params_key" in d and str(d["params_key"]) == key):
            return d["imgs"][:n_frames], d["ts"][:n_frames], _make_rig(distorted)
    imgs, ts, rig = _render_frames(n_frames, distorted)
    np.savez_compressed(cache, imgs=imgs, ts=ts, params_key=key)
    return imgs, ts, rig


def _gt_centers(ts):
    from orbslam3lib_tpu.io.synthetic import orbit_pose_at
    _, c = orbit_pose_at(np.asarray(ts, np.float64), period=PERIOD,
                         radius=0.5)
    return c


def _device_metrics(tracker, imgs):
    """Tunnel-immune device-only timings on the LIVE (already compiled)
    executables: many queued dispatches, one block — RPC latency amortizes
    away, leaving device compute (VERDICT r4 #3). The per-process RPC await
    floor (which degrades over a long session) is measured on a trivial op
    and subtracted; it is also reported as `rpc_floor_ms` so round-over-
    round FPS deltas can be attributed to tunnel weather vs the engine."""
    import jax
    import jax.numpy as jnp
    from orbslam3lib_tpu.ops.extractor import extract_orb_stereo

    cfg = tracker.cfg
    out = {}
    # await floor: block on a trivial op (median of 5)
    tiny = jnp.zeros(8)
    jax.block_until_ready(tiny * 2)
    floors = []
    for i in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny + float(i))
        floors.append(time.perf_counter() - t0)
    floor_s = float(np.median(floors))
    out["rpc_floor_ms"] = round(floor_s * 1e3, 2)

    def timed(fn, n, per=1):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        return round(max(time.perf_counter() - t0 - floor_s, 0.0)
                     / n / per * 1e3, 3)

    img0 = jnp.asarray(np.asarray(imgs[-1]))
    ex = lambda: extract_orb_stereo(img0.astype(jnp.float32),
                                    jnp.float32(tracker.threshold.t),
                                    max_kp=cfg.orb.max_kp,
                                    n_levels=cfg.orb.n_levels,
                                    return_canvas=True)[0].xy
    out["device_extract_ms"] = timed(ex, 30)

    # the steady-state chunk executable against the live map
    from orbslam3lib_tpu.tracking.tracker import _frame_step_chunk
    C = tracker.chunk
    imgs_dev = jnp.asarray(np.stack([np.asarray(imgs[-1])] * C))
    if tracker._rect_maps is not None:
        from orbslam3lib_tpu.utils.rectify import remap_bilinear_shifts
        rect = lambda: remap_bilinear_shifts(imgs_dev.astype(jnp.float32),
                                             tracker._rect_maps,
                                             *tracker._rect_bounds)
        out["device_rectify_ms_per_frame"] = round(timed(rect, 12) / C, 3)
        imgs_dev = rect()
    cam2 = cfg.camera2 or cfg.camera
    R_lr, t_lr = cfg.stereo_extrinsics
    F = cfg.orb.max_kp
    args = dict(
        bf=float(cfg.bf), min_z=float(cfg.stereo.min_z),
        close_depth=float(cfg.stereo.depth_factor * cfg.stereo.baseline),
        r_coarse=float(cfg.tracker.match_radius_coarse),
        r_fine=float(cfg.tracker.match_radius_fine),
        cam_model=cfg.camera.model_id, img_w=cfg.camera.width,
        img_h=cfg.camera.height, n_levels=cfg.orb.n_levels,
        pose_rounds=cfg.tracker.pose_rounds,
        pose_iters=cfg.tracker.pose_iters, max_kp=F,
        fisheye=bool(cfg.stereo.fisheye),
        sad_refine=bool(cfg.stereo.sad_refine),
        local_only=bool(cfg.tracker.local_map_tracking))

    def chunk():
        carry, ys = _frame_step_chunk(
            tracker.map, jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3),
            jnp.full(F, -1, jnp.int32), jnp.zeros(F, jnp.float32),
            imgs_dev, jnp.float32(tracker.threshold.t), tracker.cam_params,
            jnp.asarray(cam2.params), jnp.asarray(R_lr), jnp.asarray(t_lr),
            ref_kf=jnp.int32(max(int(tracker.last_kf_id), 0)), **args)
        return ys[0]

    out["device_chunk_ms_per_frame"] = timed(chunk, 12, per=C)

    # per-keyframe mapper costs (the KF-cadence governor)
    leaves = jax.tree_util.tree_leaves(tracker.map)
    n_host = sum(1 for l in leaves if not isinstance(l, jax.Array))
    if n_host:
        print(f"[bench] WARNING: {n_host} host-side map leaves "
              f"(each re-uploads per dispatch)", file=sys.stderr, flush=True)
    if tracker.place_rec is not None:
        from orbslam3lib_tpu.mapping import local_mapping as lm
        from orbslam3lib_tpu.mapping.loop_closing import mapper_step_fused
        from orbslam3lib_tpu.mapping.map_ba import map_window_ba
        pr, voc = tracker.place_rec, tracker.place_rec.voc
        kid = jnp.int32(max(int(tracker.last_kf_id), 1))

        def mstep():
            return mapper_step_fused(
                tracker.map, pr.bow_db, pr.active, voc.centroids, voc.idf,
                kid, tracker.cam_params, k=voc.k, depth=voc.depth,
                cam_model=cfg.camera.model_id, img_w=cfg.camera.width,
                img_h=cfg.camera.height, n_levels=cfg.orb.n_levels,
                n_tri=cfg.mapping.n_tri_neighbors,
                n_fuse=cfg.mapping.n_fuse_neighbors, do_cull_kf=True,
                with_probe=True, th_far=tracker._th_far,
                prev_cand=jnp.int32(-1))[3]

        out["device_mapper_ms_per_kf"] = timed(mstep, 20)

        ids, fixed = lm.covis_ba_window(tracker.map, kid,
                                        n_win=cfg.ba.window_size,
                                        n_fixed=cfg.ba.n_fixed)

        def ba():
            return map_window_ba(
                tracker.map, ids, fixed, tracker.cam_params, float(cfg.bf),
                cam_model=cfg.camera.model_id,
                n_ba_points=cfg.ba.max_points, n_iters=cfg.ba.n_iters).kf_R

        out["device_local_ba_ms_per_kf"] = timed(ba, 20)
    return out


def _warm_cold_graphs(tracker):
    """Force-compile every graph a live loop closure / tracking hiccup can
    demand mid-window: the staged Sim3 verification cascade, the essential-
    graph correction, the async-GBA chunk, and the relocalization chain.
    The driver clears the persistent compile cache at round start, so
    without this the first real loop pays multi-second compiles inside a
    measured window."""
    import jax
    import jax.numpy as jnp
    from orbslam3lib_tpu.mapping.loop_closing import verify_loop_fused
    from orbslam3lib_tpu.mapping.map_ba import global_bundle_adjust_auto

    t0 = time.time()
    cfg = tracker.cfg
    m = tracker.map
    cam = tracker.cam_params
    ck = dict(cam_model=cfg.camera.model_id, img_w=cfg.camera.width,
              img_h=cfg.camera.height, n_levels=cfg.orb.n_levels)
    a, b = jnp.int32(1), jnp.int32(0)
    fix = tracker.loop_closer.fix_scale if tracker.loop_closer else True
    jax.block_until_ready(verify_loop_fused(m, a, b, cam, fix_scale=fix,
                                            **ck))
    # essential-graph correction (restore the state it mutates)
    lc = tracker.loop_closer
    if lc is not None:
        n_edges = len(lc.loop_edges)
        m2 = lc.correct(m, int(tracker.last_kf_id), 0,
                        (jnp.eye(3), jnp.zeros(3), jnp.float32(1.0)))
        jax.block_until_ready(m2.kf_R)
        del m2
        lc.loop_edges = lc.loop_edges[:n_edges]
        # async-GBA chunk program
        if lc.gba_iters > 0:
            m3 = global_bundle_adjust_auto(
                m, cam, bf=float(cfg.bf), cam_model=cfg.camera.model_id,
                n_iters=1, chunk=1, n_ba_points=min(int(m.max_mp), 4096))
            jax.block_until_ready(m3.kf_R)
            del m3
    # relocalization chain (fires on transient tracking failures)
    from orbslam3lib_tpu.models.vocabulary import bow_from_descriptors
    from orbslam3lib_tpu.tracking.reloc import (detect_reloc_candidates,
                                                relocalize_against_kf)
    from orbslam3lib_tpu.tracking.reloc import track_reference_kf
    F = cfg.orb.max_kp
    pr = tracker.place_rec
    if pr is not None:
        q = bow_from_descriptors(pr.voc, m.kf_desc[0], m.kf_feat_valid[0])
        jax.block_until_ready(detect_reloc_candidates(m, pr.bow_db,
                                                      pr.active, q))
    jax.block_until_ready(relocalize_against_kf(
        m, jnp.int32(0), m.kf_xy[0], m.kf_level[0], m.kf_desc[0],
        m.kf_feat_valid[0], m.kf_angle[0], cam, **ck))
    jax.block_until_ready(track_reference_kf(
        m, jnp.int32(0), jnp.eye(3), jnp.zeros(3), m.kf_xy[0],
        m.kf_level[0], m.kf_desc[0], m.kf_feat_valid[0], m.kf_angle[0],
        jnp.full(F, -1.0), jnp.zeros(F), cam,
        cam_model=cfg.camera.model_id, bf=float(cfg.bf),
        n_levels=cfg.orb.n_levels))
    print(f"[bench] cold-graph warmup in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)


def bench_full_slam(distorted: bool = False):
    from orbslam3lib_tpu.config import SlamConfig
    from orbslam3lib_tpu.evaluation import ate_rmse
    from orbslam3lib_tpu.tracking.tracker import Tracker

    t_setup = time.time()
    imgs, ts, rig = _load_frames(N_POPULATE + N_STEADY, distorted)
    print(f"[bench] frames ready in {time.time() - t_setup:.1f}s"
          f"{' (distorted input)' if distorted else ''}",
          file=sys.stderr, flush=True)

    cfg = SlamConfig()
    cfg.camera.fx, cfg.camera.fy = rig.fx, rig.fy
    cfg.camera.cx, cfg.camera.cy = rig.cx, rig.cy
    cfg.camera.width, cfg.camera.height = rig.width, rig.height
    cfg.stereo.baseline = rig.baseline
    if distorted:
        # raw distorted stereo -> on-device rectification (Settings.cc:485)
        cfg.camera.dist = tuple(rig.dist)
        cfg.camera2 = None
        cfg.stereo.rectify = True
    cfg.orb.max_kp = 512
    cfg.orb.n_levels = 8
    # production schedule: the reference runs 2 rounds x {1,2} LM iterations
    # per frame ("LYNX MODIFIED", Optimizer.cc:990-995)
    cfg.tracker.pose_rounds = 2
    cfg.tracker.pose_iters = 2

    # zero-copy ingest analog (the reference's rpcmem/AHardwareBuffer path,
    # LynxHardwareAccelerator.cpp:121: camera frames land in pre-registered
    # shared memory, no per-frame copy): stage every frame device-resident
    # up front. Streaming 512 KB/frame through the tunneled stdio relay at
    # 48+ FPS (~24 MB/s) would measure the relay, not the engine.
    import jax as _jax
    t0 = time.time()
    imgs_dev = [_jax.device_put(imgs[i]) for i in range(len(imgs))]
    _jax.block_until_ready(imgs_dev[-1])
    print(f"[bench] {len(imgs_dev)} frames staged on device "
          f"in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    pipeline = int(os.environ.get("ORBSLAM3_TPU_PIPELINE", "16"))
    chunk = int(os.environ.get("ORBSLAM3_TPU_CHUNK", "4"))
    tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=True,
                      enable_timing=True, pipeline=pipeline, chunk=chunk,
                      async_mapping=True)
    # async GBA after a live loop correction (mpThreadGBA analog): the
    # measured windows then absorb its FPS impact, as in production
    cfg.mapping.async_gba = True
    if tracker.loop_closer is not None:
        tracker.loop_closer.async_gba = True

    # --- populate: dense keyframing over the first 240 deg of the orbit ---
    t0 = time.time()
    kf_ratio = cfg.tracker.kf_ref_ratio
    cfg.tracker.kf_ref_ratio = 10.0       # c2 always true -> KF by c1 cadence
    cfg.tracker.min_frames_between_kf = 2  # KF every 2nd frame: ~120 KFs
    cfg.tracker.max_frames_between_kf = 2  # (headroom under max_kf=256)
    # no redundancy culling while BUILDING the map: dense populate keyframes
    # are redundant by construction, and the goal here is a big map
    cfg.mapping.kf_culling = False
    # PIPELINED populate: frames flow through the chunked fast path; the
    # mapper queue is detached so mapping runs inline at consume time
    # (mapper-idle is then always true -> exactly one KF per consumed frame,
    # deterministic) and loop probes ride the batched burst fetch. The old
    # synchronous populate paid ~15 blocking ~26 ms round trips per frame
    # (~1.5 s/frame); this path pays one batched fetch per chunk.
    queue_save, tracker._map_queue = tracker._map_queue, None
    for i in range(N_POPULATE):
        tracker.process_frame(imgs_dev[i], float(ts[i]))
    tracker.finish()
    tracker._map_queue = queue_save
    n_kf = int(tracker.map.n_kf)
    n_mp = int(tracker.map.n_mp)
    # n_mp is a high-water SLOT counter (compaction resets it, and the
    # capacity-pressure compactions land at thread-timing-dependent
    # moments); live landmark count is the comparable health number
    n_live = int(np.asarray(tracker.map.mp_valid).sum())
    print(f"[bench] populate: {N_POPULATE} frames -> {n_kf} KFs, "
          f"{n_live} live MPs ({n_mp} slots), "
          f"fails {tracker.stats['track_fail']} "
          f"in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    for k, st in sorted(tracker.timer.summary().items(),
                        key=lambda kv: -kv[1]["mean_ms"] * kv[1]["count"]):
        print(f"[bench]   populate {k:20s} mean {st['mean_ms']:8.2f} ms "
              f"n={st['count']}", file=sys.stderr, flush=True)
    cfg.tracker.kf_ref_ratio = kf_ratio
    cfg.tracker.min_frames_between_kf = 3
    cfg.tracker.max_frames_between_kf = 15
    cfg.mapping.kf_culling = True
    # reclaim the slots of populate-culled landmarks NOW: a capacity-pressure
    # compaction inside a measured window would stall it
    tracker._compact_map()

    # --- steady state: warm up the pipelined graphs, then measure ---
    # pre-compile the cull-enabled mapper graph (populate ran with culling
    # off; its first lazy compile must not land inside a measured window)
    import jax
    import jax.numpy as jnp
    if tracker.place_rec is not None:
        from orbslam3lib_tpu.mapping.loop_closing import mapper_step_fused
        pr, voc = tracker.place_rec, tracker.place_rec.voc
        warm = mapper_step_fused(
            tracker.map, pr.bow_db, pr.active, voc.centroids, voc.idf,
            jnp.int32(tracker.last_kf_id), tracker.cam_params, k=voc.k,
            depth=voc.depth, cam_model=cfg.camera.model_id,
            img_w=cfg.camera.width, img_h=cfg.camera.height,
            n_levels=cfg.orb.n_levels, n_tri=cfg.mapping.n_tri_neighbors,
            n_fuse=cfg.mapping.n_fuse_neighbors, do_cull_kf=True,
            with_probe=True, th_far=tracker._th_far,
            prev_cand=jnp.int32(-1))
        jax.block_until_ready(warm[0].kf_R)
        del warm
    _warm_cold_graphs(tracker)

    base = N_POPULATE
    for i in range(N_WARM):
        tracker.process_frame(imgs_dev[base + i], float(ts[base + i]))
    tracker._drain_pipeline()
    tracker.timer.samples.clear()

    # ATE of the odometry trajectory accumulated so far (pre-revisit)
    # measure in windows and keep the best HEALTHY one (the TPU tunnel's
    # round-trip latency/bandwidth varies run to run; best-of-N isolates
    # engine cost). Health gate: a window during which tracking failed or
    # that ends with an empty/reset map is NOT eligible — a dead tracker is
    # faster than a live one, so rewarding it would invert the metric.
    n_meas = (N_STEADY - N_WARM) // N_REPS
    best_dt = worst_dt = None
    any_dt = None
    i = N_WARM
    for rep in range(N_REPS):
        fails_before = tracker.stats["track_fail"]
        t0 = time.perf_counter()
        for _ in range(n_meas):
            tracker.process_frame(imgs_dev[base + i], float(ts[base + i]))
            i += 1
        tracker._drain_pipeline()
        dt = (time.perf_counter() - t0) / n_meas
        d_fails = tracker.stats["track_fail"] - fails_before
        n_kf_now = int(tracker.map.n_kf)
        healthy = d_fails == 0 and n_kf_now > 0
        print(f"[bench] window {rep}: {dt * 1e3:.2f} ms/frame "
              f"(fails +{d_fails}, KFs {n_kf_now}, "
              f"loops {tracker.stats['n_loops']}"
              f"{', UNHEALTHY - excluded' if not healthy else ''})",
              file=sys.stderr, flush=True)
        any_dt = dt if any_dt is None else min(any_dt, dt)
        worst_dt = dt if worst_dt is None else max(worst_dt, dt)
        if healthy:
            best_dt = dt if best_dt is None else min(best_dt, dt)

    degraded = best_dt is None or tracker.stats["track_fail"] > 5
    dt = best_dt if best_dt is not None else any_dt

    fps = 1.0 / dt
    tracker.finish()
    n_kf_final = int(tracker.map.n_kf)
    n_loops = tracker.stats["n_loops"]

    # --- accuracy: drifted odometry trajectory vs loop-corrected keyframes
    est = tracker.trajectory_centers()
    ts_traj = np.asarray([t for t, _, _ in tracker.trajectory])
    ate_traj = ate_rmse(est, _gt_centers(ts_traj), with_scale=False)
    kf_valid = np.asarray(tracker.map.kf_valid)
    kf_R = np.asarray(tracker.map.kf_R)[kf_valid]
    kf_t = np.asarray(tracker.map.kf_t)[kf_valid]
    kf_ts = np.asarray(tracker.map.kf_ts)[kf_valid] + (tracker._ts_origin or 0.0)
    kf_c = -np.einsum("kij,kj->ki", np.transpose(kf_R, (0, 2, 1)), kf_t)
    ate_kf = ate_rmse(kf_c, _gt_centers(kf_ts), with_scale=False)

    print(f"[bench] steady state: {n_meas} frames/window, "
          f"{dt * 1e3:.2f} ms/frame, KFs {n_kf_final}, "
          f"fails {tracker.stats['track_fail']}, loops {n_loops}, "
          f"ATE traj {ate_traj:.4f} m vs KF {ate_kf:.4f} m"
          f"{' [DEGRADED: no healthy window]' if degraded else ''}",
          file=sys.stderr, flush=True)
    for k, st in sorted(tracker.timer.summary().items()):
        print(f"[bench]   {k:20s} mean {st['mean_ms']:8.2f} ms  "
              f"n={st['count']}", file=sys.stderr, flush=True)

    dev = _device_metrics(tracker, imgs)
    print(f"[bench] device-only: extract {dev['device_extract_ms']} ms, "
          f"chunk step {dev['device_chunk_ms_per_frame']} ms/frame",
          file=sys.stderr, flush=True)

    out = {
        "metric": "full_slam_distorted" if distorted else "full_slam_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 90.0, 3),
        "worst_window_ms": round(worst_dt * 1e3, 2),
        "fails": tracker.stats["track_fail"],
        "n_kf": n_kf_final,
        "n_loops": n_loops,
        "ate_traj_m": round(ate_traj, 4),
        "ate_kf_m": round(ate_kf, 4),
        **dev,
    }
    if "loop_latency_ms" in tracker.stats:
        out["loop_latency_ms"] = tracker.stats["loop_latency_ms"]
    if degraded:
        out["degraded"] = True

    sidecar = os.path.join(ROOT, ".bench_last_clean.json")
    if distorted:
        # parity gate vs the last clean run (VERDICT r4 #5): ATE within ~10%
        if os.path.exists(sidecar):
            clean = json.load(open(sidecar))
            out["ate_clean_m"] = clean.get("ate_kf_m")
            if out["ate_clean_m"]:
                out["ate_ratio_vs_clean"] = round(
                    ate_kf / max(out["ate_clean_m"], 1e-9), 3)
    else:
        json.dump(out, open(sidecar, "w"))
    print(json.dumps(out))


def bench_frontend():
    import jax
    import jax.numpy as jnp
    from orbslam3lib_tpu.ops.extractor import extract_orb_stereo
    from orbslam3lib_tpu.tracking.matching import match_rectified_stereo

    @jax.jit
    def frontend(img_pair, threshold):
        feats = extract_orb_stereo(img_pair, threshold, max_kp=512, n_levels=8)
        u_r, depth = match_rectified_stereo(
            feats.xy[0], feats.level[0], feats.desc[0], feats.valid[0],
            feats.xy[1], feats.level[1], feats.desc[1], feats.valid[1],
            jnp.float32(33.0), jnp.float32(0.3), n_levels=8)
        return feats.xy, feats.valid, u_r, depth

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(2, 50, 80)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), dtype=np.float32))
    img += rng.normal(0, 8, img.shape).astype(np.float32)
    img_pair = jnp.asarray(np.clip(img, 0, 255))
    threshold = jnp.float32(17.0)

    out = frontend(img_pair, threshold)
    jax.block_until_ready(out)
    n_warm, n_iter = 5, 50
    for _ in range(n_warm):
        jax.block_until_ready(frontend(img_pair, threshold))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = frontend(img_pair, threshold)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "stereo_frontend_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 90.0, 3),
    }))


def _make_dist_problem(n_cams, n_pts, obs_per_cam, seed=0):
    import jax.numpy as jnp
    from orbslam3lib_tpu.mapping.local_ba import BAProblem
    from orbslam3lib_tpu.utils import lie
    from orbslam3lib_tpu.utils.cameras import pinhole_project

    rng = np.random.default_rng(seed)
    cam_params = jnp.asarray([300.0, 300.0, 320.0, 200.0], dtype=jnp.float32)
    pts = rng.uniform([-8, -4, 4], [8, 4, 40], size=(n_pts, 3)).astype(np.float32)
    cam_R = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    cam_t = np.stack([[0.15 * i, 0.0, 0.0] for i in range(n_cams)]).astype(np.float32)
    e_cam = np.repeat(np.arange(n_cams), obs_per_cam).astype(np.int32)
    e_pt = rng.integers(0, n_pts, size=n_cams * obs_per_cam).astype(np.int32)
    p_c = np.asarray(lie.se3_apply(jnp.asarray(cam_R[e_cam]),
                                   jnp.asarray(cam_t[e_cam]),
                                   jnp.asarray(pts[e_pt])))
    uv = np.array(pinhole_project(cam_params, jnp.asarray(p_c)))
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    prob = BAProblem(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=jnp.asarray([True, True] + [False] * (n_cams - 2)),
        cam_valid=jnp.ones(n_cams, bool),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        pt_valid=jnp.ones(n_pts, bool),
        e_cam=jnp.asarray(e_cam), e_pt=jnp.asarray(e_pt),
        e_uv=jnp.asarray(uv.astype(np.float32)),
        e_inv_sigma2=jnp.ones(len(e_cam), jnp.float32),
        e_u_right=jnp.zeros(len(e_cam), jnp.float32),
        e_stereo=jnp.zeros(len(e_cam), bool),
        e_valid=jnp.ones(len(e_cam), bool),
    )
    return prob, cam_params


def bench_dist():
    """Distributed-BA scaling on a virtual device mesh.

    Measures global-BA LM iterations/sec for the SAME problem (64 cameras,
    16k landmarks, ~200k observations — a full max_kf-scale map) at
    1, 2, 4, 8 mesh devices, plus the single-device non-sharded solver as
    the zero-overhead reference. The headline number is the 8-device
    sharding efficiency vs the non-sharded solver: what fraction of the
    ideal the psum-Schur decomposition keeps after paying its collective +
    ownership-masking overhead. NOTE: the 8 "devices" are virtual CPU
    devices SHARING the same host cores, so the number bounds the
    formulation's overhead (the ICI-transferable quantity) rather than
    measuring real multi-chip speedup. Values above 1.0 are possible and
    real: the sharded program runs 8 independent per-shard pipelines
    across the cores, while the monolithic solver serializes on its
    factorization and big scatter ops.
    """
    if os.environ.get("JAX_PLATFORMS") != "cpu" or \
            "host_platform_device_count=8" not in os.environ.get("XLA_FLAGS", ""):
        # multi-device CPU mesh requires env set before backend init: re-exec
        import subprocess
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        os.execve(sys.executable, [sys.executable, __file__, "dist"], env)

    import jax
    # this container's sitecustomize pins the axon TPU plugin regardless of
    # env; switch to the virtual-CPU mesh the way tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from orbslam3lib_tpu.mapping.local_ba import bundle_adjust
    from orbslam3lib_tpu.parallel.dist_ba import (dist_bundle_adjust,
                                                  partition_problem)

    N_CAMS, N_PTS, OBS = 64, 16384, 3072
    N_ITERS, N_REPS_D = 10, 3
    prob, cam_params = _make_dist_problem(N_CAMS, N_PTS, OBS)
    devs = jax.devices()
    assert len(devs) >= 8, devs

    def time_once(fn):
        fn()  # compile
        best = None
        for _ in range(N_REPS_D):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return N_ITERS / best          # LM iters/sec

    # non-sharded reference solver
    ref_ips = time_once(lambda: bundle_adjust(
        prob, cam_params, cam_model=0, bf=0.0, n_iters=N_ITERS)[:3])
    print(f"[bench] single-device bundle_adjust: {ref_ips:7.2f} iters/s",
          file=sys.stderr, flush=True)

    results = {}
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(devs[:n]), ("mp",))
        probd = partition_problem(prob, n)
        ips = time_once(lambda: dist_bundle_adjust(
            probd, cam_params, mesh, cam_model=0, bf=0.0,
            n_iters=N_ITERS)[:3])
        results[n] = ips
        print(f"[bench] dist BA {n} device(s): {ips:7.2f} iters/s "
              f"({ips / ref_ips:5.2f}x of non-sharded)",
              file=sys.stderr, flush=True)

    eff = results[8] / ref_ips
    print(f"[bench] 8-way sharding efficiency vs non-sharded solver: "
          f"{eff:.2f} (virtual devices share host cores: this bounds "
          f"collective+masking overhead, the ICI-transferable quantity)",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "dist_ba_8dev_efficiency",
        "value": round(eff, 3),
        "unit": "fraction_of_nonsharded_throughput",
        "vs_baseline": round(eff / 0.70, 3),
    }))


def main():
    import faulthandler
    faulthandler.dump_traceback_later(3600, exit=False)
    from orbslam3lib_tpu.utils.timing import Verbose
    Verbose.level = int(os.environ.get("ORBSLAM3_TPU_VERBOSE", "0"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "full_slam"
    if mode == "frontend":
        bench_frontend()
    elif mode == "full_slam":
        bench_full_slam()
    elif mode == "distorted":
        bench_full_slam(distorted=True)
    elif mode == "dist":
        bench_dist()
    else:
        raise SystemExit(f"unknown bench mode {mode!r}")


if __name__ == "__main__":
    main()
