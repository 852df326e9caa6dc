"""Benchmarks on the attached device. Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} on stdout (breakdowns on stderr).

Modes (argv[1], default `full_slam`):

  full_slam  — the headline: steady-state FULL SLAM throughput. A synthetic
               corridor sequence at the reference geometry (stereo 2x640x400,
               8 pyramid levels) first populates a map to >=100 keyframes /
               >=8k landmarks, then the tracker runs its production loop —
               extraction, stereo matching, two-stage projection tracking,
               pose LM, keyframe policy, local mapping (cull/triangulate/
               local BA) and place recognition — with the P1 frame pipeline.
               Baseline: the reference's end-to-end 90 FPS on the Lynx-R1
               DSP (BASELINE.md).
  frontend   — front-end-only device throughput (extraction + rectified
               stereo matching), the reference's DSP hot loops 1-3.

The corridor frames are cached in .bench_cache.npz after the first run
(rendering is host-side NumPy and not part of any measured interval).
"""
import json
import os
import sys
import time

import numpy as np

N_POPULATE = 115          # frames to build the >=100-KF map
N_STEADY = 112            # steady-state frames (first 16 = pipeline warmup)
N_WARM = 16
N_REPS = 3                # measurement windows (best-of)
DT = 1.0 / 15.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache.npz")


def _render_frames(n_frames):
    from orbslam3lib_tpu.io.synthetic import (CorridorWorld, StereoRig,
                                              corridor_trajectory)
    rig = StereoRig()
    world = CorridorWorld(z1=120.0)     # long corridor: no end-wall hit
    R_l, c_l, ts = corridor_trajectory(n_frames, dt=DT, speed=0.6)
    rng = np.random.default_rng(0)
    imgs = np.zeros((n_frames, 2, rig.height, rig.width), np.uint8)
    for i in range(n_frames):
        c_r = c_l[i] + R_l[i] @ np.array([rig.baseline, 0, 0], np.float32)
        imgs[i, 0] = world.render(R_l[i], c_l[i], rig, rng=rng).astype(np.uint8)
        imgs[i, 1] = world.render(R_l[i], c_r, rig, rng=rng).astype(np.uint8)
    return imgs, ts.astype(np.float64), rig


def _render_params_key():
    """Hash of everything that shapes the rendered frames; a cache rendered
    under different parameters must be invalidated (stale frames would
    silently disagree with the StereoRig handed to the tracker)."""
    import dataclasses
    import hashlib
    from orbslam3lib_tpu.io.synthetic import CorridorWorld, StereoRig
    parts = [repr(dataclasses.asdict(StereoRig())),
             repr(dataclasses.asdict(CorridorWorld(z1=120.0))),
             f"dt={DT!r} speed=0.6 seed=0"]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()


def _load_frames(n_frames):
    key = _render_params_key()
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        if (d["imgs"].shape[0] >= n_frames
                and "params_key" in d and str(d["params_key"]) == key):
            from orbslam3lib_tpu.io.synthetic import StereoRig
            return d["imgs"][:n_frames], d["ts"][:n_frames], StereoRig()
    imgs, ts, rig = _render_frames(n_frames)
    np.savez_compressed(CACHE, imgs=imgs, ts=ts, params_key=key)
    return imgs, ts, rig


def bench_full_slam():
    from orbslam3lib_tpu.config import SlamConfig
    from orbslam3lib_tpu.tracking.tracker import Tracker

    t_setup = time.time()
    imgs, ts, rig = _load_frames(N_POPULATE + N_STEADY)
    print(f"[bench] frames ready in {time.time() - t_setup:.1f}s",
          file=sys.stderr, flush=True)

    cfg = SlamConfig()
    cfg.camera.fx, cfg.camera.fy = rig.fx, rig.fy
    cfg.camera.cx, cfg.camera.cy = rig.cx, rig.cy
    cfg.camera.width, cfg.camera.height = rig.width, rig.height
    cfg.stereo.baseline = rig.baseline
    cfg.orb.max_kp = 512
    cfg.orb.n_levels = 8
    # production schedule: the reference runs 2 rounds x {1,2} LM iterations
    # per frame ("LYNX MODIFIED", Optimizer.cc:990-995)
    cfg.tracker.pose_rounds = 2
    cfg.tracker.pose_iters = 2

    # async_mapping: LocalMapping/LoopClosing run on the mapper thread
    # (the reference's thread layout, System.cc:356-438) — KF mapping work
    # leaves the tracker's critical path
    pipeline = int(os.environ.get("ORBSLAM3_TPU_PIPELINE", "16"))
    chunk = int(os.environ.get("ORBSLAM3_TPU_CHUNK", "4"))
    tracker = Tracker(cfg, sensor="stereo", enable_loop_closing=True,
                      enable_timing=True, pipeline=pipeline, chunk=chunk,
                      async_mapping=True)

    # --- populate: dense keyframing until the map is big ---
    t0 = time.time()
    kf_ratio = cfg.tracker.kf_ref_ratio
    cfg.tracker.kf_ref_ratio = 10.0       # c2 always true -> KF every c1b
    cfg.tracker.min_frames_between_kf = 1
    cfg.tracker.max_frames_between_kf = 1  # c1a every frame: KF cadence is
                                           # then throttled by the mapper-idle
                                           # /short-queue policy, not starved
    # no redundancy culling while BUILDING the map: dense populate keyframes
    # are redundant by construction, and the goal here is a big map
    cfg.mapping.kf_culling = False
    # populate runs SYNCHRONOUSLY (pipeline off): keyframe decisions happen
    # on the frame itself, so the map grows one KF per frame deterministically
    # instead of at the pipelined consumption cadence
    pipe_save = tracker.pipeline
    tracker.pipeline = 0
    n_pop = 0
    for i in range(N_POPULATE):
        tracker.process_frame(imgs[i], float(ts[i]))
        # drain the mapper so the mapper-idle keyframe policy sees an
        # empty queue and keyframes densely
        tracker.wait_mapping_idle()
        n_pop += 1
        if tracker.stats["n_kf"] >= 110:
            break
    tracker.finish()
    tracker.pipeline = pipe_save
    n_kf = int(tracker.map.n_kf)
    n_mp = int(tracker.map.n_mp)
    print(f"[bench] populate: {n_pop} frames -> {n_kf} KFs, {n_mp} MPs, "
          f"fails {tracker.stats['track_fail']} "
          f"in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    cfg.tracker.kf_ref_ratio = kf_ratio
    cfg.tracker.min_frames_between_kf = 3
    cfg.tracker.max_frames_between_kf = 15
    cfg.mapping.kf_culling = True

    # --- steady state: warm up the pipelined graphs, then measure ---
    # pre-compile the cull-enabled mapper graph (populate ran with culling
    # off; its first lazy compile must not land inside a measured window)
    import jax
    import jax.numpy as jnp
    from orbslam3lib_tpu.mapping import local_mapping as lm_ops
    warm_map = lm_ops.mapping_step(
        tracker.map, jnp.int32(tracker.last_kf_id), tracker.cam_params,
        cam_model=cfg.camera.model_id, img_w=cfg.camera.width,
        img_h=cfg.camera.height, n_levels=cfg.orb.n_levels,
        n_tri=cfg.mapping.n_tri_neighbors,
        n_fuse=cfg.mapping.n_fuse_neighbors, do_cull_kf=True)
    jax.block_until_ready(warm_map.kf_R)
    del warm_map

    base = N_POPULATE
    for i in range(N_WARM):
        tracker.process_frame(imgs[base + i],
                              float(ts[base + i]))
    tracker._drain_pipeline()
    tracker.timer.samples.clear()

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
            tracker.process_frame(imgs[base + i], float(ts[base + i]))
            i += 1
        tracker._drain_pipeline()
        dt = (time.perf_counter() - t0) / n_meas
        d_fails = tracker.stats["track_fail"] - fails_before
        n_kf_now = int(tracker.map.n_kf)
        healthy = d_fails == 0 and n_kf_now > 0
        print(f"[bench] window {rep}: {dt * 1e3:.2f} ms/frame "
              f"(fails +{d_fails}, KFs {n_kf_now}"
              f"{', UNHEALTHY - excluded' if not healthy else ''})",
              file=sys.stderr, flush=True)
        any_dt = dt if any_dt is None else min(any_dt, dt)
        worst_dt = dt if worst_dt is None else max(worst_dt, dt)
        if healthy:
            best_dt = dt if best_dt is None else min(best_dt, dt)

    degraded = best_dt is None or tracker.stats["track_fail"] > 5
    dt = best_dt if best_dt is not None else any_dt

    fps = 1.0 / dt
    n_kf_final = int(tracker.map.n_kf)
    print(f"[bench] steady state: {n_meas} frames, {dt * 1e3:.2f} ms/frame, "
          f"KFs now {n_kf_final}, fails {tracker.stats['track_fail']}, "
          f"loops {tracker.stats['n_loops']}"
          f"{' [DEGRADED: no healthy window]' if degraded else ''}",
          file=sys.stderr, flush=True)
    for k, st in sorted(tracker.timer.summary().items()):
        print(f"[bench]   {k:20s} mean {st['mean_ms']:8.2f} ms  "
              f"n={st['count']}", file=sys.stderr, flush=True)
    tracker.finish()
    out = {
        "metric": "full_slam_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 90.0, 3),
        "worst_window_ms": round(worst_dt * 1e3, 2),
        "fails": tracker.stats["track_fail"],
        "n_kf": n_kf_final,
        "n_loops": tracker.stats["n_loops"],
    }
    if degraded:
        out["degraded"] = True
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
    ownership-masking overhead. NOTE: on this host the 8 "devices" are
    virtual CPU devices SHARING the same cores, so wall-clock cannot show
    real speedup — the efficiency number isolates the *overhead* of the
    distributed formulation, which is exactly what transfers to ICI.
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
    N_ITERS, N_REPS = 10, 3
    prob, cam_params = _make_dist_problem(N_CAMS, N_PTS, OBS)
    devs = jax.devices()
    assert len(devs) >= 8, devs

    def time_once(fn):
        fn()  # compile
        best = None
        for _ in range(N_REPS):
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
    # stack dumps on demand: kill -USR1 <pid> prints every thread's Python
    # stack to stderr (hang diagnosis on the real device)
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)
    from orbslam3lib_tpu.utils.timing import Verbose
    Verbose.level = int(os.environ.get("ORBSLAM3_TPU_VERBOSE", "0"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "full_slam"
    if mode == "frontend":
        bench_frontend()
    elif mode == "full_slam":
        bench_full_slam()
    elif mode == "dist":
        bench_dist()
    else:
        raise SystemExit(f"unknown bench mode {mode!r}")


if __name__ == "__main__":
    main()
