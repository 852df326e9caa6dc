"""Per-stage TPU timing of the frame hot path (run on the real chip).

Times, with queued dispatch (>=30 launches, one block_until_ready):
  * extract_orb_stereo (the full fused extraction graph)
  * pyramid / FAST / orient+BRIEF in isolation
  * rectified stereo matching
  * the full _frame_step_chunk executable at chunk=4 against a full-capacity
    map (the steady-state pipelined cost per frame)

Usage: python tools/profile_tpu.py [n_iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(label, fn, *args, n=30, per=1):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n / per * 1e3
    print(f"{label:36s} {dt:8.2f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(2, 50, 80)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), dtype=np.float32))
    img += rng.normal(0, 8, img.shape).astype(np.float32)
    img_pair = jnp.asarray(np.clip(img, 0, 255))
    th = jnp.float32(17.0)

    from orbslam3lib_tpu.ops.extractor import extract_orb_stereo
    from orbslam3lib_tpu.ops.pyramid import build_pyramid
    from orbslam3lib_tpu.tracking.matching import match_rectified_stereo

    ex = jax.jit(lambda im, t: extract_orb_stereo(im, t, max_kp=512,
                                                  n_levels=8))
    timed("extract_orb_stereo (2 eyes)", ex, img_pair, th, n=n)

    pyr = jax.jit(lambda im: build_pyramid(im, n_levels=8))
    timed("build_pyramid (2 eyes)", pyr, img_pair, n=n)

    feats = ex(img_pair, th)
    jax.block_until_ready(feats.xy)

    ms_fn = jax.jit(lambda f: match_rectified_stereo(
        f.xy[0], f.level[0], f.desc[0], f.valid[0],
        f.xy[1], f.level[1], f.desc[1], f.valid[1],
        jnp.float32(33.0), jnp.float32(0.3), n_levels=8))
    timed("match_rectified_stereo", ms_fn, feats, n=n)

    # full-capacity synthetic map + the chunk executable
    from orbslam3lib_tpu.config import SlamConfig
    from orbslam3lib_tpu.models import map_state as msm
    from orbslam3lib_tpu.tracking.tracker import _frame_step_chunk, _two_stage_core
    import functools

    cfg = SlamConfig()
    P, K, F = cfg.map.max_mp, cfg.map.max_kf, cfg.orb.max_kp
    m = msm.empty_map(K, P, F)
    pos = rng.uniform([-5, -3, 1], [5, 3, 60], size=(P, 3)).astype(np.float32)
    dist = np.linalg.norm(pos, axis=1)
    m = m._replace(
        mp_pos=jnp.asarray(pos),
        mp_valid=jnp.ones(P, bool),
        mp_desc=jnp.asarray(rng.integers(0, 2, size=(P, 256)).astype(np.int8)),
        mp_normal=jnp.asarray((pos / dist[:, None]).astype(np.float32)),
        mp_min_dist=jnp.asarray((dist * 0.5).astype(np.float32)),
        mp_max_dist=jnp.asarray((dist * 2.0).astype(np.float32)),
        n_mp=jnp.int32(P),
    )
    R = jnp.eye(3)
    t = jnp.zeros(3)
    prev_mp = jnp.full(F, -1, jnp.int32)
    prev_ang = jnp.zeros(F, jnp.float32)
    cam = jnp.asarray(cfg.camera.params)
    C = 4
    imgs = jnp.asarray(np.stack([np.clip(img, 0, 255)] * C))

    step = functools.partial(
        _frame_step_chunk, bf=float(cfg.bf), min_z=float(cfg.stereo.min_z),
        close_depth=float(cfg.stereo.depth_factor * cfg.stereo.baseline),
        r_coarse=7.0, r_fine=3.0, cam_model=0, img_w=640, img_h=400,
        n_levels=8, pose_rounds=2, pose_iters=2, max_kp=F,
        fisheye=False, sad_refine=True)

    def run_chunk(mm, im):
        carry, ys = step(mm, R, t, R, jnp.zeros(3), prev_mp, prev_ang,
                         im, th, cam, cam, jnp.eye(3),
                         jnp.asarray([0.11, 0, 0], jnp.float32))
        return ys[0]

    timed(f"_frame_step_chunk C={C} (per frame)", run_chunk, m, imgs,
          n=max(n // 3, 5), per=C)

    # two-stage tracking alone (the per-frame matching+LM graph)
    ts_fn = jax.jit(functools.partial(
        _two_stage_core, bf=float(cfg.bf), r_coarse=7.0, r_fine=3.0,
        cam_model=0, img_w=640, img_h=400, n_levels=8, pose_rounds=2,
        pose_iters=2))

    def run_track(mm, f):
        return ts_fn(mm, R, t, f.xy[0], f.level[0], f.desc[0], f.valid[0],
                     jnp.full(F, -1.0), jnp.zeros(F), cam)[1]

    timed("two-stage track + pose LM", run_track, m, feats, n=n)


if __name__ == "__main__":
    main()
