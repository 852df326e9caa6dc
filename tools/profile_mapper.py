"""Mapper/linalg device-cost profiler (run on the real chip)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
broken into sub-stages, on a realistically occupied synthetic MapState."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.models import map_state as ms
from orbslam3lib_tpu.models.vocabulary import train_vocabulary, _descend, bow_vector
from orbslam3lib_tpu.mapping import local_mapping as lm
from orbslam3lib_tpu.mapping.loop_closing import mapper_step_fused, loop_probe
from orbslam3lib_tpu.mapping.map_ba import map_window_ba, _gather_window_problem
from orbslam3lib_tpu.mapping.local_ba import bundle_adjust

K, P, F = 256, 16384, 512
N_KF, N_MP = 130, 15000
rng = np.random.default_rng(0)

m = ms.empty_map(K, P, F)
kf_valid = np.zeros(K, bool); kf_valid[:N_KF] = True
mp_valid = np.zeros(P, bool); mp_valid[:N_MP] = True
# each KF observes ~300 of the landmarks near its index band (covisibility)
kf_mp = np.full((K, F), -1, np.int32)
kf_fv = np.zeros((K, F), bool)
for kk in range(N_KF):
    base = int(kk / N_KF * (N_MP - 600))
    ids = rng.choice(600, size=300, replace=False) + base
    kf_mp[kk, :300] = ids
    kf_fv[kk, :450] = True
m = m._replace(
    kf_valid=jnp.asarray(kf_valid),
    kf_mp=jnp.asarray(kf_mp),
    kf_feat_valid=jnp.asarray(kf_fv),
    kf_xy=jnp.asarray(rng.uniform(0, 400, (K, F, 2)).astype(np.float32)),
    kf_desc=jnp.asarray(rng.integers(0, 2, (K, F, 256)).astype(np.int8)),
    kf_ts=jnp.asarray((np.arange(K) * 0.2).astype(np.float32)),
    kf_t=jnp.asarray(rng.normal(0, 1, (K, 3)).astype(np.float32)),
    mp_pos=jnp.asarray(rng.normal(0, 3, (P, 3)).astype(np.float32) + np.array([0, 0, 8], np.float32)),
    mp_valid=jnp.asarray(mp_valid),
    mp_desc=jnp.asarray(rng.integers(0, 2, (P, 256)).astype(np.int8)),
    mp_max_dist=jnp.full(P, 100.0),
    n_kf=jnp.int32(N_KF), n_mp=jnp.int32(N_MP),
)
cam = jnp.asarray([300.0, 300.0, 320.0, 200.0], np.float32)
voc = train_vocabulary(np.asarray(m.kf_desc[:4]).reshape(-1, 256)[:2000], k=10, depth=3)
bow_db = jnp.zeros((K, voc.k ** voc.depth), jnp.float32)
active = jnp.asarray(kf_valid)
kid = jnp.int32(N_KF - 1)

def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dt:8.2f} ms")
    return dt

ck = dict(cam_model=0, img_w=640, img_h=400, n_levels=8)

# --- mapper step components ---
bow_f = jax.jit(lambda: bow_vector(_descend(voc.centroids, m.kf_desc[kid], voc.k, voc.depth), m.kf_feat_valid[kid], voc.idf, voc.k ** voc.depth))
timeit("bow descent+vector", bow_f)
timeit("mapping_step (cull/tri/fuse/kfcull)", lambda: lm.mapping_step(m, kid, cam, n_tri=10, n_fuse=3, do_cull_kf=True, **ck).kf_R)
timeit("mapping_step no kfcull", lambda: lm.mapping_step(m, kid, cam, n_tri=10, n_fuse=3, do_cull_kf=False, **ck).kf_R)
timeit("  cull_mappoints", lambda: lm.cull_mappoints(m, kid).mp_valid)
timeit("  triangulate_with_neighbors", lambda: lm.triangulate_with_neighbors(m, kid, lm.top_covisible(m, kid, 10), cam, cam_model=0, n_levels=8)[0].kf_mp)
timeit("  top_covisible", lambda: lm.top_covisible(m, kid, 10))
timeit("  fuse_into_keyframe", lambda: lm.fuse_into_keyframe(m, kid, m.mp_valid, cam, **ck)[0].kf_mp)
timeit("  cull_keyframes", lambda: lm.cull_keyframes(m, jnp.full(8, -1, jnp.int32)).kf_valid)
probe_f = jax.jit(lambda: loop_probe(m, bow_db, active, voc.centroids, voc.idf, kid, k=voc.k, depth=voc.depth, prev_cand=jnp.int32(-1)))
timeit("loop_probe", probe_f)
timeit("mapper_step_fused", lambda: mapper_step_fused(m, bow_db, active, voc.centroids, voc.idf, kid, cam, k=voc.k, depth=voc.depth, n_tri=10, n_fuse=3, do_cull_kf=True, with_probe=True, prev_cand=jnp.int32(-1))[3])

# --- window BA ---
ids, fixed = lm.covis_ba_window(m, kid, n_win=8, n_fixed=2)
jax.block_until_ready(ids)
gather_f = jax.jit(lambda: _gather_window_problem(m, ids, fixed, 30.0, 4096)[0].e_uv, static_argnums=())
timeit("BA gather only", gather_f)
for it in (10, 5):
    timeit(f"map_window_ba n_iters={it}", lambda it=it: map_window_ba(m, ids, fixed, cam, 30.0, cam_model=0, n_ba_points=4096, n_iters=it).kf_R)
timeit("covis_ba_window", lambda: lm.covis_ba_window(m, kid, n_win=8, n_fixed=2)[0])

# --- micro: where does triangulate_with_neighbors spend time? ---
from orbslam3lib_tpu.ops.matcher import hamming_matrix
from orbslam3lib_tpu.mapping.local_mapping import _tri_pair_candidates
nbrs = lm.top_covisible(m, kid, 10)
jax.block_until_ready(nbrs)

ham_f = jax.jit(lambda: jax.vmap(lambda b: hamming_matrix(m.kf_desc[kid], m.kf_desc[jnp.clip(b,0,K-1)]))(nbrs))
timeit("vmap hamming x10", ham_f)

cand_f = jax.jit(lambda: jax.vmap(lambda b: _tri_pair_candidates(m, kid, b, cam, 0, 8, 0.6, 50.0, 1.0, None)[0])(nbrs))
timeit("vmap _tri_pair_candidates x10", cand_f)

def spawn_only():
    want = jnp.zeros((10, F), bool).at[:, :50].set(True)
    p_w = jnp.zeros((10, F, 3))
    sel = jnp.argmin(jnp.where(want, 0.5, 2.0), axis=0)
    iF = jnp.arange(F)
    m2 = ms.spawn_mappoints(m, kid, p_w[sel, iF], m.kf_desc[kid], p_w[sel, iF], jnp.ones(F), jnp.ones(F), jnp.any(want, 0), iF)
    return m2.mp_pos
timeit("spawn_mappoints", jax.jit(spawn_only))
