"""Mapper/linalg device-cost profiler (run on the real chip)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.models import map_state as ms
from orbslam3lib_tpu.utils import lie, cameras
from orbslam3lib_tpu.ops.pyramid import scale_factors
from orbslam3lib_tpu.ops.masks import BIG, penalize, step01, leq_int, is_finite_match
from orbslam3lib_tpu.ops.matcher import hamming_matrix

K, P, F = 256, 16384, 512
rng = np.random.default_rng(0)
m = ms.empty_map(K, P, F)
m = m._replace(
    kf_valid=jnp.ones(K, bool),
    kf_xy=jnp.asarray(rng.uniform(0, 400, (K, F, 2)).astype(np.float32)),
    kf_desc=jnp.asarray(rng.integers(0, 2, (K, F, 256)).astype(np.int8)),
    kf_feat_valid=jnp.ones((K, F), bool),
    kf_t=jnp.asarray(rng.normal(0, 1, (K, 3)).astype(np.float32)),
    kf_angle=jnp.asarray(rng.uniform(0, 6.28, (K, F)).astype(np.float32)),
)
cam = jnp.asarray([300.0, 300.0, 320.0, 200.0], np.float32)
kid = jnp.int32(129)
nbrs = jnp.arange(10, dtype=jnp.int32) + 100
n_levels = 8
cam_model = 0

def timeit(name, fn, n=30):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms")

def stage(kf_a, kf_b, upto):
    a = jnp.clip(kf_a, 0, K - 1)
    b = jnp.clip(kf_b, 0, K - 1)
    Ra, ta = m.kf_R[a], m.kf_t[a]
    Rb, tb = m.kf_R[b], m.kf_t[b]
    free_a = m.kf_feat_valid[a] & (m.kf_mp[a] < 0)
    free_b = m.kf_feat_valid[b] & (m.kf_mp[b] < 0)
    Rab = Ra @ Rb.T
    tab = ta - Rab @ tb
    E = lie.hat(tab) @ Rab
    ray_a = cameras.unproject(cam_model, cam, m.kf_xy[a])
    ray_b = cameras.unproject(cam_model, cam, m.kf_xy[b])
    l_b = ray_a @ E
    num = jnp.abs(jnp.einsum("ac,bc->ab", l_b, ray_b))
    den = jnp.sqrt(l_b[:, 0:1] ** 2 + l_b[:, 1:2] ** 2 + 1e-12)
    epi_px = (num / den) * cam[0]
    sf = jnp.asarray(scale_factors(n_levels))
    sig_b = sf[jnp.clip(m.kf_level[b], 0, n_levels - 1)]
    g_epi = step01(3.84 * 1.0 * sig_b[None, :] - epi_px + 0.5)
    if upto == 1:
        return g_epi
    d = hamming_matrix(m.kf_desc[a], m.kf_desc[b])
    g = g_epi * leq_int(d, 50.0)
    g = g * free_a.astype(jnp.float32)[:, None] * free_b.astype(jnp.float32)[None, :]
    dm = penalize(d, g)
    best = jnp.argmin(dm, axis=1)
    d1 = jnp.min(dm, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dm.shape, 1)
    not_best = step01(jnp.abs(cols - best[:, None]).astype(jnp.float32))
    d2 = jnp.min(dm + (1.0 - not_best) * BIG, axis=1)
    has = is_finite_match(d1) * step01((0.6 * d2 - d1) + 0.5)
    if upto == 2:
        return has
    rb_sel = ray_b[best]
    p_a, cosp, z1, z2 = cameras.triangulate_two_view(
        ray_a, rb_sel, jnp.broadcast_to(Rab, (F, 3, 3)),
        jnp.broadcast_to(tab, (F, 3)))
    if upto == 3:
        return p_a
    uv_a = cameras.project(cam_model, cam, p_a)
    p_b = jnp.einsum("ij,fj->fi", Rab.T, p_a - tab)
    uv_b = cameras.project(cam_model, cam, p_b)
    err_a = jnp.sum((uv_a - m.kf_xy[a]) ** 2, axis=-1)
    err_b = jnp.sum((uv_b - m.kf_xy[b][best]) ** 2, axis=-1)
    sig_a = sf[jnp.clip(m.kf_level[a], 0, n_levels - 1)]
    ok = has
    ok = ok * step01((0.9998 - cosp) * 1e5)
    ok = ok * step01((z1 - 0.05) * 20.0) * step01((z2 - 0.05) * 20.0)
    ok = ok * step01(5.991 * sig_a ** 2 - err_a + 0.5)
    ok = ok * step01(5.991 * (sig_a[best] ** 2) - err_b + 0.5)
    ok = ok * step01(jnp.linalg.norm(tab) * 1e3)
    Rwa, ca = lie.se3_inverse(Ra, ta)
    p_w = lie.se3_apply(Rwa, ca, p_a)
    Rwb_, cb = lie.se3_inverse(Rb, tb)
    dist_a = jnp.linalg.norm(p_w - ca, axis=-1)
    dist_b = jnp.linalg.norm(p_w - cb, axis=-1)
    ratio_d = dist_a / jnp.maximum(dist_b, 1e-6)
    ratio_o = sig_a / jnp.maximum(sig_b[best], 1e-6)
    ok = ok * step01((ratio_d - ratio_o / 1.5) * 8.0)
    ok = ok * step01((ratio_o * 1.5 - ratio_d) * 8.0)
    ok = ok * step01(kf_b.astype(jnp.float32) + 1.0) \
            * step01(jnp.abs(kf_a - kf_b).astype(jnp.float32)) \
            * m.kf_valid[b].astype(jnp.float32)
    if upto == 4:
        return ok
    from orbslam3lib_tpu.tracking.matching import rotation_consistency
    want = rotation_consistency(m.kf_angle[a], m.kf_angle[b][best], ok > 0.5)
    return want

for upto in (1, 2, 3, 4, 5):
    f = jax.jit(lambda upto=upto: jax.vmap(lambda b: stage(kid, b, upto))(nbrs))
    timeit(f"vmap stage upto={upto}", f)
