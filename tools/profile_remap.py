"""Compare stereo depth production under exact vs two-pass remap."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.io.synthetic import StereoRig, CorridorWorld, orbit_trajectory
from orbslam3lib_tpu.utils.rectify import (stereo_rectify, remap_bilinear,
                                           remap_bilinear_shifts, remap_bounds,
                                           twopass_maps)
from orbslam3lib_tpu.ops.extractor import extract_orb_stereo
from orbslam3lib_tpu.tracking.matching import match_rectified_stereo

DIST = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0)
rig = StereoRig(dist=DIST)
world = CorridorWorld(half_w=4.0, half_h=1.5, z0=-4.0, z1=4.0, back_wall=True)
R_l, c_l, ts = orbit_trajectory(4, dt=1/15.0, period=24.0, radius=0.5)
rng = np.random.default_rng(0)
i = 2
c_r = c_l[i] + R_l[i] @ np.array([rig.baseline, 0, 0], np.float32)
img = np.stack([world.render(R_l[i], c_l[i], rig, rng=rng),
                world.render(R_l[i], c_r, rig, rng=rng)]).astype(np.float32)

params = np.array([rig.fx, rig.fy, rig.cx, rig.cy, *rig.dist], np.float32)
R_lr = np.eye(3, dtype=np.float32)
t_lr = np.array([rig.baseline, 0, 0], np.float32)
rr = stereo_rectify(params, params, 1, 1, R_lr, t_lr, rig.width, rig.height)
mp2 = twopass_maps(rr.maps)
b = remap_bounds(mp2)
fxn = float(rr.new_params[0])

exact = remap_bilinear(jnp.asarray(img), jnp.asarray(rr.maps))
fast = remap_bilinear_shifts(jnp.asarray(img), jnp.asarray(mp2), *b)
d = np.abs(np.asarray(exact) - np.asarray(fast))
print("img diff: mean", d.mean(), "q99", np.quantile(d, 0.99), "max", d.max())

for name, im in (("exact", exact), ("fast", fast)):
    feats = extract_orb_stereo(im, jnp.float32(17.0), max_kp=512, n_levels=8)
    u_r, depth = match_rectified_stereo(
        feats.xy[0], feats.level[0], feats.desc[0], feats.valid[0],
        feats.xy[1], feats.level[1], feats.desc[1], feats.valid[1],
        float(fxn * rr.baseline), float(0.3), n_levels=8)
    nv = int(jnp.sum(feats.valid[0]))
    nd = int(jnp.sum(depth > 0))
    close = int(jnp.sum((depth > 0) & (depth < 40 * rr.baseline)))
    print(f"{name}: feats {nv}, with depth {nd}, close {close}")

# --- with SAD refinement (the actual chunk path) ---
from orbslam3lib_tpu.tracking.matching import refine_stereo_sad
for name, im in (("exact", exact), ("fast", fast)):
    feats, canvas = extract_orb_stereo(im, jnp.float32(17.0), max_kp=512,
                                       n_levels=8, return_canvas=True)
    u_r, depth = match_rectified_stereo(
        feats.xy[0], feats.level[0], feats.desc[0], feats.valid[0],
        feats.xy[1], feats.level[1], feats.desc[1], feats.valid[1],
        float(fxn * rr.baseline), float(0.3), n_levels=8)
    u_r2, depth2 = refine_stereo_sad(canvas[0], canvas[1], feats.xy[0],
                                     feats.level[0], feats.valid[0], u_r,
                                     depth, float(fxn * rr.baseline),
                                     float(0.3), n_levels=8)
    print(f"{name}+sad: depth {int(jnp.sum(depth2 > 0))}, "
          f"close {int(jnp.sum((depth2 > 0) & (depth2 < 40 * rr.baseline)))}")
