"""Keypoint orientation (intensity centroid) and rotated-BRIEF descriptors.

TPU-native re-design of the reference DSP kernels
(/root/reference dsp/src/orbslam_dsp_rb.cpp: ic_angle_simd:32 accumulates
m01/m10 moments over the 31x31 circular patch from the VTCM cache;
calculate_orb_descriptors_optimized16:547 rotates the 256-pair pattern by the
8-bit encoded cos/sin and gathers/compares). On TPU:

  * angles stay float32 (SURVEY.md §2.2: "angle can stay float on TPU") —
    the reference's 4-bit log-encoded cos/sin + LUT exists only because HVX
    lacks cheap float transcendentals;
  * per-keypoint patches are gathered once from a padded level "canvas"
    (all pyramid levels stacked in one (L, H, W) array, the VMEM analog of
    the reference's VTCM block cache, orbslam_dsp_pyramid.h:110-130) via a
    vmapped dynamic_slice, then all moment/descriptor math is batched
    (N, patch) elementwise work on the VPU;
  * descriptors are produced as a (N, 256) 0/1 int8 bit matrix — the layout
    that lets the Hamming matcher ride the MXU (see ops/matcher.py) — plus a
    packed (N, 8) uint32 form for compact storage.

Scalar NumPy oracles mirror the reference's *_scalar test pattern
(orbslam_dsp_rb.cpp:356; SURVEY.md §4).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .pattern import BIT_PATTERN_31

HALF_PATCH = 15          # orientation patch radius (31x31)
BRIEF_RADIUS = 19        # covers rotated pattern (|xy| <= 13 -> r <= 13*sqrt2)
BRIEF_PATCH = 2 * BRIEF_RADIUS + 1  # 39


@lru_cache(maxsize=None)
def _circular_mask_and_coords():
    """(mask, u, v) each (31, 31): the u_max-style circular patch of radius 15
    (reference umax table semantics, ORBextractor_old.cc IC_Angle)."""
    v = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    u = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    vv, uu = np.meshgrid(v, u, indexing="ij")
    umax = np.round(np.sqrt(HALF_PATCH * HALF_PATCH - v * v + 0.0)).astype(np.int32)
    mask = np.abs(uu) <= umax[:, None]
    return mask.astype(np.float32), uu.astype(np.float32), vv.astype(np.float32)


def _gather_patches(canvas: jnp.ndarray, level: jnp.ndarray, y: jnp.ndarray,
                    x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """canvas (L, H, W) f32; level/y/x (N,) int32 (level-local integer coords).
    Returns (N, 2r+1, 2r+1) patches. Starts are clamped by dynamic_slice, so
    callers must enforce a detection margin >= radius+1 for correctness."""
    size = 2 * radius + 1

    def one(lvl, yy, xx):
        return jax.lax.dynamic_slice(
            canvas, (lvl, yy - radius, xx - radius), (1, size, size))[0]

    return jax.vmap(one)(level, y, x)


def ic_angles(canvas: jnp.ndarray, level: jnp.ndarray, y: jnp.ndarray,
              x: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint -> angle in radians.

    Reference: ic_angle_simd (orbslam_dsp_rb.cpp:32) / IC_Angle
    (ORBextractor_old.cc:78): m10 = sum u*I, m01 = sum v*I over the circular
    31x31 patch; angle = atan2(m01, m10).
    """
    mask, uu, vv = _circular_mask_and_coords()
    patches = _gather_patches(canvas, level, y, x, HALF_PATCH)  # (N,31,31)
    w = jnp.asarray(mask)
    m10 = jnp.sum(patches * (jnp.asarray(uu) * w), axis=(-2, -1))
    m01 = jnp.sum(patches * (jnp.asarray(vv) * w), axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def brief_descriptors(blur_canvas: jnp.ndarray, level: jnp.ndarray,
                      y: jnp.ndarray, x: jnp.ndarray,
                      angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated-BRIEF 256-bit descriptors -> (N, 256) int8 in {0, 1}.

    Reference semantics (calculate_orb_descriptors*, orbslam_dsp_rb.cpp:283+
    and ORBextractor_old.cc computeOrbDescriptor): sample position for pattern
    point (px, py) at angle t is (round(px cos - py sin), round(px sin +
    py cos)); bit = I(p1) < I(p2); image pre-blurred with 7x7 Gaussian.
    """
    pat = jnp.asarray(BIT_PATTERN_31.astype(np.float32))  # (256, 4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)               # (N,)

    def rot_idx(px, py):
        # (N, 256) flattened patch indices
        rx = jnp.round(px[None, :] * ca[:, None] - py[None, :] * sa[:, None]).astype(jnp.int32)
        ry = jnp.round(px[None, :] * sa[:, None] + py[None, :] * ca[:, None]).astype(jnp.int32)
        return (ry + BRIEF_RADIUS) * BRIEF_PATCH + (rx + BRIEF_RADIUS)

    idx1 = rot_idx(pat[:, 0], pat[:, 1])
    idx2 = rot_idx(pat[:, 2], pat[:, 3])

    patches = _gather_patches(blur_canvas, level, y, x, BRIEF_RADIUS)
    flat = patches.reshape(patches.shape[0], -1)  # (N, 39*39)
    t1 = jnp.take_along_axis(flat, idx1, axis=1)
    t2 = jnp.take_along_axis(flat, idx2, axis=1)
    return (t1 < t2).astype(jnp.int8)


def pack_bits_u32(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) 0/1 -> (N, 8) uint32 packed (bit i of word w = pair 32w+i)."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1)


# ---------------------------------------------------------------------------
# NumPy oracles
# ---------------------------------------------------------------------------

def ic_angle_oracle(img: np.ndarray, y: int, x: int) -> float:
    mask, uu, vv = _circular_mask_and_coords()
    patch = img[y - HALF_PATCH: y + HALF_PATCH + 1,
                x - HALF_PATCH: x + HALF_PATCH + 1].astype(np.float32)
    m10 = float(np.sum(patch * uu * mask))
    m01 = float(np.sum(patch * vv * mask))
    return float(np.arctan2(m01, m10))


def brief_oracle(blur_img: np.ndarray, y: int, x: int, angle: float) -> np.ndarray:
    ca, sa = np.cos(angle), np.sin(angle)
    out = np.zeros(256, dtype=np.int8)
    for i, (px, py, qx, qy) in enumerate(BIT_PATTERN_31.astype(np.float32)):
        r1x, r1y = int(round(px * ca - py * sa)), int(round(px * sa + py * ca))
        r2x, r2y = int(round(qx * ca - qy * sa)), int(round(qx * sa + qy * ca))
        out[i] = np.int8(blur_img[y + r1y, x + r1x] < blur_img[y + r2y, x + r2x])
    return out
