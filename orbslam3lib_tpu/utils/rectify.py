"""Stereo rectification: host-side map precompute + on-device remap.

TPU-native re-design of the reference's rectification path
(/root/reference app/src/main/cpp/src/Settings.cc:177 `needToRectify` ->
Settings.cc:485 precomputeRectificationMaps: cv::stereoRectify +
cv::initUndistortRectifyMap, applied per frame with cv::remap in
Tracking/System). The map construction (Bouguet's algorithm) runs ONCE on
the host in NumPy; the per-frame work is a single jitted bilinear gather
that lives inside the frame pipeline, so raw distorted stereo pairs are
rectified on device with no extra host round trip.

After rectification both cameras are ideal pinholes sharing one intrinsic
matrix, rows are epipolar-aligned and the baseline is pure +x — exactly the
contract of matching.match_rectified_stereo.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import cameras


class RectifyResult(NamedTuple):
    """Host-side rectification precompute."""
    maps: np.ndarray       # (2, H, W, 2) sample coords (x, y) per eye
    new_params: np.ndarray  # [fx, fy, cx, cy] shared rectified intrinsics
    baseline: float        # rectified baseline (meters)
    R_rect: np.ndarray     # (2, 3, 3) rect<-cam rotations (left, right)


def _so3_log(R: np.ndarray) -> np.ndarray:
    cos = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = np.arccos(cos)
    if th < 1e-9:
        return np.zeros(3)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return w * (th / (2.0 * np.sin(th)))


def _so3_exp(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1.0 - np.cos(th)) * (K @ K)


def stereo_rectify(params_l: np.ndarray, params_r: np.ndarray,
                   model_l: int, model_r: int,
                   R_lr: np.ndarray, t_lr: np.ndarray,
                   width: int, height: int) -> RectifyResult:
    """Bouguet stereo rectification (cv::stereoRectify semantics).

    params_l/r: distorted camera parameter vectors (PINHOLE_RADTAN
    [fx,fy,cx,cy,k1,k2,p1,p2,k3] or KANNALA_BRANDT [fx,fy,cx,cy,k0..k3]).
    R_lr/t_lr: pose of the right camera in the left frame (x_l = R x_r + t).
    Returns the per-eye sample maps and the shared rectified pinhole.
    """
    R_lr = np.asarray(R_lr, np.float64).reshape(3, 3)
    t_lr = np.asarray(t_lr, np.float64).reshape(3)
    # split the relative rotation evenly between the two eyes:
    # x_l_new = Ra x_l, x_r_new = Rb x_r with Rb R_rl Ra^T = I
    om = _so3_log(R_lr)
    Ra0 = _so3_exp(-0.5 * om)          # left half-rotation
    Rb0 = Ra0 @ R_lr                   # = exp(+om/2)
    # align the baseline with +x: t_rl in the new shared orientation
    t_rl = -R_lr.T @ t_lr              # position of left cam in right frame
    t_new = Rb0 @ t_rl
    b = np.linalg.norm(t_new)
    e1 = t_new / b
    if e1[0] < 0:                      # right camera must sit at +x of left
        e1 = -e1
    e2 = np.array([-e1[1], e1[0], 0.0])
    n2 = np.linalg.norm(e2)
    e2 = np.array([0.0, 1.0, 0.0]) if n2 < 1e-9 else e2 / n2
    e3 = np.cross(e1, e2)
    R_align = np.stack([e1, e2, e3], axis=0)
    Ra = R_align @ Ra0
    Rb = R_align @ Rb0

    # shared rectified intrinsics: mean focal, image-centered principal point
    f_new = 0.25 * float(params_l[0] + params_l[1] + params_r[0] + params_r[1])
    cx_new, cy_new = width * 0.5, height * 0.5
    new_params = np.asarray([f_new, f_new, cx_new, cy_new], np.float32)

    # sample maps: rectified pixel -> source (distorted) pixel
    u, v = np.meshgrid(np.arange(width, dtype=np.float32),
                       np.arange(height, dtype=np.float32))
    ray = np.stack([(u - cx_new) / f_new, (v - cy_new) / f_new,
                    np.ones_like(u)], axis=-1)          # (H, W, 3)
    maps = np.zeros((2, height, width, 2), np.float32)
    for eye, (Rr, prm, mdl) in enumerate(
            [(Ra, params_l, model_l), (Rb, params_r, model_r)]):
        x_cam = ray @ Rr.astype(np.float32)             # Rr^T applied rowwise
        uv_src = np.asarray(cameras.project(
            mdl, jnp.asarray(np.asarray(prm, np.float32)),
            jnp.asarray(x_cam.reshape(-1, 3))))
        maps[eye] = uv_src.reshape(height, width, 2)
    return RectifyResult(maps=maps, new_params=new_params,
                         baseline=float(b),
                         R_rect=np.stack([Ra, Rb]).astype(np.float32))


@jax.jit
def remap_bilinear(img: jnp.ndarray, mp: jnp.ndarray) -> jnp.ndarray:
    """Bilinear remap: out[y, x] = img(mp[y, x, 1], mp[y, x, 0]).

    img (..., H, W) float; mp (..., H, W, 2) source (x, y) coords. Leading
    dims broadcast (e.g. (2, H, W) stereo pair with (2, H, W, 2) maps).
    Out-of-bounds samples are 0 (the reference's BORDER_CONSTANT)."""
    H, W = img.shape[-2], img.shape[-1]
    mp = jnp.broadcast_to(mp, img.shape[:-2] + (H, W, 2))
    x = mp[..., 0]
    y = mp[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    inb = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
           ).astype(img.dtype)

    def sample(im, yy, xx):
        return im[yy, xx]

    for _ in range(img.ndim - 2):
        sample = jax.vmap(sample)
    p00 = sample(img, yi, xi)
    p01 = sample(img, yi, xi + 1)
    p10 = sample(img, yi + 1, xi)
    p11 = sample(img, yi + 1, xi + 1)
    top = p00 * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    return (top * (1.0 - fy) + bot * fy) * inb
