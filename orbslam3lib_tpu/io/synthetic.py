"""Synthetic stereo(-inertial) sequence generator: a textured corridor world
rendered analytically, with exact ground-truth trajectory.

Since the benchmark datasets (EuRoC/TUM-VI) cannot be downloaded in this
environment, this module provides the integration-test workload (SURVEY.md §4:
golden-value + ATE integration tests). The world is a rectangular corridor
with procedurally textured walls; images are rendered by ray-plane
intersection + multi-octave value-noise texture lookup — rich, persistent
texture so the ORB front end behaves like on real imagery, and analytic
poses so ATE is exact.

All rendering is NumPy on the host (test-data generation, not a hot path).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from ..utils import lie
import jax.numpy as jnp


@dataclass
class StereoRig:
    fx: float = 300.0
    fy: float = 300.0
    cx: float = 320.0
    cy: float = 200.0
    width: int = 640
    height: int = 400
    baseline: float = 0.11
    model: str = "pinhole"            # "pinhole" | "kannala_brandt8"
    k: tuple = (0.0, 0.0, 0.0, 0.0)   # KB8 theta-polynomial coefficients
    dist: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)  # pinhole radtan k1,k2,p1,p2,k3

    @property
    def params(self) -> np.ndarray:
        if self.model == "pinhole":
            if any(d != 0.0 for d in self.dist):
                return np.asarray([self.fx, self.fy, self.cx, self.cy,
                                   *self.dist], dtype=np.float32)
            return np.asarray([self.fx, self.fy, self.cx, self.cy], dtype=np.float32)
        return np.asarray([self.fx, self.fy, self.cx, self.cy, *self.k],
                          dtype=np.float32)

    @property
    def bf(self) -> float:
        return self.fx * self.baseline


class _NoiseTexture:
    """Multi-octave value noise over an integer lattice (tileable by hash)."""

    def __init__(self, seed: int, base_scale: float = 0.25, octaves: int = 4):
        rng = np.random.default_rng(seed)
        self.tables = [rng.uniform(0, 1, size=(257, 257)).astype(np.float32)
                       for _ in range(octaves)]
        self.base_scale = base_scale
        self.octaves = octaves

    def sample(self, u: np.ndarray, v: np.ndarray) -> np.ndarray:
        out = np.zeros_like(u, dtype=np.float32)
        amp_sum = 0.0
        for o in range(self.octaves):
            s = self.base_scale * (2.2 ** o)
            amp = 1.0 / (1.5 ** o)
            uu, vv = u * s, v * s
            iu, iv = np.floor(uu).astype(np.int64), np.floor(vv).astype(np.int64)
            fu, fv = (uu - iu).astype(np.float32), (vv - iv).astype(np.float32)
            T = self.tables[o]
            iu0, iv0 = iu % 256, iv % 256
            a = T[iv0, iu0]
            b = T[iv0, iu0 + 1]
            c = T[iv0 + 1, iu0]
            d = T[iv0 + 1, iu0 + 1]
            val = (a * (1 - fu) * (1 - fv) + b * fu * (1 - fv)
                   + c * (1 - fu) * fv + d * fu * fv)
            out += amp * val
            amp_sum += amp
        return out / amp_sum


@dataclass
class CorridorWorld:
    """Axis-aligned corridor: x in [-hw, hw], y in [-hh, hh], z in [z0, z1].
    World frame: x right, y down, z forward. With `back_wall` a sixth
    textured plane closes the box at z0 (a room), enabling 360-degree
    orbit sequences for loop-closure benchmarks."""
    half_w: float = 2.0
    half_h: float = 1.5
    z0: float = -5.0
    z1: float = 60.0
    tex_seed: int = 42
    back_wall: bool = False

    def __post_init__(self):
        s = self.tex_seed
        # one texture per plane: left, right, floor, ceiling, end wall,
        # (optional) back wall
        self.tex = [_NoiseTexture(s + i, base_scale=3.0) for i in range(6)]

    def render(self, R_cw: np.ndarray, c_w: np.ndarray, rig: StereoRig,
               noise_sigma: float = 1.5, rng=None) -> np.ndarray:
        """Render one grayscale image for camera with world-from-cam rotation
        R_cw (3,3) and center c_w (3,). Returns (H, W) float32 in [0, 255]."""
        H, W = rig.height, rig.width
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        if rig.model == "kannala_brandt8":
            from ..utils import cameras as _cams
            import jax.numpy as _jnp
            uv = np.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
            d_c = np.asarray(_cams.kb8_unproject(
                _jnp.asarray(rig.params), _jnp.asarray(uv))).reshape(H, W, 3)
        elif any(d != 0.0 for d in rig.dist):
            from ..utils import cameras as _cams
            import jax.numpy as _jnp
            uv = np.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
            d_c = np.asarray(_cams.radtan_unproject(
                _jnp.asarray(rig.params), _jnp.asarray(uv))).reshape(H, W, 3)
        else:
            d_c = np.stack([(u - rig.cx) / rig.fx, (v - rig.cy) / rig.fy,
                            np.ones_like(u)], axis=-1)  # (H,W,3)
        d_w = d_c @ R_cw.T
        o = c_w

        best_t = np.full((H, W), np.inf, dtype=np.float32)
        img = np.full((H, W), 90.0, dtype=np.float32)

        planes = [
            (0, -self.half_w, 0),   # left wall   x = -hw, tex coords (z, y)
            (0, self.half_w, 1),    # right wall
            (1, self.half_h, 2),    # floor       y = +hh, tex (x, z)
            (1, -self.half_h, 3),   # ceiling
            (2, self.z1, 4),        # end wall    z = z1, tex (x, y)
        ]
        if self.back_wall:
            planes.append((2, self.z0, 5))  # back wall z = z0 (room mode)
        for axis, val, ti in planes:
            dn = d_w[..., axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (val - o[axis]) / dn
            hit = (t > 0.05) & np.isfinite(t)
            # mask non-intersecting rays BEFORE the multiply: inf * 0 = NaN
            # would flow through the texture lookup as a RuntimeWarning
            t_safe = np.where(hit, t, 1.0)
            p = o[None, None, :] + t_safe[..., None] * d_w
            if axis == 0:
                in_b = (np.abs(p[..., 1]) <= self.half_h) & \
                       (p[..., 2] >= self.z0) & (p[..., 2] <= self.z1)
                tu, tv = p[..., 2], p[..., 1]
            elif axis == 1:
                in_b = (np.abs(p[..., 0]) <= self.half_w) & \
                       (p[..., 2] >= self.z0) & (p[..., 2] <= self.z1)
                tu, tv = p[..., 0], p[..., 2]
            else:
                in_b = (np.abs(p[..., 0]) <= self.half_w) & \
                       (np.abs(p[..., 1]) <= self.half_h)
                tu, tv = p[..., 0], p[..., 1]
            hit &= in_b & (t < best_t)
            tex_val = self.tex[ti].sample(tu[hit], tv[hit])
            img[hit] = 30.0 + 200.0 * tex_val
            best_t[hit] = t[hit]

        if noise_sigma > 0:
            rng = rng or np.random.default_rng(0)
            img = img + rng.normal(0, noise_sigma, img.shape).astype(np.float32)
        return np.clip(img, 0, 255).astype(np.float32)


GRAVITY_W = np.array([0.0, 9.81, 0.0])  # world gravity acceleration (+y down)


def corridor_pose_at(ts: np.ndarray, speed: float = 0.8, wiggle: float = 0.25):
    """Analytic pose at arbitrary times: returns (R_cw (T,3,3), c_w (T,3)).
    The camera looks along its velocity direction with slight lateral/vertical
    oscillation — smooth, differentiable (IMU-friendly)."""
    ts = np.asarray(ts, dtype=np.float64)
    z = speed * ts
    x = wiggle * np.sin(0.35 * z)
    y = 0.4 * wiggle * np.sin(0.23 * z + 1.0)
    dx = wiggle * 0.35 * np.cos(0.35 * z) * speed
    dy = 0.4 * wiggle * 0.23 * np.cos(0.23 * z + 1.0) * speed
    dz = np.full_like(z, speed)

    fwd = np.stack([dx, dy, dz], axis=-1)
    fwd /= np.linalg.norm(fwd, axis=-1, keepdims=True)
    up_hint = np.array([0.0, 1.0, 0.0])
    right = np.cross(np.broadcast_to(up_hint, fwd.shape), fwd)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    R_cw = np.stack([right, down, fwd], axis=-1)   # float64: finite
    c_w = np.stack([x, y, z], axis=-1)             # differences need f64
    return R_cw, c_w


def orbit_pose_at(ts: np.ndarray, period: float = 24.0, radius: float = 0.5,
                  wiggle: float = 0.08):
    """Analytic orbit pose inside a room (back_wall CorridorWorld): the
    camera circles the room center at `radius`, always facing radially
    outward at the walls, completing 360 degrees per `period` seconds —
    after one period it revisits its own earlier views exactly, the
    canonical loop-closure geometry. Slight vertical bob keeps the motion
    non-degenerate. Returns (R_cw (T,3,3), c_w (T,3))."""
    ts = np.asarray(ts, dtype=np.float64)
    phi = 2.0 * np.pi * ts / period
    x = radius * np.sin(phi)
    z = radius * np.cos(phi)
    y = wiggle * np.sin(3.1 * phi)
    fwd = np.stack([np.sin(phi), np.full_like(phi, 0.0), np.cos(phi)],
                   axis=-1)
    up_hint = np.array([0.0, 1.0, 0.0])
    right = np.cross(np.broadcast_to(up_hint, fwd.shape), fwd)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    R_cw = np.stack([right, down, fwd], axis=-1)
    c_w = np.stack([x, y, z], axis=-1)
    return R_cw, c_w


def orbit_trajectory(n_frames: int, dt: float = 1.0 / 15.0,
                     period: float = 24.0, radius: float = 0.5):
    """Ground-truth orbit trajectory (see orbit_pose_at)."""
    ts = np.arange(n_frames, dtype=np.float64) * dt
    R_cw, c_w = orbit_pose_at(ts, period, radius)
    return list(R_cw.astype(np.float32)), list(c_w.astype(np.float32)), ts


def corridor_trajectory(n_frames: int, dt: float = 1.0 / 15.0,
                        speed: float = 0.8, wiggle: float = 0.25):
    """Ground-truth camera trajectory down the corridor.

    Returns (R_cw_list, c_w_list, timestamps)."""
    ts = np.arange(n_frames, dtype=np.float64) * dt
    R_cw, c_w = corridor_pose_at(ts, speed, wiggle)
    return list(R_cw.astype(np.float32)), list(c_w.astype(np.float32)), ts


def synth_imu(t0: float, t1: float, freq: float = 200.0,
              speed: float = 0.8, wiggle: float = 0.25,
              bg=np.zeros(3), ba=np.zeros(3),
              sigma_g: float = 0.0, sigma_a: float = 0.0, rng=None,
              R_bc=None, t_bc=None):
    """Synthesize body-frame IMU samples along the corridor trajectory in
    (t0, t1]: gyro (N,3), specific-force accel (N,3), dts (N,).

    R_bc/t_bc: IMU-from-camera extrinsic (p_b = R_bc p_c + t_bc); identity
    by default. The body trajectory is R_wb(t) = R_wc(t) R_bc^T,
    p_b(t) = c(t) - R_wb(t) t_bc (lever arm included, so a rotating rig
    produces the correct centripetal accelerations). Rates/accelerations
    come from central finite differences of the analytic pose; the
    accelerometer measures f = R_wb^T (a_w - g_w).
    """
    R_bc = np.eye(3) if R_bc is None else np.asarray(R_bc, np.float64)
    t_bc = np.zeros(3) if t_bc is None else np.asarray(t_bc, np.float64)
    dt = 1.0 / freq
    ts = np.arange(t0 + dt, t1 + dt * 0.5, dt)
    eps = 1e-4

    def body_pose(tq):
        R_wc, c = corridor_pose_at(tq, speed, wiggle)
        R_wb = R_wc.astype(np.float64) @ R_bc.T
        p_b = c.astype(np.float64) - np.einsum("tij,j->ti", R_wb, t_bc)
        return R_wb, p_b

    R0, p_m = body_pose(ts - dt * 0.5)                 # midpoints
    Ra, p_lo = body_pose(ts - dt * 0.5 - eps)
    Rb, p_hi = body_pose(ts - dt * 0.5 + eps)
    a_w = (p_hi - 2 * p_m + p_lo) / (eps * eps)
    # body rates from rotation increments around the midpoint
    gyro = np.zeros((len(ts), 3), dtype=np.float64)
    for i in range(len(ts)):
        dRm = Ra[i].T @ Rb[i]
        w_hat = (dRm - dRm.T) / (2 * 2 * eps)   # log approx for tiny angles
        gyro[i] = [w_hat[2, 1], w_hat[0, 2], w_hat[1, 0]]
    f_b = np.einsum("tij,tj->ti", np.transpose(R0, (0, 2, 1)),
                    a_w - GRAVITY_W)
    rng = rng or np.random.default_rng(0)
    gyro = gyro + bg + rng.normal(0, sigma_g, gyro.shape)
    f_b = f_b + ba + rng.normal(0, sigma_a, f_b.shape)
    dts = np.full(len(ts), dt, dtype=np.float32)
    return gyro.astype(np.float32), f_b.astype(np.float32), dts


def render_stereo_sequence(n_frames: int, rig: StereoRig | None = None,
                           world: CorridorWorld | None = None,
                           dt: float = 1.0 / 15.0, seed: int = 0):
    """Yield (img_pair (2,H,W) f32, Tcw_left (R, t), timestamp) per frame."""
    rig = rig or StereoRig()
    world = world or CorridorWorld()
    R_cw_list, c_w_list, ts = corridor_trajectory(n_frames, dt=dt)
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n_frames):
        R_cw, c_w = R_cw_list[i], c_w_list[i]
        c_right = c_w + R_cw @ np.array([rig.baseline, 0, 0], dtype=np.float32)
        img_l = world.render(R_cw, c_w, rig, rng=rng)
        img_r = world.render(R_cw, c_right, rig, rng=rng)
        # Tcw: p_c = R_wc^T p_w - R_wc^T c
        R = R_cw.T.astype(np.float32)
        t = (-R @ c_w).astype(np.float32)
        frames.append((np.stack([img_l, img_r]), (R, t), float(ts[i])))
    return frames, rig, world
