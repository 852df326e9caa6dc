"""Fused FAST-9/16 score + 3x3 NMS as a Pallas TPU kernel.

TPU-native re-design of the reference's HVX FAST detector
(/root/reference dsp/src/orbslam_dsp_fast.cpp: ring tests :155-452, scores
:452-497, NMS :649-749). The pure-XLA path (ops/fast.py) materializes a
(16, H, W) rolled ring stack plus several full-image temporaries in HBM; this
kernel streams the image once through VMEM in row bands with a 4-row halo
(ring radius 3 + 1 NMS row) and emits the NMS'd score map directly — the VMEM
analog of the reference's VTCM block cache (orbslam_dsp_pyramid.h:110-130),
with the 16-sample circular-arc min/max computed entirely in registers via a
python-unrolled log-doubling network.

Semantics contract (oracle: fast.nms3x3(fast.fast_scores(img, margin))),
bit-exact, tested in tests/test_pallas_ops.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import RING

TB = 32        # output rows per grid step
HALO = 4       # 3 ring radius + 1 NMS row
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_x(a: jnp.ndarray, dx: int) -> jnp.ndarray:
    """Column shift with wrap (margin-masked later, like the XLA path)."""
    if dx == 0:
        return a
    return pltpu.roll(a, (-dx) % a.shape[1], 1)


def _fast_nms_kernel(img_ref, out_ref, *, h_true: int, w_true: int,
                     margin: int):
    """One (TB + 2*HALO, W) slab -> (TB, W) NMS'd FAST scores."""
    slab = img_ref[:]                              # (TB+8, W) float32
    w = slab.shape[1]
    tbp2 = TB + 2                                  # score rows incl. NMS halo

    center = slab[HALO - 1:HALO - 1 + tbp2, :]
    # 16 ring samples, python-unrolled (static slices + lane rolls)
    ring = [
        _shift_x(slab[HALO - 1 + dy:HALO - 1 + dy + tbp2, :], dx)
        for dy, dx in RING
    ]

    def arc_score(diffs):
        # circular windowed min of length 9 via log-doubling, then max over
        # the 16 start positions
        m = [jnp.minimum(diffs[k], diffs[(k + 1) % 16]) for k in range(16)]
        m = [jnp.minimum(m[k], m[(k + 2) % 16]) for k in range(16)]
        m = [jnp.minimum(m[k], m[(k + 4) % 16]) for k in range(16)]
        m = [jnp.minimum(m[k], diffs[(k + 8) % 16]) for k in range(16)]
        return functools.reduce(jnp.maximum, m)

    bright = arc_score([r - center for r in ring])
    dark = arc_score([center - r for r in ring])
    score = jnp.maximum(jnp.maximum(bright, dark), 0.0)   # (TB+2, W)

    # margin mask in global coordinates BEFORE NMS (oracle zeroes margins
    # first, so margin pixels must not suppress interior neighbors)
    i = pl.program_id(0)
    gy = jax.lax.broadcasted_iota(jnp.int32, (tbp2, w), 0) + i * TB - 1
    gx = jax.lax.broadcasted_iota(jnp.int32, (tbp2, w), 1)
    inb = (jnp.clip((gy - margin + 1).astype(jnp.float32), 0.0, 1.0) *
           jnp.clip((h_true - margin - gy).astype(jnp.float32), 0.0, 1.0) *
           jnp.clip((gx - margin + 1).astype(jnp.float32), 0.0, 1.0) *
           jnp.clip((w_true - margin - gx).astype(jnp.float32), 0.0, 1.0))
    score = score * inb

    # 3x3 NMS on the interior TB rows
    row_max = jnp.maximum(jnp.maximum(score, _shift_x(score, -1)),
                          _shift_x(score, 1))
    nbr = jnp.maximum(jnp.maximum(row_max[0:TB, :], row_max[1:TB + 1, :]),
                      row_max[2:TB + 2, :])
    c = score[1:TB + 1, :]
    keep = jnp.clip((c - nbr) * 1e30 + 1.0, 0.0, 1.0)     # c >= nbr gate
    out_ref[:] = c * keep


@functools.partial(jax.jit, static_argnames=("margin", "interpret"))
def fast_scores_nms(img: jnp.ndarray, margin: int = 3,
                    *, interpret: bool = False) -> jnp.ndarray:
    """NMS'd exact FAST-9/16 score map, fused single pass.

    img: (H, W) float32/uint8. Returns (H, W) float32; score kept only at
    3x3 local maxima, margin rows/cols zeroed. Oracle:
    fast.nms3x3(fast.fast_scores(img, margin)).
    """
    h, w = img.shape
    h_p = _round_up(h, TB)
    w_p = _round_up(w, LANE)
    x = jnp.zeros((h_p + 2 * HALO, w_p), jnp.float32)
    x = x.at[HALO:HALO + h, :w].set(img.astype(jnp.float32))

    grid = (h_p // TB,)
    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, h_true=h, w_true=w,
                          margin=margin),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pl.Element(TB + 2 * HALO), pl.Element(w_p)),
                         lambda i: (i * TB, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, w_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_p, w_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=140 * h_p * w_p,            # ~16*4 min/max nets + NMS
            bytes_accessed=8 * h_p * w_p,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return out[:h, :w]
