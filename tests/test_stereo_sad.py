"""Sub-pixel SAD stereo refinement (Frame.cc:897-997 semantics)."""
import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.tracking.matching import refine_stereo_sad

RNG = np.random.default_rng(5)


def smooth_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))
    # slight blur for subpixel interpolability
    for _ in range(2):
        img = 0.25 * (np.roll(img, 1, 0) + np.roll(img, -1, 0) +
                      np.roll(img, 1, 1) + np.roll(img, -1, 1))
    return img


def shift_x(img, d):
    """Shift image content left by d pixels (right view of a scene at
    constant disparity d): I_r(x) = I_l(x + d)."""
    xs = np.arange(img.shape[1], dtype=np.float32) + d
    x0 = np.floor(xs).astype(int)
    f = xs - x0
    x0c = np.clip(x0, 0, img.shape[1] - 1)
    x1c = np.clip(x0 + 1, 0, img.shape[1] - 1)
    return (1 - f) * img[:, x0c] + f * img[:, x1c]


class TestStereoSAD:
    def test_subpixel_disparity_recovery(self):
        h, w = 120, 160
        true_d = 7.3
        left = smooth_image(h, w)
        right = shift_x(left, true_d)
        canvas_l = jnp.asarray(left[None])    # (1, H, W): single level
        canvas_r = jnp.asarray(right[None])

        N = 24
        xs = RNG.uniform(30, w - 30, N).astype(np.float32)
        ys = RNG.uniform(30, h - 30, N).astype(np.float32)
        xy_l = jnp.asarray(np.stack([xs, ys], 1))
        level = jnp.zeros(N, jnp.int32)
        valid = jnp.ones(N, bool)
        # descriptor-level match snapped to integer: off by up to 0.5 px
        u_r0 = jnp.asarray(np.round(xs - true_d))
        depth0 = jnp.full(N, 1.0)

        bf = 33.0
        u_ref, d_ref = refine_stereo_sad(canvas_l, canvas_r, xy_l, level,
                                         valid, u_r0, depth0, bf=bf,
                                         min_z=0.3, n_levels=1)
        u_ref = np.asarray(u_ref)
        kept = u_ref >= 0
        assert kept.sum() >= N * 0.7
        disp = xs[kept] - u_ref[kept]
        err = np.abs(disp - true_d)
        assert np.median(err) < 0.15, np.median(err)
        # refined beats the integer-snapped input
        err0 = np.abs((xs - np.asarray(u_r0)) - true_d)
        assert np.median(err) < np.median(err0[kept])
        # depth consistent with bf/disparity
        np.testing.assert_allclose(np.asarray(d_ref)[kept], bf / disp,
                                   rtol=1e-3)

    def test_unmatched_passthrough_and_cut(self):
        h, w = 120, 160
        left = smooth_image(h, w, seed=1)
        right = shift_x(left, 5.0)
        canvas_l = jnp.asarray(left[None])
        canvas_r = jnp.asarray(right[None])
        xy_l = jnp.asarray([[50.0, 50.0], [80.0, 60.0]])
        level = jnp.zeros(2, jnp.int32)
        valid = jnp.ones(2, bool)
        u_r0 = jnp.asarray([-1.0, 75.0])  # first unmatched
        depth0 = jnp.asarray([0.0, 1.0])
        u_ref, d_ref = refine_stereo_sad(canvas_l, canvas_r, xy_l, level,
                                         valid, u_r0, depth0, bf=33.0,
                                         min_z=0.3, n_levels=1)
        assert float(u_ref[0]) == -1.0
        assert float(d_ref[0]) == 0.0
