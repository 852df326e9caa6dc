"""Oracle tests for the feature front end: pyramid, FAST, orientation,
BRIEF, Hamming matcher (SURVEY.md §4 pattern: every kernel vs a scalar ref)."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.ops import fast, matcher, pyramid
from orbslam3lib_tpu.ops.extractor import ThresholdController, extract_orb
from orbslam3lib_tpu.ops.orient_brief import (
    BRIEF_RADIUS, brief_descriptors, brief_oracle, ic_angle_oracle, ic_angles,
    pack_bits_u32,
)

RNG = np.random.default_rng(7)


def synthetic_image(h=120, w=160, n_blobs=40, seed=3):
    """Smooth random image with sharp corner-ish blobs."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(40, 80, size=(h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), dtype=np.float32))
    m = min(25, h // 4, w // 4)
    for _ in range(n_blobs):
        y, x = rng.integers(m, h - m), rng.integers(m, w - m)
        s = rng.integers(2, 5)
        img[y:y + s, x:x + s] += rng.uniform(60, 120)
    return np.clip(img, 0, 255).astype(np.float32)


class TestPyramid:
    def test_reference_geometry(self):
        shapes = pyramid.level_shapes(400, 640)
        assert [s[1] for s in shapes] == list(pyramid.REF_WIDTHS)
        assert [s[0] for s in shapes] == list(pyramid.REF_HEIGHTS)

    def test_resize_matches_oracle(self):
        img = synthetic_image(80, 128)
        out = np.asarray(pyramid._resize_bilinear(jnp.asarray(img), 64, 100))
        ref = pyramid.resize_bilinear_oracle(img, 64, 100)
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_pyramid_levels(self):
        img = jnp.asarray(synthetic_image(400, 640))
        levels = pyramid.build_pyramid(img)
        assert len(levels) == 8
        assert levels[7].shape == (80, 128)
        # energy roughly preserved (mean should be stable under bilinear)
        m0 = float(jnp.mean(levels[0]))
        m7 = float(jnp.mean(levels[7]))
        assert abs(m0 - m7) / m0 < 0.05

    def test_blur_constant_image(self):
        img = jnp.full((32, 48), 100.0)
        out = pyramid.gaussian_blur_7x7(img)
        np.testing.assert_allclose(np.asarray(out), 100.0, atol=1e-3)


class TestFast:
    def test_scores_match_oracle(self):
        img = synthetic_image(48, 64, n_blobs=12)
        scores = np.asarray(fast.fast_scores(jnp.asarray(img)))
        ref = fast.fast_scores_oracle(img)
        np.testing.assert_allclose(scores, ref, atol=1e-3)
        assert (ref > 10).sum() > 5  # the synthetic image has corners

    def test_nms_keeps_local_maxima(self):
        img = synthetic_image(48, 64, n_blobs=12)
        s = fast.fast_scores(jnp.asarray(img))
        nm = np.asarray(fast.nms3x3(s))
        sn = np.asarray(s)
        ys, xs = np.nonzero(nm > 0)
        for y, x in zip(ys, xs):
            patch = sn[max(0, y - 1):y + 2, max(0, x - 1):x + 2]
            assert sn[y, x] >= patch.max() - 1e-5

    def test_tile_topk(self):
        score = np.zeros((160, 256), dtype=np.float32)
        # one strong corner per tile quadrant
        score[10, 20] = 50.0
        score[90, 200] = 40.0
        s, ys, xs = fast.tile_topk(jnp.asarray(score), 80, 128, 16)
        s, ys, xs = np.asarray(s), np.asarray(ys), np.asarray(xs)
        got = {(int(y), int(x)) for y, x, v in zip(ys, xs, s) if v > 0}
        assert got == {(10, 20), (90, 200)}


class TestOrientBrief:
    def test_ic_angle_matches_oracle(self):
        img = synthetic_image(96, 128)
        canvas = jnp.asarray(img)[None]
        pts = [(30, 40), (50, 80), (70, 100)]
        lv = jnp.zeros(len(pts), dtype=jnp.int32)
        ys = jnp.asarray([p[0] for p in pts], dtype=jnp.int32)
        xs = jnp.asarray([p[1] for p in pts], dtype=jnp.int32)
        out = np.asarray(ic_angles(canvas, lv, ys, xs))
        ref = np.array([ic_angle_oracle(img, y, x) for y, x in pts])
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_gradient_angle_sanity(self):
        # image brighter to the right -> centroid along +x -> angle ~ 0
        img = np.tile(np.arange(128, dtype=np.float32), (96, 1))
        out = float(ic_angles(jnp.asarray(img)[None],
                              jnp.zeros(1, jnp.int32),
                              jnp.asarray([48]), jnp.asarray([64]))[0])
        assert abs(out) < 1e-3

    def test_brief_matches_oracle(self):
        img = synthetic_image(96, 128)
        blur = np.asarray(pyramid.gaussian_blur_7x7(jnp.asarray(img)))
        pts = [(30, 40), (50, 80)]
        angles = [0.3, -1.2]
        lv = jnp.zeros(2, dtype=jnp.int32)
        out = np.asarray(brief_descriptors(
            jnp.asarray(blur)[None], lv,
            jnp.asarray([p[0] for p in pts], dtype=jnp.int32),
            jnp.asarray([p[1] for p in pts], dtype=jnp.int32),
            jnp.asarray(angles, dtype=jnp.float32)))
        for i, ((y, x), a) in enumerate(zip(pts, angles)):
            ref = brief_oracle(blur, y, x, a)
            mismatch = (out[i] != ref).mean()
            assert mismatch < 0.03, f"descriptor mismatch {mismatch}"

    def test_pack_bits(self):
        bits = jnp.asarray(RNG.integers(0, 2, size=(4, 256)).astype(np.int8))
        packed = np.asarray(pack_bits_u32(bits))
        b = np.asarray(bits)
        for n in range(4):
            for w in range(8):
                val = sum(int(b[n, 32 * w + i]) << i for i in range(32))
                assert packed[n, w] == val


class TestMatcher:
    def test_hamming_matches_oracle(self):
        a = RNG.integers(0, 2, size=(33, 256)).astype(np.int8)
        b = RNG.integers(0, 2, size=(57, 256)).astype(np.int8)
        d = np.asarray(matcher.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = matcher.hamming_oracle(a, b)
        np.testing.assert_array_equal(d, ref)

    def test_knn2(self):
        a = RNG.integers(0, 2, size=(16, 256)).astype(np.int8)
        b = np.concatenate([a, RNG.integers(0, 2, size=(16, 256)).astype(np.int8)])
        idx, d1, d2 = matcher.knn_match(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_array_equal(np.asarray(idx), np.arange(16))
        np.testing.assert_array_equal(np.asarray(d1), 0)
        assert np.all(np.asarray(d2) > 0)

    def test_validity_mask(self):
        a = RNG.integers(0, 2, size=(8, 256)).astype(np.int8)
        valid_b = jnp.asarray([True] * 4 + [False] * 4)
        d = matcher.hamming_matrix(jnp.asarray(a), jnp.asarray(a), None, valid_b)
        assert np.all(np.asarray(d)[:, 4:] >= float(matcher.BIG))


class TestExtractor:
    def test_end_to_end_small(self):
        img = synthetic_image(200, 320, n_blobs=60)
        feats = jax.jit(lambda im, t: extract_orb(im, t, max_kp=256, n_levels=4))(
            jnp.asarray(img), jnp.float32(10.0))
        n = int(feats.n_valid)
        assert n > 10, f"expected >10 features, got {n}"
        xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
        assert xy[:, 0].max() < 320 and xy[:, 1].max() < 200
        # descriptors of valid features should not be all-zero
        d = np.asarray(feats.desc)[np.asarray(feats.valid)]
        assert (d.sum(axis=1) > 0).mean() > 0.9

    def test_threshold_controller(self):
        c = ThresholdController(target=170, band=30, t0=17.0)
        t = c.update(800)   # too many features -> raise threshold
        assert t > 17.0
        t2 = c.update(10)   # too few -> lower
        assert t2 < t
        for _ in range(50):
            t3 = c.update(5)
        assert t3 >= c.t_min
