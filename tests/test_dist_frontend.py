"""Data-parallel front end on the virtual 8-device CPU mesh: sharded batch
extraction must agree exactly with per-frame single-device extraction."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from orbslam3lib_tpu.ops.extractor import extract_orb_stereo
from orbslam3lib_tpu.parallel.dist_frontend import make_sharded_frontend
from orbslam3lib_tpu.tracking.matching import match_rectified_stereo


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    return Mesh(np.array(devs[:8]), ("dp",))


def _texture(rng, h, w):
    base = rng.uniform(0, 255, size=(2, h // 8, w // 8)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), dtype=np.float32))
    img += rng.normal(0, 6, img.shape).astype(np.float32)
    return np.clip(img, 0, 255)


def test_sharded_frontend_matches_single_device(mesh):
    rng = np.random.default_rng(3)
    N, H, W = 8, 96, 128
    imgs = np.stack([_texture(rng, H, W) for _ in range(N)])
    ths = np.full(N, 14.0, np.float32)

    frontend = make_sharded_frontend(mesh, bf=20.0, min_z=0.3,
                                     max_kp=128, n_levels=4)
    feats, u_r, depth = frontend(jnp.asarray(imgs), jnp.asarray(ths))
    assert feats.xy.shape == (N, 2, 128, 2)
    # sharded over the frame axis
    assert len(feats.xy.sharding.device_set) == 8

    for i in [0, 3, 7]:
        ref = extract_orb_stereo(jnp.asarray(imgs[i]), jnp.float32(ths[i]),
                                 max_kp=128, n_levels=4)
        ref_ur, ref_d = match_rectified_stereo(
            ref.xy[0], ref.level[0], ref.desc[0], ref.valid[0],
            ref.xy[1], ref.level[1], ref.desc[1], ref.valid[1],
            20.0, 0.3, n_levels=4)
        np.testing.assert_allclose(np.asarray(feats.xy[i]),
                                   np.asarray(ref.xy), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(feats.valid[i]),
                                      np.asarray(ref.valid))
        np.testing.assert_array_equal(np.asarray(feats.desc[i]),
                                      np.asarray(ref.desc))
        np.testing.assert_allclose(np.asarray(u_r[i]), np.asarray(ref_ur),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(depth[i]), np.asarray(ref_d),
                                   atol=1e-3)
