"""Atlas multi-map tests: spawn, transform, merge."""
import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu.models import map_state as ms
from orbslam3lib_tpu.models.atlas import Atlas, merge_into, transform_map
from orbslam3lib_tpu.utils import lie

RNG = np.random.default_rng(81)
F = 64


def small_map(n_kf=3, n_mp=40, seed=0):
    rng = np.random.default_rng(seed)
    m = ms.empty_map(max_kf=16, max_mp=256, n_feat=F)
    for i in range(n_kf):
        xy = rng.uniform(0, 600, (F, 2)).astype(np.float32)
        desc = rng.integers(0, 2, (F, 256)).astype(np.int8)
        fv = np.ones(F, bool)
        assoc = np.full(F, -1, np.int32)
        assoc[:n_mp] = np.arange(n_mp)
        m, _ = ms.insert_keyframe(
            m, jnp.eye(3), jnp.asarray([0.1 * i, 0, 0], dtype=jnp.float32),
            jnp.float32(i), jnp.asarray(xy), jnp.zeros(F, jnp.int32),
            jnp.asarray(desc), jnp.asarray(fv), jnp.asarray(assoc),
            jnp.zeros(F, jnp.float32))
    pos = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    valid = np.zeros(256, bool); valid[:n_mp] = True
    first = np.full(256, -1, np.int32); first[:n_mp] = 0
    m = m._replace(mp_pos=jnp.asarray(pos), mp_valid=jnp.asarray(valid),
                   mp_first_kf=jnp.asarray(first), n_mp=jnp.int32(n_mp))
    return m


class TestAtlas:
    def test_new_map_on_loss(self):
        at = Atlas(max_kf=16, max_mp=256, n_feat=F)
        at.current_map = small_map()
        idx = at.create_new_map()
        assert at.count_maps() == 2 and idx == 1
        assert int(at.current_map.n_kf) == 0

    def test_transform_map_preserves_geometry(self):
        m = small_map()
        xi = np.zeros(7, np.float32)
        xi[:6] = (RNG.normal(size=6) * 0.3).astype(np.float32)
        xi[6] = np.log(1.2)
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        m2 = transform_map(m, R, t, s)
        # a landmark's position in its observing camera frame scales by s
        # but direction is preserved: check reprojection consistency
        p0 = np.asarray(m.mp_pos[0])
        p0c = np.asarray(m.kf_R[0]) @ p0 + np.asarray(m.kf_t[0])
        p0n = np.asarray(m2.mp_pos[0])
        p0cn = np.asarray(m2.kf_R[0]) @ p0n + np.asarray(m2.kf_t[0])
        # camera-frame geometry scales by s (projection-preserving)
        np.testing.assert_allclose(p0cn, float(s) * p0c, atol=1e-4)

    def test_merge_copies_and_remaps(self):
        dst = small_map(n_kf=3, n_mp=40, seed=0)
        src = small_map(n_kf=2, n_mp=30, seed=1)
        out = merge_into(dst, src)
        assert int(out.n_kf) == 5
        assert int(out.n_mp) == 70
        # src KF 0 landed at slot 3 with remapped landmark ids (offset 40)
        row = np.asarray(out.kf_mp[3])
        assert row[0] == 40
        np.testing.assert_allclose(np.asarray(out.kf_t[3]),
                                   np.asarray(src.kf_t[0]), atol=1e-6)
        # landmarks copied
        np.testing.assert_allclose(np.asarray(out.mp_pos[40]),
                                   np.asarray(src.mp_pos[0]), atol=1e-6)
        assert int(out.mp_first_kf[40]) == 3

    def test_atlas_merge_api(self):
        at = Atlas(max_kf=16, max_mp=256, n_feat=F)
        at.current_map = small_map(seed=0)
        at.create_new_map()
        at.current_map = small_map(n_kf=2, n_mp=20, seed=2)
        at.merge(0, jnp.eye(3), jnp.zeros(3), jnp.float32(1.0))
        assert at.count_maps() == 1
        assert int(at.current_map.n_kf) == 5
