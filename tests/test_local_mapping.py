"""Local-mapping op tests: triangulation of new landmarks between two
keyframes, landmark culling, keyframe culling, fusion."""
import numpy as np
import jax
import jax.numpy as jnp

from orbslam3lib_tpu.mapping import local_mapping as lm
from orbslam3lib_tpu.models import map_state as ms
from orbslam3lib_tpu.ops.orient_brief import pack_bits_u32  # noqa: F401 (api)
from orbslam3lib_tpu.utils import cameras, lie

RNG = np.random.default_rng(41)
CAM = jnp.asarray([300.0, 300.0, 320.0, 200.0], dtype=jnp.float32)
F = 128


def make_two_kf_map(n_pts=100, baseline=0.4, bind=False):
    """Two keyframes seeing the same random point cloud; descriptors are
    random-but-consistent per landmark."""
    m = ms.empty_map(max_kf=8, max_mp=512, n_feat=F)
    pts = RNG.uniform([-2, -1.5, 4], [2, 1.5, 10], size=(n_pts, 3)).astype(np.float32)
    descs = RNG.integers(0, 2, size=(n_pts, 256)).astype(np.int8)

    poses = []
    for i, tx in enumerate([0.0, baseline]):
        R = np.eye(3, dtype=np.float32)
        t = np.array([-tx, 0, 0], dtype=np.float32)  # camera at (tx,0,0)
        poses.append((R, t))
        p_c = pts @ R.T + t
        uv = np.array(cameras.pinhole_project(CAM, jnp.asarray(p_c)))
        xy = np.zeros((F, 2), np.float32)
        desc = np.zeros((F, 256), np.int8)
        fv = np.zeros(F, bool)
        xy[:n_pts] = uv + RNG.normal(0, 0.3, uv.shape).astype(np.float32)
        desc[:n_pts] = descs
        fv[:n_pts] = True
        mp_assoc = jnp.full(F, -1, jnp.int32)
        m, kf_id = ms.insert_keyframe(
            m, jnp.asarray(R), jnp.asarray(t), jnp.float32(i),
            jnp.asarray(xy), jnp.zeros(F, jnp.int32), jnp.asarray(desc),
            jnp.asarray(fv), mp_assoc, jnp.zeros(F, jnp.float32))
    return m, pts, poses


class TestTriangulatePair:
    def test_creates_points_near_truth(self):
        m, pts, poses = make_two_kf_map()
        m2, n_new = lm.triangulate_pair(m, jnp.int32(1), jnp.int32(0), CAM)
        n_new = int(n_new)
        assert n_new > 80, n_new
        created = np.asarray(m2.mp_pos[:n_new])
        valid = np.asarray(m2.mp_valid[:n_new])
        # each created point should be close to one of the true points
        # depth noise ~ z^2/(fx*b)*sigma_uv ~ 0.35 m at z=10 -> gate at 0.3
        d = np.linalg.norm(created[valid][:, None, :] - pts[None, :, :], axis=-1)
        assert np.median(d.min(axis=1)) < 0.3
        # observations bound in both keyframes
        row0 = np.asarray(m2.kf_mp[1])
        row1 = np.asarray(m2.kf_mp[0])
        assert (row0 >= 0).sum() >= n_new
        assert (row1 >= 0).sum() >= n_new * 0.8

    def test_no_points_without_baseline(self):
        m, pts, poses = make_two_kf_map(baseline=0.0)
        m2, n_new = lm.triangulate_pair(m, jnp.int32(1), jnp.int32(0), CAM)
        assert int(n_new) == 0


class TestCulling:
    def test_cull_low_ratio(self):
        m, _, _ = make_two_kf_map()
        m, _ = lm.triangulate_pair(m, jnp.int32(1), jnp.int32(0), CAM)
        n = int(m.n_mp)
        # landmark 0: bad found/visible ratio, young
        m = m._replace(
            mp_visible=m.mp_visible.at[0].set(10.0),
            mp_found=m.mp_found.at[0].set(1.0))
        m2 = lm.cull_mappoints(m, jnp.int32(2))
        assert not bool(m2.mp_valid[0])
        # its references scrubbed
        assert not np.any(np.asarray(m2.kf_mp) == 0)

    def test_keyframe_culling_protects(self):
        m, _, _ = make_two_kf_map()
        m, _ = lm.triangulate_pair(m, jnp.int32(1), jnp.int32(0), CAM)
        protect = jnp.asarray([0, 1], dtype=jnp.int32)
        m2 = lm.cull_keyframes(m, protect)
        np.testing.assert_array_equal(np.asarray(m2.kf_valid[:2]),
                                      np.asarray(m.kf_valid[:2]))
