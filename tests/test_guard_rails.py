"""Reference guard rails: thFarPoints depth cut (System.cc:174-184,
LocalMapping.cc:696), insertKFsWhenLost (Settings.cc:427, Tracking.cc:2304)
and the bad-IMU active-map reset (LocalMapping.cc:140-147,
Tracking.cc:1858-1863)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.tracking.tracker import Tracker, _insert_kf_and_spawn, OK, RECENTLY_LOST
from orbslam3lib_tpu.models import map_state as ms
from orbslam3lib_tpu.ops.extractor import Features


def _small_cfg(**kw):
    cfg = SlamConfig()
    cfg.camera.width, cfg.camera.height = 128, 96
    cfg.camera.fx = cfg.camera.fy = 80.0
    cfg.camera.cx, cfg.camera.cy = 64.0, 48.0
    cfg.orb.max_kp = 64
    cfg.orb.n_levels = 2
    cfg.map.max_kf = 32
    cfg.map.max_mp = 512
    for k, v in kw.items():
        setattr(cfg.tracker, k, v)
    return cfg


def _fake_feats(F=64, seed=0, stereo=False):
    """Fabricated feature set; stereo=True adds the (2, ...) eye batch dim
    the tracker expects from extract_orb_stereo."""
    rng = np.random.default_rng(seed)
    def eye(a):
        return jnp.stack([a, a]) if stereo else a
    return Features(
        xy=eye(jnp.asarray(rng.uniform([2, 2], [126, 94], (F, 2)).astype(np.float32))),
        level=eye(jnp.zeros(F, jnp.int32)),
        score=eye(jnp.ones(F, jnp.float32)),
        angle=eye(jnp.zeros(F, jnp.float32)),
        desc=eye(jnp.asarray(rng.integers(0, 2, (F, 256)).astype(np.int8))),
        valid=eye(jnp.ones(F, bool)),
    )


class TestThFarPoints:
    def test_spawn_depth_cut(self):
        """_insert_kf_and_spawn with th_far: no landmark spawns beyond it."""
        F = 64
        m = ms.empty_map(8, 256, F)
        feats = _fake_feats(F)
        depth = jnp.asarray(
            np.linspace(1.0, 40.0, F).astype(np.float32))  # 1..40 m
        cam = jnp.asarray([80.0, 80.0, 64.0, 48.0], jnp.float32)
        args = (m, jnp.eye(3), jnp.zeros(3), jnp.float32(0.0),
                feats.xy, feats.level, feats.desc, feats.valid,
                jnp.zeros(F), depth, jnp.full(256, -1, jnp.int32), cam)
        m_all, _ = _insert_kf_and_spawn(
            *args, 1e9, cam_model=0, n_levels=2, img_w=128, img_h=96)
        m_cut, _ = _insert_kf_and_spawn(
            *args, 1e9, cam_model=0, n_levels=2, img_w=128, img_h=96,
            th_far=jnp.float32(10.0))
        n_all, n_cut = int(m_all.n_mp), int(m_cut.n_mp)
        n_close = int(np.sum(np.asarray(depth) < 10.0))
        assert n_all == F
        assert n_cut == n_close < n_all

    def test_triangulation_far_cut(self):
        """triangulate_pair drops matches whose 3D point is beyond th_far
        in either view (LocalMapping.cc:696 semantics)."""
        from orbslam3lib_tpu.mapping.local_mapping import triangulate_pair
        rng = np.random.default_rng(1)
        F = 64
        cam = jnp.asarray([80.0, 80.0, 64.0, 48.0], jnp.float32)
        # world points at two depth bands
        p_w = np.concatenate([
            rng.uniform([-1, -1, 4], [1, 1, 8], (F // 2, 3)),
            rng.uniform([-2, -2, 25], [2, 2, 35], (F // 2, 3))]).astype(np.float32)
        # two cameras with a baseline
        R0, t0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        R1, t1 = np.eye(3, dtype=np.float32), np.asarray([-0.5, 0, 0], np.float32)
        desc = rng.integers(0, 2, (F, 256)).astype(np.int8)

        def proj(R, t):
            pc = p_w @ R.T + t
            return np.stack([80.0 * pc[:, 0] / pc[:, 2] + 64.0,
                             80.0 * pc[:, 1] / pc[:, 2] + 48.0], -1).astype(np.float32)

        m = ms.empty_map(8, 512, F)
        for R, t, xy in [(R0, t0, proj(R0, t0)), (R1, t1, proj(R1, t1))]:
            m, _ = ms.insert_keyframe(
                m, jnp.asarray(R), jnp.asarray(t), jnp.float32(0.0),
                jnp.asarray(xy), jnp.zeros(F, jnp.int32), jnp.asarray(desc),
                jnp.ones(F, bool), jnp.full(F, -1, jnp.int32),
                jnp.zeros(F, jnp.float32))
        m_no, n_no = triangulate_pair(m, jnp.int32(0), jnp.int32(1), cam,
                                      cam_model=0, n_levels=2)
        m_cut, n_cut = triangulate_pair(m, jnp.int32(0), jnp.int32(1), cam,
                                        cam_model=0, n_levels=2,
                                        th_far=jnp.float32(15.0))
        assert int(n_no) > F // 3          # plenty triangulated w/o the cut
        assert int(n_cut) <= F // 2        # far band gone
        # every spawned point with the cut is within 15 m of camera 0
        pos = np.asarray(m_cut.mp_pos)[np.asarray(m_cut.mp_valid)]
        assert pos.shape[0] == int(n_cut)
        assert np.all(np.linalg.norm(pos, axis=-1) < 15.0 + 1.0)

    def test_yaml_flag(self, tmp_path):
        from orbslam3lib_tpu.config import from_yaml
        p = tmp_path / "cfg.yaml"
        p.write_text("Camera.fx: 80.0\nthFarPoints: 20.0\n"
                     "IMU.InsertKFsWhenLost: 0\n")
        cfg = from_yaml(str(p))
        assert cfg.tracker.th_far_points == 20.0
        assert cfg.tracker.insert_kfs_when_lost is False


class TestInsertKFsWhenLost:
    def _lost_tracker(self, flag: bool):
        cfg = _small_cfg()
        cfg.use_imu = True
        cfg.tracker.insert_kfs_when_lost = flag
        tr = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
        F = cfg.orb.max_kp
        feats = _fake_feats(F, stereo=True)
        depth = jnp.asarray(np.full(F, 5.0, np.float32))
        # seed a map + one keyframe at t=0
        tr.state = OK
        tr.pose = (jnp.eye(3), jnp.zeros(3))
        tr.vel = (jnp.eye(3), jnp.zeros(3))
        tr._create_keyframe(feats, jnp.zeros(F), depth,
                            jnp.full(cfg.map.max_mp, -1, jnp.int32), 0.0, 50)
        tr.imu_ready = True
        return tr, feats, depth

    @pytest.mark.parametrize("flag", [True, False])
    def test_kf_insertion_while_lost(self, flag):
        tr, feats, depth = self._lost_tracker(flag)
        n0 = tr.stats["n_kf"]
        F = feats.xy.shape[-2]
        pred = (jnp.eye(3), jnp.asarray([0.1, 0.0, 0.0]))
        out = tr._handle_loss(feats, 0.6, u_r=jnp.zeros(F), depth=depth,
                              pred_pose=pred)
        assert out["state"] == RECENTLY_LOST
        if flag:
            assert tr.stats["n_kf"] == n0 + 1      # bridged the gap
            # pose stands in from the IMU prediction
            assert float(tr.pose[1][0]) == pytest.approx(0.1)
        else:
            assert tr.stats["n_kf"] == n0


class TestBadImuReset:
    def test_flag_and_reset(self):
        cfg = _small_cfg()
        cfg.use_imu = True
        tr = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
        tr.imu_ready = True
        tr._viba_stage = 0
        tr._imu_init_ts = 0.0
        tr._kf_times = [0.0, 0.25, 0.5]
        c = np.zeros(3)
        tr._kf_centers = [c, c + 1e-4, c + 2e-4]   # ~0.1 mm of motion
        tr._check_bad_imu()
        assert tr._bad_imu
        # next frame consumes the flag with an active-map reset
        tr.state = OK
        tr.pose = (jnp.eye(3), jnp.zeros(3))
        n_resets = tr.stats["n_resets"]
        img = np.zeros((2, cfg.camera.height, cfg.camera.width), np.float32)
        tr.process_frame(img, 1.0)
        assert tr.stats["n_resets"] == n_resets + 1
        assert not tr._bad_imu

    def test_no_flag_with_motion(self):
        cfg = _small_cfg()
        cfg.use_imu = True
        tr = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
        tr.imu_ready = True
        tr._viba_stage = 0
        tr._imu_init_ts = 0.0
        tr._kf_times = [0.0, 0.25, 0.5]
        tr._kf_centers = [np.zeros(3), np.array([0.1, 0, 0]),
                          np.array([0.2, 0, 0])]
        tr._check_bad_imu()
        assert not tr._bad_imu
