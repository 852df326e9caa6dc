"""Covisibility-driven local mapping (LocalMapping.cc:394-961 parity):
triangulation against the best covisible keyframes, SearchInNeighbors-style
fusion both ways, >=90%-redundancy keyframe culling, and the
covisibility-selected local-BA window.

Scenario: an out-and-back corridor run. The return leg revisits the forward
leg's viewpoints, so temporal recency and covisibility diverge: without
fusion, re-triangulated duplicates accumulate; without culling, the
keyframe set doubles over redundant views."""
import numpy as np
import pytest
import jax.numpy as jnp

from orbslam3lib_tpu.config import SlamConfig
from orbslam3lib_tpu.evaluation import ate_rmse
from orbslam3lib_tpu.io.synthetic import CorridorWorld, StereoRig
from orbslam3lib_tpu.mapping import local_mapping as lm_ops
from orbslam3lib_tpu.models import map_state as ms
from orbslam3lib_tpu.tracking.tracker import OK, Tracker

pytestmark = pytest.mark.slow  # e2e tier: excluded from the smoke run


def out_and_back(n_half=28, dt=1.0 / 15.0, z_max=1.6):
    """Forward then backward along the corridor, constant orientation."""
    rig = StereoRig()
    world = CorridorWorld()
    rng = np.random.default_rng(3)
    zs = np.concatenate([np.linspace(0, z_max, n_half),
                         np.linspace(z_max, 0, n_half)])
    frames = []
    R_cw = np.eye(3, dtype=np.float32)
    for i, z in enumerate(zs):
        c = np.array([0.05 * np.sin(1.7 * z), 0.03 * np.cos(2.3 * z), z],
                     np.float32)
        c_r = c + R_cw @ np.array([rig.baseline, 0, 0], np.float32)
        img_l = world.render(R_cw, c, rig, rng=rng)
        img_r = world.render(R_cw, c_r, rig, rng=rng)
        R = R_cw.T.copy()
        t = (-R @ c).astype(np.float32)
        frames.append((np.stack([img_l, img_r]), (R, t), i * dt))
    return frames, rig


def make_cfg(rig):
    cfg = SlamConfig()
    cfg.map.max_kf = 64
    cfg.map.max_mp = 4096
    cfg.orb.max_kp = 384
    cfg.orb.target_features = 300
    cfg.orb.fast_threshold = 12.0
    cfg.tracker.min_init_features = 150
    cfg.ba.max_points = 1024
    cfg.ba.window_size = 6
    # dense keyframing so the return leg creates genuinely redundant KFs
    cfg.tracker.kf_ref_ratio = 10.0
    cfg.tracker.min_frames_between_kf = 2
    cfg.camera.fx, cfg.camera.fy = rig.fx, rig.fy
    cfg.camera.cx, cfg.camera.cy = rig.cx, rig.cy
    cfg.camera.width, cfg.camera.height = rig.width, rig.height
    cfg.stereo.baseline = rig.baseline
    return cfg


@pytest.fixture(scope="module")
def revisit_frames():
    return out_and_back()


def run(frames, rig, **mapping_overrides):
    cfg = make_cfg(rig)
    for k, v in mapping_overrides.items():
        setattr(cfg.mapping, k, v)
    tr = Tracker(cfg, sensor="stereo", enable_loop_closing=False)
    for img, _, ts in frames:
        tr.process_frame(img, ts)
    tr.finish()
    return tr


class TestCovisMapping:
    def test_ops_units(self):
        m = ms.empty_map(8, 64, 16)
        # two KFs sharing landmarks, one disjoint
        rows = np.full((8, 16), -1, np.int32)
        rows[0, :8] = np.arange(8)
        rows[1, :8] = np.arange(8)          # shares all 8 with kf0
        rows[2, :4] = np.arange(4)          # shares 4
        rows[3, :8] = np.arange(20, 28)     # disjoint
        m = m._replace(kf_mp=jnp.asarray(rows),
                       kf_valid=jnp.asarray([True] * 4 + [False] * 4),
                       kf_feat_valid=jnp.ones((8, 16), bool),
                       mp_valid=jnp.ones(64, bool), n_kf=jnp.int32(4))
        nbrs = np.asarray(lm_ops.top_covisible(m, jnp.int32(0), n=3))
        assert nbrs[0] == 1 and nbrs[1] == 2 and nbrs[2] == -1

        ids, fixed = lm_ops.covis_ba_window(m, jnp.int32(1), n_win=3,
                                            n_fixed=1)
        ids = np.asarray(ids)
        assert ids[0] == 0 and bool(fixed[0])          # oldest fixed
        assert 1 in ids.tolist()

        mask = np.asarray(lm_ops.observed_mp_mask(
            m, jnp.asarray([0, 3], jnp.int32)))
        assert mask[:8].all() and mask[20:28].all() and not mask[8:20].any()
        # -1 entries are ignored
        mask2 = np.asarray(lm_ops.observed_mp_mask(
            m, jnp.asarray([-1, 3], jnp.int32)))
        assert not mask2[:8].any() and mask2[20:28].all()

    def test_revisit_tracks_and_culls(self, revisit_frames):
        frames, rig = revisit_frames
        tr = run(frames, rig)
        assert tr.state == OK
        assert tr.stats["track_fail"] == 0
        est = tr.trajectory_centers()
        gt = np.stack([-R.T @ t for _, (R, t), _ in frames[-len(est):]])
        assert ate_rmse(est, gt) < 0.05
        # the return leg is redundant: culling must have retired keyframes
        n_inserted = tr.stats["n_kf"]
        n_alive = int(np.asarray(tr.map.kf_valid).sum())
        assert n_alive < n_inserted, (n_alive, n_inserted)

    def test_fusion_bounds_duplicates(self, revisit_frames):
        frames, rig = revisit_frames
        tr_on = run(frames, rig)
        tr_off = run(frames, rig, n_fuse_neighbors=0, kf_culling=False)
        # fusion + culling keep the LIVE landmark set tighter on revisit
        # (cumulative allocations can differ either way: culled observations
        # trigger re-triangulation)
        n_alive_on = int(np.asarray(tr_on.map.mp_valid).sum())
        n_alive_off = int(np.asarray(tr_off.map.mp_valid).sum())
        assert n_alive_on < n_alive_off, (n_alive_on, n_alive_off)
