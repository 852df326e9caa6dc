"""Offline visualization (Viewer/FrameDrawer/MapDrawer equivalents)."""
import os

import numpy as np
import jax.numpy as jnp

from orbslam3lib_tpu import viz
from orbslam3lib_tpu.models import map_state as ms

RNG = np.random.default_rng(4)


def small_map():
    m = ms.empty_map(max_kf=8, max_mp=64, n_feat=32)
    F = 32
    for i in range(3):
        m, _ = ms.insert_keyframe(
            m, jnp.eye(3, dtype=jnp.float32),
            jnp.asarray([0.2 * i, 0.0, 0.0], dtype=jnp.float32),
            jnp.float32(i), jnp.zeros((F, 2), jnp.float32),
            jnp.zeros(F, jnp.int32), jnp.zeros((F, 256), jnp.int8),
            jnp.zeros(F, bool), jnp.full(F, -1, jnp.int32),
            jnp.zeros(F, jnp.float32))
    pos = RNG.uniform(-2, 2, (64, 3)).astype(np.float32)
    valid = np.zeros(64, bool); valid[:40] = True
    return m._replace(mp_pos=jnp.asarray(pos), mp_valid=jnp.asarray(valid),
                      n_mp=jnp.int32(40))


def test_write_png_roundtrip(tmp_path):
    rgb = RNG.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    p = str(tmp_path / "t.png")
    viz.write_png(p, rgb)
    from PIL import Image
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, rgb)


def test_draw_frame_marks_keypoints(tmp_path):
    img = RNG.uniform(0, 255, (100, 120)).astype(np.float32)
    xy = np.array([[30.0, 40.0], [80.0, 20.0], [500.0, 500.0]])
    valid = np.array([True, True, True])
    tracked = np.array([True, False, False])
    rgb = viz.draw_frame(img, xy, valid, tracked)
    assert rgb.shape == (100, 120, 3)
    # green box around the tracked point, blue around the other
    assert tuple(rgb[38, 28]) == tuple(viz.GREEN)
    assert tuple(rgb[18, 78]) == tuple(viz.BLUE)
    viz.save_frame(str(tmp_path / "f.png"), img, xy, valid, tracked)
    assert os.path.getsize(tmp_path / "f.png") > 100


def test_render_map_and_ply(tmp_path):
    m = small_map()
    traj = [(0.0, np.eye(3), np.array([0.1, 0, 0]))]
    viz.render_map(str(tmp_path / "m.png"), m, trajectory=traj)
    assert os.path.getsize(tmp_path / "m.png") > 1000
    viz.export_ply(str(tmp_path / "m.ply"), m, trajectory=traj)
    lines = open(tmp_path / "m.ply").read().splitlines()
    assert lines[0] == "ply"
    n = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    assert n == 40 + 3 + 1  # landmarks + kf centers + trajectory
    assert len(lines) == n + 10  # header is 10 lines
