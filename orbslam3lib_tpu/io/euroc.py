"""EuRoC MAV / TUM-VI dataset loaders (ASL folder format).

The reference consumes these benchmarks via its example mains and the YAML
configs parsed by Settings (Settings.cc:144-177); the BASELINE.json configs
are EuRoC MH01-05 and TUM-VI room1-6. Layout (ASL):

    <root>/mav0/cam0/data.csv          timestamp [ns], filename
    <root>/mav0/cam0/data/<stamp>.png  grayscale images
    <root>/mav0/cam1/...               right / second camera
    <root>/mav0/imu0/data.csv          timestamp, wx, wy, wz, ax, ay, az
    <root>/mav0/state_groundtruth_estimate0/data.csv   (EuRoC ground truth)

Iterators yield frames aligned with the IMU samples in (t_prev, t_cur].
"""
from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _read_csv(path: str) -> List[List[str]]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([c.strip() for c in line.split(",")])
    return rows


def load_image(path: str) -> np.ndarray:
    """Grayscale uint8 -> float32 (H, W)."""
    from PIL import Image
    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


@dataclass
class EurocSequence:
    root: str
    stereo: bool = True

    def __post_init__(self):
        mav = os.path.join(self.root, "mav0")
        self.cam0_rows = _read_csv(os.path.join(mav, "cam0", "data.csv"))
        self.cam1_rows = (_read_csv(os.path.join(mav, "cam1", "data.csv"))
                          if self.stereo and
                          os.path.isdir(os.path.join(mav, "cam1")) else None)
        imu_path = os.path.join(mav, "imu0", "data.csv")
        self.imu = None
        if os.path.isfile(imu_path):
            rows = _read_csv(imu_path)
            self.imu = np.asarray([[float(c) for c in r] for r in rows])
            self.imu[:, 0] *= 1e-9  # ns -> s
        gt_path = os.path.join(mav, "state_groundtruth_estimate0", "data.csv")
        self.ground_truth = None
        if os.path.isfile(gt_path):
            rows = _read_csv(gt_path)
            g = np.asarray([[float(c) for c in r[:8]] for r in rows])
            g[:, 0] *= 1e-9
            self.ground_truth = g  # t, px, py, pz, qw, qx, qy, qz

    def __len__(self):
        return len(self.cam0_rows)

    def _img_path(self, cam: str, fname: str) -> str:
        return os.path.join(self.root, "mav0", cam, "data", fname)

    def frames(self, start: int = 0, end: Optional[int] = None
               ) -> Iterator[Tuple[np.ndarray, float, Optional[Tuple]]]:
        """Yield (images, timestamp_s, imu_chunk) — images is (2, H, W) for
        stereo or (H, W) mono; imu_chunk is (gyro (N,3), acc (N,3), dts (N,))
        covering (t_prev, t_cur], or None."""
        rows = self.cam0_rows[start:end]
        prev_t = None
        for r in rows:
            ts = float(r[0]) * 1e-9
            img0 = load_image(self._img_path("cam0", r[1]))
            if self.cam1_rows is not None:
                img1 = load_image(self._img_path("cam1", r[1]))
                imgs = np.stack([img0, img1])
            else:
                imgs = img0
            chunk = None
            if self.imu is not None and prev_t is not None:
                sel = (self.imu[:, 0] > prev_t) & (self.imu[:, 0] <= ts)
                s = self.imu[sel]
                if len(s):
                    t_edges = np.concatenate([[prev_t], s[:, 0]])
                    dts = np.diff(t_edges).astype(np.float32)
                    chunk = (s[:, 1:4].astype(np.float32),
                             s[:, 4:7].astype(np.float32), dts)
            yield imgs, ts, chunk
            prev_t = ts

    def gt_centers_at(self, timestamps: np.ndarray) -> Optional[np.ndarray]:
        """Interpolated ground-truth positions for ATE evaluation."""
        if self.ground_truth is None:
            return None
        g = self.ground_truth
        out = np.stack([np.interp(timestamps, g[:, 0], g[:, 1 + i])
                        for i in range(3)], axis=1)
        return out


def write_minimal_sequence(root: str, images: List[np.ndarray],
                           timestamps: List[float],
                           images_right: Optional[List[np.ndarray]] = None,
                           imu: Optional[np.ndarray] = None,
                           gt: Optional[np.ndarray] = None):
    """Create an ASL-format directory from in-memory data (test fixture /
    dataset-export utility)."""
    from PIL import Image
    os.makedirs(os.path.join(root, "mav0", "cam0", "data"), exist_ok=True)
    cams = [("cam0", images)]
    if images_right is not None:
        os.makedirs(os.path.join(root, "mav0", "cam1", "data"), exist_ok=True)
        cams.append(("cam1", images_right))
    for cam, imgs in cams:
        with open(os.path.join(root, "mav0", cam, "data.csv"), "w") as f:
            f.write("#timestamp [ns],filename\n")
            for img, ts in zip(imgs, timestamps):
                ns = int(round(ts * 1e9))
                fname = f"{ns}.png"
                Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                    os.path.join(root, "mav0", cam, "data", fname))
                f.write(f"{ns},{fname}\n")
    if imu is not None:
        os.makedirs(os.path.join(root, "mav0", "imu0"), exist_ok=True)
        with open(os.path.join(root, "mav0", "imu0", "data.csv"), "w") as f:
            f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
            for row in imu:
                f.write(f"{int(round(row[0]*1e9))}," +
                        ",".join(f"{v:.9f}" for v in row[1:7]) + "\n")
    if gt is not None:
        d = os.path.join(root, "mav0", "state_groundtruth_estimate0")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.csv"), "w") as f:
            f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
            for row in gt:
                f.write(f"{int(round(row[0]*1e9))}," +
                        ",".join(f"{v:.9f}" for v in row[1:8]) + "\n")
