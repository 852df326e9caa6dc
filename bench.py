"""Benchmark: end-to-end SLAM front-end throughput on the attached device.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference runs full SLAM at 90 FPS on the Lynx-R1 Hexagon DSP
(BASELINE.md). The dominant per-frame device cost there is the DSP front end
(pyramid + FAST + orientation + BRIEF + stereo BF matching, orbslam_dsp.cpp
hot loops 1-3); this bench measures exactly that pipeline per stereo frame —
batched stereo extraction + rectified matching at the reference geometry
(2x640x400, 8 levels) — steady-state, inputs resident on device.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from orbslam3lib_tpu.ops.extractor import extract_orb_stereo
    from orbslam3lib_tpu.tracking.matching import match_rectified_stereo

    @jax.jit
    def frontend(img_pair, threshold):
        feats = extract_orb_stereo(img_pair, threshold, max_kp=512, n_levels=8)
        u_r, depth = match_rectified_stereo(
            feats.xy[0], feats.level[0], feats.desc[0], feats.valid[0],
            feats.xy[1], feats.level[1], feats.desc[1], feats.valid[1],
            jnp.float32(33.0), jnp.float32(0.3), n_levels=8)
        return feats.xy, feats.valid, u_r, depth

    rng = np.random.default_rng(0)
    # textured random image so FAST/top-k see realistic occupancy
    base = rng.uniform(0, 255, size=(2, 50, 80)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), dtype=np.float32))
    img += rng.normal(0, 8, img.shape).astype(np.float32)
    img_pair = jnp.asarray(np.clip(img, 0, 255))
    threshold = jnp.float32(17.0)

    out = frontend(img_pair, threshold)
    jax.block_until_ready(out)  # compile

    n_warm, n_iter = 5, 50
    for _ in range(n_warm):
        jax.block_until_ready(frontend(img_pair, threshold))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = frontend(img_pair, threshold)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "stereo_frontend_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 90.0, 3),
    }))


if __name__ == "__main__":
    main()
