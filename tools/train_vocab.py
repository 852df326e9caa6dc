"""Offline BoW vocabulary training (the reference ships a pre-trained binary
vocabulary loaded at startup — CustomVocabulary.h:60, System.cc:126-130; this
is the train-and-ship workflow that produces our equivalent).

Renders a corpus of synthetic stereo scenes (varied textures, geometry and
viewpoints), extracts real ORB descriptors with the production extractor, and
trains a hierarchical k-medians tree (models/vocabulary.py) with corpus idf
weights. The result is saved to orbslam3lib_tpu/data/orb_vocab.npz, which the
Tracker auto-loads (tracking/tracker.py _ensure_place_rec).

Usage:
    python tools/train_vocab.py [--k 10] [--depth 4] [--scenes 12]
                                [--frames 16] [--out PATH]

Sizing note: DBoW2's public ORB vocab (1M words) serves 10^5-image corpora;
at this framework's map scale (max_kf=256, <=512 features/frame, ~1.3e5
descriptors/map) W = k^depth = 10^4 words keeps ~20x the per-frame feature
count — the same words-per-image ratio — without starving idf statistics.
Pass --depth 5 for a 10^5-word tree when targeting larger corpora.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus(n_scenes: int, n_frames: int, max_kp: int = 512):
    """Render varied corridor worlds and extract ORB descriptors.

    Returns (descriptors (N,256) int8 0/1, doc_ids (N,) int32)."""
    import jax.numpy as jnp
    from orbslam3lib_tpu.io.synthetic import (CorridorWorld, StereoRig,
                                              corridor_trajectory)
    from orbslam3lib_tpu.ops.extractor import extract_orb_mono

    rig = StereoRig()
    descs, docs = [], []
    doc = 0
    for s in range(n_scenes):
        rng = np.random.default_rng(1000 + s)
        world = CorridorWorld(
            half_w=float(rng.uniform(1.5, 3.5)),
            half_h=float(rng.uniform(1.0, 2.5)),
            z1=float(rng.uniform(40.0, 120.0)),
            tex_seed=17 * s + 3)
        R_l, c_l, _ = corridor_trajectory(
            n_frames, dt=1.0 / 10.0, speed=float(rng.uniform(0.4, 1.2)))
        for i in range(n_frames):
            img = world.render(R_l[i], c_l[i], rig, rng=rng).astype(np.float32)
            f = extract_orb_mono(jnp.asarray(img), jnp.float32(15.0),
                                 max_kp=max_kp, n_levels=8)
            valid = np.asarray(f.valid[0])
            d = np.asarray(f.desc[0])[valid]
            descs.append(d.astype(np.int8))
            docs.append(np.full(len(d), doc, np.int32))
            doc += 1
        print(f"[vocab] scene {s + 1}/{n_scenes}: "
              f"{sum(len(d) for d in descs)} descriptors", flush=True)
    return np.concatenate(descs), np.concatenate(docs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from orbslam3lib_tpu.models.vocabulary import (DEFAULT_VOCAB_PATH,
                                                   save_vocabulary,
                                                   train_vocabulary)
    out = args.out or DEFAULT_VOCAB_PATH
    t0 = time.time()
    desc, docs = build_corpus(args.scenes, args.frames)
    print(f"[vocab] corpus: {len(desc)} descriptors from {docs.max() + 1} "
          f"images in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    voc = train_vocabulary(desc, k=args.k, depth=args.depth, doc_ids=docs)
    print(f"[vocab] trained k={args.k} L={args.depth} "
          f"({voc.n_words} words) in {time.time() - t0:.0f}s", flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_vocabulary(voc, out)
    print(f"[vocab] saved -> {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
