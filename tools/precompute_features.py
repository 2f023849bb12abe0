"""Precompute frozen DETR-101 feature maps for a dataset split.

The reference re-runs its frozen detector on every image in every epoch
(reference train_test.py:152-154 under no_grad).  Since the detector
never trains, its encoder output per image is a constant; this tool
computes it once and writes one `<image>_features.npz` per image.  With
`data: {features_dir: ...}` set, the dataset emits the cached map
directly and the training loop's featurize step only encodes the
(stochastically jittered, uncacheable) contrastive view — roughly a
third of a real-data training epoch's device time, and all of a PredCLS
eval's image IO.

Usage:
  python tools/precompute_features.py --split train \
      --out datasets/vg_features [--config cfg.yaml] [--batch_size 12]

Features are stored float16 ((S, S, C) per image, ~0.5 MB at VG
dimensions); the loader upcasts to float32.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", choices=["train", "test"], default="train")
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--batch_size", type=int, default=12)
    args = ap.parse_args()

    from scene_graph_commonsense_tpu.config import load_config
    from scene_graph_commonsense_tpu.data.dataset import (
        VGDataset, batches_from_dataset)
    from scene_graph_commonsense_tpu.train.loop import load_detr_featurizer
    from scene_graph_commonsense_tpu.utils.jax_cache import (
        enable_compile_cache)
    enable_compile_cache()

    cfg = load_config(args.config)
    annot = (cfg.data.annotation_train if args.split == "train"
             else cfg.data.annotation_test)
    if not os.path.exists(annot):
        sys.exit(f"{annot} not found — run the preprocessing pipeline "
                 f"first")
    # training=False: no contrastive view; the features of the MAIN view
    # are what gets cached
    if cfg.data.dataset == "oiv6":
        from scene_graph_commonsense_tpu.data.oiv6 import (
            OIV6Dataset, oiv6_batches)
        ds = OIV6Dataset(cfg, annot, training=False,
                         image_dir=cfg.data.image_dir, load_images=True)
        batches = oiv6_batches(ds, args.batch_size, shuffle=False,
                               drop_last=False)

        def name_of(path):
            # OIv6 annot_path is the bare img_fn
            return str(path)
    else:
        with open(annot) as f:
            annotations = json.load(f)
        ds = VGDataset(cfg, annotations, training=False)
        batches = batches_from_dataset(ds, args.batch_size, shuffle=False,
                                       drop_last=False)

        def name_of(path):
            # mirror the annotation cache's relative layout (file names
            # may carry subdirectories, e.g. VG_100K/123) so the
            # dataset's features_dir lookup by image file_name resolves
            name = os.path.relpath(str(path), cfg.data.annot_dir)
            return name.replace("_annotations.pkl", "").replace(
                "_annotations.npz", "")

    featurize, _, _ = load_detr_featurizer(cfg)
    os.makedirs(args.out, exist_ok=True)
    written = 0
    for batch in batches:
        paths = batch.get("annot_path")
        batch = featurize(batch)
        feats = np.asarray(batch["features"], np.float16)
        for bi, path in enumerate(paths):
            out = os.path.join(args.out, name_of(path) + "_features.npz")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            np.savez_compressed(out, features=feats[bi])
            written += 1
            if written % 1000 == 0:
                print(f"{written} feature maps written", flush=True)
    print(json.dumps({"split": args.split, "written": written,
                      "out": args.out}))


if __name__ == "__main__":
    main()
