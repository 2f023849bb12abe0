"""Offline OIv6 depth-map preparation.

TPU-native counterpart of the reference's `prepare_depth_oiv6_offline`
(reference dataset_utils.py:203-228): runs MiDaS once per OpenImages V6
image, resizes the prediction to the feature grid, min-max normalizes it,
and caches one `<img_fn>_depth.npz` per image — exactly the artifact
`data/oiv6.py::OIV6Dataset` consumes at train/eval time (depth is a frozen
input channel, never trained through, so it stays an offline tool).

Restartable: existing outputs are skipped, so an interrupted run resumes
where it stopped (same per-image-artifact design as prepare_cs).  When
MiDaS cannot be loaded (no torch-hub weights / no egress) it writes zero
depth maps unless --require_midas is set, matching the pipeline's
use_depth=False fallback (reference dataloader.py:113-114).

Usage:
  python tools/prepare_depth_oiv6.py --annotation vrd-train-anno.json \
      --image_dir images/ --out depth/ [--feature_size 32] [--model_type DPT_Large]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def prepare_depth(annotation_path: str, image_dir: str, out_dir: str,
                  feature_size: int = 32, depth_fn=None,
                  log_fn=print) -> dict:
    """Writes one `<img_fn>_depth.npz` per annotation record.  Returns
    {written, skipped, missing} counts.  `depth_fn` is injectable for
    tests; None means zero depth maps."""
    with open(annotation_path) as f:
        annotations = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    written = skipped = missing = 0
    for rec in annotations:
        img_fn = rec["img_fn"]
        out_path = os.path.join(out_dir, img_fn + "_depth.npz")
        if os.path.exists(out_path):
            skipped += 1
            continue
        depth = np.zeros((feature_size, feature_size), np.float32)
        if depth_fn is not None:
            img_path = os.path.join(image_dir, img_fn + ".jpg")
            if not os.path.exists(img_path):
                missing += 1
                continue            # no artifact: resumable once the image is
            from PIL import Image   # fetched (see module docstring)
            image = np.asarray(Image.open(img_path).convert("RGB"))
            depth = np.asarray(depth_fn(image), np.float32)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        np.savez_compressed(out_path, depth=depth)
        written += 1
    log_fn(f"depth maps: {written} written, {skipped} already present, "
           f"{missing} images missing")
    return {"written": written, "skipped": skipped, "missing": missing}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotation", required=True,
                    help="SGTR vrd-{train,test}-anno.json")
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--out", required=True, help="depth_dir for OIV6Dataset")
    ap.add_argument("--feature_size", type=int, default=32)
    ap.add_argument("--model_type", default="DPT_Large")
    ap.add_argument("--require_midas", action="store_true",
                    help="fail instead of writing zero depth maps")
    args = ap.parse_args()

    from scene_graph_commonsense_tpu.data.depth import make_midas_depth_fn
    depth_fn = make_midas_depth_fn(args.model_type,
                                   feature_size=args.feature_size)
    if depth_fn is None:
        if args.require_midas:
            raise SystemExit("MiDaS unavailable (no weights/egress)")
        print("MiDaS unavailable; writing zero depth maps")
    prepare_depth(args.annotation, args.image_dir, args.out,
                  args.feature_size, depth_fn)


if __name__ == "__main__":
    main()
