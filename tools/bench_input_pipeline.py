"""Host input-pipeline throughput: native SGRC train packer vs the
Python loader's pixel path.

Both sides assemble the identical training payload from the same raw
images: ColorJitter (torchvision blend semantics) + square BILINEAR
resize + BGR-mean normalization for the contrastive aug view, plus the
plain square view, plus the padded annotation grid.  The native side is
`sgc_pack_train_batch` (data/native/sgc_pack.cc, one thread per record);
the Python side is what `data.dataset.VGDataset.__getitem__` does per
image (square_image + color_jitter, PIL + numpy).  This is the loader
work the reference serializes on num_workers=0 (reference
train_test.py:52).

Usage: python tools/bench_input_pipeline.py [--images 48] [--size 1024]
                                            [--out BENCH_EVAL_rNN.json]
Prints one JSON line; --out merges an "input_pipeline" block into the
bench record.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from scene_graph_commonsense_tpu.data.dataset import (  # noqa: E402
    apply_color_jitter, color_jitter_params, square_image)
from scene_graph_commonsense_tpu.data.native import (  # noqa: E402
    NativeBatchPacker, write_sgrec)


def make_records(tmp, n_images, rng, fs=32, k=17, n_obj=8):
    paths, raws = [], []
    for i in range(n_images):
        h, w = int(rng.integers(400, 700)), int(rng.integers(500, 900))
        raw = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        cats = rng.integers(0, 150, n_obj).astype(np.int32)
        boxes = np.tile(np.asarray([2, 20, 4, 24], np.float32),
                        (n_obj, 1))
        super_mh = np.zeros((n_obj, k), np.uint8)
        rels = [np.full(j, -1, np.int32) for j in range(1, n_obj)]
        dirs = [np.full(j, -1.0, np.float32) for j in range(1, n_obj)]
        depth = rng.random((fs, fs)).astype(np.float32)
        p = os.path.join(tmp, f"b{i:04d}.sgrec")
        write_sgrec(p, cats, boxes, super_mh, rels, dirs, depth,
                    feature_size=fs, num_super=k, image=raw)
        paths.append(p)
        raws.append(raw)
    return paths, raws


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as tmp:
        paths, raws = make_records(tmp, args.images, rng)
        packer = NativeBatchPacker(max_objects=8, feature_size=32,
                                   num_super=17,
                                   num_threads=args.threads)
        jitter = np.zeros((len(paths), 9), np.float32)
        for i in range(len(paths)):
            apply, order, factors = color_jitter_params(rng)
            jitter[i, 0] = float(apply)
            jitter[i, 1:5] = order
            jitter[i, 5:9] = factors

        # native: record read + jitter + 2 resizes + normalize, threaded
        packer.pack_train(paths[:4], jitter[:4], args.size,
                          want_plain=True)          # warm the .so
        t0 = time.perf_counter()
        out = packer.pack_train(paths, jitter, args.size, want_plain=True)
        t_native = time.perf_counter() - t0
        assert out["ok"].all()

        # python: the same pixel math per image (VGDataset.__getitem__)
        t0 = time.perf_counter()
        for i, raw in enumerate(raws):
            square_image(raw, args.size)
            img = raw.astype(np.float32)
            if jitter[i, 0] > 0.5:
                img = apply_color_jitter(img, jitter[i, 1:5].astype(int),
                                         jitter[i, 5:9])
            square_image(img.astype(np.uint8), args.size)
        t_python = time.perf_counter() - t0

    n = len(paths)
    stats = {
        "images": n,
        "image_size": args.size,
        "native_threads": args.threads,
        "host_cores": os.cpu_count(),
        "native_img_per_s": round(n / t_native, 1),
        "python_img_per_s": round(n / t_python, 1),
        "speedup": round(t_python / t_native, 2),
    }
    print(json.dumps({"metric": "input_pipeline", **stats}))
    if args.out:
        rec = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                rec = json.load(f)
        rec["input_pipeline"] = stats
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
