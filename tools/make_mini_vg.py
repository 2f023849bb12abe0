"""Fabricates a miniature Visual Genome in the REFERENCE on-disk format so
the full CLI ladder (train -> eval pc -> prepare_cs -> train_cs -> eval_cs
-> eval sgc -> eval sgd -> --predictor ...) can be dress-rehearsed end to
end without the real 108k-image dataset.

Outputs (reference contract, reference dataloader.py:59-165,
dataset_utils.py:28-200):
  <out>/images/mini_000000.jpg ...          RGB images with one colored
                                            rectangle per object (class ->
                                            hue, so recall can beat random)
  <out>/annot/mini_000000_annotations.pkl   torch-saved dict:
      categories       (n,) int64
      super_categories list of per-object super-cat id tensors
      bbox             (n, 4) float32, feature-grid (x0, x1, y0, y1)
      relationships    lower-triangular rows: row i (len i) relates object
                       i to objects 0..i-1, raw predicate ids (pre-reorder)
      subj_or_obj      same shape, 1.0 = row object is subject, 0.0 =
                       object, -1.0 = no relation
      image_depth      (1, fs, fs) float32
  <out>/instances_vg_train.json, instances_vg_test.json

Relations are drawn from a fixed stochastic grammar over object classes
(pred = f(sub_cat, obj_cat) mostly) so the relation signal is learnable.

Usage: python tools/make_mini_vg.py --out datasets/mini_vg --images 200
       [--feature-size 32] [--max-objects 12] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def scene(rng, num_objects, fs, num_classes=150, num_rel=50):
    cats = rng.integers(0, num_classes, num_objects)
    # well-formed grid boxes, area-sorted descending like the offline
    # pipeline (reference dataset_utils.py:117)
    x0 = rng.integers(0, fs - 2, num_objects)
    y0 = rng.integers(0, fs - 2, num_objects)
    w = rng.integers(2, max(fs // 2, 3), num_objects)
    h = rng.integers(2, max(fs // 2, 3), num_objects)
    boxes = np.stack([x0, np.minimum(x0 + w, fs),
                      y0, np.minimum(y0 + h, fs)], 1).astype(np.float32)
    area = (boxes[:, 1] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 2])
    order = np.argsort(-area, kind="stable")
    cats, boxes = cats[order], boxes[order]

    rel_rows, dir_rows = [], []
    for i in range(1, num_objects):
        row = np.full(i, -1, np.int64)
        direction = np.full(i, -1.0, np.float32)
        for j in range(i):
            # only relate OVERLAPPING pairs: PredCLS eval drops pairs with
            # zero joint-mask IoU (reference evaluate.py:149-156), so
            # relations between disjoint boxes are unreachable by design
            # and would cap attainable recall
            overlap = (min(boxes[i, 1], boxes[j, 1])
                       > max(boxes[i, 0], boxes[j, 0])
                       and min(boxes[i, 3], boxes[j, 3])
                       > max(boxes[i, 2], boxes[j, 2]))
            if overlap and rng.random() < 0.6:
                direction[j] = float(rng.integers(0, 2))
                # learnable grammar: the predicate is a function of the
                # SUBJECT's class alone, so the label-conditioned head can
                # fit it through its class embeddings in a few SGD steps
                sub_cat = cats[i] if direction[j] == 1.0 else cats[j]
                row[j] = (int(sub_cat) * 7 + 3) % num_rel
        rel_rows.append(row)
        dir_rows.append(direction)
    return cats, boxes, rel_rows, dir_rows


def render(rng, cats, boxes, fs, size=256):
    """Class-coded rectangles on a noisy background."""
    img = rng.integers(90, 120, (size, size, 3)).astype(np.uint8)
    scale = size / fs
    for c, (bx0, bx1, by0, by1) in zip(cats, boxes):
        color = np.array([(c * 53) % 200 + 55, (c * 101) % 200 + 55,
                          (c * 29) % 200 + 55], np.uint8)
        xs, xe = int(bx0 * scale), max(int(bx1 * scale), int(bx0 * scale) + 2)
        ys, ye = int(by0 * scale), max(int(by1 * scale), int(by0 * scale) + 2)
        img[ys:ye, xs:xe] = color
    return img


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/mini_vg")
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--feature-size", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--max-objects", type=int, default=12)
    ap.add_argument("--num-classes", type=int, default=150,
                    help="restrict object classes to 0..N-1 so tiny runs "
                         "see each class pair often enough to learn")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train-frac", type=float, default=0.75)
    a = ap.parse_args(argv)

    import torch
    from PIL import Image

    from scene_graph_commonsense_tpu.data.artifacts import load_vg_artifacts

    art = load_vg_artifacts("datasets/artifacts")
    if art.sub2super is not None:
        sup_lists = [list(np.nonzero(row)[0]) for row in art.sub2super]
    else:
        sup_lists = [[c % 17] for c in range(150)]

    rng = np.random.default_rng(a.seed)
    img_dir = os.path.join(a.out, "images")
    annot_dir = os.path.join(a.out, "annot")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(annot_dir, exist_ok=True)

    names = []
    for i in range(a.images):
        name = f"mini_{i:06d}"
        n = int(rng.integers(2, a.max_objects + 1))
        cats, boxes, rel_rows, dir_rows = scene(rng, n, a.feature_size,
                                                num_classes=a.num_classes)
        img = render(rng, cats, boxes, a.feature_size, a.image_size)
        Image.fromarray(img).save(os.path.join(img_dir, name + ".jpg"),
                                  quality=90)
        depth = rng.random((1, a.feature_size, a.feature_size)) \
            .astype(np.float32)
        annot = {
            "categories": torch.from_numpy(cats.astype(np.int64)),
            "super_categories": [torch.as_tensor(sup_lists[int(c)])
                                 for c in cats],
            "bbox": torch.from_numpy(boxes),
            "relationships": [torch.from_numpy(r) for r in rel_rows],
            "subj_or_obj": [torch.from_numpy(d) for d in dir_rows],
            "image_depth": torch.from_numpy(depth),
        }
        torch.save(annot, os.path.join(annot_dir,
                                       name + "_annotations.pkl"))
        names.append(name + ".jpg")

    n_train = int(a.train_frac * len(names))
    for split, chunk in (("train", names[:n_train]),
                         ("test", names[n_train:])):
        path = os.path.join(a.out, f"instances_vg_{split}.json")
        with open(path, "w") as f:
            json.dump({"images": [{"file_name": nm} for nm in chunk]}, f)
    print(f"wrote {len(names)} images to {a.out} "
          f"({n_train} train / {len(names) - n_train} test)")


if __name__ == "__main__":
    main()
