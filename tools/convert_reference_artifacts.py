"""Converts the reference repo's torch-pickled dataset artifacts into the
framework's dense .npz bundle (data artifacts only — no code is taken).

Inputs (reference repo layout, see SURVEY.md §2.2):
  datasets/vg_scene_graph_annot/{train,test,zero_shot}_triplets.pt
      dicts/lists keyed by 'sub_rel_obj' strings
  datasets/vg_scene_graph_annot/sub2super_cat_dict.pt
      {object_class: [super_category_ids]}
  triplets/commonsense_{aligned,violated}_triplets.pt
      dicts keyed by (sub, rel, obj) tuples

Usage:
  python tools/convert_reference_artifacts.py \
      --reference /root/reference --out datasets/artifacts
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scene_graph_commonsense_tpu.data.artifacts import (  # noqa: E402
    NUM_OBJ, NUM_SUPER, parse_triplet_strings)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="datasets/artifacts")
    args = ap.parse_args()

    import torch  # CPU torch: offline conversion only

    def load(rel_path):
        path = os.path.join(args.reference, rel_path)
        if not os.path.exists(path):
            print(f"missing: {path}")
            return None
        return torch.load(path, map_location="cpu", weights_only=False)

    out = {}

    for prefix, rel_path in [
            ("train", "datasets/vg_scene_graph_annot/train_triplets.pt"),
            ("test", "datasets/vg_scene_graph_annot/test_triplets.pt"),
            ("zs", "datasets/vg_scene_graph_annot/zero_shot_triplets.pt")]:
        obj = load(rel_path)
        if obj is None:
            continue
        keys = list(obj.keys()) if hasattr(obj, "keys") else list(obj)
        ids = parse_triplet_strings(keys)
        for k, v in ids.items():
            out[f"{prefix}_{k}"] = v
        print(f"{prefix}: {len(keys)} triplets")

    s2s = load("datasets/vg_scene_graph_annot/sub2super_cat_dict.pt")
    if s2s is not None:
        # reference-faithful {first, last} encoding (see
        # data.artifacts.super_multi_hot / reference utils.py:123-133)
        from scene_graph_commonsense_tpu.data.artifacts import (
            super_multi_hot)
        lists = [[] for _ in range(NUM_OBJ)]
        for cls, supers in s2s.items():
            sup = supers if isinstance(supers, (list, tuple)) else [supers]
            lists[int(cls)] = [int(s) for s in sup]
        mh = super_multi_hot(lists).astype(bool)
        out["sub2super"] = mh
        print(f"sub2super: {mh.sum()} entries")

    for prefix, rel_path in [
            ("cs_aligned", "triplets/commonsense_aligned_triplets.pt"),
            ("cs_violated", "triplets/commonsense_violated_triplets.pt")]:
        obj = load(rel_path)
        if obj is None:
            continue
        keys = [k for k in obj.keys()
                if 0 <= k[0] < NUM_OBJ and 0 <= k[2] < NUM_OBJ
                and 0 <= k[1] < 50]
        out[f"{prefix}_sub"] = np.asarray([k[0] for k in keys], np.int32)
        out[f"{prefix}_rel"] = np.asarray([k[1] for k in keys], np.int32)
        out[f"{prefix}_obj"] = np.asarray([k[2] for k in keys], np.int32)
        print(f"{prefix}: {len(keys)} triplets")

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "vg_artifacts.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
