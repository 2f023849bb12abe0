"""Offline Visual Genome preprocessing CLI.

Pipeline (reference preprocess.py + prepare_datasets.py):
  1. raw VG JSONs -> instances_vg_{train,test}.json  (--stage instances)
  2. instances json -> per-image annotation cache    (--stage annotations)
  3. train/test/zero-shot triplet tables             (--stage triplets)
  4. annotation cache -> SGRC binary records for the C++ batch packer
     (--stage sgrecords; consumed via data.sgrc_dir + data/pipeline.py)

Usage:
  python tools/preprocess_vg.py --stage instances \
      --raw_dir datasets/vg/annotations --h5 datasets/vg/VG-SGG-with-attri.h5
  python tools/preprocess_vg.py --stage annotations \
      --split train --with_depth
  python tools/preprocess_vg.py --stage triplets
  python tools/preprocess_vg.py --stage sgrecords --split test \
      --out datasets/vg_sgrc_test --cluster motif
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scene_graph_commonsense_tpu.config import derive  # noqa: E402
from scene_graph_commonsense_tpu.constants import rel_index_map  # noqa: E402
from scene_graph_commonsense_tpu.data import preprocess as pp  # noqa: E402


def stage_instances(args, cfg):
    raw = args.raw_dir
    with open(os.path.join(raw, "image_data.json")) as f:
        raw_img = json.load(f)
    with open(os.path.join(raw, "objects.json")) as f:
        raw_obj = json.load(f)
    with open(os.path.join(raw, "relationships.json")) as f:
        raw_rel = json.load(f)
    train_idx, test_idx = pp.load_h5_split(args.h5)
    assert len(train_idx) == 75651 and len(test_idx) == 32422, \
        "split must match VG-SGG-with-attri.h5 (reference preprocess.py:37)"
    vocab = "datasets/vg_scene_graph_annot"
    train, test, sub2super = pp.build_instances_dataset(
        raw_img, raw_obj, raw_rel,
        os.path.join(vocab, "object_alias.txt"),
        os.path.join(vocab, "predicate_alias.txt"),
        os.path.join(vocab, "object_list.txt"),
        os.path.join(vocab, "object_types.txt"),
        train_idx, test_idx)
    with open(cfg.data.annotation_train, "w") as f:
        json.dump(train, f)
    with open(cfg.data.annotation_test, "w") as f:
        json.dump(test, f)
    print(f"wrote {cfg.data.annotation_train} "
          f"({len(train['images'])} images) and {cfg.data.annotation_test} "
          f"({len(test['images'])} images)")


def stage_annotations(args, cfg):
    annot = (cfg.data.annotation_train if args.split == "train"
             else cfg.data.annotation_test)
    with open(annot) as f:
        dataset = json.load(f)
    depth_fn = None
    if args.with_depth:
        from scene_graph_commonsense_tpu.data.depth import (
            make_midas_depth_fn)
        depth_fn = make_midas_depth_fn(feature_size=cfg.model.feature_size)
        if depth_fn is None:
            print("MiDaS unavailable; writing zero depth maps")
    n = pp.build_all_annotations(dataset, cfg.data.annot_dir,
                                 cfg.model.feature_size, depth_fn,
                                 cfg.data.image_dir, verbose=True)
    print(f"wrote {n} per-image annotation files under "
          f"{cfg.data.annot_dir}")


def stage_triplets(args, cfg):
    """Train/test/zero-shot triplet tables in the configured clustering's
    predicate order (reference dataset_utils.py:231-290 incl. the
    wears->wearing merge).  The order must match what the dataset emits
    (data/dataset.py applies rel_index_map) or zsR@k counts the wrong
    triplets — regenerate the tables when changing --cluster."""
    rel_map = rel_index_map(cfg.data.supcat_clustering)
    tables = {}
    for split, path in [("train", cfg.data.annotation_train),
                        ("test", cfg.data.annotation_test)]:
        with open(path) as f:
            anns = json.load(f)["annotations"]
        keys = set()
        for a in anns:
            rel = a["relation_id"]
            if rel == 12:
                rel = 4
            rel = int(rel_map[rel])
            keys.add((a["category1"], rel, a["category2"]))
        tables[split] = keys
        print(f"{split}: {len(keys)} unique triplets")
    zs = tables["test"] - tables["train"]
    print(f"zero-shot: {len(zs)} triplets")

    def unzip(keys):
        keys = sorted(keys)
        return (np.asarray([k[0] for k in keys], np.int32),
                np.asarray([k[1] for k in keys], np.int32),
                np.asarray([k[2] for k in keys], np.int32))

    out = {}
    for prefix, keys in [("train", tables["train"]),
                         ("test", tables["test"]), ("zs", zs)]:
        s, r, o = unzip(keys)
        out[f"{prefix}_sub"] = s
        out[f"{prefix}_rel"] = r
        out[f"{prefix}_obj"] = o
    os.makedirs(cfg.data.artifacts_dir, exist_ok=True)
    path = os.path.join(cfg.data.artifacts_dir, "vg_artifacts.npz")
    if os.path.exists(path):
        existing = dict(np.load(path))
        existing.update(out)
        out = existing
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


def stage_sgrecords(args, cfg, log_fn=print):
    """Per-image annotations -> SGRC binary records for the C++ batch
    packer (data/native).  Records bake in the wears-merge + cluster
    permutation (data/dataset.remap_lower_relationships) and the
    reference-faithful super-category multi-hot, so they are specific to
    --cluster — keep one record dir per clustering.  Returns the number
    of records written."""
    from scene_graph_commonsense_tpu.data.artifacts import super_multi_hot
    from scene_graph_commonsense_tpu.data.dataset import (
        load_annotation, remap_lower_relationships)
    from scene_graph_commonsense_tpu.data.native import write_sgrec

    annot = (cfg.data.annotation_train if args.split == "train"
             else cfg.data.annotation_test)
    with open(annot) as f:
        images = json.load(f)["images"]
    rel_map = rel_index_map(cfg.data.supcat_clustering)
    out_dir = args.out
    os.makedirs(out_dir, exist_ok=True)
    n_max = cfg.data.max_objects
    written = skipped = 0
    for img in images:
        name = os.path.splitext(img["file_name"])[0]
        rec = load_annotation(os.path.join(
            cfg.data.annot_dir, name + "_annotations.pkl"))
        if rec is None:
            rec = load_annotation(os.path.join(
                cfg.data.annot_dir, name + "_annotations.npz"))
        if rec is None:
            skipped += 1
            continue
        n = len(rec["categories"])
        if n <= 1 or n > n_max:        # reference dataloader.py:119
            skipped += 1
            continue
        rels = remap_lower_relationships(rec["relationships"], rel_map)
        super_mh = np.zeros((n, 17), np.uint8)
        if "super_categories" in rec:
            scs = [np.asarray(s).reshape(-1)
                   for s in rec["super_categories"]]
            super_mh = super_multi_hot(scs).astype(np.uint8)
        image = None
        if getattr(args, "embed_images", False):
            img_path = os.path.join(cfg.data.image_dir, img["file_name"])
            if not os.path.exists(img_path):
                skipped += 1
                continue
            from PIL import Image
            image = np.asarray(Image.open(img_path).convert("RGB"))
        write_sgrec(os.path.join(out_dir, name + ".sgrec"),
                    np.asarray(rec["categories"], np.int32),
                    np.asarray(rec["bbox"], np.float32),
                    super_mh, rels, rec["subj_or_obj"],
                    np.asarray(rec["image_depth"], np.float32),
                    feature_size=cfg.model.feature_size, image=image)
        written += 1
    log_fn(f"wrote {written} SGRC records under {out_dir} "
           f"({skipped} images skipped)")
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["instances", "annotations", "triplets",
                             "sgrecords"])
    ap.add_argument("--raw_dir", default="datasets/vg/annotations")
    ap.add_argument("--h5", default="datasets/vg/VG-SGG-with-attri.h5")
    ap.add_argument("--split", default="train", choices=["train", "test"])
    ap.add_argument("--with_depth", action="store_true")
    ap.add_argument("--out", default="datasets/vg_sgrc",
                    help="output dir for --stage sgrecords")
    ap.add_argument("--embed-images", action="store_true",
                    help="write v2 records with the raw RGB image "
                         "embedded so TRAINING batches (per-epoch "
                         "contrastive view) can be assembled by the C++ "
                         "packer (data.sgrc_dir + train)")
    ap.add_argument("--cluster", default="motif",
                    choices=["motif", "gpt2", "bert", "clip"],
                    help="predicate order for the triplet tables (must "
                         "match the training --cluster)")
    ap.add_argument("--config", default=None,
                    help="optional YAML config (paths, feature_size, "
                         "max_objects) — same schema as main.py --config")
    args = ap.parse_args()
    if args.config:
        from scene_graph_commonsense_tpu.config import load_config
        cfg = load_config(args.config, supcat_clustering=args.cluster)
    else:
        cfg = derive("vg", supcat_clustering=args.cluster)
    if args.stage == "instances":
        stage_instances(args, cfg)
    elif args.stage == "annotations":
        stage_annotations(args, cfg)
    elif args.stage == "sgrecords":
        stage_sgrecords(args, cfg)
    else:
        stage_triplets(args, cfg)


if __name__ == "__main__":
    main()
