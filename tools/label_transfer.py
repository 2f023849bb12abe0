"""IETrans / NICE data-transfer driver.

Runs a trained relation model over the training annotations, proposes
relabels (data/label_transfer.py), and writes a rewritten annotation set
that any training path consumes unchanged — the TPU-native equivalent of
the reference's scenegraph_benchmark_ietrans/ and _nice/ pipelines
(reference README_PLUGANDPLAY.md:21-22, 192-200).

Usage:
  # smoke run on synthetic batches (random weights, no files written)
  python tools/label_transfer.py --mode ietrans --synthetic 4

  # real pass: score train annotations with a checkpoint and write the
  # transferred annotation npz files under --out_dir
  python tools/label_transfer.py --mode nice --percent 30 \
      --checkpoint checkpoints/HierRelationModel_Baseline_motif2 \
      --out_dir datasets/vg_ietrans

Prints one JSON summary line (candidate/applied counts and the predicate
histogram shift).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def collect_scores(cfg, batches, estep, params):
    """Runs the jitted eval step over batches and scatters the packed pair
    outputs back onto per-image (N, N, R) score grids.

    Returns dict image_key -> (rel, scores, conn, valid_pair, annot_path).
    """
    import jax

    from scene_graph_commonsense_tpu.ops import pairs as pair_ops

    n = cfg.data.max_objects
    out_recs = {}
    next_key = 0
    for batch in batches:
        paths = batch.pop("annot_path", None)
        batch = {k: v for k, v in batch.items()
                 if k not in ("image", "image_aug", "image_nonsq",
                              "pixel_mask")}
        out = jax.tree.map(np.asarray, estep(params, batch))
        b = np.asarray(batch["cats"]).shape[0]
        r = out["relation"].shape[1]
        scores = np.full((b, n, n, r), -np.inf, np.float32)
        conn = np.zeros((b, n, n), np.float32)
        m = out["pair_mask"]
        scores[out["pair_img"][m], out["pair_sub"][m],
               out["pair_obj"][m]] = out["relation"][m]
        conn[out["pair_img"][m], out["pair_sub"][m], out["pair_obj"][m]] = \
            1.0 / (1.0 + np.exp(-out["connectivity"][m]))
        vp = np.asarray(pair_ops.pair_validity(batch["valid"]))
        rel = np.asarray(batch["rel"])
        for bi in range(b):
            key = next_key
            next_key += 1
            out_recs[key] = {
                "rel": rel[bi], "scores": scores[bi], "conn": conn[bi],
                "valid_pair": vp[bi],
                "annot_path": None if paths is None else paths[bi],
            }
    return out_recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["ietrans", "nice"],
                    default="ietrans")
    ap.add_argument("--percent", type=float, default=None,
                    help="internal-transfer (ietrans) / correction (nice) "
                         "top-percent threshold")
    ap.add_argument("--external_percent", type=float, default=100.0)
    ap.add_argument("--external_min_conn", type=float, default=0.5,
                    help="relatedness-probability gate for external "
                         "(NA->predicate) transfer")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out_dir", default=None,
                    help="where rewritten *_annotations.npz land "
                         "(required unless --synthetic)")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from scene_graph_commonsense_tpu.config import load_config
    from scene_graph_commonsense_tpu.constants import rel_index_map
    from scene_graph_commonsense_tpu.data import label_transfer as lt
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.train import engine

    import dataclasses

    cfg = load_config(args.config)
    cfg = cfg.replace(training=dataclasses.replace(
        cfg.training, batch_size=args.batch_size))

    model = make_relation_classifier(cfg)
    s = cfg.model.feature_size
    x0 = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c0 = jnp.zeros(2, jnp.int32)
    s0 = jnp.zeros((2, cfg.model.num_super_classes))
    params = model.init(jax.random.PRNGKey(0), x0, x0, c0, c0, s0, s0)
    if args.checkpoint:
        from scene_graph_commonsense_tpu.train import checkpoint as ckpt
        params = ckpt.restore(args.checkpoint, params)
    estep = engine.make_eval_step(model, cfg)

    if args.synthetic:
        from scene_graph_commonsense_tpu.data.synthetic import (
            synthetic_batch)
        rng = np.random.default_rng(0)
        batches = [{k: jnp.asarray(v) for k, v in synthetic_batch(
            rng, batch_size=args.batch_size,
            max_objects=cfg.data.max_objects, feature_size=s,
            num_channels=cfg.model.num_img_feature,
            with_aug=False).items()} for _ in range(args.synthetic)]
    else:
        if not args.out_dir:
            sys.exit("--out_dir required for a real (non-synthetic) pass")
        from scene_graph_commonsense_tpu.data.dataset import (
            VGDataset, batches_from_dataset)
        from scene_graph_commonsense_tpu.train.loop import (
            load_detr_featurizer)
        annot = cfg.data.annotation_train
        if not os.path.exists(annot):
            sys.exit(f"{annot} not found — run tools/preprocess_vg.py "
                     f"first or use --synthetic N")
        with open(annot) as f:
            annotations = json.load(f)
        ds = VGDataset(cfg, annotations, training=False)
        featurize, _, _ = load_detr_featurizer(cfg)
        # drop_last=False: a rewrite tool must cover every image (the one
        # tail batch costs one extra jit compile at its partial size)
        batches = map(featurize,
                      batches_from_dataset(ds, args.batch_size,
                                           seed=cfg.training.seed,
                                           shuffle=False,
                                           drop_last=False))

    recs = collect_scores(cfg, batches, estep, params)
    rels = {k: r["rel"] for k, r in recs.items()}
    scores = {k: r["scores"] for k, r in recs.items()}

    if args.mode == "ietrans":
        new_rels, summary = lt.ietrans(
            rels, scores,
            {k: r["conn"] for k, r in recs.items()},
            {k: r["valid_pair"] for k, r in recs.items()},
            cfg.model.num_relations,
            internal_percent=(args.percent if args.percent is not None
                              else 70.0),
            external_percent=args.external_percent,
            external_min_conn=args.external_min_conn)
    else:
        new_rels, summary = lt.nice(
            rels, scores,
            percent=args.percent if args.percent is not None else 30.0)

    freq_before = lt.predicate_frequencies(rels.values(),
                                           cfg.model.num_relations)
    freq_after = lt.predicate_frequencies(new_rels.values(),
                                          cfg.model.num_relations)
    written = skipped = 0
    if args.out_dir:
        from scene_graph_commonsense_tpu.data.dataset import load_annotation
        rel_map = rel_index_map(cfg.data.supcat_clustering)
        os.makedirs(args.out_dir, exist_ok=True)
        for k, r in recs.items():
            if r["annot_path"] is None or np.array_equal(new_rels[k],
                                                         rels[k]):
                continue
            rec = load_annotation(r["annot_path"])
            if rec is None:
                # the dataset's annot_path names the reference .pkl; fall
                # back to this framework's .npz like VGDataset.get_example
                base = os.path.splitext(r["annot_path"])[0]
                rec = load_annotation(base + ".npz")
            if rec is None:
                skipped += 1
                continue
            rec2 = lt.rewrite_annotation(rec, new_rels[k], rel_map)
            name = os.path.basename(r["annot_path"])
            if not name.endswith(".npz"):
                name = os.path.splitext(name)[0] + ".npz"
            out = os.path.join(args.out_dir, name)
            np.savez_compressed(
                out, image_depth=rec2["image_depth"],
                categories=rec2["categories"], bbox=rec2["bbox"],
                relationships=np.array(rec2["relationships"],
                                       dtype=object),
                subj_or_obj=np.array(rec2["subj_or_obj"], dtype=object),
                super_categories=np.array(
                    rec2.get("super_categories", []), dtype=object))
            written += 1

    print(json.dumps({
        "mode": args.mode, "images": len(recs), **summary,
        "written": written, "skipped": skipped,
        "tail_mass_before": round(float(
            freq_before[freq_before.argsort()[:25]].sum()
            / max(freq_before.sum(), 1)), 4),
        "tail_mass_after": round(float(
            freq_after[freq_before.argsort()[:25]].sum()
            / max(freq_after.sum(), 1)), 4),
    }))


if __name__ == "__main__":
    main()
