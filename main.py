"""CLI entry point mirroring the reference's main.py flag surface
(reference main.py:18-127):

  python main.py --run_mode {train,eval,prepare_cs,train_cs,eval_cs}
                 --eval_mode {pc,sgc,sgd} --cluster {motif,gpt2,bert,clip}
                 [--hierar] [--dataset {vg,oiv6}] [--synthetic N]

--synthetic N runs the pipeline on N synthetic VG-shaped batches (no images
on disk needed) — the smoke-test analogue of the reference's
percent_train/percent_test subsampling knobs (reference config.yaml:17-18).
"""

import argparse
import json
import os
import sys

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_mode", default=None,
                    choices=["train", "eval", "prepare_cs", "train_cs",
                             "eval_cs"])
    ap.add_argument("--eval_mode", default=None,
                    choices=["pc", "sgc", "sgd"])
    ap.add_argument("--cluster", default=None,
                    choices=["motif", "gpt2", "bert", "clip"])
    ap.add_argument("--hierar", action="store_const",
                    const=True, default=None)
    ap.add_argument("--dataset", default=None,
                    choices=["vg", "oiv6"])
    ap.add_argument("--config", default=None, help="optional YAML config")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run on N synthetic batches instead of real data")
    ap.add_argument("--predictor", default=None,
                    choices=["motifs", "transformer", "vctree", "vtranse"],
                    help="train/eval a plug-and-play predictor family "
                         "(context model + hierarchical head) instead of "
                         "the flagship relation classifier")
    ap.add_argument("--tde", action="store_true",
                    help="score predictor eval by Total Direct Effect "
                         "(counterfactual debiasing; with --predictor)")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--mesh_data", type=int, default=-1,
                    help="data-parallel mesh axis size (-1 = all devices)")
    ap.add_argument("--mock-llm", action="store_true",
                    help="prepare_cs with a deterministic offline stand-in "
                         "for the OpenAI transport (integration tests / "
                         "air-gapped dress rehearsals)")
    return ap.parse_args()


def mock_llm_transport():
    """Deterministic offline LLM: an edge's verdict is a hash of its text,
    answered coherently across the 4 paraphrases (prompts 2/3 are negated,
    commonsense/client.PROMPT_VARIATIONS), so majority votes are clean
    +1/-1 and prepare_cs produces a meaningful aligned/violated split."""
    import hashlib
    import re

    def transport(prompts):
        out = []
        for p in prompts:
            m = re.search(r"'(.+?)'", p) \
                or re.search(r"either a (.+?) or a", p) \
                or re.search(r"relation (.+?) impossible", p)
            edge = m.group(1) if m else p
            positive = int(hashlib.md5(edge.lower().encode()).hexdigest(),
                           16) % 4 != 0       # ~75% of edges pass
            negated = p.startswith("Regardless") or "impossible" in p
            out.append("Yes" if positive != negated else "No")
        return out

    return transport


def build_cfg(args):
    from scene_graph_commonsense_tpu.config import load_config
    overrides = {"dataset": args.dataset,
                 "supcat_clustering": args.cluster,
                 "hierarchical_pred": args.hierar,
                 "run_mode": args.run_mode,
                 "eval_mode": args.eval_mode}
    cfg = load_config(args.config, **overrides)
    training = {}
    if args.batch_size:
        training["batch_size"] = args.batch_size
    if args.epochs:
        training["num_epoch"] = args.epochs
    if training:
        import dataclasses
        cfg = cfg.replace(training=dataclasses.replace(cfg.training,
                                                       **training))
    return cfg


def synthetic_batches(cfg, n_batches, seed=0, with_aug=True):
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch

    def gen(epoch=0):
        rng = np.random.default_rng(seed + epoch)
        for _ in range(n_batches):
            yield synthetic_batch(
                rng, batch_size=cfg.training.batch_size,
                max_objects=cfg.data.max_objects,
                feature_size=cfg.model.feature_size,
                num_channels=cfg.model.num_img_feature,
                num_classes=cfg.model.num_classes,
                num_relations=cfg.model.num_relations,
                with_aug=with_aug)

    return gen


def native_batches(cfg, training: bool = False):
    """Batch source assembled by the C++ packer (data/native): SGRC
    records (cfg.data.sgrc_dir) + the precomputed feature cache.

    Eval (PredCLS): annotation-only v1 records, features from the cache.
    Training: v2 records with the embedded raw image — the per-epoch
    jittered contrastive view is computed by native threads
    (sgc_pack_train_batch); the main view comes from the feature cache
    when available, else from the natively-resized plain view."""
    import glob as _glob
    from scene_graph_commonsense_tpu.data.pipeline import (
        NativeRecordPipeline)
    have_cache = bool(cfg.data.features_dir)
    if not training and not have_cache:
        sys.exit("data.sgrc_dir eval requires data.features_dir: SGRC "
                 "records carry no plain view for PredCLS "
                 "(tools/precompute_features.py)")
    paths = sorted(_glob.glob(os.path.join(cfg.data.sgrc_dir, "*.sgrec")))
    if not paths:
        sys.exit(f"no .sgrec records under {cfg.data.sgrc_dir}; run "
                 f"tools/preprocess_vg.py --stage sgrecords"
                 + (" --embed-images" if training else ""))
    pct = cfg.data.percent_train if training else cfg.data.percent_test
    paths = paths[:max(1, int(pct * len(paths)))]
    pipe = NativeRecordPipeline(
        paths, cfg.training.batch_size,
        max_objects=cfg.data.max_objects,
        feature_size=cfg.model.feature_size, shuffle=training,
        seed=cfg.training.seed, training=training,
        image_size=cfg.model.image_size if training else 0,
        want_plain=training and not have_cache)

    def attach_features(batch):
        if not have_cache:
            return batch
        feats = []
        for p in batch["annot_path"]:
            name = os.path.splitext(os.path.basename(p))[0]
            fp = os.path.join(cfg.data.features_dir,
                              name + "_features.npz")
            feats.append(np.load(fp)["features"].astype(np.float32))
        batch["features"] = np.stack(feats)
        return batch

    def gen(epoch=0):
        return map(attach_features, pipe.iter_epoch(epoch))

    return gen


def real_batches(cfg, training: bool):
    # native C++ pipeline: training always (v2 records carry pixels);
    # eval only with a feature cache (v1 records are annotation-only) —
    # otherwise the Python loader supplies the eval pixels
    if (cfg.data.sgrc_dir and cfg.data.dataset == "vg"
            and (training or (cfg.training.eval_mode == "pc"
                              and cfg.data.features_dir))):
        return native_batches(cfg, training=training)
    annot = (cfg.data.annotation_train if training
             else cfg.data.annotation_test)
    if not os.path.exists(annot):
        sys.exit(f"annotation file {annot} not found; run the preprocessing "
                 f"pipeline (tools/preprocess_vg.py) or use --synthetic N")
    if cfg.data.dataset == "oiv6":
        from scene_graph_commonsense_tpu.data.oiv6 import (
            OIV6Dataset, oiv6_batches)
        ds = OIV6Dataset(cfg, annot, training=training,
                         image_dir=cfg.data.image_dir,
                         depth_dir=cfg.data.depth_dir or None,
                         load_images=True)

        def gen(epoch=0):
            return oiv6_batches(ds, cfg.training.batch_size, seed=epoch,
                                shuffle=training)

        return gen
    from scene_graph_commonsense_tpu.data.dataset import (
        VGDataset, batches_from_dataset)
    with open(annot) as f:
        annotations = json.load(f)
    ds = VGDataset(cfg, annotations, training=training)
    pct = cfg.data.percent_train if training else cfg.data.percent_test

    def gen(epoch=0):
        return batches_from_dataset(ds, cfg.training.batch_size,
                                    seed=epoch, shuffle=training,
                                    percent=pct)

    return gen


def prepped_batches(cfg, batches, featurize):
    """Background-prefetched (and optionally DETR-featurized) batch stream
    for the eval/prepare_cs paths; training.prefetch_batches=0 falls back
    to synchronous loading."""
    from scene_graph_commonsense_tpu.data.pipeline import prefetch_iterator
    if cfg.training.prefetch_batches > 0:
        return prefetch_iterator(batches, cfg.training.prefetch_batches,
                                 featurize)
    return map(featurize, batches) if featurize is not None else batches


def _result_view(res):
    """The one-line JSON result record: scalars and metric lists, plus the
    Top-3 sub-dict (reference main.py:112-123 reports Top-3 alongside the
    PredCLS metrics; tools/checkpoint_parity.py diffs it)."""
    return {k: v for k, v in res.items()
            if (isinstance(v, (int, float, list)) or k == "top3")
            and k != "recall_per_class"}


def init_relation_params(cfg, model):
    import jax
    import jax.numpy as jnp
    s = cfg.model.feature_size
    x = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c = jnp.zeros(2, jnp.int32)
    sc = jnp.zeros((2, cfg.model.num_super_classes))
    return model.init(jax.random.PRNGKey(0), x, x, c, c, sc, sc)


def main():
    args = parse_args()
    cfg = build_cfg(args)
    print(f"run_mode={cfg.training.run_mode} eval_mode="
          f"{cfg.training.eval_mode} dataset={cfg.data.dataset} "
          f"hierar={cfg.model.hierarchical_pred} "
          f"cluster={cfg.data.supcat_clustering}")

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # Re-assert the env var into jax.config: the sandbox's
        # sitecustomize force-registers the TPU tunnel backend in a way
        # that ignores JAX_PLATFORMS, so parity subprocesses that set
        # JAX_PLATFORMS=cpu (tools/checkpoint_parity.py,
        # tools/detection_parity.py) would silently land on the TPU —
        # where their float64 programs cannot compile.  The config update
        # takes precedence over backend registration (same trick as
        # tests/conftest.py).
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if cfg.model.compute_dtype == "float64":
        # precision knob for parity harnesses (tools/checkpoint_parity.py):
        # f64 end-to-end kills cross-framework candidate-rank flips
        jax.config.update("jax_enable_x64", True)
    from scene_graph_commonsense_tpu.data.artifacts import load_vg_artifacts
    from scene_graph_commonsense_tpu.utils.jax_cache import (
        enable_compile_cache)
    enable_compile_cache()
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.parallel.mesh import make_mesh

    model = make_relation_classifier(cfg)
    params = init_relation_params(cfg, model)
    # the converted triplet/zero-shot tables are VG label-space ids
    artifacts = (load_vg_artifacts(cfg.data.artifacts_dir)
                 if cfg.data.dataset == "vg" else None)
    mesh = None
    if len(jax.devices()) > 1:
        data_axis = (args.mesh_data if args.mesh_data != -1
                     else cfg.parallel.data_axis)
        if data_axis <= 0:
            # auto mesh: the data axis must divide the global batch
            # (shard_map/GSPMD sharding constraint), so pick the largest
            # divisor that fits — an 8-device harness driving batch 2
            # must run 2-way, not fail the device_put (batch % 8 != 0)
            avail = len(jax.devices()) // cfg.parallel.model_axis
            b = cfg.training.batch_size
            data_axis = max(d for d in range(1, avail + 1) if b % d == 0)
        if data_axis > 1 or cfg.parallel.model_axis > 1:
            mesh = make_mesh(data=data_axis,
                             model=cfg.parallel.model_axis)

    featurize = None
    if args.synthetic:
        train_fn = synthetic_batches(cfg, args.synthetic)
        test_fn = synthetic_batches(cfg, max(args.synthetic // 4, 1),
                                    seed=100, with_aug=False)
    else:
        train_fn = real_batches(cfg, training=True)
        test_fn = real_batches(cfg, training=False)
        # frozen DETR-101 featurizer (reference train_utils.py:9-18); the
        # converter (models/weights.py) produces the msgpack from the
        # reference's torch checkpoint
        from scene_graph_commonsense_tpu.train.loop import (
            load_detr_featurizer)
        featurize, detr, detr_params = load_detr_featurizer(cfg)

    run_mode = cfg.training.run_mode
    if args.tde and not args.predictor:
        # refuse loudly instead of silently running plain (biased)
        # scoring the user would report as +TDE numbers
        sys.exit("--tde requires --predictor (TDE scoring is implemented "
                 "for the plug-and-play predictor eval path)")
    if args.predictor:
        # plug-and-play model families (BASELINE config 5): Motifs /
        # Transformer / VCTree context + hierarchical head end-to-end
        from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib
        from scene_graph_commonsense_tpu.train import pnp_engine
        if run_mode in ("train", "train_cs"):
            pnp_engine.fit_predictor(cfg, args.predictor, train_fn,
                                     test_fn, artifacts=artifacts,
                                     featurize=featurize,
                                     steps_per_epoch=args.synthetic or 1000)
        elif run_mode in ("eval", "eval_cs"):
            predictor = pnp_engine.make_predictor(cfg, args.predictor)
            p = pnp_engine.init_predictor_params(cfg, predictor)
            ckpt = os.path.join(cfg.training.checkpoint_path,
                                pnp_engine.checkpoint_name(
                                    args.predictor,
                                    cfg.data.supcat_clustering,
                                    cfg.training.test_epoch, run_mode))
            if os.path.exists(ckpt):
                p = ckpt_lib.restore(ckpt, p)
            else:
                print(f"WARNING: predictor checkpoint {ckpt} not found — "
                      f"evaluating randomly initialized weights")
            from scene_graph_commonsense_tpu.train.loop import eval_mesh
            res = pnp_engine.run_eval_pc_predictor(
                cfg, predictor, p, test_fn(0), artifacts=artifacts,
                featurize=featurize, use_cs=run_mode == "eval_cs",
                tde=args.tde, mesh=eval_mesh(cfg, mesh))
            print(json.dumps(_result_view(res), default=str))
        else:
            # prepare_cs collects triplets from the flagship PredCLS path;
            # refuse loudly rather than silently running without --predictor
            sys.exit(f"--predictor does not support run_mode {run_mode}")
        return
    if run_mode in ("train", "train_cs"):
        from scene_graph_commonsense_tpu.train.loop import fit
        fit(cfg, model, params, train_fn, test_fn,
            steps_per_epoch=args.synthetic or 1000, artifacts=artifacts,
            mesh=mesh, featurize=featurize)
    elif run_mode in ("eval", "eval_cs"):
        from scene_graph_commonsense_tpu.eval import engines
        from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib
        from scene_graph_commonsense_tpu.train.loop import eval_mesh
        use_cs = run_mode == "eval_cs"
        # load the trained relation classifier (reference
        # evaluate.py:65-76); eval_cs evaluates the CS-trained weights
        name = ckpt_lib.checkpoint_name(
            cfg.model.hierarchical_pred,
            "train_cs" if use_cs else "train",
            cfg.data.supcat_clustering, cfg.training.test_epoch)
        ckpt = os.path.join(cfg.training.checkpoint_path, name)
        if os.path.exists(ckpt):
            params = ckpt_lib.restore(ckpt, params)
            print(f"Loaded relation checkpoint {ckpt}")
        else:
            print(f"WARNING: relation checkpoint {ckpt} not found — "
                  f"evaluating randomly initialized weights")
        batches = prepped_batches(cfg, test_fn(0), featurize)
        if cfg.training.eval_mode == "pc":
            on_batch = None
            if cfg.training.save_vis_results:
                from scene_graph_commonsense_tpu.eval.visualization import (
                    save_visualization_results)
                s = cfg.model.image_size

                def on_batch(i, out, cand, tgt):
                    save_visualization_results(
                        os.path.join(cfg.training.result_path,
                                     "visualization"),
                        i, cand, tgt,
                        heights=[s] * cfg.training.batch_size,
                        widths=[s] * cfg.training.batch_size,
                        feature_size=cfg.model.feature_size)

            res = engines.run_eval_pc(cfg, model, params, batches,
                                      artifacts=artifacts, use_cs=use_cs,
                                      on_batch=on_batch,
                                      mesh=eval_mesh(cfg, mesh))
        elif args.synthetic:
            sys.exit("sgc/sgd need detector outputs; run on real data with "
                     "a converted DETR checkpoint")
        else:
            em = eval_mesh(cfg, mesh)
            detect_fn = engines.make_detr_detect_fn(
                cfg, detr, detr_params, mesh=em)
            runner = (engines.run_eval_sgc if cfg.training.eval_mode ==
                      "sgc" else engines.run_eval_sgd)
            res = runner(cfg, model, params, batches, detect_fn,
                         artifacts=artifacts, use_cs=use_cs, mesh=em)
        print(json.dumps(_result_view(res), default=str))
    elif run_mode == "prepare_cs":
        from scene_graph_commonsense_tpu.commonsense.pipeline import (
            run_prepare_cs)
        from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib
        # prepare_cs queries the LLM about the *trained* baseline model's
        # top predictions (reference main.py:106-114)
        name = ckpt_lib.checkpoint_name(
            cfg.model.hierarchical_pred, "train",
            cfg.data.supcat_clustering, cfg.training.test_epoch)
        ckpt = os.path.join(cfg.training.checkpoint_path, name)
        if os.path.exists(ckpt):
            params = ckpt_lib.restore(ckpt, params)
            print(f"Loaded relation checkpoint {ckpt}")
        else:
            print(f"WARNING: relation checkpoint {ckpt} not found — "
                  f"prepare_cs will query predictions of random weights")
        batches = prepped_batches(cfg, train_fn(0), featurize)
        transport = mock_llm_transport() if args.mock_llm else None
        run_prepare_cs(cfg, model, params, batches, artifacts,
                       transport=transport)
    else:
        sys.exit(f"unhandled run_mode {run_mode}")


if __name__ == "__main__":
    main()
