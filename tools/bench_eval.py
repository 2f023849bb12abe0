"""Inference-path throughput benchmarks on the real chip.

Measures the serving-relevant configs of BASELINE.json at real model
dimensions on synthetic inputs (bench.py keeps the single-line training
headline; this tool reports the eval side):

  * predcls   — relation eval step over precomputed features + GT objects
  * detect    — full DETR-101 forward + static postprocess/NMS
  * sgdet     — detect + relation eval chained (the full SGDET pipeline)
  * trainfull — featurize-INCLUDED training: both contrastive views through
                the frozen DETR encoder every batch (what the reference does,
                train_test.py:152-154) + the jitted train step.  bench.py's
                headline is the features-cached config; this is the other one.

Measurement note: on the axon TPU tunnel `jax.block_until_ready` does not
actually block, so naive dispatch loops measure nothing.  Each metric runs
a dependency-chained loop (step i+1 consumes a scalar from step i, so the
device serializes) at two lengths; the per-step time is the difference,
which cancels the tunnel's fixed sync latency.  The training bench doesn't
need this because its donated TrainState already forces serialization.

Usage: python tools/bench_eval.py [predcls|detect|sgdet|trainfull|all]
                                  [--out BENCH_EVAL_rNN.json]
Prints one JSON line per mode; --out also records (merging into an
existing file) so each round's eval-side numbers live next to BENCH_r*.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 12
STEPS = 10
SHORT = 2


def chained_rate(run_step, n_long: int = STEPS, n_short: int = SHORT):
    """run_step(i, carry) -> scalar jax value; returns seconds/step from
    the (long - short) chained-run difference."""

    def chain(n):
        carry = None
        for i in range(n):
            carry = run_step(i, carry)
        return float(carry)           # scalar fetch syncs the chain

    chain(n_short)                    # warmup (compiles both carry paths)
    t0 = time.perf_counter()
    chain(n_short)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain(n_long)
    t_long = time.perf_counter() - t0
    return (t_long - t_short) / (n_long - n_short)


MODES = ("predcls", "detect", "sgdet", "trainfull", "encode", "all")


def main():
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    mode = argv[0] if argv else "all"
    if mode not in MODES:
        sys.exit(f"unknown mode {mode!r}; expected one of {MODES}")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scene_graph_commonsense_tpu.utils.jax_cache import (
        enable_compile_cache)
    enable_compile_cache()

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
    from scene_graph_commonsense_tpu.eval import engines
    from scene_graph_commonsense_tpu.models.detr import DETR, make_detr
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.train import engine as engine_lib

    cfg = derive("vg", hierarchical_pred=True,
                 training={"batch_size": BATCH, "pair_capacity": 1024})
    model = make_relation_classifier(cfg)
    s = cfg.model.feature_size
    x0 = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c0 = jnp.zeros(2, jnp.int32)
    s0 = jnp.zeros((2, cfg.model.num_super_classes))
    params = model.init(jax.random.PRNGKey(0), x0, x0, c0, c0, s0, s0)

    rng = np.random.default_rng(0)
    batches = [{k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch_size=BATCH, max_objects=cfg.data.max_objects,
        feature_size=s, num_channels=cfg.model.num_img_feature,
        mean_objects=8.0, with_aug=False).items()}
        for _ in range(STEPS)]

    results = {}
    if mode in ("predcls", "all"):
        estep = engine_lib.make_eval_step(model, cfg)

        def pc_step(i, carry):
            b = dict(batches[i % STEPS])
            if carry is not None:
                b["features"] = b["features"] + carry * 0
            return estep(params, b)["relation"][0, 0]

        dt = chained_rate(pc_step)
        results["predcls_eval"] = BATCH / dt

    if mode in ("detect", "sgdet", "trainfull", "encode", "all"):
        detr = make_detr(cfg)
        detr_params = detr.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)),
                                jnp.ones((1, 64, 64), bool))
        size = cfg.model.image_size
        mask = jnp.ones((BATCH, size, size), bool)
        key = jax.random.PRNGKey(0)
        dbatches = [jax.random.normal(jax.random.fold_in(key, i),
                                      (BATCH, size, size, 3), jnp.float32)
                    for i in range(STEPS)]
        detect_fn = engines.make_detr_detect_fn(cfg, detr, detr_params,
                                                image_key="image_nonsq")

        if mode in ("detect", "all"):
            def det_step(i, carry):
                img = dbatches[i % STEPS]
                if carry is not None:
                    img = img + carry * 0
                det = detect_fn({"image_nonsq": img, "pixel_mask": mask})
                return det["boxes"][0, 0, 0]

            dt = chained_rate(det_step)
            results["detection"] = BATCH / dt

        if mode in ("sgdet", "all"):
            estep = engine_lib.make_eval_step(model, cfg)
            sub2super = jnp.zeros(
                (cfg.model.num_classes, cfg.model.num_super_classes),
                jnp.float32)

            def sgdet_step(i, carry):
                img = dbatches[i % STEPS]
                if carry is not None:
                    img = img + carry * 0
                det = detect_fn({"image_nonsq": img, "pixel_mask": mask})
                rb = dict(batches[i % STEPS])
                rb["cats"] = det["cats"]
                rb["boxes"] = det["boxes"]
                rb["valid"] = det["valid"]
                rb["super_mh"] = sub2super[det["cats"]]
                return estep(params, rb)["relation"][0, 0]

            dt = chained_rate(sgdet_step)
            results["sgdet_pipeline"] = BATCH / dt

        if mode in ("encode", "all"):
            # Encode-path split + MFU.  The relation stage consumes the
            # encoder-only feature path (reference train_utils.py:9-18);
            # after the Pallas trunk fusion the interesting questions are
            # (a) how the remaining encode time splits between the conv
            # trunk and the transformer encoder and (b) how close the
            # whole path runs to roofline.  FLOPs come from XLA's cost
            # analysis of the UNFUSED program — XLA cannot see inside the
            # Pallas custom calls, but the math is identical, so the XLA
            # count over the fused path's measured time is the honest MFU.
            from bench import _peak_flops
            from scene_graph_commonsense_tpu.models.detr import ResNet101
            from scene_graph_commonsense_tpu.models.resnet_fused import (
                resnet_forward_fused)

            cdt = jnp.dtype(cfg.model.compute_dtype)
            # params as jit ARGUMENTS (not captured constants): capturing
            # constant-folds the frozen weights into the HLO, which blows
            # compile time up by >10x and defeats the persistent cache
            # (same fix as train/loop.py::make_detr_featurize_fn)
            enc = jax.jit(lambda p, img: detr.apply(
                p, img, method=DETR.encode_features))
            bb_params = {"params": detr_params["params"]["backbone"]}
            trunk_fused = jax.jit(lambda p, img: resnet_forward_fused(
                p, img, dtype=cdt))
            trunk_xla = jax.jit(lambda p, img: ResNet101(dtype=cdt).apply(
                p, img))
            detr_xla = detr.clone(fused_backbone=False)
            enc_xla = jax.jit(lambda p, img: detr_xla.apply(
                p, img, method=DETR.encode_features))

            def rate_of(fn, params, pick):
                def step(i, carry):
                    img = dbatches[i % STEPS]
                    if carry is not None:
                        img = img + carry * 0
                    return pick(fn(params, img))
                return chained_rate(step)

            pick0 = lambda o: o[0, 0, 0, 0]  # noqa: E731
            dt_enc = rate_of(enc, detr_params, pick0)
            dt_enc_xla = rate_of(enc_xla, detr_params, pick0)
            dt_trunk = rate_of(trunk_fused,
                               detr_params["params"]["backbone"], pick0)
            dt_trunk_xla = rate_of(trunk_xla, bb_params, pick0)
            results["encode"] = BATCH / dt_enc

            enc_mfu = trunk_mfu = None
            try:
                cost = enc_xla.lower(
                    detr_params, dbatches[0]).compile().cost_analysis()
                flops = (cost or {}).get("flops", 0.0)
                peak = _peak_flops(jax.devices()[0])
                if flops:
                    enc_mfu = round(100 * flops / dt_enc / peak, 2)
                tcost = trunk_xla.lower(
                    bb_params, dbatches[0]).compile().cost_analysis()
                tflops = (tcost or {}).get("flops", 0.0)
                if tflops:
                    trunk_mfu = round(100 * tflops / dt_trunk / peak, 2)
            except Exception:
                pass
            encode_stats = {
                "encode_ms_per_batch": round(1e3 * dt_enc, 2),
                "encode_xla_ms_per_batch": round(1e3 * dt_enc_xla, 2),
                "trunk_fused_ms_per_batch": round(1e3 * dt_trunk, 2),
                "trunk_xla_ms_per_batch": round(1e3 * dt_trunk_xla, 2),
                "transformer_encoder_ms_per_batch":
                    round(1e3 * (dt_enc - dt_trunk), 2),
                "encode_mfu_pct": enc_mfu,
                "trunk_mfu_pct": trunk_mfu,
            }
            print(json.dumps({"metric": "encode_split", **encode_stats}))

        if mode in ("trainfull", "all"):
            # featurize-included training (reference train_test.py:152-154):
            # encode BOTH contrastive views through the frozen DETR every
            # batch, then run the full train step.  Donated TrainState
            # serializes the chain (same honesty argument as bench.py); the
            # last step depends on the last encode, so the final sync
            # covers all featurize work too.
            from scene_graph_commonsense_tpu.constants import class_weights
            opt = engine_lib.make_optimizer(cfg.training.learning_rate,
                                            grad_clip_norm=5.0)
            tstep = engine_lib.make_train_step(model, cfg, opt,
                                               class_weights("vg"),
                                               use_pallas_pool=True)
            tbatch = {k: jnp.asarray(v) for k, v in synthetic_batch(
                rng, batch_size=BATCH, max_objects=cfg.data.max_objects,
                feature_size=s, num_channels=cfg.model.num_img_feature,
                mean_objects=8.0).items()}
            from scene_graph_commonsense_tpu.train.loop import (
                make_detr_featurize_fn)
            featurize = make_detr_featurize_fn(cfg, detr, detr_params)
            key2 = jax.random.PRNGKey(1)

            def full_batch(st, i):
                b = dict(tbatch)
                # synthetic_batch ships precomputed features; drop them so
                # featurize really encodes (the thing this mode measures)
                b.pop("features", None)
                b.pop("features_aug", None)
                img = dbatches[i % STEPS]
                b["image"], b["image_aug"] = img, img
                b = featurize(b)               # fused two-view encode
                return tstep(st, b, key2)      # donates st

            # Donation serializes the tstep chain but NOT the encode
            # dispatches ahead of it, and block_until_ready doesn't block
            # here (see module note) — so this mode needs the same chained
            # long-short difference with a true scalar host fetch.  The
            # final loss depends on the final encode, and float() must copy
            # real bytes, so the fetch covers the whole chain.
            # one state threaded through every chain: tstep donates it, so
            # fresh states from the same params would die after the first
            # chain consumed the param buffers
            tstate = engine_lib.TrainState(
                jax.tree.map(jnp.copy, params), opt.init(params),
                jnp.int32(0))

            def chain(st, n):
                m = None
                for i in range(n):
                    st, m = full_batch(st, i)
                return st, float(m["loss"])

            tstate, _ = chain(tstate, SHORT)  # warmup/compile
            t0 = time.perf_counter()
            tstate, _ = chain(tstate, SHORT)
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            tstate, _ = chain(tstate, STEPS)
            t_long = time.perf_counter() - t0
            results["train_featurize_included"] = \
                BATCH * (STEPS - SHORT) / (t_long - t_short)

            # cached-plain-view training: the plain contrastive view is
            # deterministic and the DETR is frozen, so its features are
            # epoch-invariant — precompute once (tools/
            # precompute_features.py + the native SGRC train pipeline,
            # main.py native_batches) and only the per-epoch jittered
            # view is encoded each batch.  Identical training math to the
            # reference's recompute-both (train_test.py:152-154); half
            # the encode per step.
            def cached_batch(st, i):
                b = dict(tbatch)
                b.pop("features_aug", None)    # keep cached plain feats
                b["image_aug"] = dbatches[i % STEPS]
                b = featurize(b)               # encodes aug view only
                return tstep(st, b, key2)

            def chain_cached(st, n):
                m = None
                for i in range(n):
                    st, m = cached_batch(st, i)
                return st, float(m["loss"])

            tstate, _ = chain_cached(tstate, SHORT)
            t0 = time.perf_counter()
            tstate, _ = chain_cached(tstate, SHORT)
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            tstate, _ = chain_cached(tstate, STEPS)
            t_long = time.perf_counter() - t0
            results["train_cached_plain_view"] = \
                BATCH * (STEPS - SHORT) / (t_long - t_short)

    for k, v in results.items():
        print(json.dumps({"metric": f"{k}_images_per_sec_per_chip",
                          "value": round(v, 2), "unit": "img/s"}))
    if out_path:
        record = {
            "device_kind": getattr(jax.devices()[0], "device_kind", ""),
            "batch_size": BATCH,
            "pair_capacity": 1024,
            "image_size": cfg.model.image_size,
            "unit": "img/s/chip",
            "results": {k: round(v, 2) for k, v in results.items()},
        }
        if mode in ("encode", "all"):
            record["encode_stats"] = encode_stats
        if os.path.exists(out_path):
            with open(out_path) as f:
                prev = json.load(f)
            record["results"] = {**prev.get("results", {}),
                                 **record["results"]}
            if "encode_stats" in prev and "encode_stats" not in record:
                record["encode_stats"] = prev["encode_stats"]
        with open(out_path, "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
