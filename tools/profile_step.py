"""Capture a jax.profiler trace of a hot program and print the top-k ops
by self time (reads the perfetto trace.json.gz directly).

Programs: the bench train step (default), the frozen-DETR featurize path
(`encode`), the full detection forward (`detect`), or the
featurize-included training chain (`trainfull`, which also reports the
device-busy fraction of the busiest device track — the saturation
evidence for the encode+train composition).

Usage: python tools/profile_step.py [step|encode|detect|trainfull] [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_trace(outdir: str):
    import jax
    from scene_graph_commonsense_tpu.utils.jax_cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.constants import class_weights
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.train import engine

    import bench

    cfg = derive("vg", hierarchical_pred=True,
                 training={"batch_size": bench.BATCH_SIZE,
                           "pair_capacity": bench.PAIR_CAPACITY})
    model = make_relation_classifier(cfg)
    s = cfg.model.feature_size
    x0 = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c0 = jnp.zeros(2, jnp.int32)
    s0 = jnp.zeros((2, cfg.model.num_super_classes))
    params = model.init(jax.random.PRNGKey(0), x0, x0, c0, c0, s0, s0)
    opt = engine.make_optimizer(cfg.training.learning_rate,
                                grad_clip_norm=5.0)
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  chunk_size=bench.CHUNK,
                                  use_pallas_pool=True)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch_size=bench.BATCH_SIZE, max_objects=cfg.data.max_objects,
        feature_size=s, num_channels=cfg.model.num_img_feature,
        mean_objects=8.0).items()}
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, metrics = step(state, batch, key)
        jax.block_until_ready(metrics["loss"])


def run_trace_detr(outdir: str, detect: bool):
    """Traces the frozen-DETR paths at bench shapes (batch 12, 1024²):
    `encode` = the per-batch featurize cost of reference-config training
    (train_utils.py:9-18); `detect` = the full SGDET detection forward."""
    import jax
    from scene_graph_commonsense_tpu.utils.jax_cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.eval import engines
    from scene_graph_commonsense_tpu.models.detr import DETR, make_detr

    import bench

    cfg = derive("vg", hierarchical_pred=True)
    detr = make_detr(cfg)
    detr_params = detr.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), None)
    size = cfg.model.image_size
    img = jax.random.normal(jax.random.PRNGKey(1),
                            (bench.BATCH_SIZE, size, size, 3), jnp.float32)
    if detect:
        mask = jnp.ones((bench.BATCH_SIZE, size, size), bool)
        fn = engines.make_detr_detect_fn(cfg, detr, detr_params,
                                         image_key="image_nonsq")
        run = lambda: fn({"image_nonsq": img, "pixel_mask": mask})["boxes"]
    else:
        # params as a jit argument, not a captured constant (compile-time)
        enc = jax.jit(lambda p, x: detr.apply(p, x,
                                              method=DETR.encode_features))
        run = lambda: enc(detr_params, img)

    jax.block_until_ready(run())
    with jax.profiler.trace(outdir):
        out = [run() for _ in range(3)]
        jax.block_until_ready(out)
    try:
        target = (jax.jit(lambda p, x: detr.apply(
            p, x, method=DETR.encode_features)) if not detect
            else None)
        if target is not None:
            cost = target.lower(detr_params, img).compile().cost_analysis()
            flops = (cost or {}).get("flops", 0.0)
            if flops:
                print(f"encode cost-analysis: {flops/1e12:.2f} TFLOP "
                      f"per batch of {bench.BATCH_SIZE}")
    except Exception:
        pass


def run_trace_trainfull(outdir: str, n_steps: int = 5):
    """Traces the featurize-INCLUDED training chain (reference
    train_test.py:152-154 composition: both contrastive views through the
    frozen DETR, then the full train step) and reports the device-busy
    fraction — the saturation evidence that encode and train step occupy
    the chip back-to-back with no host round-trips between them."""
    import jax
    from scene_graph_commonsense_tpu.utils.jax_cache import (
        enable_compile_cache)
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.constants import class_weights
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
    from scene_graph_commonsense_tpu.models.detr import make_detr
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.train import engine
    from scene_graph_commonsense_tpu.train.loop import make_detr_featurize_fn

    import bench

    cfg = derive("vg", hierarchical_pred=True,
                 training={"batch_size": bench.BATCH_SIZE,
                           "pair_capacity": bench.PAIR_CAPACITY})
    model = make_relation_classifier(cfg)
    s = cfg.model.feature_size
    x0 = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c0 = jnp.zeros(2, jnp.int32)
    s0 = jnp.zeros((2, cfg.model.num_super_classes))
    params = model.init(jax.random.PRNGKey(0), x0, x0, c0, c0, s0, s0)
    opt = engine.make_optimizer(cfg.training.learning_rate,
                                grad_clip_norm=5.0)
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  chunk_size=bench.CHUNK,
                                  use_pallas_pool=True)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))

    detr = make_detr(cfg)
    detr_params = detr.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), None)
    featurize = make_detr_featurize_fn(cfg, detr, detr_params)
    size = cfg.model.image_size
    img = jax.random.normal(jax.random.PRNGKey(1),
                            (bench.BATCH_SIZE, size, size, 3), jnp.float32)
    rng = np.random.default_rng(0)
    base = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch_size=bench.BATCH_SIZE, max_objects=cfg.data.max_objects,
        feature_size=s, num_channels=cfg.model.num_img_feature,
        mean_objects=8.0).items()}
    key = jax.random.PRNGKey(0)

    def full_batch(st):
        b = dict(base)
        b.pop("features", None)
        b.pop("features_aug", None)
        b["image"], b["image_aug"] = img, img
        b = featurize(b)
        return step(st, b, key)

    for _ in range(2):                      # compile both programs
        state, metrics = full_batch(state)
    jax.block_until_ready(metrics["loss"])
    with jax.profiler.trace(outdir):
        for _ in range(n_steps):
            state, metrics = full_batch(state)
        print("loss", float(metrics["loss"]))   # real scalar fetch


def summarize(outdir: str, top: int = 30):
    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        print("no trace found under", outdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # keep only device-track complete events (TPU op activity)
    pid_names = {}
    tid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[(ev.get("pid"), ev.get("tid"))] = \
                ev["args"].get("name", "")
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    tracks = defaultdict(lambda: [0.0, float("inf"), 0.0])  # busy, t0, t1
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        durs[name] += dur
        counts[name] += 1
        total += dur
        tr = tracks[(ev.get("pid"), ev.get("tid"))]
        tr[0] += dur
        ts = ev.get("ts", 0) / 1e3
        tr[1] = min(tr[1], ts)
        tr[2] = max(tr[2], ts + dur)
    print(f"total device op time {total:.1f} ms over "
          f"{sum(counts.values())} events")
    # device-busy fraction.  The track MUST be the op-level one ('XLA
    # Ops' thread metadata): its events are individual HLO ops that don't
    # overlap and exclude stalls, so busy/span is real utilization.  The
    # previous heuristic (busiest track by summed duration) could select
    # the 'XLA Modules'/'Steps' track, whose module-granularity events
    # tile the whole span INCLUDING intra-module stalls — that saturates
    # at 100% regardless of op-level utilization (advisor r4, medium).
    if tracks:
        op_keys = [k for k in tracks
                   if "XLA Ops" in tid_names.get(k, "")]
        if op_keys:
            key = max(op_keys, key=lambda k: tracks[k][0])
            label = f"op-level track ({tid_names[key]!r})"
        else:
            key = max(tracks, key=lambda k: tracks[k][0])
            label = (f"busiest track ({tid_names.get(key, '?')!r}; "
                     "no 'XLA Ops' thread metadata found — this may "
                     "include stalls, treat as an upper bound)")
        busy, t0, t1 = tracks[key]
        span = t1 - t0
        if span > 0:
            print(f"{label}: {busy:.1f} ms busy over "
                  f"{span:.1f} ms span -> {100 * busy / span:.1f}% "
                  f"device-busy")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d:9.2f} ms {counts[name]:5d}x  {name[:100]}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    mode = argv.pop(0) if argv and argv[0] in ("step", "encode", "detect",
                                               "trainfull") else "step"
    out = argv[0] if argv else f"/tmp/sgc_trace_{mode}"
    if mode == "step":
        run_trace(out)
    elif mode == "trainfull":
        run_trace_trainfull(out)
    else:
        run_trace_detr(out, detect=(mode == "detect"))
    summarize(out)
