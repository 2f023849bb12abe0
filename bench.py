"""Single-chip training-throughput benchmark on the flagship model.

Runs the full hierarchical PredCLS training step (two contrastive views,
packed pair grid, all loss terms, SGD update) on synthetic VG-shaped batches
at real model dimensions, and prints ONE JSON line:

  {"metric": "train_images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N}

Baseline note: the reference publishes no throughput numbers (BASELINE.md).
Its training hardware is 4x V100 with batch 12/GPU driving a Python
triangular pair loop that launches ~2 small forwards per pair column
(reference train_test.py:190-258).  REFERENCE_IMG_PER_SEC_PER_CHIP below is
a deliberately generous analytic estimate for one V100 on that loop
(~56 directed pairs/image x ~3 GFLOP/pair at low utilization plus per-column
launch overhead); vs_baseline = measured / estimate.
"""

import json
import time

import numpy as np

# Measurement note: this loop is honest on the axon TPU tunnel (where
# jax.block_until_ready does NOT block) because each step's donated
# TrainState input depends on the previous step's output — the dispatch
# itself serializes.  The measured ms/step matches the profiler's device
# op time (tools/profile_step.py).  Eval-side benches need the chained
# method of tools/bench_eval.py instead.

REFERENCE_IMG_PER_SEC_PER_CHIP = 10.0

BATCH_SIZE = 12
PAIR_CAPACITY = 1024   # ~realistic VG pair load for batch 12 (avg ~70/img)
CHUNK = 0              # unchunked trunk measured faster on v5e (231 vs
                       # 307 ms/step); chunking remains available as an HBM
                       # guard for larger capacities
STEPS = 20
WARMUP = 3


def main():
    import jax
    import jax.numpy as jnp

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.constants import class_weights
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.train import engine

    cfg = derive("vg", hierarchical_pred=True,
                 training={"batch_size": BATCH_SIZE,
                           "pair_capacity": PAIR_CAPACITY})
    model = make_relation_classifier(cfg)
    s = cfg.model.feature_size
    x0 = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c0 = jnp.zeros(2, jnp.int32)
    s0 = jnp.zeros((2, cfg.model.num_super_classes))
    params = model.init(jax.random.PRNGKey(0), x0, x0, c0, c0, s0, s0)

    opt = engine.make_optimizer(cfg.training.learning_rate,
                                grad_clip_norm=5.0)
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  chunk_size=CHUNK, use_pallas_pool=True)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch_size=BATCH_SIZE, max_objects=cfg.data.max_objects,
        feature_size=s, num_channels=cfg.model.num_img_feature,
        mean_objects=8.0).items()}

    key = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = BATCH_SIZE * STEPS / dt
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC_PER_CHIP,
                             2),
    }))


if __name__ == "__main__":
    main()
