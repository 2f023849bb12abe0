"""Runtime truncation telemetry: when the packed pair buffer's live count
exceeds its static capacity, the train step reports a positive
pair_overflow metric and the eval engines warn once per run (silent
pair-dropping is the one place the static-shape design can quietly change
results; see ops/pairs.pack_pairs and VERDICT r1 item 10)."""

import numpy as np
import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.config import derive
from scene_graph_commonsense_tpu.constants import class_weights
from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
from scene_graph_commonsense_tpu.eval.engines import check_pair_overflow
from scene_graph_commonsense_tpu.models.relation_head import (
    make_relation_classifier)
from scene_graph_commonsense_tpu.train import engine


def tiny_cfg(pair_capacity):
    return derive(
        "vg", hierarchical_pred=True,
        model={"feature_size": 16, "hidden_dim": 8, "num_img_feature": 16,
               "compute_dtype": "float32", "dropout_rate": 0.1},
        data={"max_objects": 6},
        training={"batch_size": 2, "pair_capacity": pair_capacity})


def full_batch(rng, cfg, with_aug=True):
    b = synthetic_batch(rng, batch_size=2,
                        max_objects=cfg.data.max_objects,
                        feature_size=cfg.model.feature_size,
                        num_channels=cfg.model.num_img_feature,
                        mean_objects=6.0, rel_density=0.9,
                        with_aug=with_aug)
    b["valid"] = np.ones_like(np.asarray(b["valid"]))  # 6 objs => 30 pairs
    return {k: jnp.asarray(v) for k, v in b.items()}


def init_params(cfg, model):
    s = cfg.model.feature_size
    x = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c = jnp.zeros(2, jnp.int32)
    sc = jnp.zeros((2, cfg.model.num_super_classes))
    return model.init(jax.random.PRNGKey(0), x, x, c, c, sc, sc)


def test_train_step_reports_overflow(rng):
    cfg = tiny_cfg(pair_capacity=8)   # 2 imgs x 30 pairs >> 8
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model)
    opt = engine.make_optimizer(cfg.training.learning_rate)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  donate=False)
    _, metrics = step(state, full_batch(rng, cfg), jax.random.PRNGKey(1))
    assert float(metrics["pair_overflow"]) > 0
    assert float(metrics["aug_pair_overflow"]) > 0


def test_train_step_no_overflow_at_full_capacity(rng):
    cfg = tiny_cfg(pair_capacity=0)   # 0 => worst case, can never overflow
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model)
    opt = engine.make_optimizer(cfg.training.learning_rate)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  donate=False)
    _, metrics = step(state, full_batch(rng, cfg), jax.random.PRNGKey(1))
    assert float(metrics["pair_overflow"]) == 0


def test_eval_step_overflow_warns_once(rng):
    cfg = tiny_cfg(pair_capacity=8)
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model)
    estep = engine.make_eval_step(model, cfg)
    batch = full_batch(rng, cfg, with_aug=False)
    batch.pop("features_aug", None)
    out = jax.tree.map(np.asarray, estep(params, batch))
    assert int(out["pair_count"][0]) > int(out["pair_capacity"][0])

    msgs = []
    warned = [False]
    assert check_pair_overflow(out, warned, log_fn=msgs.append)
    assert warned[0] and len(msgs) == 1 and "overflow" in msgs[0]
    # second batch in the same run: still detected, but no second warning
    assert check_pair_overflow(out, warned, log_fn=msgs.append)
    assert len(msgs) == 1
