"""End-to-end engine tests: train step (single device + 8-device mesh),
eval step -> evaluator, and a tiny overfit check."""

import numpy as np
import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.config import derive
from scene_graph_commonsense_tpu.constants import class_weights
from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
from scene_graph_commonsense_tpu.eval.builders import (
    build_candidates, build_targets)
from scene_graph_commonsense_tpu.eval.recall import Evaluator
from scene_graph_commonsense_tpu.models.relation_head import (
    make_relation_classifier)
from scene_graph_commonsense_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate_tree)
from scene_graph_commonsense_tpu.train import engine


def tiny_cfg(batch_size=4, hierar=True):
    return derive(
        "vg", hierarchical_pred=hierar,
        model={"feature_size": 16, "hidden_dim": 8, "num_img_feature": 16,
               "compute_dtype": "float32", "dropout_rate": 0.1},
        data={"max_objects": 6},
        training={"batch_size": batch_size, "learning_rate": 1e-3})


def tiny_batch(rng, cfg, with_aug=True):
    return {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch_size=cfg.training.batch_size,
        max_objects=cfg.data.max_objects,
        feature_size=cfg.model.feature_size,
        num_channels=cfg.model.num_img_feature,
        num_classes=cfg.model.num_classes,
        with_aug=with_aug).items()}


def init_params(cfg, model, rng_np):
    s = cfg.model.feature_size
    x = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c1 = jnp.zeros(2, jnp.int32)
    s1 = jnp.zeros((2, cfg.model.num_super_classes))
    return model.init(jax.random.PRNGKey(0), x, x, c1, c1, s1, s1)


def test_train_step_single_device(rng):
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    opt = engine.make_optimizer(cfg.training.learning_rate)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))
    step = engine.make_train_step(model, cfg, opt,
                                  class_weights("vg"), donate=False)
    batch = tiny_batch(rng, cfg)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params, state2.params)
    assert max(jax.tree.leaves(moved)) > 0
    # losses all finite
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_train_overfits_tiny_batch(rng):
    # the SupCon term over unnormalized hiddens is large (the reference
    # trains at lr=1e-5 for the same reason); isolate the relation loss here
    cfg = tiny_cfg().replace(training=tiny_cfg().training.__class__(
        batch_size=4, learning_rate=1e-3, lambda_contrast=0.0))
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    opt = engine.make_optimizer(1e-3)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"))
    batch = tiny_batch(rng, cfg)
    first, last = None, None
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        rel_loss = float(metrics["loss_relationship"])
        first = rel_loss if first is None else first
        last = rel_loss
    assert last < first * 0.9, (first, last)


def test_train_step_sharded_matches_replicated_semantics(rng):
    cfg = tiny_cfg(batch_size=8)
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    opt = engine.make_optimizer(cfg.training.learning_rate)
    mesh = make_mesh(data=8, model=1)
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  mesh=mesh)
    state = engine.TrainState(replicate_tree(mesh, params),
                              replicate_tree(mesh, opt.init(params)),
                              replicate_tree(mesh, jnp.int32(0)))
    batch = shard_batch(mesh, tiny_batch(rng, cfg))
    state2, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # one more step to ensure replication is stable across updates
    state3, metrics2 = step(state2, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state3.step) == 2


def test_eval_step_feeds_evaluator(rng):
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    estep = engine.make_eval_step(model, cfg)
    batch = tiny_batch(rng, cfg, with_aug=False)
    out = jax.tree.map(np.asarray, estep(params, batch))

    cand = build_candidates(
        out["relation"], out["connectivity"], out["super_relation"],
        out["pair_img"], out["pair_sub"], out["pair_obj"], out["pair_mask"],
        out["iou_ok"], np.asarray(batch["cats"]), np.asarray(batch["boxes"]),
        hierarchical=True, num_geometric=cfg.model.num_geometric,
        num_possessive=cfg.model.num_possessive)
    tgt = build_targets(np.asarray(batch["rel"]), np.asarray(batch["cats"]),
                        np.asarray(batch["boxes"]),
                        np.asarray(batch["valid"]))
    ev = Evaluator(num_classes=cfg.model.num_relations)
    ev.accumulate(cand, tgt)
    res = ev.compute()
    for r in res["recall"]:
        assert 0.0 <= r <= 1.0
    assert res["num_targets"] == (np.asarray(batch["rel"]) >= 0).sum()
    # hierarchical: 3 candidates per live pair
    assert len(cand.conf) == 3 * out["pair_mask"].sum()


def test_eval_step_flat_model(rng):
    cfg = tiny_cfg(hierar=False)
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    estep = engine.make_eval_step(model, cfg)
    batch = tiny_batch(rng, cfg, with_aug=False)
    out = jax.tree.map(np.asarray, estep(params, batch))
    assert out["relation"].shape[-1] == 50
    assert out["super_relation"] is None


def test_eval_step_sharded_matches_single_device(rng):
    """shard_map eval over the 8-device mesh must reproduce the
    single-device eval contract exactly: same live pairs (under global
    image indices) with the same scores."""
    cfg = tiny_cfg(batch_size=8)
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    batch = tiny_batch(rng, cfg, with_aug=False)
    mesh = make_mesh(data=8, model=1)
    e1 = engine.make_eval_step(model, cfg)
    e8 = engine.make_eval_step(model, cfg, mesh=mesh)
    out1 = jax.tree.map(np.asarray, e1(params, batch))
    out8 = jax.tree.map(np.asarray, e8(params, shard_batch(mesh, batch)))

    def live(out):
        m = out["pair_mask"]
        return {(int(i), int(s), int(o)): k for k, (i, s, o) in enumerate(
            zip(out["pair_img"][m], out["pair_sub"][m],
                out["pair_obj"][m]))}

    l1, l8 = live(out1), live(out8)
    assert set(l1) == set(l8)
    # align both outputs by (global image, sub, obj) key
    i1 = np.asarray([l1[k] for k in sorted(l1)])
    i8 = np.asarray([l8[k] for k in sorted(l8)])
    m1, m8 = out1["pair_mask"], out8["pair_mask"]
    np.testing.assert_allclose(out1["relation"][m1][i1],
                               out8["relation"][m8][i8], atol=1e-5)
    np.testing.assert_array_equal(out1["targets"][m1][i1],
                                  out8["targets"][m8][i8])
    np.testing.assert_array_equal(out1["iou_ok"][m1][i1],
                                  out8["iou_ok"][m8][i8])
