"""Optimizer-state and all-reduce precision knobs (TPU traffic levers)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_engine import tiny_cfg, tiny_batch, init_params  # noqa: E402

from scene_graph_commonsense_tpu.constants import class_weights  # noqa:E402
from scene_graph_commonsense_tpu.models.relation_head import (  # noqa:E402
    make_relation_classifier)
from scene_graph_commonsense_tpu.parallel.mesh import make_mesh  # noqa:E402
from scene_graph_commonsense_tpu.train import engine  # noqa: E402


def test_momentum_dtype_bf16_buffer(rng):
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    opt = engine.make_optimizer(1e-3, momentum_dtype="bfloat16")
    opt_state = opt.init(params)
    dtypes = {jnp.dtype(a.dtype) for a in jax.tree.leaves(opt_state)
              if hasattr(a, "dtype") and a.ndim > 0}
    assert jnp.dtype(jnp.bfloat16) in dtypes
    # params themselves stay f32
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(params))

    # a step still runs and decreases loss deterministically
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  use_pallas_pool=False)
    state = engine.TrainState(params, opt_state, jnp.int32(0))
    batch = tiny_batch(rng, cfg, with_aug=False)
    state, m1 = step(state, batch, jax.random.PRNGKey(0))
    state, m2 = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m2["loss"]))


def test_bf16_allreduce_close_to_f32(rng):
    """bf16 gradient pmean on an 8-device mesh stays close to f32 and the
    resulting step remains finite."""
    import dataclasses
    cfg = tiny_cfg()
    cfg = cfg.replace(training=dataclasses.replace(cfg.training,
                                                   batch_size=8))
    mesh = make_mesh(data=8)
    model = make_relation_classifier(cfg)
    batch = tiny_batch(rng, cfg, with_aug=False)

    losses = {}
    for ar in ("float32", "bfloat16"):
        c = cfg.replace(training=dataclasses.replace(
            cfg.training, grad_allreduce_dtype=ar))
        opt = engine.make_optimizer(1e-3)
        step = engine.make_train_step(model, c, opt, class_weights("vg"),
                                      mesh=mesh, use_pallas_pool=False)
        from scene_graph_commonsense_tpu.parallel.mesh import (
            replicate_tree, shard_batch)
        # fresh params per run: replicate_tree may alias, and the donated
        # first step would delete a shared buffer
        params = init_params(cfg, model, np.random.default_rng(0))
        p = replicate_tree(mesh, params)
        state = engine.TrainState(p, replicate_tree(mesh, opt.init(params)),
                                  jnp.int32(0))
        sb = shard_batch(mesh, batch)
        state, metrics = step(state, sb, jax.random.PRNGKey(0))
        state, metrics = step(state, sb, jax.random.PRNGKey(0))
        losses[ar] = float(metrics["loss"])
    assert np.isfinite(losses["bfloat16"])
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.05)


def test_compute_param_cache_is_bit_identical():
    """The memoized compute-dtype param copy (TrainState.compute_params)
    must be pure caching: losses and updated params bit-match a run that
    re-casts the f32 master params every step."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.constants import class_weights
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.train import engine

    cfg = derive(
        "vg", hierarchical_pred=True,
        model={"feature_size": 16, "hidden_dim": 8, "num_img_feature": 16,
               "compute_dtype": "bfloat16", "dropout_rate": 0.0},
        data={"max_objects": 5}, training={"batch_size": 2})
    model = make_relation_classifier(cfg)
    s = cfg.model.feature_size
    x0 = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c0 = jnp.zeros(2, jnp.int32)
    s0 = jnp.zeros((2, cfg.model.num_super_classes))
    params = model.init(jax.random.PRNGKey(0), x0, x0, c0, c0, s0, s0)
    opt = engine.make_optimizer(cfg.training.learning_rate)
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  donate=False)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch_size=2, max_objects=5, feature_size=s,
        num_channels=cfg.model.num_img_feature).items()}
    key = jax.random.PRNGKey(0)

    sa = engine.TrainState(params, opt.init(params), jnp.int32(0))
    sb = engine.TrainState(params, opt.init(params), jnp.int32(0))
    for i in range(3):
        sa, ma = step(sa, batch, key)                 # cached
        sb, mb = step(sb, batch, key)
        sb = sb._replace(compute_params=None)         # re-cast every step
        assert float(ma["loss"]) == float(mb["loss"])
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), sa.params, sb.params))
    assert max(diffs) == 0.0
