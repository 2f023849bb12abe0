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
