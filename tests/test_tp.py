"""Tensor-parallel (GSPMD) param sharding: same math, distributed layout."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, "tests")
from test_engine import tiny_cfg, tiny_batch, init_params  # noqa: E402

from scene_graph_commonsense_tpu.constants import class_weights  # noqa: E402
from scene_graph_commonsense_tpu.models.relation_head import (  # noqa: E402
    make_relation_classifier)
from scene_graph_commonsense_tpu.parallel.mesh import make_mesh  # noqa: E402
from scene_graph_commonsense_tpu.parallel.tp import (  # noqa: E402
    param_shardings, shard_params)
from scene_graph_commonsense_tpu.train import engine  # noqa: E402
import dataclasses  # noqa: E402


def test_param_shardings_layout():
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, np.random.default_rng(0))
    mesh = make_mesh(data=4, model=2)
    sh = param_shardings(params, mesh)
    p = sh["params"]
    assert p["fc1"]["kernel"].spec == P(None, "model")
    assert p["fc1"]["bias"].spec == P("model")
    assert p["fc2_h"]["kernel"].spec == P("model", None)
    assert p["conv3"]["kernel"].spec == P()
    assert p["emb_c1"]["embedding"].spec == P()


def test_tp_step_matches_replicated(rng):
    base = tiny_cfg(batch_size=4)
    cfg = base.replace(model=dataclasses.replace(base.model,
                                                 dropout_rate=0.0))
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    opt = engine.make_optimizer(cfg.training.learning_rate)
    step = engine.make_train_step(model, cfg, opt, class_weights("vg"),
                                  donate=False)
    batch = tiny_batch(rng, cfg)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))
    _, metrics_ref = step(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(data=4, model=2)
    tp_params = shard_params(params, mesh)
    tp_state = engine.TrainState(tp_params, jax.jit(opt.init)(tp_params),
                                 jnp.int32(0))
    data_sh = NamedSharding(mesh, P("data"))
    tp_batch = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
    state2, metrics_tp = step(tp_state, tp_batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(metrics_tp["loss"]),
                               float(metrics_ref["loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(metrics_tp["loss_relationship"]),
                               float(metrics_ref["loss_relationship"]),
                               rtol=2e-4)
    # updated fc1 kernel keeps its model-axis sharding
    upd = state2.params["params"]["fc1"]["kernel"]
    assert "model" in str(upd.sharding.spec)
