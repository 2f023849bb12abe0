"""Fused Pallas pair-assembly kernel vs the XLA reference (interpret mode on
the CPU test backend; the same kernel is verified exact on TPU)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_engine import tiny_cfg, tiny_batch, init_params  # noqa: E402

from scene_graph_commonsense_tpu.ops.pallas.pair_pool import (  # noqa: E402
    fused_pair_pool, pair_pool_reference, rearrange_pool_groups)
from scene_graph_commonsense_tpu.models.relation_head import (  # noqa: E402
    make_relation_classifier)
from scene_graph_commonsense_tpu.train import engine  # noqa: E402


def test_rearrange_pool_groups(rng):
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 4)).astype(np.float32))
    r = np.asarray(rearrange_pool_groups(x))
    assert r.shape == (3, 4, 4, 4, 4)
    xn = np.asarray(x)
    for dy in range(2):
        for dx in range(2):
            np.testing.assert_array_equal(r[:, dy * 2 + dx],
                                          xn[:, dy::2, dx::2, :])


def test_fused_pair_pool_matches_reference(rng):
    m, s, c, p = 6, 16, 128, 10
    a = jnp.asarray(rng.standard_normal((m, s, s, c)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((m, s, s, c)).astype(np.float32))
    si = jnp.asarray(rng.integers(0, m, p), jnp.int32)
    oj = jnp.asarray(rng.integers(0, m, p), jnp.int32)
    got = fused_pair_pool(rearrange_pool_groups(a),
                          rearrange_pool_groups(b), si, oj, interpret=True)
    want = pair_pool_reference(a, b, si, oj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_eval_step_pallas_path_matches_xla(rng):
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    batch = tiny_batch(rng, cfg, with_aug=False)
    step_xla = engine.make_eval_step(model, cfg, use_pallas_pool=False)
    step_pl = engine.make_eval_step(model, cfg, use_pallas_pool=True,
                                    pallas_interpret=True)
    out_x = jax.tree.map(np.asarray, step_xla(params, batch))
    out_p = jax.tree.map(np.asarray, step_pl(params, batch))
    np.testing.assert_allclose(out_p["relation"], out_x["relation"],
                               atol=1e-4)
    np.testing.assert_allclose(out_p["connectivity"], out_x["connectivity"],
                               atol=1e-4)
    np.testing.assert_array_equal(out_p["pair_mask"], out_x["pair_mask"])


def test_pair_pool_gradients_match_xla(rng):
    """Custom-VJP backward of the fused kernel vs XLA autodiff."""
    from scene_graph_commonsense_tpu.ops.pallas.pair_pool import pair_pool
    m, s, c, p = 4, 8, 128, 6
    a = jnp.asarray(rng.standard_normal((m, s, s, c)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((m, s, s, c)).astype(np.float32))
    si = jnp.asarray(rng.integers(0, m, p), jnp.int32)
    oj = jnp.asarray(rng.integers(0, m, p), jnp.int32)

    def loss_pl(a, b):
        a4 = rearrange_pool_groups(a)
        b4 = rearrange_pool_groups(b)
        out = pair_pool(a4, b4, si, oj, True, 0)
        return (out ** 2).sum()

    def loss_ref(a, b):
        return (pair_pool_reference(a, b, si, oj) ** 2).sum()

    # jax.grad differentiates through rearrange_pool_groups too, so both
    # gradients live in the original (M, S, S, C) layout
    ga_pl, gb_pl = jax.grad(loss_pl, argnums=(0, 1))(a, b)
    ga_rf, gb_rf = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_pl), np.asarray(ga_rf),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_pl), np.asarray(gb_rf),
                               atol=1e-5)


def test_object_streams_grouped_matches_rearranged(rng):
    """conv2 as four offset stride-2 convs == stride-1 conv + rearrange."""
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    s = cfg.model.feature_size
    x = jnp.asarray(rng.standard_normal(
        (3, s, s, 2 * cfg.model.hidden_dim + 1)).astype(np.float32))
    a, b = model.apply(params, x, method=type(model).object_streams)
    a4, b4 = model.apply(params, x,
                         method=type(model).object_streams_grouped)
    np.testing.assert_allclose(np.asarray(a4),
                               np.asarray(rearrange_pool_groups(a)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b4),
                               np.asarray(rearrange_pool_groups(b)),
                               atol=1e-5)
