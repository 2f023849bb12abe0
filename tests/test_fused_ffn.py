"""Interpret-mode correctness for the fused FFN+LayerNorm kernel
(ops/pallas/ffn.py) vs the naive EncoderLayer chain it replaces
(models/detr.py: linear1 -> relu -> linear2 -> +residual -> LayerNorm,
the FFN of reference train_utils.py:9-18's frozen DETR encoder).
On-chip counterpart: tools/verify_fused.py::check_ffn (PARITY_TPU.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_graph_commonsense_tpu.ops.pallas.ffn import fused_ffn_ln


def naive_ffn_ln(x, w1, b1, w2, b2, gamma, beta, compute_dtype, eps=1e-5):
    """The flax math: Dense in compute dtype, residual + LN stats in f32
    (post-norm activations promote to f32)."""
    cd = jnp.dtype(compute_dtype)
    h = jnp.maximum(x.astype(cd) @ w1.astype(cd) + b1.astype(cd), 0)
    y = h.astype(cd) @ w2.astype(cd) + b2.astype(cd)
    y = x.astype(jnp.float32) + y.astype(jnp.float32)
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _args(rng, n, d, f):
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) / np.sqrt(d), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d), jnp.float32)
    g = jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    return x, w1, b1, w2, b2, g, beta


@pytest.mark.parametrize("cd", [jnp.float32, jnp.bfloat16])
def test_fused_ffn_matches_naive(cd):
    rng = np.random.default_rng(0)
    args = _args(rng, 256, 128, 512)
    got = fused_ffn_ln(*args, compute_dtype=cd, block_t=128,
                       interpret=True)
    ref = naive_ffn_ln(*args, compute_dtype=cd)
    assert got.dtype == jnp.float32
    tol = 1e-5 if cd == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=tol, rtol=tol)


def test_fused_ffn_blocking_invariant():
    rng = np.random.default_rng(1)
    args = _args(rng, 512, 64, 256)
    one = fused_ffn_ln(*args, compute_dtype=jnp.float32, block_t=512,
                       interpret=True)
    four = fused_ffn_ln(*args, compute_dtype=jnp.float32, block_t=128,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(one), np.asarray(four),
                               atol=2e-6, rtol=2e-6)


def test_encoder_layer_flash_matches_naive():
    """The full EncoderLayer with flash=True (fused attention + fused
    FFN) vs flash=False on identical params — the production routing of
    models/detr.py (needs B*L % 512 == 0)."""
    from scene_graph_commonsense_tpu.models.detr import EncoderLayer

    rng = np.random.default_rng(2)
    b, l, d = 1, 512, 64
    src = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, l)) < 0.8).at[:, 0].set(True)
    naive = EncoderLayer(d_model=d, nhead=2, dim_ff=128,
                         dtype=jnp.float32, flash=False)
    params = naive.init(jax.random.PRNGKey(0), src, pos, mask)
    want = naive.apply(params, src, pos, mask)
    flash = EncoderLayer(d_model=d, nhead=2, dim_ff=128,
                         dtype=jnp.float32, flash=True)
    got = flash.apply(params, src, pos, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_encoder_layer_flash_param_tree_unchanged():
    """The sliver-binding trick must not change the param tree: init with
    flash=True produces the exact structure of flash=False (checkpoint
    converter contract, models/weights.py)."""
    from scene_graph_commonsense_tpu.models.detr import EncoderLayer

    b, l, d = 1, 512, 64
    z = jnp.zeros((b, l, d))
    mask = jnp.ones((b, l), bool)
    p_naive = EncoderLayer(d_model=d, nhead=2, dim_ff=128,
                           dtype=jnp.float32, flash=False).init(
        jax.random.PRNGKey(0), z, z, mask)
    p_flash = EncoderLayer(d_model=d, nhead=2, dim_ff=128,
                           dtype=jnp.float32, flash=True).init(
        jax.random.PRNGKey(0), z, z, mask)
    assert jax.tree.structure(p_naive) == jax.tree.structure(p_flash)
    shapes = lambda p: jax.tree.map(jnp.shape, p)  # noqa: E731
    assert shapes(p_naive) == shapes(p_flash)
