"""Parity of the fused Pallas bottleneck trunk vs the Flax module.

Runs the Pallas kernels in interpreter mode on CPU (the TPU lowering is
exercised by bench/profile on the chip; the math is identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_graph_commonsense_tpu.models.detr import Bottleneck, ResNet101
from scene_graph_commonsense_tpu.models.resnet_fused import (
    _fused_block, resnet_forward_fused)


def _perturbed_params(m, rng, x):
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [p + 0.02 * jax.random.normal(k, p.shape)
              for p, k in zip(leaves, keys)]
    return jax.tree.unflatten(treedef, leaves)


def test_fused_block_matches_module():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16, 32))
    m = Bottleneck(planes=8, stride=1, downsample=False, dtype=jnp.float32)
    params = _perturbed_params(m, 0, x)
    # identity residual needs C == 4 * planes
    ref = m.apply({"params": params}, x)
    got = _fused_block(params, x, downsample=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_downsample_matches_module():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16, 16))
    m = Bottleneck(planes=8, stride=1, downsample=True, dtype=jnp.float32)
    params = _perturbed_params(m, 0, x)
    ref = m.apply({"params": params}, x)
    got = _fused_block(params, x, downsample=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_fused_trunk_matches_module():
    blocks = (2, 1, 2, 1)
    m = ResNet101(dtype=jnp.float32, blocks=blocks)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    params = _perturbed_params(m, 0, x)
    ref = m.apply({"params": params}, x)
    got = resnet_forward_fused(params, x, blocks=blocks,
                               dtype=jnp.float32, interpret=True)
    err = float(jnp.max(jnp.abs(ref - got)))
    assert err < 1e-4, err


def test_fused_backbone_flag_in_encode():
    """DETR._encode routes through the fused trunk when flagged and the
    result matches the module path."""
    from scene_graph_commonsense_tpu.models.detr import DETR

    kw = dict(num_classes=11, num_queries=4, d_model=16, nhead=2,
              num_encoder_layers=1, num_decoder_layers=1,
              backbone_blocks=(1, 1, 1, 1), dim_ff=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
    plain = DETR(**kw)
    params = plain.init(jax.random.PRNGKey(0), x, None)
    ref = plain.apply(params, x, method=DETR.encode_features)
    fused = DETR(fused_backbone=True, **kw)
    got = fused.apply(params, x, method=DETR.encode_features)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
