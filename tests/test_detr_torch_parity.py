"""DETR numerical validation against a torch-side architecture replica.

tests/torch_detr.py re-creates the facebookresearch/detr `detr_resnet101`
architecture (the model the reference loads via torch.hub, reference
utils.py:88-120) with plain torch modules and hub-exact state-dict names.
These tests run `convert_detr_state_dict` on its randomly-initialized
state dict (with randomized BN running stats) and assert float64 parity of:

  * encoder features (the relation-stage path, reference
    train_utils.py:9-18), including the space-to-depth conv1 rewrite and
    FrozenBatchNorm folding;
  * full detection outputs pred_logits / pred_boxes (reference
    evaluate.py:309), including key-padding-masked attention for a
    partially padded canvas.

Channel dims are the real model's (2048-ch C5, d_model 256, ff 2048, 6+6
layers); the spatial extent is kept small (64x64 images -> 2x2 feature
grid) so the full-depth ResNet-101 stays cheap on CPU.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.models.detr import DETR
from scene_graph_commonsense_tpu.models.weights import (
    convert_detr_state_dict)

from torch_detr import TorchDETR, randomize_bn_stats


def _build_pair(blocks, n_enc, n_dec, seed):
    torch.manual_seed(seed)
    tm = TorchDETR(blocks=blocks, n_enc=n_enc, n_dec=n_dec)
    randomize_bn_stats(tm)
    tm = tm.double().eval()
    params = convert_detr_state_dict(
        {k: v.double().numpy() for k, v in tm.state_dict().items()},
        num_encoder_layers=n_enc, num_decoder_layers=n_dec, blocks=blocks)
    jm = DETR(num_encoder_layers=n_enc, num_decoder_layers=n_dec,
              backbone_blocks=blocks, dtype=jnp.float64)
    return tm, jm, params


def _inputs(rng, b=2, size=64):
    images = rng.standard_normal((b, size, size, 3))
    valid = np.ones((b, size, size), bool)
    if b > 1:
        # pad half the canvas so even the 2x2 feature grid has masked
        # keys and the padded-attention path is exercised
        valid[1, :, size // 2:] = False
        valid[1, size // 2:, :] = False
    return images, valid


@pytest.mark.slow
def test_detr_full_depth_parity(rng):
    """Full-depth (3,4,23,3) ResNet-101 + 6+6 transformer, f64 parity of
    encoder features and detection outputs (<=1e-8 vs torch)."""
    tm, jm, params = _build_pair((3, 4, 23, 3), 6, 6, seed=0)
    images, valid = _inputs(rng)
    t_img = torch.from_numpy(images.transpose(0, 3, 1, 2))
    t_valid = torch.from_numpy(valid)

    with torch.no_grad():
        t_feat = tm.encode_features(t_img, t_valid).numpy()
        t_out = tm(t_img, t_valid)

    with jax.enable_x64(True):
        j_feat = np.asarray(jm.apply(
            params, jnp.asarray(images), jnp.asarray(valid),
            method=DETR.encode_features))
        j_out = jax.tree.map(np.asarray, jm.apply(
            params, jnp.asarray(images), jnp.asarray(valid)))

    np.testing.assert_allclose(j_feat.transpose(0, 3, 1, 2), t_feat,
                               atol=1e-8)
    np.testing.assert_allclose(j_out["pred_logits"],
                               t_out["pred_logits"].numpy(), atol=1e-8)
    np.testing.assert_allclose(j_out["pred_boxes"],
                               t_out["pred_boxes"].numpy(), atol=1e-10)


@pytest.mark.slow
def test_detr_space_to_depth_equals_plain_conv(rng):
    """The stem's space-to-depth rewrite is numerically exact: odd-sized
    input (plain conv path) vs even-sized crop (s2d path) of a shared
    image agree with torch on both."""
    tm, jm, params = _build_pair((1, 1, 1, 1), 1, 1, seed=1)
    images, valid = _inputs(rng, b=1, size=66)
    t_img = torch.from_numpy(images.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t_even = tm.encode_features(
            t_img[:, :, :64, :64],
            torch.from_numpy(valid[:, :64, :64])).numpy()
        t_odd = tm.encode_features(
            t_img[:, :, :65, :65],
            torch.from_numpy(valid[:, :65, :65])).numpy()
    with jax.enable_x64(True):
        j_even = np.asarray(jm.apply(
            params, jnp.asarray(images[:, :64, :64]),
            jnp.asarray(valid[:, :64, :64]),
            method=DETR.encode_features))
        j_odd = np.asarray(jm.apply(
            params, jnp.asarray(images[:, :65, :65]),
            jnp.asarray(valid[:, :65, :65]),
            method=DETR.encode_features))
    np.testing.assert_allclose(j_even.transpose(0, 3, 1, 2), t_even,
                               atol=1e-8)
    np.testing.assert_allclose(j_odd.transpose(0, 3, 1, 2), t_odd,
                               atol=1e-8)
