"""DETR-ResNet101 detector in Flax (frozen feature/detection backbone).

The reference loads `torch.hub facebookresearch/detr detr_resnet101`, swaps
the class head to 151 VG classes (602 for OIv6), remaps checkpoint keys, and
keeps the whole detector frozen in eval mode (reference utils.py:88-120,
train_test.py:80-81).  This module re-implements the architecture natively:

  * ResNet-101 v1.5 backbone with frozen batch-norm (all stats are params;
    the detector is never trained here, matching the reference);
  * sine positional embeddings (DETR PositionEmbeddingSine, normalized);
  * post-norm transformer encoder (6 layers) and decoder (6 layers, 100
    learned queries, final LayerNorm);
  * class head (num_classes + 1 logits) and 3-layer box MLP with sigmoid
    cxcywh output.

Two public paths:
  * `encode_features`: backbone -> input_proj -> encoder -> (B, S, S, 256)
    feature map for the relation stage (reference train_utils.py:9-18);
  * `__call__`: full detection forward returning pred_logits / pred_boxes
    (reference evaluate.py:309).

TPU notes: NHWC layout; images arrive at a static padded canvas with a
validity mask (the reference's NestedTensor raggedness, reference
utils.py:153-204, becomes mask-carrying fixed shapes).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics as (frozen) parameters — the detector is
    never trained, so scale/bias/mean/var are plain constants from the
    converted checkpoint."""
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros,
                          (self.features,))
        var = self.param("running_var", nn.initializers.ones,
                         (self.features,))
        scale = (w / jnp.sqrt(var + self.eps)).astype(self.dtype)
        shift = (b - mean * w / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * scale + shift


class Conv1x1(nn.Module):
    """1x1 conv expressed as a dot over the channel axis.

    Param tree is identical to `nn.Conv(features, (1, 1), use_bias=False)`
    — a (1, 1, Cin, Cout) "kernel" — so checkpoints and the torch
    converter are unaffected.  The dot form lets XLA fuse the elementwise
    epilogue (frozen-BN affine, residual add, relu) into the matmul's
    output tiles instead of running it as a separate pass after the conv
    HLO; measured on a v5e chip the full ResNet-101+encoder forward goes
    65.0 -> 64.0 ms/batch (batch 12 @ 1024**2) — small because the 3x3
    convs and attention dominate, but free.  A strided 1x1 conv
    (torchvision downsample, padding 0) is exactly a spatial subsample
    followed by the channel dot."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features))
        if self.stride != 1:
            x = x[:, ::self.stride, ::self.stride]
        return jnp.einsum("bhwc,cd->bhwd", x.astype(self.dtype),
                          kernel[0, 0].astype(self.dtype))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = Conv1x1(self.planes, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = Conv1x1(self.planes * 4, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                              name="bn3")(out)
        if self.downsample:
            idn = Conv1x1(self.planes * 4, stride=self.stride,
                          dtype=self.dtype, name="downsample_conv")(x)
            idn = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                  name="downsample_bn")(idn)
        else:
            idn = x
        return nn.relu(out + idn)


def _space_to_depth_conv1(x, kernel, dtype):
    """The stem 7x7/2 conv as an exact 4x4/1 conv over a 2x2
    space-to-depth layout (the standard TPU ResNet trick: 3 input
    channels leave the MXU's 128-wide contraction almost idle; packing
    the 2x2 pixel block lifts it to 12 and runs ~3x faster).

    out[y,x,o] = sum_{ky,kx,c} w[ky,kx,c,o] * in[2y+ky-3, 2x+kx-3, c]
    with in2[u,v,(a*2+b)*3+c] = in[2u+a, 2v+b, c] becomes a stride-1
    conv whose 4x4 kernel k2[du,dv,(a*2+b)*3+c,o] = w[2du+a-1, 2dv+b-1,
    c,o] (zero where the index leaves [0,7)); padding (2,1).  Exact —
    uses the same stored (7,7,3,64) weights, rearranged at trace time."""
    b, h, w_, c = x.shape
    x = x.astype(dtype)      # cast before the rearrange: half the traffic
    x2 = x.reshape(b, h // 2, 2, w_ // 2, 2, c)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_ // 2, 4 * c)
    k = jnp.zeros((4, 4, 4 * c, kernel.shape[-1]), kernel.dtype)
    for ky in range(7):
        du, a = (ky + 1) // 2, (ky + 1) % 2
        for kx in range(7):
            dv, bb = (kx + 1) // 2, (kx + 1) % 2
            ci = (a * 2 + bb) * c
            k = k.at[du, dv, ci:ci + c].set(kernel[ky, kx])
    return jax.lax.conv_general_dilated(
        x2, k.astype(dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet101(nn.Module):
    """torchvision-style ResNet-101 trunk up to C5 (stride 32, 2048 ch).
    `blocks` shrinks the per-stage depth for tests."""
    dtype: Any = jnp.float32
    blocks: Tuple[int, int, int, int] = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, x):
        conv1 = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype, name="conv1")
        if self.is_initializing() or x.shape[1] % 2 or x.shape[2] % 2:
            # init path creates the canonical (7,7,3,64) params; odd
            # spatial dims can't space-to-depth — plain conv handles them
            x = conv1(x)
        else:
            x = _space_to_depth_conv1(
                x, conv1.variables["params"]["kernel"], self.dtype)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, (planes, nblocks, stride) in enumerate(
                zip((64, 128, 256, 512), self.blocks, (1, 2, 2, 2))):
            for i in range(nblocks):
                x = Bottleneck(planes, stride=stride if i == 0 else 1,
                               downsample=(i == 0), dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x)
        return x


def sine_position_embedding(mask: jnp.ndarray, num_pos_feats: int = 128,
                            temperature: float = 10000.0,
                            dtype=jnp.float32) -> jnp.ndarray:
    """DETR PositionEmbeddingSine (normalized, scale 2*pi).

    mask: (B, H, W) bool — True where the canvas holds real pixels.
    Returns (B, H, W, 2 * num_pos_feats).
    """
    # compute in >= f32 (f64 under x64 parity runs: the embedding feeds six
    # post-norm encoder layers, so f32 rounding here amplifies to ~1e-5)
    compute_dt = jnp.promote_types(jnp.dtype(dtype), jnp.float32)
    not_mask = mask.astype(compute_dt)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=compute_dt)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(pos_x.shape[:-1] + (-1,))
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(pos_y.shape[:-1] + (-1,))
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class MHA(nn.Module):
    """Multi-head attention with separate q/k/v inputs and key padding mask
    (torch nn.MultiheadAttention semantics; in_proj is split into q/k/v
    Dense layers for conversion).

    flash=True routes self-attention through the fused Pallas kernel
    (ops/pallas/attention.py — the (B, H, L, L) score tensor stays in
    VMEM; the naive path writes ~1 GB of scores per encoder layer at
    DETR shapes).  Falls back to the naive path for short/ragged
    sequences.  Key-padding semantics are identical to the naive path
    (only keys are masked)."""
    d_model: int
    nhead: int
    dtype: Any = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask: Optional[jnp.ndarray]
                 = None):
        d_head = self.d_model // self.nhead
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype,  # noqa
                                      name=name)
        qh = dense("q_proj")(q).reshape(q.shape[:-1] + (self.nhead, d_head))
        kh = dense("k_proj")(k).reshape(k.shape[:-1] + (self.nhead, d_head))
        vh = dense("v_proj")(v).reshape(v.shape[:-1] + (self.nhead, d_head))
        use_flash = (self.flash and q.shape[1] == k.shape[1]
                     and q.shape[1] % 512 == 0
                     and jnp.dtype(self.dtype) != jnp.float64)
        if use_flash:
            from ..ops.pallas.attention import fused_attention
            out = fused_attention(
                qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
                vh.transpose(0, 2, 1, 3), key_valid=key_padding_mask,
                scale=1.0 / math.sqrt(d_head))
            out = out.transpose(0, 2, 1, 3)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) \
                / math.sqrt(d_head)
            if key_padding_mask is not None:
                # key_padding_mask: (B, K) True = valid key
                bias = jnp.where(key_padding_mask[:, None, None, :], 0.0,
                                 jnp.finfo(jnp.float32).min)
                logits = logits + bias
            # softmax in >= f32 (upcast for bf16 compute, no downcast
            # under x64)
            attn = jax.nn.softmax(
                logits.astype(jnp.promote_types(logits.dtype, jnp.float32)),
                axis=-1)
            attn = attn.astype(vh.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(q.shape[:-1] + (self.d_model,))
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_ff: int = 2048
    dtype: Any = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, src, pos, key_padding_mask):
        q = k = src + pos
        src2 = MHA(self.d_model, self.nhead, self.dtype, flash=self.flash,
                   name="self_attn")(q, k, src, key_padding_mask)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + src2)
        lin1 = nn.Dense(self.dim_ff, dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        b, l, d = src.shape
        if (self.flash and (b * l) % 512 == 0
                and jnp.dtype(self.dtype) != jnp.float64):
            # VMEM-resident FFN + residual + LayerNorm
            # (ops/pallas/ffn.py).  Bind the flax modules on slivers so
            # the param tree/converter contract is unchanged; the sliver
            # results are unused and DCE'd.
            from ..ops.pallas.ffn import fused_ffn_ln
            _ = lin1(src[:1, :1])
            _ = lin2(jnp.zeros((1, 1, self.dim_ff), self.dtype))
            _ = norm2(src[:1, :1])
            p1 = lin1.variables["params"]
            p2 = lin2.variables["params"]
            pn = norm2.variables["params"]
            out = fused_ffn_ln(
                src.reshape(b * l, d), p1["kernel"], p1["bias"],
                p2["kernel"], p2["bias"], pn["scale"], pn["bias"],
                compute_dtype=self.dtype)
            return out.reshape(b, l, d)
        src2 = lin2(nn.relu(lin1(src)))
        return norm2(src + src2)


class DecoderLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_ff: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, key_padding_mask):
        q = k = tgt + query_pos
        tgt2 = MHA(self.d_model, self.nhead, self.dtype,
                   name="self_attn")(q, k, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + tgt2)
        tgt2 = MHA(self.d_model, self.nhead, self.dtype,
                   name="cross_attn")(tgt + query_pos, memory + pos, memory,
                                      key_padding_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + tgt2)
        tgt2 = nn.Dense(self.dim_ff, dtype=self.dtype, name="linear1")(tgt)
        tgt2 = nn.Dense(self.d_model, dtype=self.dtype,
                        name="linear2")(nn.relu(tgt2))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + tgt2)


class DETR(nn.Module):
    """DETR-ResNet101 with a swapped class head (151 / 602 classes)."""
    num_classes: int = 151          # 150 VG classes + no-object
    num_queries: int = 100
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    backbone_blocks: Tuple[int, int, int, int] = (3, 4, 23, 3)
    dim_ff: int = 2048
    dtype: Any = jnp.float32
    # Route the frozen trunk through the fused Pallas bottleneck kernel
    # (ops/pallas/bottleneck.py) — same param tree, forward-only.
    fused_backbone: bool = False
    # Flash (online-softmax Pallas) encoder self-attention; see MHA.flash.
    flash_encoder: bool = False

    def setup(self):
        self.backbone = ResNet101(dtype=self.dtype,
                                  blocks=self.backbone_blocks)
        self.input_proj = nn.Conv(self.d_model, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="input_proj")
        self.encoder_layers = [
            EncoderLayer(self.d_model, self.nhead, self.dim_ff, self.dtype,
                         flash=self.flash_encoder, name=f"encoder_{i}")
            for i in range(self.num_encoder_layers)]
        self.decoder_layers = [
            DecoderLayer(self.d_model, self.nhead, self.dim_ff, self.dtype,
                         name=f"decoder_{i}")
            for i in range(self.num_decoder_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        self.query_embed = nn.Embed(self.num_queries, self.d_model,
                                    name="query_embed")
        self.class_embed = nn.Dense(self.num_classes, dtype=self.dtype,
                                    name="class_embed")
        self.bbox_layers = [nn.Dense(self.d_model, dtype=self.dtype,
                                     name=f"bbox_embed_{i}")
                            for i in range(2)]
        self.bbox_out = nn.Dense(4, dtype=self.dtype, name="bbox_embed_2")

    # -------- shared trunk --------

    def _encode(self, images: jnp.ndarray,
                pixel_mask: Optional[jnp.ndarray]):
        """images: (B, H, W, 3); pixel_mask: (B, H, W) True = real pixels."""
        if self.fused_backbone and not self.is_initializing():
            from .resnet_fused import resnet_forward_fused
            feat = resnet_forward_fused(
                self.backbone.variables["params"], images.astype(self.dtype),
                blocks=self.backbone_blocks, dtype=self.dtype)
        else:
            feat = self.backbone(images.astype(self.dtype))
        b, h, w, _ = feat.shape
        if pixel_mask is None:
            fmask = jnp.ones((b, h, w), bool)
        else:
            # downsample the pixel mask to the feature grid like DETR's
            # F.interpolate on the boolean mask (reference utils.py:185-204)
            ys = (jnp.arange(h) * pixel_mask.shape[1]) // h
            xs = (jnp.arange(w) * pixel_mask.shape[2]) // w
            fmask = pixel_mask[:, ys][:, :, xs]
        pos = sine_position_embedding(fmask, self.d_model // 2,
                                      dtype=self.dtype)
        src = self.input_proj(feat)
        src = src.reshape(b, h * w, self.d_model)
        pos = pos.reshape(b, h * w, self.d_model)
        kmask = fmask.reshape(b, h * w)
        for layer in self.encoder_layers:
            src = layer(src, pos, kmask)
        return src, pos, kmask, (h, w)

    def encode_features(self, images: jnp.ndarray,
                        pixel_mask: Optional[jnp.ndarray] = None):
        """Encoder-only feature path for the relation stage: (B, S, S, 256)
        (reference train_utils.py:9-18)."""
        src, _, _, (h, w) = self._encode(images, pixel_mask)
        return src.reshape(src.shape[0], h, w, self.d_model)

    def __call__(self, images: jnp.ndarray,
                 pixel_mask: Optional[jnp.ndarray] = None):
        """Full detection forward: dict with pred_logits (B, Q, C+1) and
        pred_boxes (B, Q, 4) in normalized cxcywh."""
        memory, pos, kmask, _ = self._encode(images, pixel_mask)
        b = memory.shape[0]
        tgt = jnp.zeros((b, self.num_queries, self.d_model), self.dtype)
        query_pos = jnp.broadcast_to(
            self.query_embed.embedding[None], tgt.shape).astype(self.dtype)
        for layer in self.decoder_layers:
            tgt = layer(tgt, memory, pos, query_pos, kmask)
        hs = self.decoder_norm(tgt)
        logits = self.class_embed(hs)
        x = hs
        for lyr in self.bbox_layers:
            x = nn.relu(lyr(x))
        up = jnp.promote_types(self.dtype, jnp.float32)
        boxes = jax.nn.sigmoid(self.bbox_out(x).astype(up))
        return {"pred_logits": logits.astype(up),
                "pred_boxes": boxes}


def make_detr(cfg) -> DETR:
    num = 151 if cfg.data.dataset == "vg" else 602
    mode = getattr(cfg.model, "fused_backbone", "auto")
    fused = mode == "on" or (mode == "auto"
                             and jax.default_backend() == "tpu"
                             and jax.device_count() == 1)
    # the fused Pallas trunk is specialized to the ResNet-101 layout
    fused = fused and tuple(cfg.model.detr_blocks) == (3, 4, 23, 3)
    fmode = getattr(cfg.model, "flash_encoder", "auto")
    flash = fmode == "on" or (fmode == "auto"
                              and jax.default_backend() == "tpu"
                              and jnp.dtype(cfg.model.compute_dtype)
                              != jnp.float64)
    return DETR(num_classes=num, dtype=jnp.dtype(cfg.model.compute_dtype),
                num_encoder_layers=cfg.model.detr_enc_layers,
                num_decoder_layers=cfg.model.detr_dec_layers,
                backbone_blocks=tuple(cfg.model.detr_blocks),
                fused_backbone=fused, flash_encoder=flash)
