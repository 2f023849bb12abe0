"""Fused-forward ResNet-101 trunk over the frozen DETR param dict.

The Flax module (`models.detr.ResNet101`) remains the source of truth for
parameter structure, initialization, and conversion; this module is a pure
function over that param tree that runs the same math through the fused
Pallas bottleneck kernel (`ops.pallas.bottleneck`) wherever the block is
stride-1 (30 of 33 blocks).  The detector is frozen for the whole pipeline
(reference train_test.py:80-81), so no backward pass is needed.

The three stride-2 stage transitions and the stem stay on XLA: Mosaic
cannot strided-slice the sublane axis, and they are a small fraction of
the trunk's time.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.pallas.bottleneck import (fold_bn, fused_bottleneck,
                                     fused_bottleneck_s2)
from ..ops.pallas.stem import stem_conv_pool, stem_pool


def _conv(x, kernel, stride: int, padding: int, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, fold):
    return x * fold[0].astype(x.dtype) + fold[1].astype(x.dtype)


def _xla_bottleneck(p, x, stride: int, downsample: bool, dtype):
    """Reference-math bottleneck through plain XLA ops (used for the
    stride-2 stage transitions; matches models.detr.Bottleneck)."""
    out = _conv(x, p["conv1"]["kernel"], 1, 0, dtype)
    out = jax.nn.relu(_bn(out, fold_bn(p["bn1"])))
    out = _conv(out, p["conv2"]["kernel"], stride, 1, dtype)
    out = jax.nn.relu(_bn(out, fold_bn(p["bn2"])))
    out = _conv(out, p["conv3"]["kernel"], 1, 0, dtype)
    out = _bn(out, fold_bn(p["bn3"]))
    if downsample:
        idn = _conv(x[:, ::stride, ::stride], p["downsample_conv"]["kernel"],
                    1, 0, dtype)
        idn = _bn(idn, fold_bn(p["downsample_bn"]))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def _fused_block(p, x, downsample: bool, interpret):
    k1 = p["conv1"]["kernel"]
    k3 = p["conv3"]["kernel"]
    wd = sd = None
    if downsample:
        wd = p["downsample_conv"]["kernel"][0, 0].astype(x.dtype)
        sd = fold_bn(p["downsample_bn"])
    return fused_bottleneck(
        x,
        k1[0, 0].astype(x.dtype), fold_bn(p["bn1"]),
        p["conv2"]["kernel"].astype(x.dtype), fold_bn(p["bn2"]),
        k3[0, 0].astype(x.dtype), fold_bn(p["bn3"]),
        wd, sd, interpret=interpret)


def resnet_forward_fused(params, images: jnp.ndarray, *,
                         blocks: Tuple[int, int, int, int] = (3, 4, 23, 3),
                         dtype: Any = jnp.float32,
                         interpret: Optional[bool] = None,
                         upto: Optional[str] = None) -> jnp.ndarray:
    """ResNet-101 trunk forward from `ResNet101`'s param dict.

    images: (B, H, W, 3); returns C5 (B, H/32, W/32, 2048).  Numerically
    equivalent to `ResNet101(dtype=dtype).apply(...)` up to compute-dtype
    rounding (BN folding is done in f32 here).

    upto: stop after a named stage ("stem", "layer1".."layer4") and return
    that stage's activation — used by the per-stage roofline profiler
    (tools/roofline_encode.py) to time chained prefixes of the real
    program.  None (default) runs the whole trunk.
    """
    from .detr import _space_to_depth_conv1  # local: avoid import cycle

    x = images
    if x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0:
        # whole stem in one kernel (conv-as-dot + BN + relu + pool)
        x = stem_conv_pool(x.astype(dtype), params["conv1"]["kernel"],
                           fold_bn(params["bn1"]), interpret=interpret)
    else:
        if x.shape[1] % 2 or x.shape[2] % 2:
            x = _conv(x, params["conv1"]["kernel"], 2, 3, dtype)
        else:
            x = _space_to_depth_conv1(x, params["conv1"]["kernel"], dtype)
        if x.shape[1] % 2 or x.shape[2] % 2:
            x = jax.nn.relu(_bn(x, fold_bn(params["bn1"])))
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0)] * 4)
        else:
            x = stem_pool(x, fold_bn(params["bn1"]), interpret=interpret)
    if upto == "stem":
        return x
    for stage, (planes, nblocks, stride) in enumerate(
            zip((64, 128, 256, 512), blocks, (1, 2, 2, 2))):
        for i in range(nblocks):
            p = params[f"layer{stage + 1}_{i}"]
            if i == 0 and stride != 1:
                if x.shape[1] % 2 or x.shape[2] % 2:
                    x = _xla_bottleneck(p, x, stride, True, dtype)
                else:
                    x = fused_bottleneck_s2(
                        x,
                        p["conv1"]["kernel"][0, 0].astype(x.dtype),
                        fold_bn(p["bn1"]),
                        p["conv2"]["kernel"].astype(x.dtype),
                        fold_bn(p["bn2"]),
                        p["conv3"]["kernel"][0, 0].astype(x.dtype),
                        fold_bn(p["bn3"]),
                        p["downsample_conv"]["kernel"][0, 0].astype(x.dtype),
                        fold_bn(p["downsample_bn"]),
                        interpret=interpret)
            else:
                x = _fused_block(p, x, downsample=(i == 0),
                                 interpret=interpret)
        if upto == f"layer{stage + 1}":
            return x
    return x
