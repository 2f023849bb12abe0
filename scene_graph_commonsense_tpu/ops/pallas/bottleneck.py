"""Fused frozen ResNet bottleneck block (Pallas, TPU, forward-only).

The reference keeps its DETR-ResNet101 detector frozen in eval mode for the
whole pipeline (reference train_test.py:80-81, utils.py:88-120), so the
backbone never needs a backward pass — but it runs on every image of every
batch and dominates featurize-included training and SGDET inference.  Under
plain XLA each bottleneck costs ~4 HBM round-trips of the block activation
(conv1 -> bn/relu pass -> conv2 -> conv3 -> residual add_maximum pass, plus
layout copies between dot-preferred and conv-preferred layouts measured at
~10 ms/batch on v5e); this kernel runs the whole residual block

    y = relu(BN3(W3 . relu(BN2(conv3x3(relu(BN1(W1 . x)))))) + idn(x))

in one pass through VMEM: the 1x1 convs are MXU dots, the 3x3 is nine
shifted dots accumulated in f32, the frozen BatchNorms fold to per-channel
scale/shift epilogues, and the residual add + relu happen before the single
output write.  HBM traffic drops to ~read x once + write y once.

Only stride-1 blocks are fused (30 of ResNet-101's 33): Mosaic cannot
strided-slice the sublane axis, so the three stride-2 stage transitions
stay on XLA (`models.resnet_fused`).

Halo: the 3x3 needs one row above/below each row-block.  Rather than
overlapping block specs (not expressible) or reading x three times, the
caller precomputes an `edges` tensor with the two boundary rows of every
row-block (a (2/R)-sized gather), and the kernel rebuilds the haloed
activation in a VMEM scratch, zeroing the rows/columns that fall outside
the image (conv zero-padding).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(h: int, w: int, cin: int, cmid: int, co: int,
               wbytes: int) -> int:
    """Row-block size: bound VMEM (weights + x/edges/out blocks + a_h
    scratch) while keeping the halo recompute overhead (2/R of conv1)
    small."""
    for r in (32, 16, 8, 4, 2):
        if h % r:
            continue
        x_blk = r * w * cin * 2
        a_h = (r + 2) * (w + 2) * cmid * 2
        out_blk = r * w * co * 2
        edges = 2 * w * cin * 2
        # live kernel values: f32 acc, f32 conv3 result + residual,
        # the x2d/a bf16 copies (measured against Mosaic's scoped-vmem
        # accounting, which OOMed at 24M for r*w*co f32 intermediates)
        vals = r * w * (4 * cmid + 8 * co + 2 * co + 2 * cin + 2 * cmid)
        # x/edges/out are double-buffered by the pipeline; a_h, weights
        # and live values are resident for the whole grid
        if 2 * (x_blk + out_blk + edges) + a_h + wbytes + vals \
                <= 12 * 1024 * 1024:
            return r
    return 1


def _kernel(x_ref, xp_ref, xn_ref, w1_ref, w2_ref, w3_ref, s1_ref, s2_ref,
            s3_ref, o_ref, a_h, *, rows: int, width: int, cmid: int,
            wd_ref=None, sd_ref=None):
    r, w, m = rows, width, cmid
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    x = x_ref[0]                                     # (R, W, C)
    cin = x.shape[-1]
    cd = x.dtype

    def conv1(v2d):                                  # (N, C) -> (N, M) bf16
        a = jnp.dot(v2d, w1_ref[:], preferred_element_type=jnp.float32)
        return jnp.maximum(a * s1_ref[0] + s1_ref[1], 0.0).astype(cd)

    x2d = x.reshape(r * w, cin)
    a = conv1(x2d).reshape(r, w, m)
    # haloed activation: rows 0 / R+1 and cols 0 / W+1 are conv2's padding
    a_h[1:r + 1] = jnp.pad(a, ((0, 0), (1, 1), (0, 0)))
    e = jnp.concatenate([xp_ref[0, 0], xn_ref[0, 0]])       # (2W, C)
    ae = jnp.pad(conv1(e).reshape(2, w, m), ((0, 0), (1, 1), (0, 0)))
    a_h[0] = ae[0]
    a_h[r + 1] = ae[1]

    @pl.when(i == 0)
    def _():                                         # top image border
        a_h[0] = jnp.zeros((w + 2, m), cd)

    @pl.when(i == nh - 1)
    def _():                                         # bottom image border
        a_h[r + 1] = jnp.zeros((w + 2, m), cd)

    acc = jnp.zeros((r * w, m), jnp.float32)
    for dy in range(3):
        rows3 = a_h[dy:dy + r]                       # (R, W+2, M)
        for dx in range(3):
            av = jax.lax.slice_in_dim(rows3, dx, dx + w, axis=1)
            acc = acc + jnp.dot(av.reshape(r * w, m), w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    b = jnp.maximum(acc * s2_ref[0] + s2_ref[1], 0.0).astype(cd)

    c = jnp.dot(b, w3_ref[:], preferred_element_type=jnp.float32)
    c = c * s3_ref[0] + s3_ref[1]
    if wd_ref is not None:
        idn = jnp.dot(x2d, wd_ref[:], preferred_element_type=jnp.float32)
        idn = idn * sd_ref[0] + sd_ref[1]
    else:
        idn = x2d.astype(jnp.float32)
    y = jnp.maximum(c + idn, 0.0).astype(cd)
    o_ref[0] = y.reshape(r, w, y.shape[-1])


def fused_bottleneck(x: jnp.ndarray,
                     w1: jnp.ndarray, s1: jnp.ndarray,
                     w2: jnp.ndarray, s2: jnp.ndarray,
                     w3: jnp.ndarray, s3: jnp.ndarray,
                     wd: Optional[jnp.ndarray] = None,
                     sd: Optional[jnp.ndarray] = None,
                     *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """One frozen stride-1 bottleneck block, fused.

    x:  (B, H, W, C) activations (compute dtype, typically bf16).
    w1: (C, M)  conv1 kernel;      s1: (2, M) f32 folded BN1 (scale, shift).
    w2: (3, 3, M, M) conv2 kernel; s2: (2, M).
    w3: (M, CO) conv3 kernel;      s3: (2, CO).
    wd/sd: optional (C, CO) / (2, CO) downsample projection (layer1_0).
    """
    b, h, w, cin = x.shape
    m = w1.shape[1]
    co = w3.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wbytes = 2 * (w1.size + w2.size + w3.size
                  + (wd.size if wd is not None else 0))
    r = _pick_rows(h, w, cin, m, co, wbytes)
    nh = h // r
    has_d = wd is not None
    kern = functools.partial(_kernel, rows=r, width=w, cmid=m)
    if has_d:
        def kern(x_ref, xp_ref, xn_ref, w1_ref, w2_ref, w3_ref, wd_ref,
                 s1_ref, s2_ref, s3_ref, sd_ref, o_ref, a_h):
            _kernel(x_ref, xp_ref, xn_ref, w1_ref, w2_ref, w3_ref, s1_ref,
                    s2_ref, s3_ref, o_ref, a_h, rows=r, width=w, cmid=m,
                    wd_ref=wd_ref, sd_ref=sd_ref)
    full = lambda a: pl.BlockSpec(a.shape, lambda bb, ii: (0,) * a.ndim)
    # halo rows as 1-row blocks of x itself (index maps in row units):
    # reads exactly rows i*r-1 and i*r+r — no gather tensor, no extra
    # full-block fetches (a fancy x[:, idx] gather and a strided-slice
    # edge build both lower to while-loops of row copies on TPU,
    # measured at 12-20 ms/batch at ResNet shapes)
    in_specs = [
        pl.BlockSpec((1, r, w, cin), lambda bb, ii: (bb, ii, 0, 0)),
        pl.BlockSpec((1, 1, w, cin),
                     lambda bb, ii: (bb, jnp.maximum(ii * r - 1, 0), 0, 0)),
        pl.BlockSpec((1, 1, w, cin),
                     lambda bb, ii: (bb, jnp.minimum(ii * r + r, h - 1),
                                     0, 0)),
        full(w1), full(w2), full(w3),
    ]
    args = [x, x, x, w1, w2, w3]
    if has_d:
        in_specs.append(full(wd))
        args.append(wd)
    in_specs += [full(s1), full(s2), full(s3)]
    args += [s1, s2, s3]
    if has_d:
        in_specs.append(full(sd))
        args.append(sd)
    flops_blk = 2 * r * w * m * (cin + 9 * m + co + (cin if has_d else 0))
    return pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r, w, co), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((r + 2, w + 2, m), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=b * nh * flops_blk,
            bytes_accessed=x.size * 2 * 2 + b * h * w * co * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def fold_bn(bn_params, eps: float = 1e-5) -> jnp.ndarray:
    """FrozenBatchNorm {weight, bias, running_mean, running_var} ->
    (2, C) f32 [scale, shift] so BN becomes one fused multiply-add."""
    w = bn_params["weight"].astype(jnp.float32)
    b = bn_params["bias"].astype(jnp.float32)
    mean = bn_params["running_mean"].astype(jnp.float32)
    var = bn_params["running_var"].astype(jnp.float32)
    scale = w * jax.lax.rsqrt(var + eps)
    return jnp.stack([scale, b - mean * scale])
