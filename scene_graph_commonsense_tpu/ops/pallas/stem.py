"""Fused ResNet stem tail: frozen-BN + ReLU + 3x3/2 max-pool (Pallas, TPU).

After the stem convolution the reference trunk applies BatchNorm, ReLU and
a 3x3 stride-2 max-pool with padding 1 (torchvision ResNet).  In XLA this
costs a layout copy + relu pass over the (B, H, W, 64) conv output plus a
reduce-window — ~4.7 ms/batch at DETR shapes (H = W = 512).  This kernel
does all three in one read of the conv output and one write of the pooled
(B, H/2, W/2, 64) result.

Column access at stride 2 cannot be expressed on the sublane axis (Mosaic
restriction), so the caller passes the conv output with column pairs packed
into lanes — (B, H, W/2, 2C), a pure lane-merge reshape in XLA — and the
kernel takes the window maximum as: even half, odd half, and the odd half
of the *previous* packed column (a +1 sublane roll with the wrapped column
masked to -inf, matching the pool's left padding).  Rows ride the same
1-row halo block specs as `bottleneck.py`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xp_ref, xn_ref, s_ref, o_ref, *, rows: int, wout: int,
            ch: int):
    r, w, c = rows, wout, ch
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    neg = jnp.float32(-3.0e38)

    def bnrelu(v):                                   # (N, W, 2C) f32
        return jnp.maximum(v.astype(jnp.float32) * s_ref[0] + s_ref[1], 0.0)

    v = bnrelu(x_ref[0])                             # (2R, W, 2C)
    vt = bnrelu(xp_ref[0])                           # (1, W, 2C)
    vb = bnrelu(xn_ref[0])
    vt = jnp.where(i == 0, neg, vt)                  # pool's -inf padding
    vb = jnp.where(i == nh - 1, neg, vb)
    # rows: out row u pools conv rows 2u-1, 2u, 2u+1 (unrolled — a
    # strided axis-0 slice lowers to an unsupported >2D gather)
    col = jnp.concatenate([vt, v, vb], axis=0)       # (2R+2, W, 2C)
    rm = jnp.stack([
        jnp.maximum(jnp.maximum(col[2 * u], col[2 * u + 1]),
                    col[2 * u + 2]) for u in range(r)])   # (R, W, 2C)
    even, odd = rm[..., :c], rm[..., c:]
    prev_odd = pltpu.roll(odd, 1, axis=1)            # odd half of col v-1
    first = jax.lax.broadcasted_iota(jnp.int32, (r, w, c), 1) == 0
    prev_odd = jnp.where(first, neg, prev_odd)       # left -inf padding
    out = jnp.maximum(jnp.maximum(even, odd), prev_odd)
    o_ref[0] = out.astype(o_ref.dtype)


def stem_pool(conv_out: jnp.ndarray, bn_fold: jnp.ndarray,
              *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """relu(bn(conv_out)) -> 3x3 stride-2 max-pool, padding 1.

    conv_out: (B, H, W, C) stem conv output (H, W even).
    bn_fold:  (2, C) f32 [scale, shift] from `bottleneck.fold_bn`.
    Returns (B, H/2, W/2, C).
    """
    b, h, w, c = conv_out.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xp = conv_out.reshape(b, h, w // 2, 2 * c)       # column pairs -> lanes
    spack = jnp.concatenate([bn_fold, bn_fold], axis=1)   # (2, 2C)
    r = 8 if (h // 2) % 8 == 0 else 1
    nh = (h // 2) // r
    kern = functools.partial(_kernel, rows=r, wout=w // 2, ch=c)
    return pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, 2 * r, w // 2, 2 * c),
                         lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, w // 2, 2 * c),
                         lambda bb, ii: (bb, jnp.maximum(2 * r * ii - 1, 0),
                                         0, 0)),
            pl.BlockSpec((1, 1, w // 2, 2 * c),
                         lambda bb, ii: (bb,
                                         jnp.minimum(2 * r * ii + 2 * r,
                                                     h - 1), 0, 0)),
            pl.BlockSpec((2, 2 * c), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, w // 2, c),
                               lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c),
                                       conv_out.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=conv_out.size * 8, bytes_accessed=conv_out.size * 2
            + b * (h // 2) * (w // 2) * c * 2, transcendentals=0),
        interpret=interpret,
    )(xp, xp, xp, spack)
