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


def _build_stem_weights(w7: jnp.ndarray, dtype) -> jnp.ndarray:
    """Rearrange the (7, 7, 3, 64) stem conv kernel into the (288, 128)
    dot matrix used by `stem_conv_pool`.

    K rows are ordered (du, cs, a, m, c): du = s2d row tap, cs = cell
    column tap (t-1, t, t+1), (a, m) = position inside the 2x4 raw-pixel
    cell, c = RGB.  N cols are (pi, o): output column parity and channel.
    Entry = w7[ky, kx] with ky = 2*du + a - 1 and kx = 4*(cs-1) + m
    - 2*pi + 3 (zero where the tap leaves the 7x7 support)."""
    w = jnp.zeros((4, 3, 2, 4, 3, 2, 64), w7.dtype)
    for du in range(4):
        for a in range(2):
            ky = 2 * du + a - 1
            if not 0 <= ky < 7:
                continue
            for cs in range(3):
                for m in range(4):
                    for pi in range(2):
                        kx = 4 * (cs - 1) + m - 2 * pi + 3
                        if not 0 <= kx < 7:
                            continue
                        w = w.at[du, cs, a, m, :, pi, :].set(w7[ky, kx])
    return w.reshape(288, 128).astype(dtype)


def _conv_pool_kernel(x_ref, t3_ref, t2_ref, t1_ref, b1_ref, b2_ref,
                      w_ref, s_ref, o_ref, cs_scr, *, rows: int,
                      cells: int):
    """images (raw rows as (cells, 12) lanes) -> stem conv + BN + relu +
    3x3/2 max-pool, one pass.  See stem_conv_pool."""
    r, t = rows, cells
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    neg = jnp.float32(-3.0e38)
    cd = x_ref.dtype

    raws = jnp.concatenate(
        [t3_ref[0], t2_ref[0], t1_ref[0], x_ref[0], b1_ref[0], b2_ref[0]],
        axis=0)                                       # (4R+10, T, 12)
    # merge raw row pairs into lanes, unrolled: a reshape-split + middle
    # index is a strided row view, whose lane-concat Mosaic rejects with
    # an offset mismatch
    s2d = jnp.stack(
        [jnp.concatenate([raws[2 * sl], raws[2 * sl + 1]], axis=-1)
         for sl in range(2 * r + 5)])                 # (2R+5, T, 24)
    # s2d row sl is raw conv-grid row 2*u0 - 3 + sl; rows outside the
    # image are the conv's ZERO padding
    sl = jax.lax.broadcasted_iota(jnp.int32, s2d.shape, 0)
    bad = jnp.logical_or(jnp.logical_and(i == 0, sl < 3),
                         jnp.logical_and(i == nh - 1, sl >= 2 * r + 3))
    s2d = jnp.where(bad, jnp.zeros_like(s2d), s2d)
    sp = jnp.pad(s2d, ((0, 0), (1, 1), (0, 0)))       # zero cells t=-1, T
    # Mosaic rejects lane concats whose operands carry a sublane offset
    # (the cs column shifts); a scratch round-trip normalizes them
    for cs in range(3):
        cs_scr[cs] = jax.lax.slice_in_dim(sp, cs, cs + t, axis=1)
    kin = jnp.concatenate(
        [jax.lax.slice_in_dim(cs_scr[cs], du, du + 2 * r + 2, axis=0)
         for du in range(4) for cs in range(3)], axis=-1)
    conv = jnp.dot(kin.reshape((2 * r + 2) * t, 288), w_ref[:],
                   preferred_element_type=jnp.float32)
    conv = jnp.maximum(conv * s_ref[0] + s_ref[1], 0.0)
    conv = conv.reshape(2 * r + 2, t, 128)
    # conv row co is pool-grid conv row 2*u0 - 1 + co; outside rows are
    # the pool's -inf padding
    co = jax.lax.broadcasted_iota(jnp.int32, conv.shape, 0)
    bad = jnp.logical_or(jnp.logical_and(i == 0, co == 0),
                         jnp.logical_and(i == nh - 1, co == 2 * r + 1))
    conv = jnp.where(bad, neg, conv)
    v4 = conv.reshape(r + 1, 2, t, 128)
    ev, od = v4[:, 0], v4[0:r, 1]
    rm = jnp.maximum(jnp.maximum(ev[0:r], od), ev[1:r + 1])  # (R, T, 128)
    even, odd = rm[..., :64], rm[..., 64:]
    prev = pltpu.roll(odd, 1, axis=1)                # odd half of col v-1
    first = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 1) == 0
    prev = jnp.where(first, neg, prev)               # left -inf padding
    o_ref[0] = jnp.maximum(jnp.maximum(even, odd), prev).astype(cd)


def stem_conv_pool(images: jnp.ndarray, w7: jnp.ndarray,
                   bn_fold: jnp.ndarray,
                   *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """The full DETR-ResNet stem in one kernel: 7x7/2 conv (as a space-to-
    depth K=288 dot with a pre-permuted weight matrix), frozen-BN, relu,
    and the 3x3/2 max-pool.  images (B, H, W, 3) -> (B, H/4, W/4, 64).

    The input rides a pure-bitcast (B, H, W/4, 12) view (row-major lane
    merge), so the only XLA-side work is the bf16 cast; the 2x2 pixel
    cells' lane order is absorbed into the weight permutation
    (`_build_stem_weights`) instead of shuffling data.
    """
    b, h, w, c = images.shape
    assert c == 3 and h % 8 == 0 and w % 8 == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x3 = images.reshape(b, h, w // 4, 12)
    t = w // 4
    wmat = _build_stem_weights(w7, images.dtype)
    spack = jnp.concatenate([bn_fold, bn_fold], axis=1)   # (2, 128)
    hq = h // 4
    r = 1
    for cand in (8, 4, 2):
        if hq % cand:
            continue
        # calibrated against Mosaic's scoped-vmem accounting (16.46M at
        # r=8, t=256): kin + f32 conv values dominate
        est = (2 * cand + 2) * t * (288 * 2 + 128 * 8) \
            + (4 * cand + 10) * t * 12 * 2 * 4 \
            + 3 * (2 * cand + 5) * t * 24 * 2
        if est <= 6 * 1024 * 1024:
            r = cand
            break
    nh = hq // r
    halo = lambda off, lim: pl.BlockSpec(
        (1, 2, t, 12),
        lambda bb, ii, off=off, lim=lim: (
            bb, jnp.clip(2 * r * ii + off, 0, lim), 0, 0))
    kern = functools.partial(_conv_pool_kernel, rows=r, cells=t)
    return pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, 4 * r, t, 12), lambda bb, ii: (bb, ii, 0, 0)),
            halo(-3, h // 2 - 1), halo(-2, h // 2 - 1), halo(-1, h // 2 - 1),
            halo(2 * r, h // 2 - 1), halo(2 * r + 1, h // 2 - 1),
            pl.BlockSpec((288, 128), lambda bb, ii: (0, 0)),
            pl.BlockSpec((2, 128), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, t, 64),
                               lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, w // 4, 64), images.dtype),
        scratch_shapes=[pltpu.VMEM((3, 2 * r + 5, t, 24), images.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h // 2) * (w // 4) * 288 * 128,
            bytes_accessed=images.size * 2 + b * hq * (w // 4) * 64 * 2,
            transcendentals=0),
        interpret=interpret,
    )(x3, x3, x3, x3, x3, x3, wmat, spack)


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
