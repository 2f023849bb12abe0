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


def _chunk_rows(r: int) -> int:
    """Row-chunk for the conv2->conv3->residual epilogue: the f32
    accumulators live only for one chunk, so the row-block r (which sets
    DMA size and the 2/R halo overhead) can grow past what full-block
    f32 intermediates would allow."""
    return min(r, 4)


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
        # live kernel values (measured against Mosaic's scoped-vmem
        # accounting, which OOMed at 24M for r*w*co f32 intermediates):
        # full-block terms are the bf16 conv1 output; the f32 conv2
        # accumulator and conv3 result + residual are chunk-local
        # (the epilogue runs in _chunk_rows-row chunks)
        ch = _chunk_rows(r)
        vals = r * w * 2 * cmid \
            + ch * w * (4 * cmid + 8 * co + 2 * co + 2 * cin + 2 * cmid)
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

    # conv2 -> conv3 -> residual epilogue in row chunks: the f32
    # accumulators (acc, c, idn) live only chunk-long, which is what lets
    # _pick_rows choose r=8-16 instead of 4 (halving the 2/R halo
    # recompute and doubling DMA block sizes)
    ch = min(r, 4)
    for c0 in range(0, r, ch):
        slices = [jax.lax.slice_in_dim(a_h[c0 + dy:c0 + dy + ch], dx,
                                       dx + w, axis=1).reshape(ch * w, m)
                  for dy in range(3) for dx in range(3)]
        if m < 128:
            # small stage-1 channels: one K=9M dot keeps the MXU
            # contraction lanes full instead of nine K=M
            # (quarter-utilized) passes; w2_ref arrives pre-flattened
            acc = jnp.dot(jnp.concatenate(slices, axis=-1),
                          w2_ref[:].reshape(9 * m, m),
                          preferred_element_type=jnp.float32)
        else:
            acc = jnp.zeros((ch * w, m), jnp.float32)
            for k, av in enumerate(slices):
                acc = acc + jnp.dot(av, w2_ref[k // 3, k % 3],
                                    preferred_element_type=jnp.float32)
        b = jnp.maximum(acc * s2_ref[0] + s2_ref[1], 0.0).astype(cd)

        c = jnp.dot(b, w3_ref[:], preferred_element_type=jnp.float32)
        c = c * s3_ref[0] + s3_ref[1]
        xc = jax.lax.slice_in_dim(x, c0, c0 + ch, axis=0) \
            .reshape(ch * w, cin)
        if wd_ref is not None:
            idn = jnp.dot(xc, wd_ref[:], preferred_element_type=jnp.float32)
            idn = idn * sd_ref[0] + sd_ref[1]
        else:
            idn = xc.astype(jnp.float32)
        y = jnp.maximum(c + idn, 0.0).astype(cd)
        o_ref[0, c0:c0 + ch] = y.reshape(ch, w, y.shape[-1])


def _kernel_s2(x_ref, xt_ref, w1_ref, w2_ref, w3_ref, wd_ref, s1_ref,
               s2_ref, s3_ref, sd_ref, o_ref, *, rows: int, wout: int,
               cmid: int):
    """Stride-2 transition block on column-pair-packed input.

    x_ref: (1, 2R, Wp, 2C) — input rows [2iR, 2iR+2R), columns packed in
    pairs (lane halves = even/odd column).  xt_ref: 1-row top halo
    (input row 2iR-1).  Row parity split makes the three dy taps
    contiguous row slices; column taps are aligned lane-half selects of
    the packed layout plus one leading zero column.  Output rows u take
    input rows 2u-1..2u+1, so no bottom halo is needed.
    """
    r, wp, m = rows, wout, cmid
    i = pl.program_id(1)
    c2 = x_ref.shape[-1]
    cin = c2 // 2
    cd = x_ref.dtype

    def conv1(v):                                    # (N, Wp, 2C) -> packed a
        n = v.shape[0]
        ve = v[..., :cin].reshape(n * wp, cin)
        vo = v[..., cin:].reshape(n * wp, cin)
        both = jnp.concatenate([ve, vo], axis=0)
        a = jnp.dot(both, w1_ref[:], preferred_element_type=jnp.float32)
        a = jnp.maximum(a * s1_ref[0] + s1_ref[1], 0.0).astype(cd)
        return jnp.concatenate([a[:n * wp].reshape(n, wp, m),
                                a[n * wp:].reshape(n, wp, m)], axis=-1)

    xb = x_ref[0].reshape(r, 2, wp, c2)
    x_od = xb[:, 0]                                  # local t = 2u+1 (r rows)
    top = xt_ref[0]                                  # (1, Wp, 2C), t = 0
    x_ev = jnp.concatenate([top, xb[:, 1]], axis=0)  # t = 0,2,..,2R (R+1)
    a_ev = conv1(x_ev)                               # (R+1, Wp, 2M)
    # row -1 is conv2's ZERO padding — zero a (not x: conv1(0) = relu(b1))
    row0 = jax.lax.broadcasted_iota(jnp.int32, a_ev.shape, 0) == 0
    a_ev = jnp.where(jnp.logical_and(row0, i == 0),
                     jnp.zeros_like(a_ev), a_ev)
    a_ev = jnp.pad(a_ev, ((0, 0), (1, 0), (0, 0)))          # (R+1, Wp+1, 2M)
    a_od = jnp.pad(conv1(x_od), ((0, 0), (1, 0), (0, 0)))   # (R,   Wp+1, 2M)

    acc = jnp.zeros((r * wp, m), jnp.float32)
    taps = ((a_ev[0:r], 0), (a_od, 1), (a_ev[1:r + 1], 2))
    for rows3, dy in taps:
        cols = ((jax.lax.slice_in_dim(rows3, 0, wp, axis=1)[..., m:], 0),
                (jax.lax.slice_in_dim(rows3, 1, wp + 1, axis=1)[..., :m], 1),
                (jax.lax.slice_in_dim(rows3, 1, wp + 1, axis=1)[..., m:], 2))
        for av, dx in cols:
            acc = acc + jnp.dot(av.reshape(r * wp, m), w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    b = jnp.maximum(acc * s2_ref[0] + s2_ref[1], 0.0).astype(cd)
    c = jnp.dot(b, w3_ref[:], preferred_element_type=jnp.float32)
    c = c * s3_ref[0] + s3_ref[1]
    idn = jnp.dot(x_od[..., :cin].reshape(r * wp, cin), wd_ref[:],
                  preferred_element_type=jnp.float32)
    idn = idn * sd_ref[0] + sd_ref[1]
    y = jnp.maximum(c + idn, 0.0).astype(cd)
    o_ref[0] = y.reshape(r, wp, y.shape[-1])


def fused_bottleneck_s2(x: jnp.ndarray,
                        w1: jnp.ndarray, s1: jnp.ndarray,
                        w2: jnp.ndarray, s2: jnp.ndarray,
                        w3: jnp.ndarray, s3: jnp.ndarray,
                        wd: jnp.ndarray, sd: jnp.ndarray,
                        *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Stride-2 downsampling bottleneck (the three ResNet-101 stage
    transitions), fused.  x: (B, H, W, C) -> (B, H/2, W/2, CO)."""
    b, h, w, cin = x.shape
    m = w1.shape[1]
    co = w3.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    wbytes = 2 * (w1.size + w2.size + w3.size + wd.size)
    wp = w // 2
    r = 1
    for cand in (16, 8, 4, 2):
        if (h // 2) % cand:
            continue
        blk = 2 * cand * wp * 2 * cin * 2 + cand * wp * co * 2
        vals = cand * wp * (2 * 2 * m * 3 + 4 * m + 8 * co + 2 * co
                            + 2 * cin)
        if 2 * blk + vals + wbytes <= 12 * 1024 * 1024:
            r = cand
            break
    nh = (h // 2) // r
    xp = x.reshape(b, h, wp, 2 * cin)                # lane-merge bitcast
    kern = functools.partial(_kernel_s2, rows=r, wout=wp, cmid=m)
    full = lambda a: pl.BlockSpec(a.shape, lambda bb, ii: (0,) * a.ndim)
    flops_blk = 2 * r * wp * m * (2 * (2 * r + 1) / (2 * r) * cin
                                  + 9 * m + co) + 2 * r * wp * cin * co
    return pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, 2 * r, wp, 2 * cin),
                         lambda bb, ii: (bb, ii, 0, 0)),
            pl.BlockSpec((1, 1, wp, 2 * cin),
                         lambda bb, ii: (bb, jnp.maximum(2 * r * ii - 1, 0),
                                         0, 0)),
            full(w1), full(w2), full(w3), full(wd),
            full(s1), full(s2), full(s3), full(sd),
        ],
        out_specs=pl.BlockSpec((1, r, wp, co),
                               lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, wp, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=int(b * nh * flops_blk),
            bytes_accessed=x.size * 2 + b * (h // 2) * wp * co * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, w1, w2, w3, wd, s1, s2, s3, sd)


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
            dimension_semantics=("parallel", "parallel")),
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
