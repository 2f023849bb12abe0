"""Fused transformer FFN + residual + LayerNorm (Pallas, TPU).

The DETR encoder's FFN (linear1 -> relu -> linear2, reference
train_utils.py:9-18 runs it inside the frozen torch-hub DETR) is the
encoder's FLOP majority (155 of ~280 GFLOP/batch-12) but under XLA it
round-trips the (B*L, 4D) intermediate through HBM — ~50 MB per layer
at DETR shapes (12x1024x2048 bf16) plus separate residual-add and
LayerNorm passes over the (B*L, D) stream.  This kernel keeps the whole
chain

    y = LayerNorm(x + linear2(relu(linear1(x))))

VMEM-resident per token-block: two MXU matmuls with f32 accumulation,
bias/relu epilogues, the residual add, and the row LayerNorm, with HBM
traffic of exactly x in + y out.

Matches the EncoderLayer math (models/detr.py): matmuls in the compute
dtype (bf16 in production) with f32 accumulation; residual + LayerNorm
statistics in f32 (flax LayerNorm promotes with its f32 params, so
post-norm activations are f32 even under bf16 compute).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref,
                o_ref, *, eps: float, compute_dtype):
    x = x_ref[:]                                       # (T, D), x dtype
    xc = x.astype(compute_dtype)
    h = jnp.dot(xc, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[0].astype(jnp.float32), 0.0)
    h = h.astype(compute_dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32) + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    out = d * jax.lax.rsqrt(var + eps)
    out = out * g_ref[0].astype(jnp.float32) + bt_ref[0].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def fused_ffn_ln(x: jnp.ndarray,
                 w1: jnp.ndarray, b1: jnp.ndarray,
                 w2: jnp.ndarray, b2: jnp.ndarray,
                 gamma: jnp.ndarray, beta: jnp.ndarray, *,
                 compute_dtype=jnp.bfloat16, eps: float = 1e-5,
                 block_t: int = 512,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """LayerNorm(x + relu(x @ w1 + b1) @ w2 + b2) over flattened tokens.

    x: (N, D) in the residual dtype (f32 after a post-norm layer);
    w1: (D, F); w2: (F, D); gamma/beta: (D,) LayerNorm affine.  Output is
    f32 (the flax post-norm dtype).  N must divide by block_t.
    """
    n, d = x.shape
    f = w1.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = min(block_t, n)
    assert n % t == 0, (n, t)
    cd = jnp.dtype(compute_dtype)
    w1 = w1.astype(cd)
    w2 = w2.astype(cd)
    kern = functools.partial(_ffn_kernel, eps=eps, compute_dtype=cd)
    row = lambda a: pl.BlockSpec((1, a.shape[-1]), lambda i: (0, 0))  # noqa
    return pl.pallas_call(
        kern,
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),
            row(b1), pl.BlockSpec((f, d), lambda i: (0, 0)), row(b2),
            row(gamma), row(beta),
        ],
        out_specs=pl.BlockSpec((t, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * f,
            bytes_accessed=x.size * x.dtype.itemsize + n * d * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      gamma.reshape(1, -1), beta.reshape(1, -1))
