"""Fused pair assembly: gather + add + 2x2 maxpool + ReLU (Pallas, TPU).

The pair trunk's first stage gathers each directed pair's subject/object
streams, sums them, max-pools 2x2 and applies ReLU (see
models.relation_head.pair_trunk).  In XLA this materializes the two gathered
(P, S, S, 4h) tensors in HBM; this kernel streams the per-object blocks
through VMEM via scalar-prefetched pair indices and writes only the pooled
(P, S/2, S/2, 4h) result — 4x fewer output bytes and no gather
materialization.

Layout trick: Mosaic cannot strided-slice the sublane axis, so the streams
are pre-arranged once per batch from (M, S, S, C) to (M, 4, S/2, S/2, C)
with the 2x2 pool group on a leading (untiled) axis; the kernel reduces over
it with a plain max.

Used on the inference/eval path (no VJP); training keeps the XLA
formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rearrange_pool_groups(x: jnp.ndarray) -> jnp.ndarray:
    """(M, S, S, C) -> (M, 4, S/2, S/2, C): pool group (dy, dx) on axis 1."""
    m, s, _, c = x.shape
    h = s // 2
    return x.reshape(m, h, 2, h, 2, c).transpose(0, 2, 4, 1, 3, 5) \
        .reshape(m, 4, h, h, c)


def _kernel(si_ref, oj_ref, a_ref, b_ref, o_ref):
    s = a_ref[0] + b_ref[0]                      # (4, h, h, Ct)
    o_ref[0] = jnp.maximum(jnp.max(s, axis=0), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "channel_tile"))
def fused_pair_pool(a4: jnp.ndarray, b4: jnp.ndarray, si: jnp.ndarray,
                    oj: jnp.ndarray, interpret: bool = False,
                    channel_tile: int = 0) -> jnp.ndarray:
    """a4/b4: (M, 4, h, h, C) rearranged streams; si/oj: (P,) object
    indices.  Returns relu(maxpool2(a[si] + b[oj])): (P, h, h, C)."""
    m, four, h, _, c = a4.shape
    p = si.shape[0]
    ct = channel_tile or c
    n_ct = c // ct

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p, n_ct),
        in_specs=[
            pl.BlockSpec((1, 4, h, h, ct),
                         lambda pi, ci, si, oj: (si[pi], 0, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h, h, ct),
                         lambda pi, ci, si, oj: (oj[pi], 0, 0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, h, ct),
                               lambda pi, ci, si, oj: (pi, 0, 0, ci),
                               memory_space=pltpu.VMEM),
    )
    flops = p * 4 * h * h * c * 2
    return pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, h, h, c), a4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(2 * p * 4 + p) * h * h * c
            * a4.dtype.itemsize, transcendentals=0),
        interpret=interpret,
    )(si, oj, a4, b4)


def pair_pool_reference(a: jnp.ndarray, b: jnp.ndarray, si: jnp.ndarray,
                        oj: jnp.ndarray) -> jnp.ndarray:
    """XLA reference: relu(maxpool2(a[si] + b[oj])) from the un-rearranged
    (M, S, S, C) streams."""
    s = a[si] + b[oj]
    pooled = jax.lax.reduce_window(s, -jnp.inf, jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return jax.nn.relu(pooled)


# ---------------------------------------------------------------------------
# Differentiable wrapper (training path)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pair_pool(a4, b4, si, oj, interpret: bool = False,
              channel_tile: int = 0):
    """Differentiable fused pair pool: the Pallas kernel forward with an
    XLA backward (recompute winners + segment-add into the object streams).
    Ties take the gradient on every maximal element — a measure-zero
    difference from select-and-scatter's first-winner rule."""
    return fused_pair_pool(a4, b4, si, oj, interpret=interpret,
                           channel_tile=channel_tile)


def _pair_pool_fwd(a4, b4, si, oj, interpret, channel_tile):
    out = fused_pair_pool(a4, b4, si, oj, interpret=interpret,
                          channel_tile=channel_tile)
    return out, (a4, b4, si, oj, out)


def _pair_pool_bwd(interpret, channel_tile, res, g):
    a4, b4, si, oj, out = res
    s = a4[si] + b4[oj]                       # (P, 4, h, h, C)
    winner = (s == out[:, None]) & (out[:, None] > 0)
    ds = g[:, None] * winner.astype(g.dtype)
    da4 = jnp.zeros_like(a4).at[si].add(ds)
    db4 = jnp.zeros_like(b4).at[oj].add(ds)
    return da4, db4, None, None


pair_pool.defvjp(_pair_pool_fwd, _pair_pool_bwd)
