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

Eval uses the kernel directly; training goes through the custom-VJP
wrapper `pair_pool`, whose forward also records the winning pool slot
(int8) and whose backward turns the pair->object scatter-add into one
dense MXU contraction against the 0/1 pair-incidence matrix (see
`pair_pool` docstring; ~38 ms -> ~8 ms per step on v5e vs XLA autodiff
of the gather/scatter formulation).
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


def _kernel_idx(si_ref, oj_ref, a_ref, b_ref, o_ref, idx_ref):
    # Mosaic's reduce-index lowering and (on some targets) vector compares
    # are float32-only, so the winner computation runs in f32
    s = (a_ref[0] + b_ref[0]).astype(jnp.float32)    # (4, h, h, Ct)
    mx = jnp.max(s, axis=0)
    o_ref[0] = jnp.maximum(mx, 0.0).astype(o_ref.dtype)
    # winning pool slot, -1 where ReLU clips (drives the matmul
    # backward); int8 quarters the HBM traffic of saving/reading it
    idx = jnp.argmax(s, axis=0).astype(jnp.int8)
    idx_ref[0] = jnp.where(mx > 0.0, idx, jnp.int8(-1))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "channel_tile",
                                    "with_idx"))
def fused_pair_pool(a4: jnp.ndarray, b4: jnp.ndarray, si: jnp.ndarray,
                    oj: jnp.ndarray, interpret: bool = False,
                    channel_tile: int = 0, with_idx: bool = False):
    """a4/b4: (M, 4, h, h, C) rearranged streams; si/oj: (P,) object
    indices.  Returns relu(maxpool2(a[si] + b[oj])): (P, h, h, C); with
    with_idx also the (P, h, h, C) int8 winning-slot index (-1 where the
    ReLU clips), consumed by the training backward."""
    m, four, h, _, c = a4.shape
    p = si.shape[0]
    ct = channel_tile or c
    n_ct = c // ct

    out_spec = pl.BlockSpec((1, h, h, ct),
                            lambda pi, ci, si, oj: (pi, 0, 0, ci),
                            memory_space=pltpu.VMEM)
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
        out_specs=(out_spec, out_spec) if with_idx else out_spec,
    )
    flops = p * 4 * h * h * c * 2
    out_shape = jax.ShapeDtypeStruct((p, h, h, c), a4.dtype)
    if with_idx:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((p, h, h, c), jnp.int8))
    return pl.pallas_call(
        _kernel_idx if with_idx else _kernel, grid_spec=grid_spec,
        out_shape=out_shape,
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
    """Differentiable fused pair pool.

    Forward: the Pallas kernel, additionally emitting the winning pool
    slot per output element (-1 where the ReLU clips).

    Backward ("scatter on the MXU"): routing g into the winning slot is
    one fused elementwise pass producing ds (P, 4, h, h, C); the
    pair->object scatter-add then becomes a single matmul
    [onehot(si); onehot(oj)] (2M, P) @ ds (P, K) — the 0/1 matrix turns
    the data-dependent scatter into dense MXU work with one read of ds,
    replacing XLA's serialized scatter-add (which cost ~4x more HBM
    traffic regathering both streams and comparing against the output).
    Ties take the gradient on the first maximal slot, matching
    select-and-scatter's first-winner rule."""
    # primal (no grad in flight): the idx-free kernel — computing the
    # winner index here would write an unused (P, h, h, C) int8 tensor on
    # every eval/inference call
    return fused_pair_pool(a4, b4, si, oj, interpret=interpret,
                           channel_tile=channel_tile, with_idx=False)


def _pair_pool_fwd(a4, b4, si, oj, interpret, channel_tile):
    out, idx = fused_pair_pool(a4, b4, si, oj, interpret=interpret,
                               channel_tile=channel_tile, with_idx=True)
    return out, (si, oj, idx, a4.shape[0])


def _pair_pool_bwd(interpret, channel_tile, res, g):
    si, oj, idx, m = res
    # route g into the winning slot: (P, 4, h, h, C), zero elsewhere
    slots = jnp.arange(4, dtype=jnp.int8).reshape(1, 4, 1, 1, 1)
    ds = jnp.where(idx[:, None] == slots, g[:, None], 0).astype(g.dtype)
    # pair->object scatter-add as one dense contraction over the 0/1
    # incidence; einsum keeps ds's natural layout (reshaping to a 2-D dot
    # operand forces ~15 ms of relayout copies on v5e)
    ar = jnp.arange(m, dtype=si.dtype)
    onehot = jnp.concatenate([
        (si[None, :] == ar[:, None]).astype(g.dtype),
        (oj[None, :] == ar[:, None]).astype(g.dtype)], axis=0)  # (2M, P)
    # HIGHEST matmul precision: the TPU default lowers f32 matmuls to
    # bf16 MXU passes, which would round the f32 cotangents to ~2e-3
    # rel error (caught on-chip by tools/verify_fused.py; XLA's own
    # scatter backward is exact).  For bf16 cotangents the operands are
    # MXU-exact either way, so this costs nothing in production bf16 and
    # ~1 ms at f32 (the contraction is ~64 GFLOP against a 197 TFLOP/s
    # chip).
    dab = jnp.einsum("mp,pchwk->mchwk", onehot, ds,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST).astype(g.dtype)
    return dab[:m], dab[m:], None, None


pair_pool.defvjp(_pair_pool_fwd, _pair_pool_bwd)
