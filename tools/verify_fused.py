"""On-chip parity gate for every Pallas kernel in the compute path.

The interpreter-mode tests (tests/test_resnet_fused.py, test_pallas_pool.py)
prove the kernel *math*; this tool proves the **Mosaic lowering** on the real
TPU.  It compares, on the actual device:

  1. the full-depth (3,4,23,3) fused ResNet-101 trunk
     (models/resnet_fused.resnet_forward_fused) vs the Flax module
     (models/detr.ResNet101) at the production DETR shape
     (image_size 1024 -> C5 32x32x2048), in f32 AND in the production
     bfloat16 — the bf16 legs are additionally referenced against the f32
     XLA truth so a fused-path precision regression cannot hide inside
     bf16-vs-bf16 agreement;
  2. the stem megakernel (ops/pallas/stem.stem_conv_pool: 7x7 conv-as-dot
     + BN + relu + 3x3/2 maxpool) vs the XLA stem formulation;
  3. the fused pair pool (ops/pallas/pair_pool.pair_pool) forward AND
     custom-VJP backward vs the XLA reference formulation
     (pair_pool_reference + jax.grad), at the production relation dims
     (S=32 streams, 4h=512 channels, P=1024 packed pairs);
  4. the fused encoder attention (ops/pallas/attention.fused_attention)
     vs the naive MHA math at the production encoder shape
     (12x8x1024x32, key-masked), f32 AND bf16, both referenced against
     the 'highest'-precision naive truth;
  5. the fused FFN+LayerNorm (ops/pallas/ffn.fused_ffn_ln) vs the flax
     encoder-FFN chain at 12288 tokens x 256 -> 2048 -> 256, f32 + bf16.

Writes PARITY_TPU.json and exits non-zero on any tolerance breach.  Run it
before recording any bench: these kernels replace the compute the reference
delegates to torch hub (/root/reference/utils.py:88-120), so their on-chip
correctness is load-bearing for every downstream number.

Usage:  python tools/verify_fused.py [--out PARITY_TPU.json]
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.models.detr import ResNet101
from scene_graph_commonsense_tpu.models.resnet_fused import (
    resnet_forward_fused)
from scene_graph_commonsense_tpu.ops.pallas.bottleneck import fold_bn
from scene_graph_commonsense_tpu.ops.pallas.pair_pool import (
    pair_pool, pair_pool_reference, rearrange_pool_groups)
from scene_graph_commonsense_tpu.ops.pallas.stem import stem_conv_pool
from scene_graph_commonsense_tpu.utils.jax_cache import enable_compile_cache

# Production shapes: config.py image_size=1024 -> C5 32x32; hidden_dim=128
# -> 4h=512 pair-stream channels; bench.py PAIR_CAPACITY=1024.
BATCH = 2
IMG = 1024
PAIR_M = 120        # object-stream rows (B*N at batch 12, N=10 valid)
PAIR_P = 1024       # packed pair capacity
PAIR_S = 32         # stream spatial (== feature_size)
PAIR_C = 512        # 4 * hidden_dim


def _rel(got, ref):
    """max |got - ref| / max |ref| — scale-free across 33 blocks of growth."""
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    return float(np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-30))


def _perturbed_params(key, x):
    m = ResNet101(dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x[:1, :64, :64])["params"]
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    leaves = [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, keys)]
    return jax.tree.unflatten(treedef, leaves)


def check_trunk(results):
    """TPU matmul-precision note: XLA lowers f32 matmuls/convs to bf16
    MXU passes by default, so neither the fused kernel nor the default
    XLA program is the f32 'truth' — the truth is the XLA trunk traced
    under default_matmul_precision('highest').  Each path is gated on
    tracking that truth at least as well as XLA's own default does
    (within 3x), which is what production runs."""
    x = jax.random.normal(jax.random.PRNGKey(3), (BATCH, IMG, IMG, 3),
                          jnp.float32)
    params = _perturbed_params(jax.random.PRNGKey(7), x)

    def xla(dt):
        return jax.jit(lambda p, v: ResNet101(dtype=dt).apply(
            {"params": p}, v))(params, x)

    def fused(dt):
        return jax.jit(lambda p, v: resnet_forward_fused(
            p, v, dtype=dt))(params, x)

    with jax.default_matmul_precision("highest"):
        truth = np.asarray(
            jax.jit(lambda p, v: ResNet101(dtype=jnp.float32).apply(
                {"params": p}, v))(params, x), np.float64)

    got32 = fused(jnp.float32)
    e_xla32 = _rel(xla(jnp.float32), truth)
    e_fused32 = _rel(got32, truth)
    results["trunk_f32_vs_f32_truth"] = {
        "rel": e_fused32, "xla_default_rel": e_xla32,
        "tol": max(3.0 * e_xla32, 2e-4),
        "shape": list(np.shape(got32))}
    del got32

    # bf16 production legs: fused-vs-xla agreement, plus both against the
    # f32 truth so the fused path cannot silently lose precision
    xla16 = np.asarray(xla(jnp.bfloat16), np.float64)
    got16 = np.asarray(fused(jnp.bfloat16), np.float64)
    results["trunk_bf16_fused_vs_xla_bf16"] = {
        "rel": _rel(got16, xla16), "tol": 0.15}
    e_xla = _rel(xla16, truth)
    e_fused = _rel(got16, truth)
    results["trunk_bf16_vs_f32_truth"] = {
        "rel": e_fused, "xla_bf16_rel": e_xla,
        # fused bf16 must track the f32 truth about as well as XLA bf16 does
        "tol": max(3.0 * e_xla, 0.05)}


def check_stem(results):
    x = jax.random.normal(jax.random.PRNGKey(5), (BATCH, IMG, IMG, 3),
                          jnp.float32)
    params = _perturbed_params(jax.random.PRNGKey(9), x)
    w7, fold = params["conv1"]["kernel"], fold_bn(params["bn1"])

    def xla_stem(v):
        out = jax.lax.conv_general_dilated(
            v, w7, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jax.nn.relu(out * fold[0] + fold[1])
        out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)),
                      constant_values=-jnp.inf)
        return jax.lax.reduce_window(out, -jnp.inf, jax.lax.max,
                                     (1, 3, 3, 1), (1, 2, 2, 1),
                                     [(0, 0)] * 4)

    ref = jax.jit(xla_stem)(x)
    got = jax.jit(lambda v: stem_conv_pool(v, w7, fold))(x)
    results["stem_megakernel_f32"] = {"rel": _rel(got, ref), "tol": 2e-5,
                                      "shape": list(np.shape(got))}


def check_pair_pool(results):
    ka, kb, kw = jax.random.split(jax.random.PRNGKey(11), 3)
    a = jax.random.normal(ka, (PAIR_M, PAIR_S, PAIR_S, PAIR_C), jnp.float32)
    b = jax.random.normal(kb, (PAIR_M, PAIR_S, PAIR_S, PAIR_C), jnp.float32)
    rng = np.random.default_rng(0)
    si = jnp.asarray(rng.integers(0, PAIR_M, PAIR_P), jnp.int32)
    oj = jnp.asarray(rng.integers(0, PAIR_M, PAIR_P), jnp.int32)
    h = PAIR_S // 2
    w = jax.random.normal(kw, (PAIR_P, h, h, PAIR_C), jnp.float32)

    # everything an operand, nothing closed over: a closed-over device
    # array becomes an HLO *constant*, and at these sizes (w alone is
    # 537 MB) the axon remote-compile request blows the tunnel's body
    # limit (HTTP 413).  The rel errors are also computed on device so
    # only scalars cross the wire.
    def loss_kernel(a, b, si, oj, w):
        out = pair_pool(rearrange_pool_groups(a), rearrange_pool_groups(b),
                        si, oj, False, 0)
        return jnp.sum(out * w), out

    def loss_xla(a, b, si, oj, w):
        out = pair_pool_reference(a, b, si, oj)
        return jnp.sum(out * w), out

    def jrel(got, ref):
        got = got.astype(jnp.float32)
        ref = ref.astype(jnp.float32)
        return (jnp.max(jnp.abs(got - ref))
                / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))

    def vjp_of(loss):
        def run(a, b, si, oj, w):
            (_, out), (da, db) = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(a, b, si, oj, w)
            return out, da, db
        return jax.jit(run)

    # The VJP contracts the cotangent on the MXU, where XLA's f32
    # default is bf16 passes (see check_trunk) — so truth is the XLA
    # formulation at 'highest', and the kernel is gated on tracking it
    # at least as well as XLA's default does.
    out_k, da_k, db_k = vjp_of(loss_kernel)(a, b, si, oj, w)
    out_x, da_x, db_x = vjp_of(loss_xla)(a, b, si, oj, w)
    with jax.default_matmul_precision("highest"):
        out_t, da_t, db_t = vjp_of(loss_xla)(a, b, si, oj, w)

    cmp = jax.jit(lambda *t: [jrel(g, r) for g, r in
                              zip(t[:3], t[3:])])
    r_out, r_da, r_db = [float(v) for v in
                         cmp(out_k, da_k, db_k, out_t, da_t, db_t)]
    x_out, x_da, x_db = [float(v) for v in
                         cmp(out_x, da_x, db_x, out_t, da_t, db_t)]
    results["pair_pool_forward_f32"] = {
        "rel": r_out, "xla_default_rel": x_out,
        "tol": max(3.0 * x_out, 1e-5)}
    results["pair_pool_vjp_da_f32"] = {
        "rel": r_da, "xla_default_rel": x_da,
        "tol": max(3.0 * x_da, 1e-5)}
    results["pair_pool_vjp_db_f32"] = {
        "rel": r_db, "xla_default_rel": x_db,
        "tol": max(3.0 * x_db, 1e-5)}


def check_attention(results):
    """On-chip fused encoder attention (ops/pallas/attention.py) vs the
    naive MHA math at the production encoder shape (batch 12, 8 heads,
    L=1024 tokens, d_head=32 — models/detr.py MHA), masked, f32 + bf16.
    Same gating pattern as check_trunk: truth is the naive formulation
    at matmul precision 'highest'; each path must track it at least as
    well as the naive path at XLA's default precision does."""
    import math

    from scene_graph_commonsense_tpu.ops.pallas.attention import (
        fused_attention)

    b, h, l, dh = 12, 8, 1024, 32
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    q = jax.random.normal(ks[0], (b, h, l, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, l, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, l, dh), jnp.float32)
    key_valid = jax.random.uniform(ks[3], (b, l)) < 0.8
    key_valid = key_valid.at[:, 0].set(True)
    scale = 1.0 / math.sqrt(dh)

    def naive(q, k, v, m):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        logits = logits + jnp.where(m[:, None, None, :], 0.0,
                                    jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)

    def jrel(got, ref):
        got = got.astype(jnp.float32)
        ref = ref.astype(jnp.float32)
        return (jnp.max(jnp.abs(got - ref))
                / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))

    with jax.default_matmul_precision("highest"):
        truth = jax.jit(naive)(q, k, v, key_valid)
    cmp = jax.jit(lambda g, t: jrel(g, t))

    for dt, floor in ((jnp.float32, 1e-5), (jnp.bfloat16, 0.05)):
        cast = lambda t: t.astype(dt)  # noqa: E731
        got = jax.jit(lambda *t: fused_attention(
            *t[:3], key_valid=t[3], scale=scale, interpret=False))(
            cast(q), cast(k), cast(v), key_valid)
        ref = jax.jit(naive)(cast(q), cast(k), cast(v), key_valid)
        e_fused = float(cmp(got, truth))
        e_xla = float(cmp(ref, truth))
        results[f"attention_{jnp.dtype(dt).name}_vs_f32_truth"] = {
            "rel": e_fused, "xla_default_rel": e_xla,
            "tol": max(3.0 * e_xla, floor),
            "shape": list(np.shape(got))}


def check_ffn(results):
    """On-chip fused FFN+LayerNorm (ops/pallas/ffn.py) vs the flax chain
    at the production encoder shape (12*1024 tokens, 256 -> 2048 -> 256),
    bf16 compute + f32 residual/LN (the post-norm promotion), plus an
    all-f32 leg.  Truth: the same chain at matmul precision 'highest'."""
    from scene_graph_commonsense_tpu.ops.pallas.ffn import fused_ffn_ln

    n, d, f = 12 * 1024, 256, 2048
    ks = jax.random.split(jax.random.PRNGKey(17), 7)
    x = jax.random.normal(ks[0], (n, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, f), jnp.float32) / np.sqrt(d)
    b1 = jax.random.normal(ks[2], (f,), jnp.float32)
    w2 = jax.random.normal(ks[3], (f, d), jnp.float32) / np.sqrt(f)
    b2 = jax.random.normal(ks[4], (d,), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[5], (d,), jnp.float32)
    bt = 0.1 * jax.random.normal(ks[6], (d,), jnp.float32)

    def naive(x, w1, b1, w2, b2, g, bt, cd):
        h = jnp.maximum(x.astype(cd) @ w1.astype(cd) + b1.astype(cd), 0)
        y = h.astype(cd) @ w2.astype(cd) + b2.astype(cd)
        y = x.astype(jnp.float32) + y.astype(jnp.float32)
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return (y - mu) * jax.lax.rsqrt(var + 1e-5) * g + bt

    def jrel(got, ref):
        return (jnp.max(jnp.abs(got - ref))
                / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))

    with jax.default_matmul_precision("highest"):
        truth = jax.jit(functools.partial(naive, cd=jnp.float32))(
            x, w1, b1, w2, b2, g, bt)
    cmp = jax.jit(jrel)
    for cd, floor in ((jnp.float32, 1e-5), (jnp.bfloat16, 0.05)):
        got = jax.jit(functools.partial(
            fused_ffn_ln, compute_dtype=cd, interpret=False))(
            x, w1, b1, w2, b2, g, bt)
        ref = jax.jit(functools.partial(naive, cd=cd))(
            x, w1, b1, w2, b2, g, bt)
        e_fused = float(cmp(got, truth))
        e_xla = float(cmp(ref, truth))
        results[f"ffn_{jnp.dtype(cd).name}_vs_f32_truth"] = {
            "rel": e_fused, "xla_default_rel": e_xla,
            "tol": max(3.0 * e_xla, floor), "shape": [n, d]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "PARITY_TPU.json"))
    args = ap.parse_args()
    enable_compile_cache()

    dev = jax.devices()[0]
    results = {}
    import time
    for name, fn in (("stem", check_stem), ("pair_pool", check_pair_pool),
                     ("attention", check_attention), ("ffn", check_ffn),
                     ("trunk", check_trunk)):
        t0 = time.perf_counter()
        fn(results)
        print(f"[{name}] done in {time.perf_counter() - t0:.1f}s",
              flush=True)

    failures = [k for k, v in results.items() if v["rel"] > v["tol"]]
    record = {
        "what": "on-chip fused-kernel parity vs the XLA formulation "
                "(tools/verify_fused.py)",
        "device": str(dev.device_kind),
        "platform": jax.default_backend(),
        "checks": results,
        "failures": failures,
        "pass": not failures,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: round(v["rel"], 9) for k, v in results.items()}))
    print(f"{'PASS' if not failures else 'FAIL'} -> {args.out}")
    if failures:
        print("failed:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
