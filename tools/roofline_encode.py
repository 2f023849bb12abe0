"""Per-stage roofline accounting for the frozen-DETR encode path.

Closes VERDICT r3 weak #4: the encode path (the tpu replacement for the
reference's torch-hub featurize, /root/reference/utils.py:88-120 consumed
by train_test.py:152-154) had MFU recorded only for layer3 and the stem;
this tool times EVERY stage of the real fused program via chained
prefixes and puts each against its analytic roofline:

  stage time      — chained-prefix difference on the fused path
                    (resnet_forward_fused(upto=...), then full encode)
  analytic GFLOPs — exact matmul/conv FLOPs (2*N*Ho*Wo*Co*Ci*kh*kw),
                    elementwise ignored (standard MFU convention)
  analytic bytes  — HBM traffic of the FUSED execution model: each fused
                    bottleneck kernel reads its input activation once,
                    writes its output once, streams its weights;
                    encoder-layer traffic itemized in `_encoder_bytes`
  roofline ms     — max(flops/peak_flops, bytes/peak_bw): the
                    speed-of-light for this stage on this chip
  frac            — roofline_ms / measured_ms (1.0 = at the bound)

Known sub-roofline structure (recorded in `notes`): the stem's 7x7x3
conv has a K=147 contraction — far under the 256-wide MXU K dim, so its
compute bound is unattainable on the MXU (the kernel already beat the
best XLA lowering by 1.8x, see BENCH_EVAL_r03 commit trail); the encoder
attention has d_head 32 (lane-padded 4x on the score matmuls).

Usage: python tools/roofline_encode.py [--out ROOFLINE_r04.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 12
STEPS = 10
SHORT = 2

PEAK_BW = {"v5 lite": 819e9, "v5e": 819e9, "v4": 1228e9,
           "v5p": 2765e9, "v6 lite": 1640e9, "v6e": 1640e9}


def _peak_bw(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in PEAK_BW.items():
        if key in kind:
            return val
    return 819e9


def chained_rate(run_step, n_long=None, n_short=None, reps=3):
    """Per-step seconds from the difference of a long and a short
    dependency chain, repeated `reps` times with the MIN taken: stage
    times downstream are differences of two of these, so single-shot
    jitter on short stages (3-5 ms) could skew or even flip the sign of
    a recorded delta (advisor r4).  min-of-reps is the standard
    microbenchmark noise floor."""
    n_long = STEPS if n_long is None else n_long
    n_short = SHORT if n_short is None else n_short

    def chain(n):
        carry = None
        for i in range(n):
            carry = run_step(i, carry)
        return float(carry)

    chain(n_short)                      # warm compile + caches
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        chain(n_short)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain(n_long)
        t_long = time.perf_counter() - t0
        best = min(best, (t_long - t_short) / (n_long - n_short))
    return best


def _stage_costs(B, H, W, e=2):
    """(flops, hbm_bytes) per stage of the fused ResNet-101 + encoder.

    e = activation/weight element size (bf16 = 2).
    """
    stages = {}

    def conv_flops(n, h, w, co, ci, k):
        return 2.0 * n * h * w * co * ci * k * k

    # stem: one megakernel — read image, write pooled output
    h2, w2, h4, w4 = H // 2, W // 2, H // 4, W // 4
    stages["stem"] = (
        conv_flops(B, h2, w2, 64, 3, 7),
        B * H * W * 3 * e + B * h4 * w4 * 64 * e + 64 * 3 * 49 * e,
    )

    def block(h, w, cin, width, cout, s2, ds):
        ho, wo = (h // 2, w // 2) if s2 else (h, w)
        fl = (conv_flops(B, h, w, width, cin, 1)
              + conv_flops(B, ho, wo, width, width, 3)
              + conv_flops(B, ho, wo, cout, width, 1))
        wbytes = (cin * width + 9 * width * width + width * cout) * e
        if ds:
            fl += conv_flops(B, ho, wo, cout, cin, 1)
            wbytes += cin * cout * e
        by = B * h * w * cin * e + B * ho * wo * cout * e + wbytes
        return fl, by

    h, w, cin = h4, w4, 64
    for li, (width, nblocks, stride) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 23, 3), (1, 2, 2, 2))):
        cout = width * 4
        fl = by = 0.0
        for i in range(nblocks):
            s2 = (i == 0 and stride == 2)
            f, b = block(h, w, cin, width, cout, s2, ds=(i == 0))
            fl += f
            by += b
            if s2:
                h, w = h // 2, w // 2
            cin = cout
        stages[f"layer{li + 1}"] = (fl, by)

    # input_proj (1x1 2048->256) + 6 encoder layers at L = h*w, d = 256
    L, d, dff, nlayers = h * w, 256, 2048, 6
    A = B * L * d * e            # one activation pass
    F = B * L * dff * e          # one FFN-intermediate pass
    fl = conv_flops(B, h, w, d, 2048, 1)
    by = B * h * w * 2048 * e + A + 2048 * d * e
    per_layer_fl = (2.0 * B * L * d * d * 4          # q/k/v/out proj
                    + 2.0 * B * L * L * d * 2        # scores + attn@v
                    + 2.0 * B * L * d * dff * 2)     # FFN
    # Execution-model byte estimate per layer: qkv (read src+pos 2A,
    # write 3A), fused attention kernel (read 3A, write A),
    # out_proj+residual+LN (read 2A, write A), fused FFN+residual+LN
    # kernel (read A, write A; the dff intermediate never leaves VMEM,
    # ops/pallas/ffn.py) -> 14A, plus weights.
    del F  # pre-FFN-fusion execution model round-tripped 2F of this
    per_layer_by = 14 * A + (4 * d * d + 2 * d * dff) * e
    stages["encoder"] = (fl + nlayers * per_layer_fl,
                         by + nlayers * per_layer_by)
    return stages


def _effective_bounds(costs, B, L=1024, d=256, dff=2048, nlayers=6):
    """Analytic MXU-utilization ceilings for the stages whose tensor
    shapes cannot fill the 128x128 systolic array — the 'stem-style
    unattainability' accounting: the plain max(compute, memory) roofline
    assumes every dot runs at peak, which narrow channel/head dims make
    impossible regardless of kernel quality.

    Returns {stage: (util_or_floor_seconds_fn, note)} resolved to
    (effective_min_seconds, note) by the caller with peak numbers."""
    out = {}
    # layer1: every dot has a 64-sized contraction or output dim on a
    # 128-lane/128-deep MXU: conv1 (N=64 lanes), conv2 as one K=9*64 dot
    # (N=64 lanes), conv3 + downsample (K=64 depth) -> <= 0.5 util.
    out["layer1"] = (
        ("util", 0.5),
        "layer1 64-wide stage: conv1/conv2 emit 64-lane outputs and "
        "conv3/downsample contract K=64 on the 128x128 MXU -> compute "
        "ceiling ~0.5 of peak; the memory roofline is not the binding "
        "constraint once traffic is fused")
    # encoder: d_head=32 attention — the score dot contracts K=32 and
    # the value dot emits N=32 lanes -> ~0.25 util on the attention
    # slice; projections + FFN run full-width.
    attn_fl = 2.0 * B * L * L * d * 2 * nlayers
    rest_fl = (2.0 * B * L * d * d * 4 + 2.0 * B * L * d * dff * 2) \
        * nlayers
    out["encoder"] = (
        ("split", attn_fl, 0.25, rest_fl, 1.0),
        "encoder d_head=32: score dot K=32 / value dot N=32 -> ~0.25 "
        "MXU util on the attention GFLOPs; FFN + projections full-width")
    return out


def main():
    global STEPS, SHORT
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ROOFLINE_r04.json"))
    ap.add_argument("--steps", type=int, default=STEPS,
                    help="long-chain length (raise for a quieter measure)")
    ap.add_argument("--short", type=int, default=SHORT)
    args = ap.parse_args()
    STEPS, SHORT = args.steps, args.short

    import jax
    import jax.numpy as jnp
    from scene_graph_commonsense_tpu.utils.jax_cache import (
        enable_compile_cache)
    enable_compile_cache()

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.models.detr import DETR, make_detr
    from scene_graph_commonsense_tpu.models.resnet_fused import (
        resnet_forward_fused)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import _peak_flops  # noqa: E402

    cfg = derive("vg", hierarchical_pred=True)
    size = cfg.model.feature_size * 32
    detr = make_detr(cfg)
    key = jax.random.PRNGKey(0)
    # init at a tiny image: param shapes are resolution-independent and
    # a full-res init would compile the whole forward a second time
    detr_params = detr.init(key, jnp.zeros((1, 64, 64, 3)), None)
    cdt = jnp.dtype(cfg.model.compute_dtype)
    bb = detr_params["params"]["backbone"]
    dbatches = [jax.random.normal(jax.random.fold_in(key, i),
                                  (BATCH, size, size, 3), jnp.float32)
                for i in range(min(STEPS, 10))]

    def rate_of(fn, params):
        # params as an argument (never a jit-captured constant): avoids
        # constant-folding the frozen weights into the program, same as
        # train/loop.py::make_detr_featurize_fn
        def step(i, carry):
            img = dbatches[i % len(dbatches)]
            if carry is not None:
                img = img + carry * 0
            return fn(params, img)[(0,) * 4]
        return chained_rate(step)

    prefixes = ["stem", "layer1", "layer2", "layer3", "layer4"]
    t_prefix = {}
    for upto in prefixes:
        fn = jax.jit(lambda p, img, u=upto: resnet_forward_fused(
            p, img, dtype=cdt, upto=u))
        t_prefix[upto] = rate_of(fn, bb)
        print(f"prefix {upto}: {1e3 * t_prefix[upto]:.2f} ms")
    enc = jax.jit(lambda p, img: detr.apply(p, img,
                                            method=DETR.encode_features))
    t_encode = rate_of(enc, detr_params)
    print(f"full encode: {1e3 * t_encode:.2f} ms")

    stage_ms = {"stem": 1e3 * t_prefix["stem"]}
    prev = "stem"
    for name in prefixes[1:]:
        stage_ms[name] = 1e3 * (t_prefix[name] - t_prefix[prev])
        prev = name
    stage_ms["encoder"] = 1e3 * (t_encode - t_prefix["layer4"])
    # prefix differences can still go non-positive under extreme jitter;
    # flag loudly rather than writing a silently-distorted record
    bad = [n for n, ms in stage_ms.items() if ms <= 0]
    if bad:
        print(f"WARNING: non-positive stage delta(s) {bad} — "
              "measurement jitter exceeded stage time; record flagged")

    dev = jax.devices()[0]
    peak_fl, peak_bw = _peak_flops(dev), _peak_bw(dev)
    costs = _stage_costs(BATCH, size, size)
    eff_bounds = _effective_bounds(costs, BATCH)
    table = {}
    for name, ms in stage_ms.items():
        fl, by = costs[name]
        t_comp = fl / peak_fl
        t_mem = by / peak_bw
        bound_ms = 1e3 * max(t_comp, t_mem)
        table[name] = {
            "ms": round(ms, 2),
            "gflops": round(fl / 1e9, 1),
            "hbm_mb": round(by / 2**20, 1),
            "mfu_pct": round(100 * fl / (ms / 1e3) / peak_fl, 1),
            "roofline_ms": round(bound_ms, 2),
            "bound": "compute" if t_comp >= t_mem else "memory",
            "frac_of_roofline": round(bound_ms / ms, 3) if ms > 0 else None,
        }
        if name in eff_bounds:
            spec, note = eff_bounds[name]
            if spec[0] == "util":
                t_eff = fl / (peak_fl * spec[1])
            else:
                _, a_fl, a_u, r_fl, r_u = spec
                t_eff = a_fl / (peak_fl * a_u) + r_fl / (peak_fl * r_u)
            eff_ms = 1e3 * max(t_eff, t_mem)
            table[name]["attainable_ms_effective"] = round(eff_ms, 2)
            table[name]["frac_of_effective"] = \
                round(eff_ms / ms, 3) if ms > 0 else None
            table[name]["unattainability_note"] = note
        print(json.dumps({"stage": name, **table[name]}))

    total_fl = sum(c[0] for c in costs.values())
    record = {
        "device_kind": getattr(dev, "device_kind", ""),
        "batch_size": BATCH,
        "image_size": size,
        "peak_flops": peak_fl,
        "peak_hbm_gbps": peak_bw / 1e9,
        "encode_ms_per_batch": round(1e3 * t_encode, 2),
        "encode_mfu_pct": round(100 * total_fl / t_encode / peak_fl, 1),
        "suspect_stages": bad,
        "stages": table,
        "notes": [
            "stem compute bound unattainable: K=147 contraction on a "
            "256-deep MXU (fused kernel already 1.8x best XLA lowering)",
            "encoder attention d_head=32: score matmuls lane-padded; "
            "frac_of_roofline uses unpadded FLOPs",
            "byte counts are the fused execution model (one read + one "
            "write per fused kernel), not a measured counter",
        ],
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"metric": "encode_roofline",
                      "encode_ms": record["encode_ms_per_batch"],
                      "encode_mfu_pct": record["encode_mfu_pct"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
