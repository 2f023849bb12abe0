"""Whole-engine detection-eval parity at PRODUCTION geometry.

Closes VERDICT r3 missing #1: every engine-level living-reference
comparison previously ran at feature_size 8 / image 256^2; production is
feature_size 32 / image 1024^2 / max_objects 20
(/root/reference/config.yaml:28-29, dataloader.py:119).  This recorder
re-runs the EXACT `tests/test_engine_parity.py` harness — living
evaluate.eval_sgd / eval_sgc vs eval.engines.run_eval_sgd / run_eval_sgc
on a shared twin + oracle-derived GT — at the real dims, so the
x feature_size box scaling (evaluate.py:326-332), the 32-grid mask-IoU
quantization (evaluate.py:111-116), NMS on the 32 grid
(evaluate.py:348-365), and the dense pairs-per-image regime (synth GROUP
raised so detections approach the 20-slot bound) all flow end-to-end.

Hours-scale on this 1-core host; one mode per invocation, resumable:

  python tools/engine_parity_fulldims.py sgd
  python tools/engine_parity_fulldims.py sgc
  python tools/engine_parity_fulldims.py all [--fs 32] [--batch 4]
      [--group 8] [--anchors 10] [--decoys 4]
      [--out ENGINE_PARITY_FULLDIMS.json]

Each mode merges its record (metrics both sides, equality verdict, wall
time, detection/pair census) into --out, keyed by mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["sgd", "sgc", "all"])
    ap.add_argument("--fs", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    # group 6 -> 18-19 detections/image: the dense regime right under the
    # 20-slot bound (group >= 7 saturates it and trips the census assert)
    ap.add_argument("--group", type=int, default=6)
    ap.add_argument("--anchors", type=int, default=10)
    ap.add_argument("--decoys", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ENGINE_PARITY_FULLDIMS.json"))
    args = ap.parse_args(argv)

    # Geometry knobs must be in the environment BEFORE the test module is
    # imported (it reads them at module scope).
    os.environ["ENGINE_PARITY_FS"] = str(args.fs)
    os.environ["ENGINE_PARITY_BATCH"] = str(args.batch)
    os.environ["ENGINE_PARITY_SYNTH_GROUP"] = str(args.group)
    os.environ["ENGINE_PARITY_ANCHORS"] = str(args.anchors)
    os.environ["ENGINE_PARITY_DECOYS"] = str(args.decoys)
    # Same harness platform as tests/conftest.py: CPU (the reference side
    # is torch-CPU f64; keeping JAX on CPU makes the twin forward f64-exact)
    # with the persistent compile cache.
    os.environ["JAX_PLATFORMS"] = "cpu"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests = os.path.join(root, "tests")
    for p in (root, tests):
        if p not in sys.path:
            sys.path.insert(0, p)

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np
    import test_engine_parity as tep

    modes = ["sgd", "sgc"] if args.mode == "all" else [args.mode]
    for mode in modes:
        rng = np.random.default_rng(0)          # == the pytest rng fixture
        t0 = time.time()
        ours, ref = tep.run_parity(mode, rng)
        seconds = time.time() - t0
        try:
            tep.assert_parity(ours, ref)
            verdict, error = "equal", None
        except AssertionError as e:             # record the divergence too
            verdict, error = "DIVERGED", str(e)

        record = {
            "feature_size": args.fs, "image_size": args.fs * 32,
            "batch": args.batch, "max_objects": tep.MAX_DET,
            "synth_group": args.group, "anchors": args.anchors,
            "decoys": args.decoys, "hidden_dim": 128,
            "ours": ours, "reference": ref,
            "verdict": verdict, "error": error,
            "wall_seconds": round(seconds, 1),
        }
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        merged[mode] = record
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"[{mode}] {verdict} in {seconds:.0f}s -> {args.out}",
              flush=True)
        if verdict != "equal":
            print(f"[{mode}] ours={ours}\n[{mode}] ref={ref}", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
