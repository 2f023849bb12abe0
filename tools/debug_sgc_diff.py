"""Bisect the trained-checkpoint SGCLS recall gap (ours 0.340 vs
reference 0.245 at R@20 on the det-anchored fixture, same 94 targets).

Three invocations (separate processes — a heavy flax forward and a heavy
torch forward in one process deadlock on OpenMP futexes):

  python tools/debug_sgc_diff.py ours      # raw DETR outputs -> npz
  python tools/debug_sgc_diff.py ref       # torch hub replica -> npz
  python tools/debug_sgc_diff.py compare   # stage A/B verdicts
"""

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (ROOT, os.path.join(ROOT, "tools"), os.path.join(ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ["JAX_PLATFORMS"] = "cpu"


def run_ours(d):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from detection_parity import _load_test_batch, _our_cfg

    with jax.enable_x64(True):
        cfg = _our_cfg(d, "sgc")
        from scene_graph_commonsense_tpu.train.loop import (
            load_detr_featurizer)
        _, detr, detr_params = load_detr_featurizer(cfg, log_fn=print)
        batch, names = _load_test_batch(cfg)
        import jax.numpy as jnp
        out = detr.apply(detr_params,
                         jnp.asarray(batch["image_nonsq"]),
                         jnp.asarray(batch["pixel_mask"]))
        np.savez(os.path.join(d, "dbg_ours_raw.npz"),
                 logits=np.asarray(out["pred_logits"]),
                 boxes=np.asarray(out["pred_boxes"]),
                 images=np.asarray(batch["image_nonsq"]),
                 pixel_mask=np.asarray(batch["pixel_mask"]))
    print("wrote dbg_ours_raw.npz")


def run_ref(d):
    from detection_parity import craft_replica, _hub_replica
    from checkpoint_parity import _setup_reference_env

    torch = _setup_reference_env()
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        import utils as ref_utils
        with np.load(os.path.join(d, "dbg_ours_raw.npz")) as z:
            images = z["images"]
            pixel_mask = z["pixel_mask"]
        inner = craft_replica(torch, d)
        hub = _hub_replica(torch, inner.double())
        hub.eval()
        imgs = torch.from_numpy(images.transpose(0, 3, 1, 2)).double()
        # share OUR pixel mask (True = valid): NestedTensor's mask is
        # True = padded.  nested_tensor_from_tensor_list would rebuild an
        # all-valid mask from the already-padded square tensors and the
        # two sides would attend differently for reasons that are an
        # artifact of this probe, not of either framework.
        ntensor = ref_utils.NestedTensor(
            imgs, ~torch.from_numpy(pixel_mask))
        with torch.no_grad():
            ref_out = hub(ntensor)
        np.savez(os.path.join(d, "dbg_ref_raw.npz"),
                 logits=ref_out["pred_logits"].numpy(),
                 boxes=ref_out["pred_boxes"].numpy())
    finally:
        torch.set_default_dtype(prev)
    print("wrote dbg_ref_raw.npz")


def compare(d):
    with np.load(os.path.join(d, "dbg_ours_raw.npz")) as z:
        ol, ob = z["logits"], z["boxes"]
    with np.load(os.path.join(d, "dbg_ref_raw.npz")) as z:
        rl, rb = z["logits"], z["boxes"]
    print("stage A: raw DETR outputs", ol.shape, rl.shape)
    print(f"  max|dlogits| = {np.max(np.abs(ol - rl)):.3e}   "
          f"max|dboxes| = {np.max(np.abs(ob - rb)):.3e}")
    am_o, am_r = ol.argmax(-1), rl.argmax(-1)
    print(f"  argmax disagreements: {(am_o != am_r).sum()} of {am_o.size}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["ours", "ref", "compare", "all"])
    ap.add_argument("--dir", default="/tmp/det_parity")
    args = ap.parse_args()
    if args.stage in ("all", "ours"):
        run_ours(args.dir)
    if args.stage in ("all", "ref"):
        run_ref(args.dir)
    if args.stage in ("all", "compare"):
        compare(args.dir)


if __name__ == "__main__":
    main()
