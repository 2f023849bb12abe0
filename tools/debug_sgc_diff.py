"""Bisect the trained-checkpoint SGCLS recall gap (ours 0.340 vs
reference 0.245 at R@20 on the det-anchored fixture, same 94 targets).

Stage A: raw DETR outputs — torch hub replica vs our flax conversion on
the same test images (f64 CPU).
Stage B: the reference eval_sgc detection prep (topk expansion,
alp2fre remap, per-class NMS, evaluate.py:543-592) transcribed to numpy
over the REFERENCE raw outputs, vs our postprocess_detections output.
Stage C: label matching (match_object_categories vs
match_predicted_labels_top2) on whichever detections agree.

Usage: python tools/debug_sgc_diff.py [--dir /tmp/det_parity]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/det_parity")
    args = ap.parse_args()
    d = args.dir

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from detection_parity import (_load_test_batch, _our_cfg,
                                  craft_replica, _hub_replica)
    from checkpoint_parity import _setup_reference_env

    # ---- ours: raw DETR forward ----
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
        ours_logits = np.asarray(out["pred_logits"])
        ours_boxes = np.asarray(out["pred_boxes"])

    # ---- reference: torch hub replica forward on the same tensors ----
    torch = _setup_reference_env()
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        import utils as ref_utils
        inner = craft_replica(torch, d)
        hub = _hub_replica(torch, inner.double())
        hub.eval()
        imgs = torch.from_numpy(
            np.asarray(batch["image_nonsq"]).transpose(0, 3, 1, 2)).double()
        with torch.no_grad():
            ref_out = hub(
                ref_utils.nested_tensor_from_tensor_list(list(imgs)))
        ref_logits = ref_out["pred_logits"].numpy()
        ref_boxes = ref_out["pred_boxes"].numpy()
    finally:
        torch.set_default_dtype(prev)

    print("stage A: raw DETR outputs")
    print("  logits shapes", ours_logits.shape, ref_logits.shape)
    dl = np.max(np.abs(ours_logits - ref_logits))
    db = np.max(np.abs(ours_boxes - ref_boxes))
    print(f"  max|dlogits| = {dl:.3e}   max|dboxes| = {db:.3e}")
    # argmax agreement (class decisions)
    am_o = ours_logits.argmax(-1)
    am_r = ref_logits.argmax(-1)
    print(f"  argmax disagreements: {(am_o != am_r).sum()} "
          f"of {am_o.size}")


if __name__ == "__main__":
    main()
