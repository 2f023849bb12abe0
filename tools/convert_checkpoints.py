"""Converts reference torch checkpoints into this framework's formats.

  # DETR-101 detector (VG- or OIv6-pretrained)
  python tools/convert_checkpoints.py --kind detr \
      --src checkpoints/detr101_vg_ckpt.pth \
      --out checkpoints/detr101_vg.msgpack \
      --remap datasets/vg_scene_graph_annot

  # relation classifier (Hier/Flat RelationModel *.pth)
  python tools/convert_checkpoints.py --kind relation --hierar \
      --src checkpoints/HierRelationModel_Baseline_motif2_0.pth \
      --out checkpoints/hier_relation_motif
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scene_graph_commonsense_tpu.models import weights  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=["detr", "relation"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--remap", default=None,
                    help="dir with detr101_key_{before,after}.txt")
    ap.add_argument("--hierar", action="store_true")
    ap.add_argument("--dataset", default="vg", choices=["vg", "oiv6"])
    args = ap.parse_args()

    state = weights.load_torch_checkpoint(args.src)
    if args.kind == "detr":
        if args.remap:
            state = weights.apply_key_remap(
                state,
                os.path.join(args.remap, "detr101_key_before.txt"),
                os.path.join(args.remap, "detr101_key_after.txt"))
        params = weights.convert_detr_state_dict(state)
        import flax.serialization
        with open(args.out, "wb") as f:
            f.write(flax.serialization.to_bytes(params))
        print(f"wrote {args.out}")
    else:
        params = weights.convert_relation_state_dict(
            state, hierarchical=args.hierar,
            use_super=(args.dataset == "vg"),
            num_classes=150 if args.dataset == "vg" else 601)
        from scene_graph_commonsense_tpu.train import checkpoint as ckpt
        ckpt.save(args.out, params)
        print(f"wrote orbax checkpoint {args.out}")


if __name__ == "__main__":
    main()
