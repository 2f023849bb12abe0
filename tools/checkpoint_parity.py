"""Reference-trained checkpoint -> this framework's eval: R@k equality.

The strongest real-parity proxy this weightless environment permits
(VERDICT r2, item 2): the LIVING reference's training loop
(/root/reference/train_test.py:31-330) is executed on a fabricated mini-VG
(tools/make_mini_vg.py, reference on-disk contract), its trained checkpoint
is converted with models/weights.convert_relation_state_dict, and both
frameworks evaluate PredCLS on the SAME test images with the SAME frozen
DETR replica weights:

  reference:  VisualGenomeDataset -> process_image_features -> mask build
              -> pair loop -> BayesianRelationClassifier -> Evaluator
              (evaluate.py:29-227, CPU-patched like tools/bench_reference)
  ours:       VGDataset -> DETR.encode_features (converted replica weights)
              -> packed pair grid -> RelationClassifier (converted ckpt)
              -> eval.recall.Evaluator, faithful_eval_targets on
              (main.py --run_mode eval --eval_mode pc --hierar)

Each side runs its WHOLE chain — dataset loading, mask building, pair
filtering, forward, evaluator — and the R@20/50/100, mR@k, zsR@k and target
counts are asserted equal (small float tolerance: the image resize kernels
are float-equivalent but not bit-identical, see
reference_shim.install_torchvision_shim).

Usage:
  python tools/checkpoint_parity.py all [--dir /tmp/ckpt_parity]
      [--images 96] [--epochs 2] [--out CKPT_PARITY.json]

Subcommands fixture / ref-train / ref-eval / ours / compare re-run stages
individually against the same --dir.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
TESTS = os.path.join(ROOT, "tests")
if TESTS not in sys.path:
    sys.path.insert(0, TESTS)
REFERENCE = "/root/reference"
ANNOT = os.path.join(REFERENCE, "datasets/vg_scene_graph_annot")

FEATURE_SIZE = 8
IMAGE_SIZE = 256
MAX_OBJECTS = 8
HIDDEN_DIM = 128
DETR_SEED = 7


# ---------------------------------------------------------------------------
# Stage 0: fixture
# ---------------------------------------------------------------------------

def make_fixture(d: str, images: int) -> None:
    from tools import make_mini_vg
    make_mini_vg.main(["--out", os.path.join(d, "data"),
                       "--images", str(images),
                       "--feature-size", str(FEATURE_SIZE),
                       "--image-size", str(IMAGE_SIZE),
                       "--max-objects", str(MAX_OBJECTS),
                       "--num-classes", "12", "--seed", "0"])


def _n_test(d: str) -> int:
    with open(os.path.join(d, "data/instances_vg_test.json")) as f:
        return len(json.load(f)["images"])


# ---------------------------------------------------------------------------
# Reference side (LIVING code, CPU-patched)
# ---------------------------------------------------------------------------

def _reference_args(d: str, run_mode: str, batch_size: int,
                    epochs: int) -> dict:
    import yaml
    with open(os.path.join(REFERENCE, "config.yaml")) as f:
        args = yaml.safe_load(f)
    args["dataset"].update({
        "dataset": "vg",
        "image_dir": os.path.join(d, "data/images"),
        "annot_dir": os.path.join(d, "data/annot"),
        "annotation_train": os.path.join(d,
                                         "data/instances_vg_train.json"),
        "annotation_test": os.path.join(d, "data/instances_vg_test.json"),
        "train_triplets": f"{ANNOT}/train_triplets.pt",
        "test_triplets": f"{ANNOT}/test_triplets.pt",
        "zero_shot_triplets": f"{ANNOT}/zero_shot_triplets.pt",
        "sub2super_cat_dict": f"{ANNOT}/sub2super_cat_dict.pt",
        "supcat_clustering": "motif",
    })
    args["models"].update({
        "hierarchical_pred": True, "num_classes": 150,
        "num_super_classes": 17, "num_geometric": 15, "num_possessive": 11,
        "num_semantic": 24, "num_relations": 50,
        "feature_size": FEATURE_SIZE, "image_size": IMAGE_SIZE,
        "hidden_dim": HIDDEN_DIM, "num_img_feature": 256,
        "use_depth": True, "llm_model": "gpt3.5", "topk_cat": 2,
    })
    args["training"].update({
        "run_mode": run_mode, "eval_mode": "pc",
        "continue_train": False, "start_epoch": 0,
        "num_epoch": epochs, "test_epoch": epochs - 1,
        "batch_size": batch_size,
        "result_path": os.path.join(d, "ref_results") + "/",
        "checkpoint_path": os.path.join(d, "ref_ckpt") + "/",
        # recall bookkeeping only at the final-batch trigger during
        # training; eval accumulates every batch
        "print_freq": 10 ** 6, "eval_freq": 10 ** 6,
        "print_freq_test": 1, "eval_freq_test": 1,
        # mini set: the unnormalized SupCon term destabilizes tiny-batch
        # training (same setting as the dress rehearsal fixture)
        "lambda_contrast": 0.0,
        "save_vis_results": False, "verbose": False,
    })
    os.makedirs(args["training"]["result_path"], exist_ok=True)
    os.makedirs(args["training"]["checkpoint_path"], exist_ok=True)
    return args


def _setup_reference_env():
    """Shims + path + CPU patch; returns the torch module."""
    from reference_shim import install_torchvision_shim
    install_torchvision_shim()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    from tools.bench_reference import _patch_torch_cpu
    _patch_torch_cpu(torch)
    return torch


def _detr_replica(torch, d: str, create: bool = False):
    """One shared TorchDETR replica (hub dims): torch state on disk feeds
    both the reference run (hub wrapper) and our converter."""
    from torch_detr import TorchDETR, randomize_bn_stats
    path = os.path.join(d, "detr_replica.pth")
    torch.manual_seed(DETR_SEED)
    inner = TorchDETR()
    if create:
        gen = torch.Generator().manual_seed(DETR_SEED)
        randomize_bn_stats(inner, generator=gen)
        torch.save(inner.state_dict(), path)
    else:
        inner.load_state_dict(torch.load(path))
    return inner.eval()


def run_reference_train(d: str, epochs: int, batch_size: int = 4) -> None:
    torch = _setup_reference_env()
    torch.manual_seed(0)
    import torch.nn as nn

    import train_test

    from tools.bench_reference import _hub_detr

    inner = _detr_replica(torch, d, create=True)
    train_test.build_detr101 = lambda a: _hub_detr(torch, nn, inner=inner)

    args = _reference_args(d, "train", batch_size, epochs)
    import dataloader as ref_dataloader
    train_ds = ref_dataloader.VisualGenomeDataset(
        args, "cpu", args["dataset"]["annotation_train"], training=True)
    test_ds = ref_dataloader.VisualGenomeDataset(
        args, "cpu", args["dataset"]["annotation_test"], training=False)

    t0 = time.monotonic()
    try:
        train_test.training(0, args, train_ds, test_ds)
    finally:
        import torch.distributed as dist
        if dist.is_initialized():
            dist.destroy_process_group()
    print(f"[ckpt-parity] reference training took "
          f"{time.monotonic() - t0:.0f}s")


def run_reference_eval(d: str, epochs: int) -> dict:
    torch = _setup_reference_env()
    torch.manual_seed(0)
    import torch.nn as nn

    import dataloader as ref_dataloader
    import evaluate

    from tools.bench_reference import _hub_detr

    inner = _detr_replica(torch, d)
    evaluate.build_detr101 = lambda a: _hub_detr(torch, nn, inner=inner)

    n_test = _n_test(d)
    args = _reference_args(d, "eval", n_test, epochs)

    # the reference's eval loader expects an underscore between clustering
    # and epoch that its own saver never writes (evaluate.py:66-76 vs
    # train_test.py:313-319) — bridge the quirk
    epoch = epochs - 1
    ckdir = args["training"]["checkpoint_path"]
    src = os.path.join(ckdir, f"HierRelationModel_Baseline_motif"
                              f"{epoch}_0.pth")
    dst = os.path.join(ckdir, f"HierRelationModel_Baseline_motif_"
                              f"{epoch}_0.pth")
    shutil.copy(src, dst)

    captured = {}
    RefEval, RefTop3 = evaluate.Evaluator, evaluate.Evaluator_Top3

    class CapturingEvaluator(RefEval):
        def compute(self, per_class=False, predcls=True):
            out = super().compute(per_class, predcls)
            recall, _, mean_recall, recall_zs, _, mean_recall_zs = out
            captured.update(
                recall=[float(r) for r in recall],
                mean_recall=[float(r) for r in mean_recall],
                recall_zs=[float(r) for r in recall_zs],
                mean_recall_zs=[float(r) for r in mean_recall_zs],
                num_targets=float(self.num_connected_target))
            return out

    class CapturingTop3(RefTop3):
        def compute(self, per_class=False):
            out = super().compute(per_class)
            recall, _, mean_recall = out
            captured["top3_recall"] = [float(r) for r in recall]
            captured["top3_mean_recall"] = [float(r) for r in mean_recall]
            return out

    evaluate.Evaluator = CapturingEvaluator
    evaluate.Evaluator_Top3 = CapturingTop3

    test_ds = ref_dataloader.VisualGenomeDataset(
        args, "cpu", args["dataset"]["annotation_test"], training=False)

    t0 = time.monotonic()
    try:
        evaluate.eval_pc(0, args, test_ds)
    finally:
        evaluate.Evaluator, evaluate.Evaluator_Top3 = RefEval, RefTop3
        import torch.distributed as dist
        if dist.is_initialized():
            dist.destroy_process_group()
    print(f"[ckpt-parity] reference eval took {time.monotonic() - t0:.0f}s")
    assert captured, "reference eval never reached Evaluator.compute"
    _save(d, "reference.json", captured)
    return captured


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------

def convert_checkpoints(d: str, epochs: int) -> None:
    import torch

    from scene_graph_commonsense_tpu.models import weights
    from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib

    # DETR replica -> msgpack
    state = {k: v.numpy() for k, v in torch.load(
        os.path.join(d, "detr_replica.pth")).items()}
    params = weights.convert_detr_state_dict(state)
    import flax.serialization
    with open(os.path.join(d, "detr_replica.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))

    # trained relation checkpoint -> orbax (DDP prefix stripped,
    # reference utils.py:207-214)
    epoch = epochs - 1
    raw = torch.load(os.path.join(
        d, "ref_ckpt", f"HierRelationModel_Baseline_motif{epoch}_0.pth"))
    raw = {(k[7:] if k.startswith("module.") else k): v.numpy()
           for k, v in raw.items()}
    rel = weights.convert_relation_state_dict(
        raw, hierarchical=True, hidden_dim=HIDDEN_DIM,
        feature_size=FEATURE_SIZE)
    out = os.path.join(d, "our_ckpt",
                       ckpt_lib.checkpoint_name(True, "train", "motif",
                                                epoch))
    ckpt_lib.save(out, rel)
    print(f"[ckpt-parity] converted checkpoints -> {out}")


def run_ours(d: str, epochs: int) -> dict:
    n_test = _n_test(d)
    art = os.path.join(d, "artifacts")
    os.makedirs(art, exist_ok=True)
    shutil.copy(os.path.join(ROOT, "datasets/artifacts/vg_artifacts.npz"),
                os.path.join(art, "vg_artifacts.npz"))
    os.makedirs(os.path.join(d, "our_results"), exist_ok=True)
    cfg = f"""
data:
  image_dir: {d}/data/images
  annot_dir: {d}/data/annot
  annotation_train: {d}/data/instances_vg_train.json
  annotation_test: {d}/data/instances_vg_test.json
  artifacts_dir: {art}
  max_objects: {MAX_OBJECTS}
model:
  image_size: {IMAGE_SIZE}
  feature_size: {FEATURE_SIZE}
  hidden_dim: {HIDDEN_DIM}
  compute_dtype: float32
  detr_pretrained: {d}/detr_replica.msgpack
training:
  batch_size: {n_test}
  test_epoch: {epochs - 1}
  checkpoint_path: {d}/our_ckpt/
  result_path: {d}/our_results/
  faithful_eval_targets: true
"""
    cfg_path = os.path.join(d, "ours.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.join(d, "jaxcache"))
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "main.py", "--config", cfg_path,
         "--run_mode", "eval", "--eval_mode", "pc", "--hierar"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=7200)
    print(f"[ckpt-parity] our eval took {time.monotonic() - t0:.0f}s")
    if proc.returncode != 0:
        sys.exit(f"our eval failed:\n{proc.stdout[-3000:]}\n"
                 f"{proc.stderr[-3000:]}")
    assert "Loaded relation checkpoint" in proc.stdout, proc.stdout[-2000:]
    res = None
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            res = json.loads(line)
            break
    assert res is not None, proc.stdout[-2000:]
    _save(d, "ours.json", res)
    return res


# ---------------------------------------------------------------------------
# Compare
# ---------------------------------------------------------------------------

def _save(d: str, name: str, obj: dict) -> None:
    with open(os.path.join(d, name), "w") as f:
        json.dump(obj, f, indent=2)


def compare(d: str, out_path: str, tol: float = 0.01) -> dict:
    with open(os.path.join(d, "reference.json")) as f:
        ref = json.load(f)
    with open(os.path.join(d, "ours.json")) as f:
        ours = json.load(f)
    keys = ["recall", "mean_recall", "recall_zs", "mean_recall_zs"]

    def _delta(a, b):
        # both-NaN (e.g. mean over an empty zero-shot class set) agrees
        if np.isnan(a) and np.isnan(b):
            return 0.0
        return abs(a - b)

    deltas = {k: [_delta(a, b) for a, b in zip(ref[k], ours[k])]
              for k in keys if k in ref and k in ours}
    max_delta = max((max(v) for v in deltas.values()), default=float("nan"))
    top3 = {}
    if "top3_recall" in ref and "top3" in ours:
        top3 = {"reference": {"recall": ref["top3_recall"],
                              "mean_recall": ref["top3_mean_recall"]},
                "ours": {"recall": ours["top3"]["recall"],
                         "mean_recall": ours["top3"]["mean_recall"]},
                "max_delta": max(
                    _delta(a, b) for ra, oa in
                    (("top3_recall", "recall"),
                     ("top3_mean_recall", "mean_recall"))
                    for a, b in zip(ref[ra], ours["top3"][oa]))}
        max_delta = max(max_delta, top3["max_delta"])
    record = {
        "what": "reference-trained checkpoint evaluated by both frameworks "
                "on the same mini-VG test images with a shared DETR "
                "replica (tools/checkpoint_parity.py)",
        "config": {"feature_size": FEATURE_SIZE, "image_size": IMAGE_SIZE,
                   "max_objects": MAX_OBJECTS, "hidden_dim": HIDDEN_DIM,
                   "faithful_eval_targets": True},
        "reference": {k: ref.get(k) for k in keys + ["num_targets"]},
        "ours": {k: ours.get(k) for k in keys + ["num_targets"]},
        "deltas": deltas,
        "max_delta": max_delta,
        "top3": top3,
        "num_targets_equal": ref.get("num_targets") == ours.get(
            "num_targets"),
        "tolerance": tol,
        "pass": bool(max_delta <= tol
                     and ref.get("num_targets") == ours.get("num_targets")),
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record, indent=2))
    if not record["pass"]:
        sys.exit("checkpoint parity FAILED")
    return record


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["all", "fixture", "ref-train",
                                      "ref-eval", "ours", "compare"])
    ap.add_argument("--dir", default="/tmp/ckpt_parity")
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "CKPT_PARITY.json"))
    a = ap.parse_args()
    os.makedirs(a.dir, exist_ok=True)
    if a.stage in ("all", "fixture"):
        make_fixture(a.dir, a.images)
    if a.stage in ("all", "ref-train"):
        run_reference_train(a.dir, a.epochs)
    if a.stage in ("all", "ref-eval"):
        run_reference_eval(a.dir, a.epochs)
    if a.stage in ("all", "ours"):
        convert_checkpoints(a.dir, a.epochs)
        run_ours(a.dir, a.epochs)
    if a.stage in ("all", "compare"):
        compare(a.dir, a.out)


if __name__ == "__main__":
    main()
