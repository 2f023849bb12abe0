"""Trained-checkpoint SGCLS / SGDET / PredCLS(+Top-3) parity ladder.

Closes VERDICT r3 missing #4: CKPT_PARITY previously covered PredCLS only
(12-class fixture) with an empty top3 field; the reference evaluates
trained checkpoints in all three modes (/root/reference/main.py:112-123).
This ladder composes the two r3 harnesses — the reference-trained-mini-
checkpoint rig (tools/checkpoint_parity.py) and the whole-detection-engine
parity rig (tests/test_engine_parity.py) — into one record:

  * 150-class mini-VG fixture (tools/make_mini_vg.py), REAL reference
    training (train_test.py:31-330) on a shared small DETR replica
    (tests/torch_detr.py geometry (2,2,2,2)/2enc/2dec — full-size hub
    conversion is separately proven by tests/test_detr_torch_parity.py);
  * the replica's detection head is CRAFTED for diverse detections
    (scaled query/class/bbox embeddings + a no-object bias): a plain
    random-weight decoder collapses to near-identical per-query outputs
    and would give zero detections-derived recall on every side;
  * after training, the TEST annotations are rewritten detection-anchored
    (GT objects copy the framework's own detections + unmatchable decoys)
    with ORACLE predicates from the trained relation model — recall is
    then nonzero iff each chain reproduces the composed
    detection->remap->NMS->pair->forward->match pipeline, and decoys +
    deliberately-wrong predicates keep it strictly inside (0, 1) (same
    self-consistency design as tests/test_engine_parity.py);
  * BOTH frameworks evaluate the SAME trained checkpoint in pc / sgc /
    sgd through their WHOLE chains — reference evaluate.eval_pc /
    eval_sgc / eval_sgd (evaluate.py:29-227, 230-461, 464-703,
    CPU-patched, float64) vs this framework's full CLI
    (main.py --run_mode eval --eval_mode {pc,sgc,sgd}, compute_dtype
    float64) — and R@k / mR@k / zsR@k / target counts plus the PredCLS
    Top-3 metrics are compared.

Usage:
  python tools/detection_parity.py all [--dir /tmp/det_parity]
  python tools/detection_parity.py {fixture,ref-train,det-fixture,probe,
                                    ref-eval,ours,compare}
      [--mode pc|sgc|sgd|all] [--dir D] [--out CKPT_PARITY.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(ROOT, "tests")
TOOLS = os.path.join(ROOT, "tools")
for p in (ROOT, TESTS, TOOLS):
    if p not in sys.path:
        sys.path.insert(0, p)
REFERENCE = "/root/reference"
ANNOT = os.path.join(REFERENCE, "datasets/vg_scene_graph_annot")

FS = 8                   # feature grid
IMG = 256                # square view (FS * 32)
MAX_OBJ = 8
HID = 128
DET_BLOCKS = (2, 2, 2, 2)
DET_ENC, DET_DEC = 2, 2
DETR_SEED = 7
N_ANCHOR, N_DECOY = 4, 2

# detection-head crafting knobs (see `probe` stage for the census)
Q_SCALE = 8.0            # sharper per-query cross-attention
C_SCALE = 3.0            # separated class logits
NO_OBJ_BIAS = 2.0        # probe-tuned: 2-5 survivors/image, 2-5 classes
                         # (5.0 starved the census: min 0, mean 1.0)
B_SCALE = 5.0            # box-logit spread
B_BIAS = 1.2             # box-logit bias range (uniform +-)


# ---------------------------------------------------------------------------
# Stage: fixture (150-class mini-VG + crafted replica)
# ---------------------------------------------------------------------------

def craft_replica(torch, d: str, create: bool = False):
    """Small-geometry TorchDETR whose detection head yields DIVERSE
    detections (multiple classes/boxes per image, per-class NMS work,
    <= MAX_OBJ-1 survivors).  Shared by both frameworks from disk."""
    from torch_detr import TorchDETR, randomize_bn_stats
    path = os.path.join(d, "detr_replica.pth")
    torch.manual_seed(DETR_SEED)
    inner = TorchDETR(blocks=DET_BLOCKS, n_enc=DET_ENC, n_dec=DET_DEC)
    if create:
        gen = torch.Generator().manual_seed(DETR_SEED)
        randomize_bn_stats(inner, generator=gen)
        with torch.no_grad():
            inner.query_embed.weight.mul_(Q_SCALE)
            inner.class_embed.weight.mul_(C_SCALE)
            inner.class_embed.bias.zero_()
            inner.class_embed.bias[150] = NO_OBJ_BIAS
            inner.bbox_embed.layers[2].weight.mul_(B_SCALE)
            inner.bbox_embed.layers[2].bias.uniform_(-B_BIAS, B_BIAS,
                                                     generator=gen)
        torch.save(inner.state_dict(), path)
    else:
        inner.load_state_dict(torch.load(path))
    return inner.eval()


def make_fixture(d: str, images: int) -> None:
    import torch

    import make_mini_vg
    make_mini_vg.main(["--out", os.path.join(d, "data"),
                       "--images", str(images),
                       "--feature-size", str(FS),
                       "--image-size", str(IMG),
                       "--max-objects", str(MAX_OBJ - 2),
                       "--num-classes", "150", "--seed", "0"])
    craft_replica(torch, d, create=True)
    convert_replica(d)


def convert_replica(d: str) -> None:
    import torch

    import flax.serialization

    from scene_graph_commonsense_tpu.models import weights
    state = {k: v.numpy() for k, v in torch.load(
        os.path.join(d, "detr_replica.pth")).items()}
    params = weights.convert_detr_state_dict(
        state, num_encoder_layers=DET_ENC, num_decoder_layers=DET_DEC,
        blocks=DET_BLOCKS)
    with open(os.path.join(d, "detr_replica.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def _n_test(d: str) -> int:
    with open(os.path.join(d, "data/instances_vg_test.json")) as f:
        return len(json.load(f)["images"])


# ---------------------------------------------------------------------------
# Our in-process stack (det-fixture + probe)
# ---------------------------------------------------------------------------

def _our_cfg(d: str, eval_mode: str):
    from scene_graph_commonsense_tpu.config import derive
    return derive(
        "vg", hierarchical_pred=True, run_mode="eval", eval_mode=eval_mode,
        model={"feature_size": FS, "image_size": IMG, "hidden_dim": HID,
               "compute_dtype": "float64", "fused_backbone": "off",
               "detr_blocks": DET_BLOCKS, "detr_enc_layers": DET_ENC,
               "detr_dec_layers": DET_DEC,
               "detr_pretrained": os.path.join(d, "detr_replica.msgpack")},
        data={"max_objects": MAX_OBJ,
              "image_dir": os.path.join(d, "data/images"),
              "annot_dir": os.path.join(d, "data/annot"),
              "annotation_train": os.path.join(
                  d, "data/instances_vg_train.json"),
              "annotation_test": os.path.join(
                  d, "data/instances_vg_test.json"),
              "artifacts_dir": os.path.join(ROOT, "datasets/artifacts"),
              # fixture images are uniform squares: a canvas equal to the
              # resize output carries NO padding, so our detection view is
              # the exact tensor the reference's NestedTensor builds
              # (bit-parity prerequisite; see config.DataConfig)
              "nonsq_min_side": 600, "nonsq_canvas": 600},
        training={"batch_size": _n_test(d), "faithful_sgd_targets": True,
                  "sgcls_top2_duplicates": True})


def _load_test_batch(cfg):
    """One batch with every test image, in annotation-file order."""
    from scene_graph_commonsense_tpu.data.dataset import (
        VGDataset, batches_from_dataset)
    with open(cfg.data.annotation_test) as f:
        annotations = json.load(f)
    ds = VGDataset(cfg, annotations, training=False)
    batches = list(batches_from_dataset(ds, cfg.training.batch_size,
                                        seed=0, shuffle=False))
    assert len(batches) == 1, (len(batches), cfg.training.batch_size)
    return batches[0], [img["file_name"] for img in annotations["images"]]


def _detection_pass(d: str, cfg):
    """Our DETR replica + postprocess on every test image's nonsq view."""
    import jax

    from scene_graph_commonsense_tpu.eval import engines
    from scene_graph_commonsense_tpu.train.loop import load_detr_featurizer

    featurize, detr, detr_params = load_detr_featurizer(cfg, log_fn=print)
    batch, names = _load_test_batch(cfg)
    detect_fn = engines.make_detr_detect_fn(cfg, detr, detr_params)
    det = jax.tree.map(np.asarray, detect_fn(batch))
    batch = featurize(batch)
    return batch, names, det


def probe(d: str) -> None:
    """Detection census for replica-knob tuning."""
    import jax
    with jax.enable_x64(True):
        cfg = _our_cfg(d, "sgd")
        _, names, det = _detection_pass(d, cfg)
    per_img = det["valid"].sum(1)
    cats = [sorted(set(det["cats"][i, det["valid"][i]].tolist()))
            for i in range(len(names))]
    print(f"survivors/image: min={per_img.min()} max={per_img.max()} "
          f"mean={per_img.mean():.1f}")
    print(f"distinct classes/image: "
          f"{[len(c) for c in cats]}")
    assert per_img.max() < MAX_OBJ, "slot bound saturated — lower "\
        "NO_OBJ activity or raise MAX_OBJ"
    assert per_img.min() >= 2, "an image has <2 detections"


# ---------------------------------------------------------------------------
# Stage: det-fixture (rewrite TEST annotations detection-anchored)
# ---------------------------------------------------------------------------

def _inverse_rel_map():
    """model-space (motif scat) -> raw annotation predicate id.  Raw 12 is
    rewritten to 4 by every loader (wears-merge, reference
    dataloader.py:144-146), so the model id it maps to has no writable
    preimage — returned as -1 and avoided by the GT writer."""
    from scene_graph_commonsense_tpu.constants import rel_index_map
    fwd = rel_index_map("motif")
    inv = np.full(50, -1, np.int64)
    for raw in range(50):
        if raw == 12:
            continue
        if inv[fwd[raw]] < 0:
            inv[fwd[raw]] = raw
    return inv


def _best_branch_rel(row, ng, npos):
    blocks = [(row[:ng], 0), (row[ng:ng + npos], ng),
              (row[ng + npos:], ng + npos)]
    best = max(blocks, key=lambda b: b[0].max())
    return int(best[0].argmax()) + best[1]


def build_det_fixture(d: str) -> None:
    """Runs our detection + the TRAINED relation model once (oracle) and
    rewrites every TEST annotation pkl: GT objects = N_ANCHOR detections
    + N_DECOY unmatchable decoys, ~80% oracle predicates / ~20% wrong,
    decoy edges unmatchable."""
    import jax

    import torch

    from scene_graph_commonsense_tpu.data.artifacts import load_vg_artifacts
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.models.weights import (
        convert_relation_state_dict)
    from scene_graph_commonsense_tpu.train import engine as engine_lib

    with jax.enable_x64(True):
        cfg = _our_cfg(d, "sgd")
        batch, names, det = _detection_pass(d, cfg)
        art = load_vg_artifacts(cfg.data.artifacts_dir)

        # trained reference checkpoint -> our params (DDP prefix strip,
        # reference utils.py:207-214)
        epoch = _epochs(d) - 1
        raw = torch.load(os.path.join(
            d, "ref_ckpt", f"HierRelationModel_Baseline_motif{epoch}_0.pth"))
        raw = {(k[7:] if k.startswith("module.") else k): v.numpy()
               for k, v in raw.items()}
        rel_params = convert_relation_state_dict(
            raw, hierarchical=True, hidden_dim=HID, feature_size=FS)
        model = make_relation_classifier(cfg)

        b = len(names)
        oracle_batch = {
            "features": batch["features"],
            "depth": batch["depth"],
            "cats": det["cats"],
            "boxes": det["boxes"],
            "valid": det["valid"],
            "rel": np.full((b, MAX_OBJ, MAX_OBJ), -1, np.int32),
            "super_mh": art.sub2super[det["cats"]].astype(np.float64),
        }
        estep = engine_lib.make_eval_step(model, cfg)
        out = jax.tree.map(np.asarray, estep(rel_params, oracle_batch))

    ng, npos = cfg.model.num_geometric, cfg.model.num_possessive
    pair_idx = {}
    for p in range(len(out["pair_img"])):
        if out["pair_mask"][p]:
            pair_idx[(int(out["pair_img"][p]), int(out["pair_sub"][p]),
                      int(out["pair_obj"][p]))] = p
    inv = _inverse_rel_map()
    writable = np.nonzero(inv >= 0)[0]
    sup_lists = [list(np.nonzero(row)[0]) if row.any() else [int(c) % 17]
                 for c, row in enumerate(art.sub2super)]

    rng = np.random.default_rng(123)
    census = {"anchors": 0, "oracle_edges": 0, "wrong_edges": 0,
              "decoy_edges": 0}
    for bi, name in enumerate(names):
        slots = np.nonzero(det["valid"][bi])[0]
        anchors = np.sort(rng.choice(slots, min(N_ANCHOR, len(slots)),
                                     replace=False))
        ka = len(anchors)
        n = ka + N_DECOY
        boxes = np.zeros((n, 4), np.float32)
        cats = np.zeros(n, np.int64)
        boxes[:ka] = det["boxes"][bi, anchors]
        cats[:ka] = det["cats"][bi, anchors]
        for k in range(N_DECOY):            # tiny corner boxes: unmatchable
            x0, y0 = rng.integers(0, 2, 2)
            boxes[ka + k] = [x0, x0 + 2, y0, y0 + 2]
            cats[ka + k] = rng.integers(0, 150)

        rel_rows, dir_rows = [], []
        for i in range(1, n):
            row = np.full(i, -1, np.int64)
            direction = np.full(i, -1.0, np.float32)
            for j in range(i):
                if i < ka and j < ka:       # anchor-anchor: oracle GT
                    if rng.random() > 0.85:
                        continue
                    dd = int(rng.integers(0, 2))
                    sub, obj = (anchors[i], anchors[j]) if dd == 1 \
                        else (anchors[j], anchors[i])
                    p = pair_idx.get((bi, int(sub), int(obj)))
                    if p is None or not out["iou_ok"][p]:
                        continue            # failed the overlap filter
                    if rng.random() < 0.8:
                        m = _best_branch_rel(out["relation"][p], ng, npos)
                        raw_id = inv[m]
                        if raw_id < 0:      # unwritable (wears-merge hole)
                            raw_id = int(rng.choice(writable))
                            census["wrong_edges"] += 1
                        else:
                            census["oracle_edges"] += 1
                    else:                   # deliberately-wrong predicate
                        raw_id = int(rng.choice(writable))
                        census["wrong_edges"] += 1
                    row[j] = raw_id
                    direction[j] = float(dd)
                elif i >= ka and rng.random() < 0.5:
                    row[j] = int(rng.choice(writable))
                    direction[j] = float(rng.integers(0, 2))
                    census["decoy_edges"] += 1
            rel_rows.append(row)
            dir_rows.append(direction)
        census["anchors"] += int(ka)

        pkl = os.path.join(d, "data/annot",
                           name.replace(".jpg", "_annotations.pkl"))
        annot = torch.load(pkl)             # keep the original depth map
        annot.update({
            "categories": torch.from_numpy(cats),
            "super_categories": [torch.as_tensor(sup_lists[int(c)])
                                 for c in cats],
            "bbox": torch.from_numpy(boxes),
            "relationships": [torch.from_numpy(r) for r in rel_rows],
            "subj_or_obj": [torch.from_numpy(dr) for dr in dir_rows],
        })
        torch.save(annot, pkl)
    assert census["oracle_edges"] > 0, census
    print(f"[det-fixture] rewrote {len(names)} test annotations: {census}")
    _save(d, "det_fixture_census.json", census)


# ---------------------------------------------------------------------------
# Stage: ref-train / ref-eval
# ---------------------------------------------------------------------------

def _epochs(d: str) -> int:
    with open(os.path.join(d, "meta.json")) as f:
        return json.load(f)["epochs"]


def _reference_args(d: str, run_mode: str, eval_mode: str,
                    batch_size: int, epochs: int) -> dict:
    import yaml
    with open(os.path.join(REFERENCE, "config.yaml")) as f:
        args = yaml.safe_load(f)
    args["dataset"].update({
        "dataset": "vg", "supcat_clustering": "motif",
        "image_dir": os.path.join(d, "data/images"),
        "annot_dir": os.path.join(d, "data/annot"),
        "annotation_train": os.path.join(d, "data/instances_vg_train.json"),
        "annotation_test": os.path.join(d, "data/instances_vg_test.json"),
        "train_triplets": f"{ANNOT}/train_triplets.pt",
        "test_triplets": f"{ANNOT}/test_triplets.pt",
        "zero_shot_triplets": f"{ANNOT}/zero_shot_triplets.pt",
        "sub2super_cat_dict": f"{ANNOT}/sub2super_cat_dict.pt",
    })
    args["models"].update({
        "hierarchical_pred": True, "num_classes": 150,
        "num_super_classes": 17, "num_geometric": 15, "num_possessive": 11,
        "num_semantic": 24, "num_relations": 50,
        "feature_size": FS, "image_size": IMG, "hidden_dim": HID,
        "num_img_feature": 256, "use_depth": True, "llm_model": "gpt3.5",
        "topk_cat": 2, "nms": 0.5,
    })
    args["training"].update({
        "run_mode": run_mode, "eval_mode": eval_mode,
        "continue_train": False, "start_epoch": 0,
        "num_epoch": epochs, "test_epoch": epochs - 1,
        "batch_size": batch_size,
        "result_path": os.path.join(d, "ref_results") + "/",
        "checkpoint_path": os.path.join(d, "ref_ckpt") + "/",
        "print_freq": 10 ** 6, "eval_freq": 10 ** 6,
        "print_freq_test": 1, "eval_freq_test": 1,
        "lambda_contrast": 0.0,     # unnormalized SupCon destabilizes the
                                    # tiny set (same as checkpoint_parity)
        "save_vis_results": False, "verbose": False,
    })
    os.makedirs(args["training"]["result_path"], exist_ok=True)
    os.makedirs(args["training"]["checkpoint_path"], exist_ok=True)
    return args


def _hub_replica(torch, inner):
    """Hub-interface wrapper exposing BOTH the featurize path
    (train_utils.py:9-18) and the REAL detection forward
    (evaluate.py:308-309: detr(nested_tensor_from_tensor_list(...)))."""
    import torch.nn as nn

    from torch_detr import sine_position_embedding

    class HubJoiner(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = inner.backbone[0].body

        def forward(self, ntensor):
            import utils as ref_utils
            feat = self.body(ntensor.tensors)
            mask = torch.nn.functional.interpolate(
                ntensor.mask[:, None].to(ntensor.tensors.dtype),
                size=feat.shape[-2:]).bool()[:, 0]
            pos = sine_position_embedding(~mask, 128) \
                .to(ntensor.tensors.dtype)
            return [ref_utils.NestedTensor(feat, mask)], [pos]

    class HubEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = inner.transformer.encoder.layers

        def forward(self, src, src_key_padding_mask=None, pos=None):
            out = src
            for layer in self.layers:
                out = layer(out, pos, src_key_padding_mask)
            return out

    class HubTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = HubEncoder()

    class HubDETR(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = HubJoiner()
            self.input_proj = inner.input_proj
            self.transformer = HubTransformer()
            self.inner = inner

        def forward(self, ntensor):
            return inner(ntensor.tensors, ~ntensor.mask)

    return HubDETR()


def run_reference_train(d: str, epochs: int, batch_size: int = 4) -> None:
    from checkpoint_parity import _setup_reference_env
    torch = _setup_reference_env()
    torch.manual_seed(0)

    import train_test

    inner = craft_replica(torch, d)
    train_test.build_detr101 = lambda a: _hub_replica(torch, inner)

    args = _reference_args(d, "train", "pc", batch_size, epochs)
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
    _save(d, "meta.json", {"epochs": epochs})
    print(f"[det-parity] reference training took "
          f"{time.monotonic() - t0:.0f}s")


def run_reference_eval(d: str, mode: str) -> dict:
    from checkpoint_parity import _setup_reference_env
    torch = _setup_reference_env()
    torch.manual_seed(0)

    import torchvision

    from test_engine_parity import torch_nms
    torchvision.ops.nms = torch_nms

    import dataloader as ref_dataloader
    import evaluate

    epochs = _epochs(d)
    inner = craft_replica(torch, d)

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        hub = _hub_replica(torch, inner.double())
        evaluate.build_detr101 = lambda a: hub

        n_test = _n_test(d)
        args = _reference_args(d, "eval", mode, n_test, epochs)

        # saver/loader underscore quirk bridge (evaluate.py:66-76 vs
        # train_test.py:313-319)
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
                captured["top3_mean_recall"] = [float(r) for r in
                                                mean_recall]
                return out

        evaluate.Evaluator = CapturingEvaluator
        evaluate.Evaluator_Top3 = CapturingTop3

        test_ds = ref_dataloader.VisualGenomeDataset(
            args, "cpu", args["dataset"]["annotation_test"], training=False)

        fn = {"pc": evaluate.eval_pc, "sgc": evaluate.eval_sgc,
              "sgd": evaluate.eval_sgd}[mode]
        t0 = time.monotonic()
        try:
            fn(0, args, test_ds)
        finally:
            evaluate.Evaluator, evaluate.Evaluator_Top3 = RefEval, RefTop3
            import torch.distributed as dist
            if dist.is_initialized():
                dist.destroy_process_group()
        print(f"[det-parity] reference eval {mode} took "
              f"{time.monotonic() - t0:.0f}s")
        assert captured, "reference eval never reached compute()"
        _save(d, f"reference_{mode}.json", captured)
        return captured
    finally:
        torch.set_default_dtype(prev)


# ---------------------------------------------------------------------------
# Stage: ours (full CLI)
# ---------------------------------------------------------------------------

def run_ours(d: str, mode: str) -> dict:
    n_test = _n_test(d)
    epochs = _epochs(d)
    art = os.path.join(d, "artifacts")
    os.makedirs(art, exist_ok=True)
    shutil.copy(os.path.join(ROOT, "datasets/artifacts/vg_artifacts.npz"),
                os.path.join(art, "vg_artifacts.npz"))
    if not os.path.exists(os.path.join(d, "our_ckpt")):
        _convert_relation_ckpt(d, epochs)
    os.makedirs(os.path.join(d, "our_results"), exist_ok=True)
    faithful = ("  faithful_eval_targets: true\n" if mode == "pc" else
                "  faithful_sgd_targets: true\n"
                "  sgcls_top2_duplicates: true\n")
    cfg = f"""
data:
  image_dir: {d}/data/images
  annot_dir: {d}/data/annot
  annotation_train: {d}/data/instances_vg_train.json
  annotation_test: {d}/data/instances_vg_test.json
  artifacts_dir: {art}
  max_objects: {MAX_OBJ}
  nonsq_min_side: 600
  nonsq_canvas: 600
model:
  image_size: {IMG}
  feature_size: {FS}
  hidden_dim: {HID}
  compute_dtype: float64
  fused_backbone: 'off'
  detr_blocks: [{", ".join(map(str, DET_BLOCKS))}]
  detr_enc_layers: {DET_ENC}
  detr_dec_layers: {DET_DEC}
  detr_pretrained: {d}/detr_replica.msgpack
training:
  batch_size: {n_test}
  test_epoch: {epochs - 1}
  checkpoint_path: {d}/our_ckpt/
  result_path: {d}/our_results/
{faithful}"""
    cfg_path = os.path.join(d, f"ours_{mode}.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.join(d, "jaxcache"))
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "main.py", "--config", cfg_path,
         "--run_mode", "eval", "--eval_mode", mode, "--hierar"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=14400)
    print(f"[det-parity] our eval {mode} took {time.monotonic() - t0:.0f}s")
    if proc.returncode != 0:
        sys.exit(f"our eval {mode} failed:\n{proc.stdout[-3000:]}\n"
                 f"{proc.stderr[-3000:]}")
    assert "Loaded relation checkpoint" in proc.stdout, proc.stdout[-2000:]
    res = None
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            res = json.loads(line)
            break
    assert res is not None, proc.stdout[-2000:]
    _save(d, f"ours_{mode}.json", res)
    return res


def _convert_relation_ckpt(d: str, epochs: int) -> None:
    import torch

    from scene_graph_commonsense_tpu.models.weights import (
        convert_relation_state_dict)
    from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib
    epoch = epochs - 1
    raw = torch.load(os.path.join(
        d, "ref_ckpt", f"HierRelationModel_Baseline_motif{epoch}_0.pth"))
    raw = {(k[7:] if k.startswith("module.") else k): v.numpy()
           for k, v in raw.items()}
    rel = convert_relation_state_dict(
        raw, hierarchical=True, hidden_dim=HID, feature_size=FS)
    out = os.path.join(d, "our_ckpt",
                       ckpt_lib.checkpoint_name(True, "train", "motif",
                                                epoch))
    ckpt_lib.save(out, rel)
    print(f"[det-parity] converted relation checkpoint -> {out}")


# ---------------------------------------------------------------------------
# Stage: compare
# ---------------------------------------------------------------------------

def _save(d: str, name: str, obj) -> None:
    with open(os.path.join(d, name), "w") as f:
        json.dump(obj, f, indent=2)


def _delta(a, b):
    if isinstance(a, float) and isinstance(b, float) \
            and math.isnan(a) and math.isnan(b):
        return 0.0
    return abs(a - b)


def compare(d: str, out_path: str, tol: float = 1e-9) -> dict:
    record = {
        "what": "reference-trained checkpoint evaluated by BOTH whole "
                "frameworks (reference evaluate.eval_pc/sgc/sgd vs our "
                "full CLI) on the same detection-anchored mini-VG test "
                "set with a shared crafted DETR replica, float64 "
                "(tools/detection_parity.py)",
        "config": {"feature_size": FS, "image_size": IMG,
                   "max_objects": MAX_OBJ, "hidden_dim": HID,
                   "num_classes": 150, "detr_blocks": list(DET_BLOCKS),
                   "compute_dtype": "float64"},
        "tolerance": tol,
    }
    keys = ["recall", "mean_recall", "recall_zs", "mean_recall_zs"]
    overall = True
    for mode in ("pc", "sgc", "sgd"):
        rp = os.path.join(d, f"reference_{mode}.json")
        op = os.path.join(d, f"ours_{mode}.json")
        if not (os.path.exists(rp) and os.path.exists(op)):
            record[mode] = {"status": "missing"}
            overall = False
            continue
        with open(rp) as f:
            ref = json.load(f)
        with open(op) as f:
            ours = json.load(f)
        deltas = {k: [_delta(a, b) for a, b in zip(ref[k], ours[k])]
                  for k in keys if k in ref and k in ours}
        max_delta = max((max(v) for v in deltas.values()),
                        default=float("nan"))
        entry = {
            "reference": {k: ref.get(k) for k in keys + ["num_targets"]},
            "ours": {k: ours.get(k) for k in keys + ["num_targets"]},
            "max_delta": max_delta,
            "num_targets_equal": ref.get("num_targets")
            == ours.get("num_targets"),
        }
        if mode == "pc" and "top3_recall" in ref and "top3" in ours:
            t3 = max(_delta(a, b) for ra, oa in
                     (("top3_recall", "recall"),
                      ("top3_mean_recall", "mean_recall"))
                     for a, b in zip(ref[ra], ours["top3"][oa]))
            entry["top3"] = {
                "reference": {"recall": ref["top3_recall"],
                              "mean_recall": ref["top3_mean_recall"]},
                "ours": {k: ours["top3"][k]
                         for k in ("recall", "mean_recall")},
                "max_delta": t3,
            }
            max_delta = max(max_delta, t3)
            entry["max_delta"] = max_delta
        nonzero = sum(ref.get("recall", [0])) > 0
        interior = (ref.get("recall", [1.0]) or [1.0])[-1] < 1.0
        entry["recall_nonzero"] = bool(nonzero)
        entry["recall_interior"] = bool(interior)
        entry["pass"] = bool(max_delta <= tol and entry["num_targets_equal"]
                             and nonzero and interior)
        overall = overall and entry["pass"]
        record[mode] = entry
    record["pass"] = overall
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps({m: record[m].get("pass", record[m])
                      for m in ("pc", "sgc", "sgd")}, indent=1))
    if not overall:
        sys.exit("detection-checkpoint parity FAILED")
    return record


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["all", "fixture", "ref-train",
                                      "det-fixture", "probe", "ref-eval",
                                      "ours", "compare"])
    ap.add_argument("--dir", default="/tmp/det_parity")
    ap.add_argument("--mode", default="all",
                    choices=["pc", "sgc", "sgd", "all"])
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "CKPT_PARITY.json"))
    a = ap.parse_args()
    os.makedirs(a.dir, exist_ok=True)
    # the sandbox sitecustomize pins JAX_PLATFORMS to the TPU tunnel; the
    # config update wins (same pattern as tests/conftest.py) — this ladder
    # is a CPU-f64 parity harness
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    modes = ["pc", "sgc", "sgd"] if a.mode == "all" else [a.mode]
    if a.stage in ("all", "fixture"):
        make_fixture(a.dir, a.images)
    if a.stage == "probe":
        probe(a.dir)
    if a.stage in ("all", "ref-train"):
        run_reference_train(a.dir, a.epochs)
    if a.stage in ("all", "det-fixture"):
        build_det_fixture(a.dir)
    if a.stage in ("all", "ref-eval"):
        for m in modes:
            run_reference_eval(a.dir, m)
    if a.stage in ("all", "ours"):
        for m in modes:
            run_ours(a.dir, m)
    if a.stage in ("all", "compare"):
        compare(a.dir, a.out)


if __name__ == "__main__":
    main()
