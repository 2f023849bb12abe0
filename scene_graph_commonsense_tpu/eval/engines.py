"""Evaluation engines: PredCLS / SGCLS / SGDET.

Mirrors reference evaluate.py's three modes:
  * eval_pc  (reference evaluate.py:29-227): GT boxes + GT labels;
  * eval_sgc (reference evaluate.py:464-703): GT boxes + predicted labels
    matched per GT box by best IoU;
  * eval_sgd (reference evaluate.py:230-461): fully predicted boxes/labels
    through the static detection postprocess.

Each engine consumes an iterator of host batches (see train.engine for the
batch contract), runs the jitted eval step, converts outputs to flat
Candidates/Targets and streams them into the vectorized evaluators.

Batches may carry precomputed detector features ('features'); when a DETR
model+params pair is supplied, features (and detections for SGDET) are
computed on the fly from 'image' / 'image_nonsq' entries.

Documented deviation: the reference's SGCLS label matcher duplicates a GT
box when the two best-IoU predicted slots tie (the top-2 class candidates of
one predicted box, reference utils.py:404-415); this implementation
conditions each GT box on the single best-IoU predicted slot's class.
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from scene_graph_commonsense_tpu.constants import OBJ_ALP2FRE
from scene_graph_commonsense_tpu.eval.builders import (
    build_candidates, build_candidates_top3, build_targets,
    eval_column_keep, sgd_target_keep)
from scene_graph_commonsense_tpu.eval.recall import (
    Evaluator, EvaluatorTop3, np_mask_iou)
from scene_graph_commonsense_tpu.ops.detection import postprocess_detections
from scene_graph_commonsense_tpu.train import engine as engine_lib


def _np(tree):
    return jax.tree.map(np.asarray, tree)


_MODEL_KEYS = ("features", "features_aug", "depth", "cats", "super_mh",
               "boxes", "rel", "valid")


def _model_batch(batch):
    """Keeps only the jit-consumable arrays (drops annot paths, raw images,
    pixel masks)."""
    return {k: batch[k] for k in _MODEL_KEYS if batch.get(k) is not None}


def check_pair_overflow(out, warned: list, log_fn=None) -> bool:
    """Warns ONCE per run when the packed pair buffer truncated (silent
    pair-dropping changes recall; see pack_pairs / make_eval_step docs).
    `warned` is a single-element mutable flag owned by the calling run."""
    count = np.asarray(out.get("pair_count", 0))
    cap = np.asarray(out.get("pair_capacity", np.iinfo(np.int32).max))
    over = bool((count > cap).any())
    if over and not warned[0]:
        warned[0] = True
        msg = (f"pair buffer overflow: {int(count.max())} live pairs > "
               f"capacity {int(cap.min())} per shard — excess pairs are "
               f"DROPPED and recall may shift; raise "
               f"training.pair_capacity")
        (log_fn or (lambda m: warnings.warn(m, RuntimeWarning,
                                            stacklevel=2)))(msg)
    return over


def _accumulate_batch(evaluator, ev3, cfg, out, batch, artifacts,
                      use_cs: bool, predcls: bool, cats, boxes,
                      cat_conf=None, target_keep=None):
    m = cfg.model
    cs_a = cs_v = None
    if use_cs and artifacts is not None:
        cs_a, cs_v = artifacts.cs_aligned, artifacts.cs_violated
    cand = build_candidates(
        out["relation"], out["connectivity"], out["super_relation"],
        out["pair_img"], out["pair_sub"], out["pair_obj"],
        out["pair_mask"], out["iou_ok"], cats, boxes,
        hierarchical=m.hierarchical_pred, num_geometric=m.num_geometric,
        num_possessive=m.num_possessive, predcls=predcls,
        cat_conf=cat_conf, cs_aligned=cs_a, cs_violated=cs_v,
        num_obj_classes=m.num_classes)
    keep = target_keep
    if cfg.training.faithful_eval_targets:
        # deviation 4: drop targets of pair columns whose overlap filter
        # failed for every image in this batch (eval/builders docstring)
        col = eval_column_keep(np.asarray(batch["boxes"]),
                               np.asarray(batch["valid"]),
                               cfg.model.feature_size)
        keep = col if keep is None else (keep & col)
    tgt = build_targets(np.asarray(batch["rel"]), np.asarray(batch["cats"]),
                        np.asarray(batch["boxes"]),
                        np.asarray(batch["valid"]), keep=keep)
    evaluator.accumulate(cand, tgt)
    if cfg.data.dataset == "oiv6":
        evaluator.accumulate_precision(cand, tgt)
    if ev3 is not None:
        cand3 = build_candidates_top3(
            out["relation"], out["connectivity"], out["super_relation"],
            out["pair_img"], out["pair_sub"], out["pair_obj"],
            out["pair_mask"], out["iou_ok"], cats, boxes,
            num_geometric=m.num_geometric, num_possessive=m.num_possessive)
        ev3.accumulate(cand3, tgt)
    return cand, tgt


def _make_evaluators(cfg, artifacts, predcls: bool):
    from scene_graph_commonsense_tpu.constants import OIV6_WMAP_WEIGHT
    zs = artifacts.zs_table if (artifacts is not None
                                and cfg.data.dataset == "vg") else None
    ev = Evaluator(num_classes=cfg.model.num_relations,
                   feature_size=cfg.model.feature_size, predcls=predcls,
                   zs_table=zs, num_obj_classes=cfg.model.num_classes,
                   oiv6_weights=OIV6_WMAP_WEIGHT
                   if cfg.data.dataset == "oiv6" else None)
    ev3 = None
    if cfg.model.hierarchical_pred and cfg.data.dataset == "vg":
        ev3 = EvaluatorTop3(num_classes=cfg.model.num_relations,
                            feature_size=cfg.model.feature_size,
                            num_geometric=cfg.model.num_geometric,
                            num_possessive=cfg.model.num_possessive)
    return ev, ev3


def _results(cfg, ev, ev3) -> Dict:
    res = ev.compute()
    if ev3 is not None:
        res["top3"] = ev3.compute()
    if cfg.data.dataset == "oiv6":
        res["wmap_rel"], res["wmap_phrase"] = ev.compute_precision()
    return res


def run_eval_pc(cfg, model, params, batches: Iterable[Dict],
                artifacts=None, use_cs: bool = False,
                max_batches: Optional[int] = None,
                on_batch: Optional[Callable] = None, estep=None,
                mesh=None) -> Dict:
    """PredCLS: GT boxes + labels, overlap-filtered pair grid.  Pass a
    prebuilt `estep` to reuse its jit cache across calls (the per-epoch
    test pass does — a fresh jit wrapper re-traces and recompiles the
    whole pair-grid forward every epoch otherwise).  With a mesh the step
    shards batches over the 'data' axis (the reference's per-GPU eval
    processes, main.py:112-123)."""
    ev, ev3 = _make_evaluators(cfg, artifacts, predcls=True)
    if estep is None:
        estep = engine_lib.make_eval_step(model, cfg, mesh=mesh)
    warned = [False]
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        out = _np(estep(params, _model_batch(batch)))
        check_pair_overflow(out, warned)
        cand, tgt = _accumulate_batch(
            ev, ev3, cfg, out, batch, artifacts, use_cs, predcls=True,
            cats=np.asarray(batch["cats"]), boxes=np.asarray(batch["boxes"]))
        if on_batch is not None:
            on_batch(i, out, cand, tgt)
    return _results(cfg, ev, ev3)


def match_predicted_labels(det: Dict[str, np.ndarray],
                           gt_boxes: np.ndarray, gt_valid: np.ndarray,
                           feature_size: int = 32):
    """SGCLS label matching: each GT box takes the class/confidence of the
    best-IoU predicted slot, confidence scaled by that IoU (reference
    utils.py:376-422)."""
    b, n = gt_valid.shape
    cats = np.zeros((b, n), np.int32)
    conf = np.zeros((b, n), np.float32)
    pb, pc, pv = (np.asarray(det["boxes"]), np.asarray(det["cats"]),
                  np.asarray(det["valid"]))
    pconf = np.asarray(det["cat_conf"])
    for bi in range(b):
        if not pv[bi].any():
            continue
        ious = np_mask_iou(gt_boxes[bi][:, None], pb[bi][None],
                           feature_size)
        ious = np.where(pv[bi][None, :], ious, -1.0)
        best = ious.argmax(axis=1)
        cats[bi] = pc[bi][best]
        conf[bi] = pconf[bi][best] * np.maximum(ious[np.arange(n), best], 0)
    cats[~gt_valid] = 0
    conf[~gt_valid] = 0
    return cats, conf


def match_predicted_labels_top2(det: Dict[str, np.ndarray],
                                gt_boxes: np.ndarray, gt_valid: np.ndarray,
                                feature_size: int = 32):
    """Reference-faithful SGCLS matching incl. the top-2 tie duplication
    (reference utils.py:376-422): each GT box takes the best-IoU predicted
    slot's class with confidence pred_conf * best_iou; when the two best
    IoUs tie EXACTLY (the same detection box repeated for its two class
    candidates, reference evaluate.py:313-315), the GT box is duplicated
    with both candidates.  Returns slot-expanded (cats, conf, boxes, valid)
    of width 2N (slots 2k / 2k+1 belong to GT box k; the reference inserts
    the duplicate adjacently, which is order-equivalent for the
    confidence-ranked evaluator).  An image with fewer than two predicted
    slots is dropped entirely (reference utils.py:393-394 returns None and
    eval_sgc skips the batch)."""
    b, n = gt_valid.shape
    cats = np.zeros((b, 2 * n), np.int32)
    conf = np.zeros((b, 2 * n), np.float32)
    boxes = np.zeros((b, 2 * n, 4), np.float32)
    valid = np.zeros((b, 2 * n), bool)
    pb, pc, pv = (np.asarray(det["boxes"]), np.asarray(det["cats"]),
                  np.asarray(det["valid"]))
    pconf = np.asarray(det["cat_conf"])
    for bi in range(b):
        if pv[bi].sum() < 2:
            continue
        ious = np_mask_iou(gt_boxes[bi][:, None], pb[bi][None],
                           feature_size)
        ious = np.where(pv[bi][None, :], ious, -1.0)
        order = np.argsort(-ious, axis=1, kind="stable")
        top1, top2 = order[:, 0], order[:, 1]
        iou1 = ious[np.arange(n), top1]
        iou2 = ious[np.arange(n), top2]
        for k in range(n):
            if not gt_valid[bi, k]:
                continue
            boxes[bi, 2 * k] = gt_boxes[bi, k]
            valid[bi, 2 * k] = True
            cats[bi, 2 * k] = pc[bi][top1[k]]
            conf[bi, 2 * k] = pconf[bi][top1[k]] * max(iou1[k], 0)
            if iou1[k] == iou2[k]:
                boxes[bi, 2 * k + 1] = gt_boxes[bi, k]
                valid[bi, 2 * k + 1] = True
                cats[bi, 2 * k + 1] = pc[bi][top2[k]]
                conf[bi, 2 * k + 1] = pconf[bi][top2[k]] * max(iou2[k], 0)
    return cats, conf, boxes, valid


def run_eval_sgc(cfg, model, params, batches: Iterable[Dict],
                 detect_fn: Callable[[Dict], Dict],
                 artifacts=None, use_cs: bool = False,
                 max_batches: Optional[int] = None, mesh=None) -> Dict:
    """SGCLS: GT boxes, predicted labels.  detect_fn(batch) must return the
    detection dict of ops.detection.postprocess_detections."""
    ev, ev3 = _make_evaluators(cfg, artifacts, predcls=False)
    ev3 = None   # Top-3 is a PredCLS-only report in the reference
    cap = 0
    if cfg.training.sgcls_top2_duplicates:
        # slot-expanded 2N grid needs its own worst-case capacity
        n2 = 2 * cfg.data.max_objects
        cap = cfg.training.batch_size * n2 * (n2 - 1)
    estep = engine_lib.make_eval_step(model, cfg, capacity=cap, mesh=mesh)
    sub2super = artifacts.sub2super if artifacts is not None else None
    warned = [False]
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        det = _np(detect_fn(batch))
        gt_boxes = np.asarray(batch["boxes"])
        gt_valid = np.asarray(batch["valid"])
        if cfg.training.sgcls_top2_duplicates:
            # faithful slot-expanded grid (2N slots, GT boxes duplicated
            # on exact top-2 IoU ties)
            cats, conf, boxes, valid = match_predicted_labels_top2(
                det, gt_boxes, gt_valid, cfg.model.feature_size)
            run_batch = _model_batch(batch)
            run_batch["cats"] = cats
            run_batch["boxes"] = boxes
            run_batch["valid"] = valid
            n2 = cats.shape[1]
            run_batch["rel"] = np.full(
                (cats.shape[0], n2, n2), -1, np.int32)
        else:
            cats, conf = match_predicted_labels(
                det, gt_boxes, gt_valid, cfg.model.feature_size)
            boxes = gt_boxes
            run_batch = _model_batch(batch)
            run_batch["cats"] = cats
        if sub2super is not None:
            run_batch["super_mh"] = sub2super[cats].astype(np.float32)
        out = _np(estep(params, run_batch))
        check_pair_overflow(out, warned)
        # targets keep GT cats; candidates use matched predicted cats.
        # The reference adds the RAW class confidences (softmax prob x IoU)
        # to the log-space relation confidence (reference
        # evaluator.py:164-166, utils.py:410-418) — replicated as-is.
        # The reference's SGCLS targets ALSO come from match_target_sgd
        # (reference evaluate.py:597), so the faithful last-object-row
        # drop applies here exactly as in run_eval_sgd.
        tk = (sgd_target_keep(np.asarray(batch["valid"]))
              if cfg.training.faithful_sgd_targets else None)
        _accumulate_batch(ev, None, cfg, out, batch,
                          artifacts, use_cs, predcls=False,
                          cats=cats, boxes=boxes,
                          cat_conf=conf, target_keep=tk)
    return _results(cfg, ev, ev3)


def run_eval_sgd(cfg, model, params, batches: Iterable[Dict],
                 detect_fn: Callable[[Dict], Dict],
                 artifacts=None, use_cs: bool = False,
                 max_batches: Optional[int] = None, mesh=None) -> Dict:
    """SGDET: predicted boxes + labels drive the pair grid; GT pairs are the
    unmatched target set (reference utils.py:294-352)."""
    ev, ev3 = _make_evaluators(cfg, artifacts, predcls=False)
    ev3 = None   # Top-3 is a PredCLS-only report in the reference
    estep = engine_lib.make_eval_step(model, cfg, mesh=mesh)
    sub2super = artifacts.sub2super if artifacts is not None else None
    warned = [False]
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        det = _np(detect_fn(batch))
        run_batch = _model_batch(batch)
        run_batch["cats"] = det["cats"]
        run_batch["boxes"] = det["boxes"]
        run_batch["valid"] = det["valid"]
        if sub2super is not None:
            run_batch["super_mh"] = sub2super[det["cats"]].astype(np.float32)
        out = _np(estep(params, run_batch))
        check_pair_overflow(out, warned)
        m = cfg.model
        cs_a = cs_v = None
        if use_cs and artifacts is not None:
            cs_a, cs_v = artifacts.cs_aligned, artifacts.cs_violated
        # confidence adds subject+object class confidence (reference
        # evaluator.py:164-166); reference adds raw softmax probabilities
        cand = build_candidates(
            out["relation"], out["connectivity"], out["super_relation"],
            out["pair_img"], out["pair_sub"], out["pair_obj"],
            out["pair_mask"], out["iou_ok"], np.asarray(det["cats"]),
            np.asarray(det["boxes"]), hierarchical=m.hierarchical_pred,
            num_geometric=m.num_geometric, num_possessive=m.num_possessive,
            predcls=False, cat_conf=np.asarray(det["cat_conf"]),
            cs_aligned=cs_a, cs_violated=cs_v,
            num_obj_classes=m.num_classes)
        keep = (sgd_target_keep(np.asarray(batch["valid"]))
                if cfg.training.faithful_sgd_targets else None)
        tgt = build_targets(np.asarray(batch["rel"]),
                            np.asarray(batch["cats"]),
                            np.asarray(batch["boxes"]),
                            np.asarray(batch["valid"]), keep=keep)
        ev.accumulate(cand, tgt)
        if cfg.data.dataset == "oiv6":
            ev.accumulate_precision(cand, tgt)
    return _results(cfg, ev, ev3)


def make_detr_detect_fn(cfg, detr_model, detr_params,
                        image_key: str = "image_nonsq", mesh=None):
    """Builds detect_fn: full DETR forward + static postprocess (reference
    evaluate.py:309-368).

    With a mesh, images/outputs are annotated batch-sharded over 'data'
    and GSPMD partitions the whole detector (detection is embarrassingly
    parallel per image — NMS and postprocess are vmapped); params stay
    replicated."""
    import jax.numpy as jnp

    # params ride as an ARGUMENT, not a closed-over constant: jit embeds
    # captured arrays into the program, so XLA constant-folds ~160 MB of
    # frozen weights (minutes of compile) and the persistent compile
    # cache misses whenever the checkpoint changes
    def _detect_impl(params, images, pixel_mask):
        out = detr_model.apply(params, images, pixel_mask)
        return postprocess_detections(
            out["pred_logits"], out["pred_boxes"], OBJ_ALP2FRE,
            num_classes=cfg.model.num_classes, topk_cat=cfg.model.topk_cat,
            feature_size=cfg.model.feature_size, nms_iou=cfg.model.nms_iou,
            max_objects=cfg.data.max_objects)

    if mesh is None:
        _detect = jax.jit(_detect_impl)
    else:
        from jax.sharding import NamedSharding, PartitionSpec
        data_sh = NamedSharding(mesh, PartitionSpec("data"))
        repl = NamedSharding(mesh, PartitionSpec())
        _detect = jax.jit(_detect_impl,
                          in_shardings=(repl, data_sh, data_sh),
                          out_shardings=data_sh)

    def detect_fn(batch):
        images = jnp.asarray(batch[image_key])
        mask = batch.get("pixel_mask")
        if mask is None:
            mask = jnp.ones(images.shape[:3], bool)
        return _detect(detr_params, images, mask)

    return detect_fn
