"""Faithful eval-target parity (deviations 4 and the SGDET target drop).

Two quirks of the reference change the R@k denominator:

  * deviation 4 (reference evaluate.py:152-157): the ragged eval loop skips
    BOTH directions of a pair column when no image in the batch overlaps
    there, silently dropping those GT pairs from the target set;
  * SGDET targets (reference utils.py:305-313): match_target_sgd's loop
    bound never visits the last object's relation row.

`training.faithful_eval_targets` / `training.faithful_sgd_targets` restore
them via eval/builders.{eval_column_keep,sgd_target_keep}.  The SGDET test
runs the LIVING reference match_target_sgd; the deviation-4 test replicates
the reference's exact control flow (mask int-truncation, sum(OR)/sum(AND)
overlap, whole-column continue) since that logic is inlined in eval_pc and
cannot be imported in isolation — the checkpoint-parity harness
(tools/checkpoint_parity.py) covers it against the living eval_pc end to
end.
"""

import sys

import numpy as np
import pytest

from scene_graph_commonsense_tpu.eval.builders import (
    build_targets, eval_column_keep, sgd_target_keep)
from scene_graph_commonsense_tpu.ops.pairs import directed_rel_from_lower

from reference_shim import REFERENCE_DIR, _install_stubs

FS = 16


def _ragged_scene(rng, n, fs=FS, overlap_frac=0.5):
    """Boxes with a controllable overlap rate plus triangular relation rows
    (reference annotation contract)."""
    x0 = rng.integers(0, fs - 2, n).astype(np.float64)
    y0 = rng.integers(0, fs - 2, n).astype(np.float64)
    w = rng.integers(2, fs // 2, n)
    h = rng.integers(2, fs // 2, n)
    boxes = np.stack([x0, np.minimum(x0 + w, fs),
                      y0, np.minimum(y0 + h, fs)], 1)
    # shove some boxes into a far corner so whole columns can fail overlap
    for i in range(n):
        if rng.random() > overlap_frac:
            boxes[i] = [fs - 2, fs, fs - 2, fs] if i % 2 else [0, 2, 0, 2]
    rel_rows, dir_rows = [], []
    for i in range(1, n):
        row = np.full(i, -1, np.int64)
        direction = np.full(i, -1.0, np.float32)
        for j in range(i):
            if rng.random() < 0.6:
                row[j] = rng.integers(0, 50)
                direction[j] = float(rng.integers(0, 2))
        rel_rows.append(row)
        dir_rows.append(direction)
    return boxes, rel_rows, dir_rows


def _batch(rng, counts, fs=FS, **kw):
    n_max = max(counts)
    b = len(counts)
    boxes = np.zeros((b, n_max, 4))
    valid = np.zeros((b, n_max), bool)
    rel = np.full((b, n_max, n_max), -1, np.int32)
    scenes = []
    for bi, n in enumerate(counts):
        bx, rr, dr = _ragged_scene(rng, n, fs, **kw)
        boxes[bi, :n] = bx
        valid[bi, :n] = True
        rel[bi] = directed_rel_from_lower(rr, dr, n, n_max)
        scenes.append((bx, rr, dr))
    cats = rng.integers(0, 150, (b, n_max)).astype(np.int32) * valid
    return dict(boxes=boxes, valid=valid, rel=rel, cats=cats,
                scenes=scenes, counts=counts)


def _reference_eval_pc_targets(batch, fs=FS):
    """Directed target pairs the reference eval loop would accumulate:
    exact replica of evaluate.py:111-157's mask build, overlap filter and
    whole-column continue (numpy, torch-free)."""
    counts = batch["counts"]
    rel = batch["rel"]
    masks = []
    for bi, n in enumerate(counts):
        m = np.zeros((n, fs, fs), bool)
        for j in range(n):
            x0, x1, y0, y1 = batch["boxes"][bi, j]
            m[j, int(y0):int(y1), int(x0):int(x1)] = True
        masks.append(m)
    collected = []
    for g in range(max(counts)):
        keep = [bi for bi, n in enumerate(counts) if n > g]
        if not keep:
            continue
        for e in range(g):
            g_masks = np.stack([masks[bi][g] for bi in keep])
            e_masks = np.stack([masks[bi][e] for bi in keep])
            or_sum = np.logical_or(g_masks, e_masks).sum((1, 2))
            and_sum = np.logical_and(g_masks, e_masks).sum((1, 2))
            with np.errstate(divide="ignore", invalid="ignore"):
                joint_iou = or_sum / and_sum
            joint_iou[np.isinf(joint_iou)] = 0
            iou_mask = joint_iou > 0          # NaN (0/0) compares False
            if iou_mask.sum() == 0:
                continue                      # deviation 4: column dropped
            for bi in keep:                   # targets ignore per-image iou
                if rel[bi, g, e] >= 0:
                    collected.append((bi, g, e, rel[bi, g, e]))
                if rel[bi, e, g] >= 0:
                    collected.append((bi, e, g, rel[bi, e, g]))
    return sorted(collected)


def test_eval_column_keep_matches_reference_loop(rng):
    """50 randomized ragged batches: the vectorized keep mask reproduces
    the reference loop's target set exactly, and differs from the unfiltered
    set on batches engineered to drop columns."""
    any_dropped = False
    for _ in range(50):
        counts = [int(rng.integers(2, 9)) for _ in range(4)]
        batch = _batch(rng, counts, overlap_frac=0.35)
        ref = _reference_eval_pc_targets(batch)
        keep = eval_column_keep(batch["boxes"], batch["valid"], FS)
        tgt = build_targets(batch["rel"], batch["cats"], batch["boxes"],
                            batch["valid"], keep=keep)
        # boxes can coincide across slots; compare multisets of
        # (img, sub_box, obj_box, rel) instead of slot indices
        ref_rows = sorted((int(i),) + tuple(batch["boxes"][i, g])
                          + tuple(batch["boxes"][i, e]) + (int(r),)
                          for i, g, e, r in ref)
        our_rows = sorted((int(i),) + tuple(s) + tuple(o) + (int(r),)
                          for i, s, o, r in zip(tgt.img, tgt.sub_box,
                                                tgt.obj_box, tgt.rel))
        assert ref_rows == our_rows
        full = build_targets(batch["rel"], batch["cats"], batch["boxes"],
                             batch["valid"])
        if len(full.img) != len(tgt.img):
            any_dropped = True
    assert any_dropped, "fixture never exercised a dropped column"


@pytest.mark.slow
def test_sgd_target_keep_matches_living_match_target_sgd(rng):
    """The LIVING reference match_target_sgd (utils.py:294-352) on ragged
    torch batches == build_targets with sgd_target_keep, incl. the dropped
    last-object row."""
    import torch

    _install_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from utils import match_target_sgd

    for _ in range(20):
        counts = [int(rng.integers(2, 9)) for _ in range(3)]
        batch = _batch(rng, counts, overlap_frac=0.9)
        relationships = [[torch.from_numpy(np.asarray(r)) for r in sc[1]]
                         for sc in batch["scenes"]]
        subj_or_obj = [[torch.from_numpy(np.asarray(d)) for d in sc[2]]
                       for sc in batch["scenes"]]
        cats_t = [torch.from_numpy(batch["cats"][bi, :n].astype(np.int64))
                  for bi, n in enumerate(counts)]
        boxes_t = [torch.from_numpy(batch["boxes"][bi, :n])
                   for bi, n in enumerate(counts)]
        cs, co, bs, bo, rt = match_target_sgd(
            "cpu", relationships, subj_or_obj, cats_t, boxes_t)

        ref_rows = []
        for bi in range(len(counts)):
            if rt[bi] is None:
                continue
            for k in range(len(rt[bi])):
                ref_rows.append((bi, int(cs[bi][k]), int(co[bi][k]))
                                + tuple(np.asarray(bs[bi][k], np.float64))
                                + tuple(np.asarray(bo[bi][k], np.float64))
                                + (int(rt[bi][k]),))

        keep = sgd_target_keep(batch["valid"])
        tgt = build_targets(batch["rel"], batch["cats"], batch["boxes"],
                            batch["valid"], keep=keep)
        our_rows = [(int(i), int(sc), int(oc)) + tuple(sb) + tuple(ob)
                    + (int(r),)
                    for i, sc, oc, sb, ob, r in zip(
                        tgt.img, tgt.sub_cat, tgt.obj_cat,
                        tgt.sub_box, tgt.obj_box, tgt.rel)]
        assert sorted(ref_rows) == sorted(our_rows)

        # and the quirk is real: the unfiltered set is strictly larger
        # whenever the last object had relations
        full = build_targets(batch["rel"], batch["cats"], batch["boxes"],
                             batch["valid"])
        assert len(full.img) >= len(tgt.img)
