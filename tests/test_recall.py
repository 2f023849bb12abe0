"""Vectorized evaluator vs a literal loop oracle of the reference matching
semantics (reference evaluator.py:280-367, 697-773)."""

import numpy as np

from scene_graph_commonsense_tpu.eval.recall import (
    Evaluator, EvaluatorTop3, Candidates, Targets, np_mask_iou)

TOP_K = (20, 50, 100)
NUM_REL = 50
NUM_OBJ = 30
NG, NP = 15, 11


def random_scene(rng, num_images=3, max_cand=140, max_tgt=25, num_obj=NUM_OBJ):
    imgs_c, imgs_t = [], []
    for b in range(num_images):
        c = rng.integers(5, max_cand)
        t = rng.integers(1, max_tgt)
        conf = rng.standard_normal(c)
        conf[rng.random(c) < 0.15] = -np.inf
        boxes = rng.integers(0, 33, (c, 2, 4)).astype(np.float64)
        tboxes = rng.integers(0, 33, (t, 2, 4)).astype(np.float64)
        # make some targets findable: copy candidates into targets
        rel_c = rng.integers(0, NUM_REL, c)
        sub_c = rng.integers(0, num_obj, c)
        obj_c = rng.integers(0, num_obj, c)
        rel_t = rng.integers(0, NUM_REL, t)
        rel_t[rng.random(t) < 0.2] = -1
        sub_t = rng.integers(0, num_obj, t)
        obj_t = rng.integers(0, num_obj, t)
        for i in range(t):
            if rng.random() < 0.5 and c > 0:
                j = rng.integers(0, c)
                rel_t[i], sub_t[i], obj_t[i] = rel_c[j], sub_c[j], obj_c[j]
                tboxes[i] = boxes[j] + rng.integers(0, 3, (2, 4))
        imgs_c.append((conf, rel_c, sub_c, obj_c, boxes))
        imgs_t.append((rel_t, sub_t, obj_t, tboxes))
    cand = Candidates(
        img=np.concatenate([np.full(len(ic[0]), b)
                            for b, ic in enumerate(imgs_c)]),
        conf=np.concatenate([ic[0] for ic in imgs_c]),
        rel=np.concatenate([ic[1] for ic in imgs_c]),
        sub_cat=np.concatenate([ic[2] for ic in imgs_c]),
        obj_cat=np.concatenate([ic[3] for ic in imgs_c]),
        sub_box=np.concatenate([ic[4][:, 0] for ic in imgs_c]),
        obj_box=np.concatenate([ic[4][:, 1] for ic in imgs_c]))
    tgt = Targets(
        img=np.concatenate([np.full(len(it[0]), b)
                            for b, it in enumerate(imgs_t)]),
        rel=np.concatenate([it[0] for it in imgs_t]),
        sub_cat=np.concatenate([it[1] for it in imgs_t]),
        obj_cat=np.concatenate([it[2] for it in imgs_t]),
        sub_box=np.concatenate([it[3][:, 0] for it in imgs_t]),
        obj_box=np.concatenate([it[3][:, 1] for it in imgs_t]))
    return cand, tgt


def oracle_recall(cand, tgt, zs_table=None, equiv=None, iou_thresh=0.5):
    """Literal per-target scan in reference order (reference
    evaluator.py:294-356)."""
    hits = {k: 0.0 for k in TOP_K}
    per_class = {k: np.zeros(NUM_REL) for k in TOP_K}
    hits_zs = {k: 0.0 for k in TOP_K}
    n_t, n_t_zs = 0.0, 0.0
    t_per_class = np.zeros(NUM_REL)
    for image in np.unique(tgt.img):
        cs = cand.img == image
        ts = tgt.img == image
        conf = cand.conf[cs]
        order = np.argsort(-conf, kind="stable")
        keep = order[:min(TOP_K[-1], len(conf))]
        for i in np.nonzero(ts)[0]:
            if tgt.rel[i] == -1:
                continue
            found = False
            for jj, j in enumerate(keep):
                if equiv is None:
                    lab = (tgt.sub_cat[i] == cand.sub_cat[cs][j]
                           and tgt.obj_cat[i] == cand.obj_cat[cs][j])
                else:
                    lab = (equiv[cand.sub_cat[cs][j], tgt.sub_cat[i]]
                           and equiv[cand.obj_cat[cs][j], tgt.obj_cat[i]])
                if not lab:
                    continue
                si = np_mask_iou(tgt.sub_box[i], cand.sub_box[cs][j])
                oi = np_mask_iou(tgt.obj_box[i], cand.obj_box[cs][j])
                if si >= iou_thresh and oi >= iou_thresh:
                    if tgt.rel[i] == cand.rel[cs][j]:
                        for k in TOP_K:
                            if jj >= k:
                                continue
                            hits[k] += 1
                            per_class[k][tgt.rel[i]] += 1
                            if zs_table is not None:
                                tid = (tgt.sub_cat[i] * NUM_REL
                                       + tgt.rel[i]) * NUM_OBJ \
                                    + tgt.obj_cat[i]
                                if zs_table[tid]:
                                    hits_zs[k] += 1
                        found = True
                    if found:
                        break
            n_t += 1
            t_per_class[tgt.rel[i]] += 1
            if zs_table is not None:
                tid = (tgt.sub_cat[i] * NUM_REL + tgt.rel[i]) * NUM_OBJ \
                    + tgt.obj_cat[i]
                if zs_table[tid]:
                    n_t_zs += 1
    return hits, per_class, n_t, t_per_class, hits_zs, n_t_zs


def test_evaluator_matches_oracle(rng):
    for trial in range(4):
        cand, tgt = random_scene(rng)
        zs = rng.random(NUM_OBJ * NUM_REL * NUM_OBJ) < 0.3
        ev = Evaluator(num_classes=NUM_REL, top_k=TOP_K, zs_table=zs,
                       num_obj_classes=NUM_OBJ)
        ev.accumulate(cand, tgt)
        hits, per_class, n_t, t_pc, hits_zs, n_t_zs = oracle_recall(
            cand, tgt, zs_table=zs)
        for k in TOP_K:
            assert ev.hits[k] == hits[k], (trial, k)
            np.testing.assert_array_equal(ev.hits_per_class[k], per_class[k])
            assert ev.hits_zs[k] == hits_zs[k]
        assert ev.num_targets == n_t
        assert ev.num_targets_zs == n_t_zs
        np.testing.assert_array_equal(ev.targets_per_class, t_pc)


def test_evaluator_equivalence_matching(rng):
    equiv = np.eye(NUM_OBJ, dtype=bool)
    equiv[2, 5] = equiv[5, 2] = True
    cand, tgt = random_scene(rng)
    ev = Evaluator(num_classes=NUM_REL, top_k=TOP_K, predcls=False,
                   equiv=equiv, num_obj_classes=NUM_OBJ)
    ev.accumulate(cand, tgt)
    hits, *_ = oracle_recall(cand, tgt, equiv=equiv)
    for k in TOP_K:
        assert ev.hits[k] == hits[k]


def test_perfect_predictions_give_unit_recall(rng):
    # candidates == targets, all confident -> R@k == 1 when T <= 20
    t = 15
    boxes = rng.integers(0, 16, (t, 4)).astype(np.float64)
    boxes[:, 1] = boxes[:, 0] + 1 + rng.integers(0, 15, t)  # x_max > x_min
    boxes[:, 3] = boxes[:, 2] + 1 + rng.integers(0, 15, t)  # y_max > y_min
    tgt = Targets(img=np.zeros(t, int), rel=rng.integers(0, NUM_REL, t),
                  sub_cat=rng.integers(0, NUM_OBJ, t),
                  obj_cat=rng.integers(0, NUM_OBJ, t),
                  sub_box=boxes, obj_box=boxes[::-1].copy())
    cand = Candidates(img=tgt.img, conf=rng.standard_normal(t),
                      rel=tgt.rel, sub_cat=tgt.sub_cat, obj_cat=tgt.obj_cat,
                      sub_box=tgt.sub_box, obj_box=tgt.obj_box)
    ev = Evaluator(num_classes=NUM_REL, top_k=TOP_K, num_obj_classes=NUM_OBJ)
    ev.accumulate(cand, tgt)
    res = ev.compute()
    assert res["recall"] == [1.0, 1.0, 1.0]


def oracle_top3(cand, tgt, iou_thresh=0.5):
    """Literal loop oracle for Evaluator_Top3 incl. the
    `j >= max(k, num_target)` quirk (reference evaluator.py:711-766)."""
    hits = {k: 0.0 for k in TOP_K}
    hits1 = {k: 0.0 for k in TOP_K}
    n_t = 0.0
    for image in np.unique(tgt.img):
        cs = cand.img == image
        ts = (tgt.img == image) & (tgt.rel >= 0)
        conf = cand.conf[cs]
        order = np.argsort(-conf, kind="stable")
        keep = order[:min(TOP_K[-1], len(conf))]
        num_target = int(ts.sum())
        rel_full = cand.relation_full[cs]
        sup = cand.super_rel[cs]
        for i in np.nonzero(ts)[0]:
            found = found1 = False
            for jj, j in enumerate(keep):
                if not (tgt.sub_cat[i] == cand.sub_cat[cs][j]
                        and tgt.obj_cat[i] == cand.obj_cat[cs][j]):
                    continue
                si = np_mask_iou(tgt.sub_box[i], cand.sub_box[cs][j])
                oi = np_mask_iou(tgt.obj_box[i], cand.obj_box[cs][j])
                if si < iou_thresh or oi < iou_thresh:
                    continue
                p1 = rel_full[j][:NG].argmax()
                p2 = rel_full[j][NG:NG + NP].argmax() + NG
                p3 = rel_full[j][NG + NP:].argmax() + NG + NP
                if not found and tgt.rel[i] in (p1, p2, p3):
                    for k in TOP_K:
                        if jj >= max(k, num_target):
                            continue
                        hits[k] += 1
                    found = True
                if not found1:
                    top1 = [p1, p2, p3][sup[j].argmax()]
                    if tgt.rel[i] == top1:
                        for k in TOP_K:
                            if jj >= max(k, num_target):
                                continue
                            hits1[k] += 1
                        found1 = True
                if found and found1:
                    break
            n_t += 1
    return hits, hits1, n_t


def test_top3_matches_oracle(rng):
    cand, tgt = random_scene(rng, num_images=2, max_cand=120)
    c = len(cand.conf)
    cand.relation_full = rng.standard_normal((c, NUM_REL))
    cand.super_rel = rng.standard_normal((c, 3))
    ev = EvaluatorTop3(num_classes=NUM_REL, top_k=TOP_K,
                       num_geometric=NG, num_possessive=NP)
    ev.accumulate(cand, tgt)
    hits, hits1, n_t = oracle_top3(cand, tgt)
    for k in TOP_K:
        assert ev.hits[k] == hits[k], k
        assert ev.hits_top1[k] == hits1[k], k
    assert ev.num_targets == n_t


def test_zero_candidate_image_counts_targets(rng):
    """An image whose every candidate was filtered out (e.g. all detection
    pairs failed the overlap filter in SGDET) contributes its targets to
    the R@k denominator with zero hits — the reference's empty per-image
    candidate list does the same (reference evaluator.py:294-356)."""
    empty = lambda *s: np.zeros(s)
    cand = Candidates(img=empty(0), conf=empty(0), rel=empty(0).astype(int),
                      sub_cat=empty(0).astype(int),
                      obj_cat=empty(0).astype(int),
                      sub_box=empty(0, 4), obj_box=empty(0, 4))
    tgt = Targets(img=np.zeros(3, int), rel=np.asarray([1, 2, -1]),
                  sub_cat=np.asarray([0, 1, 0]),
                  obj_cat=np.asarray([1, 0, 1]),
                  sub_box=np.tile([0, 4, 0, 4], (3, 1)).astype(float),
                  obj_box=np.tile([2, 6, 2, 6], (3, 1)).astype(float))
    ev = Evaluator(num_classes=NUM_REL, top_k=TOP_K)
    ev.accumulate(cand, tgt)
    assert ev.num_targets == 2.0           # the -1 padding row dropped
    assert all(ev.hits[k] == 0.0 for k in TOP_K)
