"""Numerical parity against the LIVING reference implementation.

Unlike the oracle tests (tests/test_relation_converter.py etc.), which
re-implement torch semantics, these tests import /root/reference's actual
torch modules (model.py, evaluator.py) and assert equality:

  * forward parity: reference BayesianRelationClassifier /
    FlatRelationClassifier (reference model.py:37-186) with random weights at
    full VG dims -> convert_relation_state_dict -> RelationClassifier, both
    in float64, max |diff| <= 1e-8 (far inside the 1e-5 budget);
  * evaluator parity: identical candidate streams through the reference
    Evaluator / Evaluator_Top3 (reference evaluator.py:118-367, 640-773,
    with the real shipped train/test/zero-shot triplet artifacts) and this
    framework's eval.recall evaluators, asserting equal R@k / mR@k / zsR@k
    over 100+ randomized scenes.

Scenes follow the reference's PredCLS accumulate layout: one row per
directed GT-object pair, candidate cats/boxes == target cats/boxes, and a
per-pair relation target that is -1 for unconnected pairs (reference
train_utils.py:186-194, evaluator.py:140-147).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.eval.builders import log_sigmoid
from scene_graph_commonsense_tpu.eval.recall import (
    Candidates, Evaluator, EvaluatorTop3, Targets)
from scene_graph_commonsense_tpu.models.relation_head import (
    RelationClassifier)
from scene_graph_commonsense_tpu.models.weights import (
    convert_relation_state_dict)

from reference_shim import import_reference, reference_args

ref_model, ref_evaluator = import_reference()

NUM_OBJ, NUM_SUPER, NUM_REL = 150, 17, 50
NG, NP, NS = 15, 11, 24


# ---------------------------------------------------------------------------
# Model forward parity (full VG dims, float64)
# ---------------------------------------------------------------------------

def _random_pair_inputs(rng, P: int):
    h_sub = rng.standard_normal((P, 257, 32, 32))
    h_obj = rng.standard_normal((P, 257, 32, 32))
    c1 = rng.integers(0, NUM_OBJ, P)
    c2 = rng.integers(0, NUM_OBJ, P)
    # 1-3 DISTINCT super-categories per object (process_super_class sums
    # one-hots, so distinctness keeps the multi-hot binary, reference
    # utils.py:123-133)
    s1 = [sorted(rng.choice(NUM_SUPER, rng.integers(1, 4), replace=False))
          for _ in range(P)]
    s2 = [sorted(rng.choice(NUM_SUPER, rng.integers(1, 4), replace=False))
          for _ in range(P)]
    return h_sub, h_obj, c1, c2, s1, s2


def _multi_hot(lists, n=NUM_SUPER):
    """Production encoding (reference-faithful {first, last} quirk,
    data.artifacts.super_multi_hot)."""
    from scene_graph_commonsense_tpu.data.artifacts import super_multi_hot
    return super_multi_hot(lists, num_super=n).astype(np.float64)


def _run_reference(torch_model, h_sub, h_obj, c1, c2, s1, s2):
    torch_model = torch_model.double().eval()
    with torch.no_grad():
        return torch_model(
            torch.from_numpy(h_sub), torch.from_numpy(h_obj),
            torch.from_numpy(c1), torch.from_numpy(c2), s1, s2,
            rank="cpu")


def _run_ours(state_dict, hierarchical, h_sub, h_obj, c1, c2, s1, s2):
    params = convert_relation_state_dict(
        {k: v.double().numpy() for k, v in state_dict.items()},
        hierarchical=hierarchical)
    mod = RelationClassifier(hierarchical=hierarchical, dtype=jnp.float64)
    with jax.enable_x64(True):
        return jax.tree.map(np.asarray, mod.apply(
            params,
            jnp.asarray(h_sub.transpose(0, 2, 3, 1)),
            jnp.asarray(h_obj.transpose(0, 2, 3, 1)),
            jnp.asarray(c1), jnp.asarray(c2),
            jnp.asarray(_multi_hot(s1)), jnp.asarray(_multi_hot(s2)),
            deterministic=True))


@pytest.mark.slow
def test_bayesian_forward_matches_reference(rng):
    """Reference model.py:105-186 vs RelationClassifier(hierarchical)."""
    torch.manual_seed(0)
    m = ref_model.BayesianRelationClassifier(reference_args())
    h_sub, h_obj, c1, c2, s1, s2 = _random_pair_inputs(rng, P=6)
    rel1, rel2, rel3, sup, conn, pred, _ = _run_reference(
        m, h_sub, h_obj, c1, c2, s1, s2)
    out = _run_ours(m.state_dict(), True, h_sub, h_obj, c1, c2, s1, s2)

    ref_rel = torch.cat([rel1, rel2, rel3], dim=1).numpy()
    np.testing.assert_allclose(out["relation"], ref_rel, atol=1e-8)
    np.testing.assert_allclose(out["super_relation"], sup.numpy(),
                               atol=1e-8)
    np.testing.assert_allclose(out["connectivity"], conn.numpy()[:, 0],
                               atol=1e-8)
    np.testing.assert_allclose(out["hidden"], pred.numpy(), atol=1e-8)


@pytest.mark.slow
def test_flat_forward_matches_reference(rng):
    """Reference model.py:37-102 vs RelationClassifier(flat)."""
    torch.manual_seed(1)
    m = ref_model.FlatRelationClassifier(reference_args(hierarchical=False))
    h_sub, h_obj, c1, c2, s1, s2 = _random_pair_inputs(rng, P=6)
    rel, conn, pred, _ = _run_reference(m, h_sub, h_obj, c1, c2, s1, s2)
    out = _run_ours(m.state_dict(), False, h_sub, h_obj, c1, c2, s1, s2)

    np.testing.assert_allclose(out["relation"], rel.numpy(), atol=1e-8)
    np.testing.assert_allclose(out["connectivity"], conn.numpy()[:, 0],
                               atol=1e-8)
    np.testing.assert_allclose(out["hidden"], pred.numpy(), atol=1e-8)


# ---------------------------------------------------------------------------
# Evaluator parity (real triplet artifacts, randomized scenes)
# ---------------------------------------------------------------------------

def _random_scene(rng, n_pairs, all_finite=True):
    """One image's directed pairs in the reference's PredCLS layout.
    Boxes are (x0, x1, y0, y1) on the 32x32 grid (reference
    evaluator.py:184-193), snapped to a coarse grid so distinct pairs
    coincide (exercising cross-pair matching and first-match-wins order).
    Labels come from a narrow range for the same reason."""

    def boxes(n):
        x0 = rng.choice([0, 4, 8, 16], n)
        y0 = rng.choice([0, 4, 8, 16], n)
        x1 = x0 + rng.choice([8, 12, 16], n)
        y1 = y0 + rng.choice([8, 12, 16], n)
        return np.stack([x0, x1, y0, y1], 1).astype(np.float64)

    relation = np.log(rng.dirichlet(np.ones(NUM_REL), n_pairs))
    conn = log_sigmoid(rng.standard_normal(n_pairs) * 2)
    sub_cat = rng.integers(0, 25, n_pairs)
    obj_cat = rng.integers(0, 25, n_pairs)
    sub_box, obj_box = boxes(n_pairs), boxes(n_pairs)
    iou_mask = np.ones(n_pairs, bool) if all_finite \
        else rng.random(n_pairs) < 0.7

    t_rel = rng.integers(0, NUM_REL, n_pairs)
    t_rel[rng.random(n_pairs) < 0.4] = -1        # unconnected pairs
    # make some predictions correct so hits occur at varied ranks
    for j in np.nonzero((t_rel >= 0) & (rng.random(n_pairs) < 0.6))[0]:
        relation[j, t_rel[j]] = relation[j].max() + rng.random()
    return dict(relation=relation, conn=conn, sub_cat=sub_cat,
                obj_cat=obj_cat, sub_box=sub_box, obj_box=obj_box,
                iou_mask=iou_mask, t_rel=t_rel)


def _accumulate_reference(ref_ev, scenes):
    """Feeds scenes through the reference accumulate in the PredCLS calling
    convention (reference train_utils.py:190-194): candidate and target
    cats/boxes are the same arrays, one globally-unique image id each."""
    for img, sc in enumerate(scenes):
        n = len(sc["conn"])
        ref_ev.accumulate(
            torch.full((n,), img),
            torch.from_numpy(sc["relation"]),
            torch.from_numpy(sc["t_rel"]),
            torch.from_numpy(sc["relation"][:, :3]),  # super: unused here
            torch.from_numpy(sc["conn"]),
            torch.from_numpy(sc["sub_cat"]), torch.from_numpy(sc["obj_cat"]),
            torch.from_numpy(sc["sub_cat"]), torch.from_numpy(sc["obj_cat"]),
            torch.from_numpy(sc["sub_box"]), torch.from_numpy(sc["obj_box"]),
            torch.from_numpy(sc["sub_box"]), torch.from_numpy(sc["obj_box"]),
            torch.from_numpy(sc["iou_mask"]))


def _ours_candidates(scenes, hierarchical):
    """Expands scenes into flat Candidates/Targets the way build_candidates
    does (branch argmax x3 + log-sigmoid connectivity already applied)."""
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


def _load_zs_table():
    """Real zero-shot table, dense-encoded the framework's way."""
    from scene_graph_commonsense_tpu.data.artifacts import load_vg_artifacts
    art = load_vg_artifacts("datasets/artifacts")
    assert art.zs_table is not None, \
        "run tools/convert_reference_artifacts.py first"
    return art.zs_table


@pytest.mark.slow
@pytest.mark.parametrize("hierar", [True, False])
def test_evaluator_matches_reference(rng, hierar):
    """Equal R@k / mR@k / zsR@k on 120 randomized scenes (reference
    evaluator.py:118-367 with the real shipped triplet artifacts)."""
    ref_ev = ref_evaluator.Evaluator(
        args=reference_args(hierarchical=hierar), num_classes=NUM_REL,
        iou_thresh=0.5, top_k=[20, 50, 100])
    ours = Evaluator(num_classes=NUM_REL, predcls=True,
                     zs_table=_load_zs_table())

    # scenes with few pairs keep -inf tie-ordering irrelevant (with the x3
    # hierarchical expansion every candidate index stays < min(top_k));
    # larger scenes stay all-finite so torch's unstable argsort and numpy's
    # stable one agree on distinct confidences
    scenes = []
    for i in range(120):
        if i % 3 == 0:
            scenes.append(_random_scene(rng, n_pairs=int(rng.integers(2, 7)),
                                        all_finite=False))
        else:
            scenes.append(_random_scene(rng,
                                        n_pairs=int(rng.integers(20, 60)),
                                        all_finite=True))

    _accumulate_reference(ref_ev, scenes)
    recall, _, mean_recall, recall_zs, _, mean_recall_zs = \
        ref_ev.compute(per_class=True)

    cand, tgt = _ours_candidates(scenes, hierar)
    ours.accumulate(cand, tgt)
    res = ours.compute()

    np.testing.assert_allclose(res["recall"], [float(r) for r in recall],
                               atol=1e-12)
    np.testing.assert_allclose(res["mean_recall"],
                               [float(r) for r in mean_recall], atol=1e-12)
    np.testing.assert_allclose(res["recall_zs"],
                               [float(r) for r in recall_zs], atol=1e-12)
    np.testing.assert_allclose(res["mean_recall_zs"],
                               [float(r) for r in mean_recall_zs],
                               atol=1e-12)
    assert res["num_targets"] == float(ref_ev.num_connected_target)


@pytest.mark.slow
def test_evaluator_top3_matches_reference(rng):
    """Equal R@k* / mR@k* on randomized scenes (reference
    evaluator.py:640-773, incl. the j >= max(k, num_target) quirk)."""
    ref_ev = ref_evaluator.Evaluator_Top3(
        args=reference_args(), num_classes=NUM_REL, iou_thresh=0.5,
        top_k=[20, 50, 100])
    ours = EvaluatorTop3(num_classes=NUM_REL)

    scenes = [_random_scene(rng, n_pairs=int(rng.integers(20, 60)))
              for _ in range(100)]
    sup = [np.log(rng.dirichlet(np.ones(3), len(s["conn"])))
           for s in scenes]

    for img, (sc, sp) in enumerate(zip(scenes, sup)):
        n = len(sc["conn"])
        ref_ev.accumulate(
            torch.full((n,), img),
            torch.from_numpy(sc["relation"]),
            torch.from_numpy(sc["t_rel"]),
            torch.from_numpy(sp),
            torch.from_numpy(sc["conn"]),
            torch.from_numpy(sc["sub_cat"]), torch.from_numpy(sc["obj_cat"]),
            torch.from_numpy(sc["sub_cat"]), torch.from_numpy(sc["obj_cat"]),
            torch.from_numpy(sc["sub_box"]), torch.from_numpy(sc["obj_box"]),
            torch.from_numpy(sc["sub_box"]), torch.from_numpy(sc["obj_box"]),
            torch.from_numpy(sc["iou_mask"]))
    recall, _, mean_recall = ref_ev.compute(per_class=True)

    imgs, confs, rfull, sups = [], [], [], []
    scs, ocs, sbs, obs = [], [], [], []
    t_imgs, t_rels, t_scs, t_ocs, t_sbs, t_obs = [], [], [], [], [], []
    for img, (sc, sp) in enumerate(zip(scenes, sup)):
        conf = np.max(np.stack([sc["relation"][:, :NG].max(1),
                                sc["relation"][:, NG:NG + NP].max(1),
                                sc["relation"][:, NG + NP:].max(1)]), axis=0)
        conf = np.where(sc["iou_mask"], conf, -np.inf) + sc["conn"]
        imgs.append(np.full(len(conf), img))
        confs.append(conf)
        rfull.append(sc["relation"])
        sups.append(sp)
        scs.append(sc["sub_cat"])
        ocs.append(sc["obj_cat"])
        sbs.append(sc["sub_box"])
        obs.append(sc["obj_box"])
        t_imgs.append(np.full(len(sc["t_rel"]), img))
        t_rels.append(sc["t_rel"])
        t_scs.append(sc["sub_cat"])
        t_ocs.append(sc["obj_cat"])
        t_sbs.append(sc["sub_box"])
        t_obs.append(sc["obj_box"])
    cand = Candidates(
        img=np.concatenate(imgs), conf=np.concatenate(confs),
        rel=np.zeros(sum(len(c) for c in confs), np.int64),
        sub_cat=np.concatenate(scs), obj_cat=np.concatenate(ocs),
        sub_box=np.concatenate(sbs), obj_box=np.concatenate(obs),
        relation_full=np.concatenate(rfull), super_rel=np.concatenate(sups))
    tgt = Targets(img=np.concatenate(t_imgs), rel=np.concatenate(t_rels),
                  sub_cat=np.concatenate(t_scs),
                  obj_cat=np.concatenate(t_ocs),
                  sub_box=np.concatenate(t_sbs),
                  obj_box=np.concatenate(t_obs))
    ours.accumulate(cand, tgt)
    res = ours.compute()

    np.testing.assert_allclose(res["recall"], [float(r) for r in recall],
                               atol=1e-12)
    np.testing.assert_allclose(res["mean_recall"],
                               [float(r) for r in mean_recall], atol=1e-12)
