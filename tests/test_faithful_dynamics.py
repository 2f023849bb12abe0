"""Faithful-dynamics parity against the LIVING reference loss code.

Drives the reference's `train_one_direction` / `calculate_losses_on_
relationships` (reference train_utils.py:21-157) column by column with a
stub classifier that returns pre-generated outputs, replicating the
train_test.py:174-258 plumbing (targets, keep_in_batch, loss accumulation
with the triangular re-accumulation, the dynamic LR assignment), and
asserts that train.losses.faithful_losses reproduces:

  * the per-term column sums (relationship / connectivity incl. the
    rebinding quirk / commonsense),
  * the backward `losses` value (triangular re-accumulation weights),
  * the dynamic-LR factor left in effect at optimizer.step() time.

Also checks match_predicted_labels_top2 against the reference's
match_object_categories (reference utils.py:376-422) on randomized
detections, including the top-2 tie duplication.
"""

import math

import numpy as np
import pytest
import torch

from scene_graph_commonsense_tpu.constants import class_weights
from scene_graph_commonsense_tpu.eval.engines import (
    match_predicted_labels_top2)
from scene_graph_commonsense_tpu.eval.recall import np_mask_iou
from scene_graph_commonsense_tpu.train import losses as L

from reference_shim import import_reference, reference_args

import_reference()
import train_utils as ref_train_utils  # noqa: E402  (reference module)
import utils as ref_utils              # noqa: E402

NG, NP, NS, R = 15, 11, 24, 50


class _Cfg:
    """Minimal attribute views of the config objects faithful_losses
    reads."""

    class model:
        hierarchical_pred = True
        num_geometric, num_possessive, num_semantic = NG, NP, NS
        num_classes = 150

    class training:
        lambda_connectivity = 0.3
        lambda_not_connected = 0.7
        lambda_commonsense = 0.5
        lambda_cs_weak = 0.1
        lambda_cs_strong = 10.0
        lambda_contrast = 1.0


def _gen_scene(rng, b=3, n=5):
    """Random grids in the shapes faithful_losses consumes, plus the
    reference-format lower-triangular targets."""
    n_per = np.array([n] + list(rng.integers(2, n + 1, b - 1)))
    valid = np.arange(n)[None] < n_per[:, None]

    sup = rng.standard_normal((b, n, n, 3))
    sup = np.log(np.exp(sup) / np.exp(sup).sum(-1, keepdims=True))
    rel = np.zeros((b, n, n, R))
    for off, width in ((0, NG), (NG, NP), (NG + NP, NS)):
        x = rng.standard_normal((b, n, n, width))
        lp = np.log(np.exp(x) / np.exp(x).sum(-1, keepdims=True))
        k = 0 if off == 0 else (1 if off == NG else 2)
        rel[..., off:off + width] = lp + sup[..., k:k + 1]
    conn = rng.standard_normal((b, n, n)) * 2
    # f32 on both sides: torch's f32-strict criteria set the precision
    sup, rel, conn = (a.astype(np.float32) for a in (sup, rel, conn))

    # one direction at most per unordered pair (the reference's
    # lower-triangular storage can hold only one)
    rel_t = np.full((b, n, n), -1, np.int64)
    for bi in range(b):
        for i in range(1, int(n_per[bi])):
            for j in range(i):
                if rng.random() < 0.6:
                    r = int(rng.integers(0, R))
                    if rng.random() < 0.5:
                        rel_t[bi, i, j] = r
                    else:
                        rel_t[bi, j, i] = r
    cats = rng.integers(0, 150, (b, n))
    return n_per, valid, sup, rel, conn, rel_t, cats


def _reference_run(args, n_per, sup, rel, conn, rel_t, cats,
                   cs_aligned=None, cs_violated=None):
    """Replicates the train_test.py:174-258 loop with the reference's
    train_one_direction doing the loss math."""
    b = len(n_per)
    n_max = int(max(n_per))

    # reference-format targets (train_test.py:174-180)
    relationships, subj_or_obj = [], []
    for bi in range(b):
        rows, drows = [], []
        for i in range(1, int(n_per[bi])):
            row = np.full(i, -1, np.int64)
            direction = np.full(i, -1.0, np.float32)
            for j in range(i):
                if rel_t[bi, i, j] >= 0:
                    row[j], direction[j] = rel_t[bi, i, j], 1.0
                elif rel_t[bi, j, i] >= 0:
                    row[j], direction[j] = rel_t[bi, j, i], 0.0
            rows.append(torch.from_numpy(row))
            drows.append(torch.from_numpy(direction))
        relationships.append(rows)
        subj_or_obj.append(drows)

    counts = torch.as_tensor(n_per) - 1
    relations_target, direction_target = [], []
    for g in range(int(counts.max())):
        keep = torch.nonzero(counts > g).view(-1)
        relations_target.append(torch.vstack(
            [relationships[i][g] for i in keep]).T)
        direction_target.append(torch.vstack(
            [subj_or_obj[i][g] for i in keep]).T)

    # criteria exactly as train_test.py:100-117 builds them
    relation_count = ref_utils.get_num_each_class_reordered(args)
    cw = 1 - relation_count / torch.sum(relation_count)
    crit_rel = [torch.nn.NLLLoss(weight=cw[:NG]),
                torch.nn.NLLLoss(weight=cw[NG:NG + NP]),
                torch.nn.NLLLoss(weight=cw[NG + NP:]),
                torch.nn.NLLLoss()]
    crit_conn = torch.nn.BCEWithLogitsLoss()

    current = {}

    def stub_classifier(h_sub, *a, **k):
        bsel, i, j = current["keep"], current["sub"], current["obj"]
        return (torch.from_numpy(rel[bsel, i, j, :NG]),
                torch.from_numpy(rel[bsel, i, j, NG:NG + NP]),
                torch.from_numpy(rel[bsel, i, j, NG + NP:]),
                torch.from_numpy(sup[bsel, i, j]),
                torch.from_numpy(conn[bsel, i, j][:, None]),
                torch.zeros(len(bsel), 8),
                torch.zeros(len(bsel), 8))

    hid = [[] for _ in range(b)]
    hid_l = [[] for _ in range(b)]
    sums = {"rel": 0.0, "conn": 0.0, "cs": 0.0}
    losses = torch.zeros((), dtype=torch.float64)
    loss_rel_acc = torch.zeros((), dtype=torch.float64)
    loss_conn_acc = torch.zeros((), dtype=torch.float64)
    loss_cs_acc = torch.zeros((), dtype=torch.float64)
    last_lr_scale = 1.0

    n_counts = torch.as_tensor(n_per)
    dummy = torch.zeros(1)
    for g in range(n_max):
        keep = torch.nonzero(n_counts > g).view(-1)
        last_lr_scale = math.sqrt(len(keep) / b)
        for e in range(g):
            keep_np = keep.numpy()
            iou_mask = torch.ones(len(keep), dtype=torch.bool)
            for first, (si, oi) in (((True), (g, e)), ((False), (e, g))):
                current.update(keep=keep_np, sub=si, obj=oi)
                cat_sub = torch.from_numpy(cats[keep_np, si])
                cat_obj = torch.from_numpy(cats[keep_np, oi])
                (lr_rel, lr_conn, lr_cs, *_rest, hid, hid_l) = \
                    ref_train_utils.train_one_direction(
                        stub_classifier, args, dummy, dummy, cat_sub,
                        cat_obj, None, None, dummy, dummy, dummy, dummy,
                        iou_mask, "cpu", g, e, keep, None, None,
                        crit_rel, crit_conn, relations_target,
                        direction_target, 1, hid, hid_l,
                        cs_aligned, cs_violated, 10 ** 6,
                        first_direction=first)
                sums["rel"] += float(lr_rel)
                sums["conn"] += float(lr_conn)
                sums["cs"] += float(lr_cs)
                loss_rel_acc = loss_rel_acc + lr_rel
                loss_conn_acc = loss_conn_acc + lr_conn
                loss_cs_acc = loss_cs_acc + lr_cs
                losses = losses + loss_rel_acc \
                    + args["training"]["lambda_connectivity"] \
                    * loss_conn_acc \
                    + args["training"]["lambda_commonsense"] * loss_cs_acc
    return sums, float(losses), last_lr_scale


def _faithful_args(run_mode="train"):
    args = reference_args(run_mode=run_mode)
    args["training"].update({
        "lambda_connectivity": _Cfg.training.lambda_connectivity,
        "lambda_not_connected": _Cfg.training.lambda_not_connected,
        "lambda_commonsense": _Cfg.training.lambda_commonsense,
        "lambda_cs_weak": _Cfg.training.lambda_cs_weak,
        "lambda_cs_strong": _Cfg.training.lambda_cs_strong,
        "eval_freq": 10 ** 6,
    })
    return args


@pytest.mark.parametrize("with_cs", [False, True])
def test_faithful_losses_match_reference(rng, with_cs):
    import jax
    import jax.numpy as jnp

    n_per, valid, sup, rel, conn, rel_t, cats = _gen_scene(rng)

    cs_aligned = cs_violated = None
    cs_tables = None
    if with_cs:
        trip = [(int(s), int(r), int(o)) for s, r, o in
                rng.integers(0, 50, (300, 3)) * np.array([3, 1, 3])]
        cs_aligned = {t: 1 for t in trip[:200]}
        cs_violated = {t: 1 for t in trip[200:]}
        aligned = np.zeros(150 * 50 * 150, bool)
        violated = np.zeros(150 * 50 * 150, bool)
        for (s, r, o), table in [(t, aligned) for t in cs_aligned] + \
                [(t, violated) for t in cs_violated]:
            table[(s * 50 + r) * 150 + o] = True
        cs_tables = (jnp.asarray(aligned), jnp.asarray(violated))

    args = _faithful_args("train_cs" if with_cs else "train")
    sums, ref_total, ref_lr = _reference_run(
        args, n_per, sup, rel, conn, rel_t, cats, cs_aligned, cs_violated)

    cw = jnp.asarray(class_weights("vg", faithful=True))
    total, metrics = L.faithful_losses(
        _Cfg.model, _Cfg.training, jnp.asarray(rel), jnp.asarray(sup),
        jnp.asarray(conn), jnp.asarray(rel_t), jnp.asarray(valid), cw,
        sub_cats=jnp.asarray(cats), obj_cats=jnp.asarray(cats),
        cs_tables=cs_tables)
    del jax

    tol = dict(rtol=1e-4, atol=1e-4)
    assert np.isclose(float(metrics["loss_relationship"]), sums["rel"],
                      **tol)
    assert np.isclose(float(metrics["loss_connectivity"]), sums["conn"],
                      **tol)
    assert np.isclose(float(metrics["loss_commonsense"]), sums["cs"],
                      **tol)
    assert np.isclose(float(total), ref_total, rtol=1e-4)
    assert np.isclose(float(metrics["lr_scale"]), ref_lr, atol=1e-6)


def test_faithful_mode_train_step_runs(rng):
    """make_train_step(faithful_dynamics=True) compiles and produces
    finite losses + an lr_scale in (0, 1]."""
    import jax
    import jax.numpy as jnp
    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.train import engine

    cfg = derive(
        "vg", hierarchical_pred=True,
        model={"feature_size": 16, "hidden_dim": 8, "num_img_feature": 16,
               "compute_dtype": "float32", "dropout_rate": 0.1},
        data={"max_objects": 5},
        training={"batch_size": 2, "faithful_dynamics": True})
    model = make_relation_classifier(cfg)
    s = cfg.model.feature_size
    x = jnp.zeros((2, s, s, cfg.model.num_img_feature + 1))
    c = jnp.zeros(2, jnp.int32)
    sc = jnp.zeros((2, cfg.model.num_super_classes))
    params = model.init(jax.random.PRNGKey(0), x, x, c, c, sc, sc)
    opt = engine.make_optimizer(cfg.training.learning_rate)
    state = engine.TrainState(params, opt.init(params), jnp.int32(0))
    step = engine.make_train_step(
        model, cfg, opt, class_weights("vg", faithful=True), donate=False)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, batch_size=2, max_objects=5,
        feature_size=s, num_channels=cfg.model.num_img_feature).items()}
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0 < float(metrics["lr_scale"]) <= 1
    # params moved
    a0 = jax.tree.leaves(state.params)[0]
    a1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(a1))


def test_faithful_class_weights_match_reference_table():
    args = reference_args()
    ref_counts = ref_utils.get_num_each_class_reordered(args).numpy()
    ref_w = 1 - ref_counts / ref_counts.sum()
    np.testing.assert_allclose(class_weights("vg", faithful=True), ref_w,
                               rtol=1e-6)
    # the corrected table differs (the typo'd one drops count 2380)
    assert not np.allclose(class_weights("vg"),
                           class_weights("vg", faithful=True))


def test_sgcls_top2_matches_reference_matcher(rng):
    """match_predicted_labels_top2 vs reference match_object_categories
    (utils.py:376-422).  Scenes are built so top-2 ties occur only
    between the two copies of a repeated detection box (the real
    pipeline's topk_cat=2 duplication, reference evaluate.py:313-315) —
    ties between DIFFERENT equal-IoU boxes hit torch.topk's unspecified
    ordering and are untestable."""
    b, n_gt, n_det = 2, 5, 10
    fs = 32
    gt = np.array([[0, 6, 0, 6], [8, 14, 0, 6], [16, 22, 0, 6],
                   [0, 6, 8, 14], [8, 14, 8, 14]], np.float64)
    # image 0: every det box is a GT box repeated twice -> tie path
    det0 = np.repeat(gt, 2, axis=0)
    # image 1: nested enlargements -> unique top-2 values (no tie)
    det1 = np.concatenate([gt + np.array([0, 1, 0, 1.0]),
                           gt + np.array([0, 2, 0, 2.0])])
    gt_boxes = [gt, gt]
    det_boxes = [det0, det1]
    det_cats = [rng.integers(0, 150, n_det) for _ in range(b)]
    det_conf = [rng.random(n_det).astype(np.float32) for _ in range(b)]

    ref_cats, ref_conf, ref_boxes = ref_utils.match_object_categories(
        [torch.from_numpy(c) for c in det_cats],
        [torch.from_numpy(c) for c in det_conf],
        [torch.from_numpy(d) for d in det_boxes],
        [torch.from_numpy(g) for g in gt_boxes])

    det = {"boxes": np.stack(det_boxes),
           "cats": np.stack(det_cats).astype(np.int32),
           "cat_conf": np.stack(det_conf).astype(np.float32),
           "valid": np.ones((b, n_det), bool)}
    cats2, conf2, boxes2, valid2 = match_predicted_labels_top2(
        det, np.stack(gt_boxes), np.ones((b, n_gt), bool), fs)

    for bi in range(b):
        ref_rows = sorted(
            (int(c), tuple(map(float, bx)), float(cf))
            for c, cf, bx in zip(ref_cats[bi], ref_conf[bi],
                                 ref_boxes[bi].numpy()))
        mine = sorted(
            (int(cats2[bi, k]), tuple(map(float, boxes2[bi, k])),
             float(conf2[bi, k]))
            for k in range(2 * n_gt) if valid2[bi, k])
        assert [r[:2] for r in mine] == [r[:2] for r in ref_rows]
        np.testing.assert_allclose([r[2] for r in mine],
                                   [r[2] for r in ref_rows], rtol=1e-5)
