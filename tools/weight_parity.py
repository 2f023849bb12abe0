"""Post-step WEIGHT parity against the LIVING reference training loop.

Closes VERDICT r3 missing #2: faithful mode already matches the
reference's per-term column sums, backward total, and dynamic-LR factor
(tests/test_faithful_dynamics.py) — but loss-value equality does not imply
gradient equality.  Here the SAME fabricated batches (identical feature
grids, depth, masks, categories, super-categories, targets) drive

  reference: the REAL BayesianRelationClassifier (f64) through a
             line-faithful replication of train_test.py:165-280 —
             per-column forward via the living train_one_direction
             (train_utils.py:21-120), triangular loss re-accumulation,
             the SupCon term with its double-lambda fold
             (train_test.py:262-272), dynamic LR mutation at
             train_test.py:192, losses.backward(), and a REAL
             torch.optim.SGD(momentum=0.9, weight_decay) step
             (train_test.py:100-101);
  ours:      the converted init through train.engine.make_train_step
             (faithful_dynamics=True, compute_dtype float64) with
             make_optimizer's matching SGD + coupled weight decay and the
             post-momentum lr_scale.

After EVERY step the reference's post-step state_dict is converted and
each parameter leaf is compared to ours (f64, atol 1e-8).  Two steps with
different per-image object counts exercise the momentum buffer and a
CHANGING dynamic-LR factor.  One deliberate deviation: the reference
model runs .eval() and our dropout_rate is 0 — dropout draws from
incomparable RNGs; every other training-dynamics surface is live.

Usage:  python tools/weight_parity.py [--steps 2] [--out WEIGHT_PARITY.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(ROOT, "tests")
for p in (ROOT, TESTS):
    if p not in sys.path:
        sys.path.insert(0, p)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

B, N, FS, C = 3, 5, 8, 256
LR, WD = 1e-3, 1e-4      # lr amplified (ref config 1e-5) so any gradient
                         # divergence dwarfs the 1e-8 tolerance
NG, NP, NS = 15, 11, 24


class _HashMembership:
    """Deterministic synthetic commonsense membership over (sub, rel, obj)
    triplets — the SAME predicate backs the reference side's `tuple in
    <set>` probes (any __contains__ works there, train_utils.py:55-56) and
    our dense bool tables, so both frameworks see one commonsense world
    without materializing 1.1M-tuple Python sets."""

    def __init__(self, kind: str):
        self.kind = kind

    @staticmethod
    def _bucket(s, r, o):
        return (int(s) * 1009 + int(r) * 2003 + int(o) * 3001) % 10

    def __contains__(self, t):
        s, r, o = t
        h = self._bucket(s, r, o)
        return h < 7 if self.kind == "aligned" else h == 9

    def dense_tables(self, num_classes=150, num_relations=50):
        tid = np.arange(num_classes * num_relations * num_classes)
        o = tid % num_classes
        r = (tid // num_classes) % num_relations
        s = tid // (num_classes * num_relations)
        h = (s * 1009 + r * 2003 + o * 3001) % 10
        return (h < 7) if self.kind == "aligned" else (h == 9)


def make_batches(steps: int, seed: int = 42):
    """Fabricated training batches: per-step feature grids + scenes.
    Object counts vary per step so lr_scale = sqrt(#images at max count/B)
    changes between steps (train_test.py:192)."""
    rng = np.random.default_rng(seed)
    n_pers = [[5, 3, 4], [4, 5, 2], [3, 5, 5], [5, 5, 3]]
    batches = []
    for s in range(steps):
        n_per = np.array(n_pers[s % len(n_pers)])
        feats = rng.standard_normal((B, C, FS, FS))
        feats_aug = rng.standard_normal((B, C, FS, FS))
        depth = rng.random((B, 1, FS, FS))
        boxes = np.zeros((B, N, 4), np.int64)       # [x_lo, x_hi, y_lo, y_hi]
        cats = rng.integers(0, 150, (B, N))
        sup = [[sorted(rng.choice(17, rng.integers(1, 4), replace=False))
                for _ in range(N)] for _ in range(B)]
        rel_t = np.full((B, N, N), -1, np.int64)
        for bi in range(B):
            for oi in range(N):
                x0 = rng.integers(0, FS - 2)
                y0 = rng.integers(0, FS - 2)
                boxes[bi, oi] = [x0, rng.integers(x0 + 2, FS + 1),
                                 y0, rng.integers(y0 + 2, FS + 1)]
            for i in range(1, int(n_per[bi])):
                for j in range(i):
                    if rng.random() < 0.7:
                        r = int(rng.integers(0, 50))
                        if rng.random() < 0.5:
                            rel_t[bi, i, j] = r
                        else:
                            rel_t[bi, j, i] = r
        batches.append(dict(n_per=n_per, feats=feats, feats_aug=feats_aug,
                            depth=depth, boxes=boxes, cats=cats, sup=sup,
                            rel_t=rel_t))
    return batches


# ---------------------------------------------------------------------------
# Reference side
# ---------------------------------------------------------------------------

def run_reference(batches, decay_at: int = 0, train_cs: bool = False):
    """The living loop: train_test.py:165-280 with fabricated features in
    place of process_image_features (the frozen-DETR encode is not under
    test here; its f64 parity is proven in tests/test_detr_torch_parity).

    decay_at > 0 treats each batch as one reference epoch and crosses the
    LR-step boundary before batch index `decay_at` (lr_decay *= 0.1,
    train_test.py:138-139).  train_cs runs the living commonsense penalty
    (train_utils.py:36-60) against the _HashMembership world."""
    import torch
    from reference_shim import import_reference, reference_args
    ref_model, _ = import_reference()
    import train_utils as ref_train_utils
    import utils as ref_utils
    from sup_contrast.losses import SupConLossHierar

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        args = reference_args()
        args["models"]["feature_size"] = FS
        args["models"]["image_size"] = FS * 32
        args["training"].update({"eval_freq": 10 ** 9,
                                 "learning_rate": LR,
                                 "weight_decay": WD,
                                 "lambda_connectivity": 0.1,
                                 "lambda_not_connected": 1.0,
                                 "lambda_commonsense": 1.0,
                                 "lambda_cs_weak": 0.1,
                                 "lambda_cs_strong": 10.0,
                                 # != 1 so the double-lambda fold
                                 # (train_test.py:268-272) is visible
                                 "lambda_contrast": 0.7})
        torch.manual_seed(5)
        model = ref_model.BayesianRelationClassifier(
            args, input_dim=128, feature_size=FS).double()
        model.eval()                    # dropout off (see module docstring)
        init_state = {k: v.clone() for k, v in model.state_dict().items()}

        optimizer = torch.optim.SGD(
            [{"params": model.parameters(), "initial_lr": LR}],
            lr=LR, momentum=0.9, weight_decay=WD)
        original_lr = optimizer.param_groups[0]["lr"]
        lr_decay = 1                                 # train_test.py:135
        if train_cs:
            args["training"]["run_mode"] = "train_cs"
        cs_a = _HashMembership("aligned")
        cs_v = _HashMembership("violated")

        relation_count = ref_utils.get_num_each_class_reordered(args)
        cw = (1 - relation_count / torch.sum(relation_count)).double()
        crit_rel = [torch.nn.NLLLoss(weight=cw[:NG]),
                    torch.nn.NLLLoss(weight=cw[NG:NG + NP]),
                    torch.nn.NLLLoss(weight=cw[NG + NP:]),
                    torch.nn.NLLLoss()]
        crit_conn = torch.nn.BCEWithLogitsLoss()
        crit_contrast = SupConLossHierar()

        post_step_states = []
        for si, bdata in enumerate(batches):
            if decay_at and si == decay_at:
                lr_decay *= 0.1                      # train_test.py:138-139
            n_per = bdata["n_per"]
            feats = torch.from_numpy(bdata["feats"])
            feats_aug = torch.from_numpy(bdata["feats_aug"])
            depth = torch.from_numpy(bdata["depth"])

            # masks exactly as train_test.py:196-201 (bbox already in
            # feature-grid coords, [x_lo, x_hi, y_lo, y_hi])
            masks, bbox, categories, super_categories = [], [], [], []
            for i in range(B):
                n = int(n_per[i])
                bx = torch.from_numpy(bdata["boxes"][i, :n])
                m = torch.zeros(n, FS, FS, dtype=torch.bool)
                for j in range(n):
                    m[j, int(bx[j][2]):int(bx[j][3]),
                      int(bx[j][0]):int(bx[j][1])] = 1
                masks.append(m)
                bbox.append(bx.double())
                categories.append(torch.from_numpy(bdata["cats"][i, :n]))
                super_categories.append(
                    [torch.as_tensor(s) for s in bdata["sup"][i][:n]])

            # reference-format lower-triangular targets
            # (train_test.py:176-186)
            relationships, subj_or_obj = [], []
            for bi in range(B):
                rows, drows = [], []
                for i in range(1, int(n_per[bi])):
                    row = np.full(i, -1, np.int64)
                    direction = np.full(i, -1.0)
                    for j in range(i):
                        if bdata["rel_t"][bi, i, j] >= 0:
                            row[j] = bdata["rel_t"][bi, i, j]
                            direction[j] = 1.0
                        elif bdata["rel_t"][bi, j, i] >= 0:
                            row[j] = bdata["rel_t"][bi, j, i]
                            direction[j] = 0.0
                    rows.append(torch.from_numpy(row))
                    drows.append(torch.from_numpy(direction))
                relationships.append(rows)
                subj_or_obj.append(drows)

            num_graph_iter = torch.as_tensor([len(m) for m in masks]) - 1
            relations_target, direction_target = [], []
            for g in range(int(num_graph_iter.max())):
                keep = torch.nonzero(num_graph_iter > g).view(-1)
                relations_target.append(torch.vstack(
                    [relationships[i][g] for i in keep]).T)
                direction_target.append(torch.vstack(
                    [subj_or_obj[i][g] for i in keep]).T)

            hidden_cat_accumulated = [[] for _ in range(B)]
            hidden_cat_labels_accumulated = [[] for _ in range(B)]
            losses, loss_connectivity, loss_relationship = 0.0, 0.0, 0.0
            loss_contrast, loss_commonsense = 0.0, 0.0

            num_graph_iter = torch.as_tensor([len(m) for m in masks])
            for graph_iter in range(int(num_graph_iter.max())):
                keep_in_batch = torch.nonzero(
                    num_graph_iter > graph_iter).view(-1)
                optimizer.param_groups[0]["lr"] = \
                    original_lr * lr_decay \
                    * math.sqrt(len(keep_in_batch) / len(num_graph_iter))

                curr_graph_masks = torch.stack(
                    [torch.unsqueeze(masks[i][graph_iter], dim=0)
                     for i in keep_in_batch])
                h_graph = torch.cat(
                    (feats[keep_in_batch] * curr_graph_masks,
                     depth[keep_in_batch] * curr_graph_masks), dim=1)
                h_graph_aug = torch.cat(
                    (feats_aug[keep_in_batch] * curr_graph_masks,
                     depth[keep_in_batch] * curr_graph_masks), dim=1)
                cat_graph = torch.tensor(
                    [torch.unsqueeze(categories[i][graph_iter], dim=0)
                     for i in keep_in_batch])
                spcat_graph = [super_categories[i][graph_iter]
                               for i in keep_in_batch]
                bbox_graph = torch.stack(
                    [bbox[i][graph_iter] for i in keep_in_batch])

                for edge_iter in range(graph_iter):
                    curr_edge_masks = torch.stack(
                        [torch.unsqueeze(masks[i][edge_iter], dim=0)
                         for i in keep_in_batch])
                    h_edge = torch.cat(
                        (feats[keep_in_batch] * curr_edge_masks,
                         depth[keep_in_batch] * curr_edge_masks), dim=1)
                    h_edge_aug = torch.cat(
                        (feats_aug[keep_in_batch] * curr_edge_masks,
                         depth[keep_in_batch] * curr_edge_masks), dim=1)
                    cat_edge = torch.tensor(
                        [torch.unsqueeze(categories[i][edge_iter], dim=0)
                         for i in keep_in_batch])
                    spcat_edge = [super_categories[i][edge_iter]
                                  for i in keep_in_batch]
                    bbox_edge = torch.stack(
                        [bbox[i][edge_iter] for i in keep_in_batch])
                    iou_mask = torch.ones(len(keep_in_batch),
                                          dtype=torch.bool)

                    for first, hs, ho, cs_, co, ss, so, bs, bo, hsa, hoa \
                            in ((True, h_graph, h_edge, cat_graph,
                                 cat_edge, spcat_graph, spcat_edge,
                                 bbox_graph, bbox_edge, h_graph_aug,
                                 h_edge_aug),
                                (False, h_edge, h_graph, cat_edge,
                                 cat_graph, spcat_edge, spcat_graph,
                                 bbox_edge, bbox_graph, h_edge_aug,
                                 h_graph_aug)):
                        (curr_loss_relationship, curr_loss_connectivity,
                         curr_loss_commonsense, *_rest,
                         hidden_cat_accumulated,
                         hidden_cat_labels_accumulated) = \
                            ref_train_utils.train_one_direction(
                                model, args, hs, ho, cs_, co, ss, so,
                                bs, bo, hsa, hoa, iou_mask, "cpu",
                                graph_iter, edge_iter, keep_in_batch,
                                None, None, crit_rel, crit_conn,
                                relations_target, direction_target, 1,
                                hidden_cat_accumulated,
                                hidden_cat_labels_accumulated,
                                cs_a, cs_v, 10 ** 9,
                                first_direction=first)
                        loss_relationship += curr_loss_relationship
                        loss_connectivity += curr_loss_connectivity
                        loss_commonsense += curr_loss_commonsense
                        losses += loss_relationship \
                            + args["training"]["lambda_connectivity"] \
                            * loss_connectivity \
                            + args["training"]["lambda_commonsense"] \
                            * loss_commonsense

            # contrastive tail, train_test.py:262-272 (lambda folded twice)
            if not all(len(s) == 0 for s in hidden_cat_accumulated):
                hc = [torch.stack(s) for s in hidden_cat_accumulated
                      if len(s) > 0]
                hcl = [torch.stack(s) for s in
                       hidden_cat_labels_accumulated if len(s) > 0]
                temp = crit_contrast("cpu", torch.cat(hc, dim=0),
                                     torch.cat(hcl, dim=0))
                loss_contrast += 0.0 if torch.isnan(temp) \
                    else args["training"]["lambda_contrast"] * temp
            losses += args["training"]["lambda_contrast"] * loss_contrast

            optimizer.zero_grad()
            losses.backward()
            optimizer.step()
            post_step_states.append(
                {k: v.detach().clone().numpy()
                 for k, v in model.state_dict().items()})
        return init_state, post_step_states
    finally:
        torch.set_default_dtype(prev)


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------

def run_ours(init_state, batches, decay_at: int = 0,
             train_cs: bool = False):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.constants import class_weights
    from scene_graph_commonsense_tpu.data.artifacts import super_multi_hot
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.models.weights import (
        convert_relation_state_dict)
    from scene_graph_commonsense_tpu.train import engine

    cfg = derive(
        "vg", hierarchical_pred=True, run_mode="train",
        model={"feature_size": FS, "image_size": FS * 32,
               "hidden_dim": 128, "num_img_feature": C,
               "compute_dtype": "float64", "dropout_rate": 0.0,
               "fused_backbone": "off"},
        data={"max_objects": N},
        training={"batch_size": B, "faithful_dynamics": True,
                  "learning_rate": LR, "weight_decay": WD,
                  "lambda_contrast": 0.7,
                  "aug_pair_capacity": B * N * (N - 1)})

    with jax.enable_x64(True):
        model = make_relation_classifier(cfg)
        params = convert_relation_state_dict(
            {k: np.asarray(v, np.float64) for k, v in init_state.items()},
            hierarchical=True, hidden_dim=128, feature_size=FS)
        cs_tables = None
        if train_cs:
            cs_tables = (_HashMembership("aligned").dense_tables(),
                         _HashMembership("violated").dense_tables())
        opt = engine.make_optimizer(LR, momentum=0.9, weight_decay=WD,
                                    momentum_dtype="float64")
        state = engine.TrainState(params, opt.init(params), jnp.int32(0))
        step = engine.make_train_step(
            model, cfg, opt, class_weights("vg", faithful=True),
            cs_tables=cs_tables, donate=False, use_pallas_pool=False)
        step_decayed = None
        if decay_at:
            # the SGD momentum trace is lr-independent on both sides
            # (torch applies lr at the update, our chain scales after
            # trace), so the post-boundary step can reuse the optimizer
            # state under a 0.1x optimizer
            opt_d = engine.make_optimizer(LR * 0.1, momentum=0.9,
                                          weight_decay=WD,
                                          momentum_dtype="float64")
            step_decayed = engine.make_train_step(
                model, cfg, opt_d, class_weights("vg", faithful=True),
                cs_tables=cs_tables, donate=False, use_pallas_pool=False)

        post = []
        for si, bdata in enumerate(batches):
            run_step = step_decayed if (decay_at and si >= decay_at) \
                else step
            valid = np.arange(N)[None] < bdata["n_per"][:, None]
            sup_mh = np.stack([
                super_multi_hot(bdata["sup"][i], num_super=17)
                for i in range(B)]).astype(np.float64)
            batch = {
                "features": jnp.asarray(
                    bdata["feats"].transpose(0, 2, 3, 1)),
                "features_aug": jnp.asarray(
                    bdata["feats_aug"].transpose(0, 2, 3, 1)),
                "depth": jnp.asarray(bdata["depth"].transpose(0, 2, 3, 1)),
                "cats": jnp.asarray(bdata["cats"].astype(np.int32)),
                "super_mh": jnp.asarray(sup_mh),
                "boxes": jnp.asarray(bdata["boxes"].astype(np.float64)),
                "rel": jnp.asarray(bdata["rel_t"].astype(np.int32)),
                "valid": jnp.asarray(valid),
            }
            state, metrics = run_step(state, batch, jax.random.PRNGKey(0))
            post.append(jax.tree.map(np.asarray, state.params))
        return post


def compare(init_state, ref_states, our_states):
    from scene_graph_commonsense_tpu.models.weights import (
        convert_relation_state_dict)
    import jax

    def convert(sd):
        return convert_relation_state_dict(
            {k: np.asarray(v, np.float64) for k, v in sd.items()},
            hierarchical=True, hidden_dim=128, feature_size=FS)

    def max_delta(a_tree, b_tree):
        return max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a)
                                             - np.asarray(b)))),
            a_tree, b_tree)))

    init_params = convert(init_state)
    results = []
    for s, (rs, os_) in enumerate(zip(ref_states, our_states)):
        results.append({
            "step": s + 1,
            "max_abs_delta": max_delta(convert(rs), os_),
            # how far the weights travelled from init — the scale any
            # divergence must be judged against
            "weights_moved_by": max_delta(init_params, os_),
        })
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--decay-at", type=int, default=0,
                    help="treat batches as epochs and cross the 0.1x LR "
                         "boundary before this batch index "
                         "(train_test.py:138-139); 0 = no decay")
    ap.add_argument("--train-cs", action="store_true",
                    help="run_mode train_cs: the commonsense penalty "
                         "(train_utils.py:36-60) live in both backwards")
    ap.add_argument("--name", default=None,
                    help="config key in the merged record (derived from "
                         "the knobs when omitted)")
    ap.add_argument("--atol", type=float, default=1e-8)
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "WEIGHT_PARITY.json"))
    args = ap.parse_args(argv)
    name = args.name or "steps{}_seed{}{}{}".format(
        args.steps, args.seed,
        f"_decay@{args.decay_at}" if args.decay_at else "",
        "_train_cs" if args.train_cs else "")

    t0 = time.time()
    batches = make_batches(args.steps, seed=args.seed)
    init_state, ref_states = run_reference(batches, decay_at=args.decay_at,
                                           train_cs=args.train_cs)
    our_states = run_ours(init_state, batches, decay_at=args.decay_at,
                          train_cs=args.train_cs)
    results = compare(init_state, ref_states, our_states)
    ok = all(r["max_abs_delta"] <= args.atol for r in results)
    record = {
        "verdict": "equal" if ok else "DIVERGED",
        "atol": args.atol, "steps": results,
        "config": {"steps": args.steps, "seed": args.seed,
                   "lr_decay_boundary_before_step": args.decay_at,
                   "train_cs": args.train_cs},
        "geometry": {"batch": B, "max_objects": N, "feature_size": FS,
                     "hidden_dim": 128, "num_img_feature": C,
                     "lr": LR, "weight_decay": WD, "momentum": 0.9},
        "wall_seconds": round(time.time() - t0, 1),
    }
    # merge into the multi-config record (one file, keyed by config)
    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = json.load(f)
        if "configs" in old:
            merged = old["configs"]
        elif "steps" in old:
            old.pop("notes", None)
            merged["r4_steps2_seed42"] = old
    merged[name] = record
    out_doc = {
        "what": "post-step WEIGHT parity vs the LIVING reference "
                "training loop (tools/weight_parity.py), one entry per "
                "config",
        "notes": "reference model .eval() / our dropout_rate=0 "
                 "(incomparable dropout RNGs); every other training "
                 "surface live — forward, triangular re-accumulation, "
                 "SupCon with double-lambda fold, dynamic LR, LR-step "
                 "decay, the train_cs commonsense penalty, "
                 "SGD momentum+coupled weight decay",
        "all_equal": all(c.get("verdict") == "equal"
                         for c in merged.values()),
        "configs": merged,
    }
    with open(args.out, "w") as f:
        json.dump(out_doc, f, indent=1)
    for r in results:
        print(f"step {r['step']}: max|delta|={r['max_abs_delta']:.3e} "
              f"(weights moved {r['weights_moved_by']:.3e})")
    print(f"[{name}] verdict: {record['verdict']} -> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
