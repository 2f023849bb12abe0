"""End-to-end engine for the plug-and-play predictor families.

Makes BASELINE config 5 ("Motifs / VCTree + HIERCOM heads") runnable in
this framework rather than library-only: a HierarchicalPredictor (Motifs /
Transformer / VCTree context, models/predictors.py) trains and evaluates on
the same fixed-shape batch contract as the flagship relation head (see
train.engine), with per-object features mask-pooled from the frozen
detector feature map — the TPU stand-in for SGB's ROIAlign box features.

Pairs are the full N x N directed grid per image (diagonal and padding
masked), so every shape is static and the same recall evaluator
(eval.recall.Evaluator) scores the outputs.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scene_graph_commonsense_tpu.models.predictors import (
    HierarchicalPredictor)
from scene_graph_commonsense_tpu.ops import boxes as box_ops
from scene_graph_commonsense_tpu.ops import pairs as pair_ops
from scene_graph_commonsense_tpu.train import losses as L
from scene_graph_commonsense_tpu.train.engine import TrainState


def roi_pool_features(features: jnp.ndarray, boxes: jnp.ndarray,
                      valid: jnp.ndarray) -> jnp.ndarray:
    """Mask-average-pool the (B, S, S, C) feature map per object box ->
    (B, N, C).  Static-shape equivalent of per-box ROI pooling."""
    s = features.shape[1]
    masks = box_ops.boxes_to_masks(boxes, s, features.dtype)   # (B, N, S, S)
    masks = masks * valid[:, :, None, None].astype(masks.dtype)
    area = jnp.maximum(masks.sum(axis=(2, 3)), 1.0)
    pooled = jnp.einsum("bnhw,bhwc->bnc", masks, features)
    return pooled / area[..., None]


def union_pool_features(features: jnp.ndarray, boxes: jnp.ndarray,
                        pair_sub: jnp.ndarray, pair_obj: jnp.ndarray
                        ) -> jnp.ndarray:
    """(B, P, C) features mask-pooled over each pair's union box."""
    s = features.shape[1]
    take = jax.vmap(lambda b, i: b[i])
    bs = take(boxes, pair_sub)
    bo = take(boxes, pair_obj)
    union = jax.vmap(jax.vmap(box_ops.union_box))(bs, bo)      # (B, P, 4)
    masks = box_ops.boxes_to_masks(union, s, features.dtype)
    area = jnp.maximum(masks.sum(axis=(2, 3)), 1.0)
    pooled = jnp.einsum("bphw,bhwc->bpc", masks, features)
    return pooled / area[..., None]


def grid_pairs(b: int, n: int):
    """All N*N directed (sub, obj) slot pairs per image, row-major — the
    same order as the rel grid flattens to."""
    sub = jnp.repeat(jnp.arange(n, dtype=jnp.int32), n)
    obj = jnp.tile(jnp.arange(n, dtype=jnp.int32), n)
    return (jnp.broadcast_to(sub, (b, n * n)),
            jnp.broadcast_to(obj, (b, n * n)))


def _forward(predictor, params, batch, deterministic=True, rng=None,
             with_intermediates=False, counterfactual=False):
    b, n = batch["cats"].shape
    feats = roi_pool_features(batch["features"], batch["boxes"],
                              batch["valid"])
    pair_sub, pair_obj = grid_pairs(b, n)
    pair_mask = pair_ops.pair_validity(batch["valid"]).reshape(b, n * n)
    union = union_pool_features(batch["features"], batch["boxes"],
                                pair_sub, pair_obj)
    if counterfactual:
        # TDE intervention (Tang et al. 2020): wipe the *visual* input by
        # replacing every object/union feature with the mean feature while
        # keeping labels and boxes — the context/bias path is untouched.
        # Deviation: the mean is the batch's masked mean rather than a
        # training-set running mean (no extra state to carry).
        v = batch["valid"].astype(feats.dtype)
        feats = jnp.broadcast_to(
            (feats * v[..., None]).sum((0, 1))
            / jnp.maximum(v.sum(), 1.0), feats.shape)
        pm = pair_mask.astype(union.dtype)
        union = jnp.broadcast_to(
            (union * pm[..., None]).sum((0, 1))
            / jnp.maximum(pm.sum(), 1.0), union.shape)
    out = predictor.apply(
        params, feats, batch["boxes"], batch["cats"], batch["valid"],
        pair_sub, pair_obj, pair_mask, union,
        rngs={"dropout": rng} if rng is not None else None,
        mutable=["intermediates"] if with_intermediates else False)
    if with_intermediates:
        out, inter = out
        out = dict(out)
        scores = inter.get("intermediates", {}).get(
            "context", {}).get("pair_scores")
        if scores is not None:
            out["structure_scores"] = scores[0]
    img = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n * n)
    out["pair_img"] = img
    out["pair_sub"] = pair_sub.reshape(-1)
    out["pair_obj"] = pair_obj.reshape(-1)
    out["targets"] = jnp.where(out["pair_mask"],
                               batch["rel"].reshape(-1), -1)
    return out


def make_pnp_train_step(predictor: HierarchicalPredictor, cfg, optimizer,
                        cs_tables=None, mesh=None):
    """Jitted train step: hierarchical relation NLL + connectivity BCE
    (+ object-decode CE outside predcls mode; + the commonsense penalty
    over LLM-validated triplet tables when cs_tables is given — the same
    train_cs composition the reference applies to its base model,
    reference train_utils.py:36-60, here available to every plug-and-play
    family).

    With a mesh, the batch is 'data'-sharded and state replicated via
    GSPMD; the partitioner inserts the gradient all-reduce (the reference
    runs every plug-and-play family under DDP too, reference
    main.py:103-123)."""
    tc = cfg.training

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = _forward(predictor, params, batch, deterministic=False,
                           rng=rng,
                           with_intermediates=predictor.family == "vctree")
            targets = out["targets"]
            valid_p = out["pair_mask"]
            connected = (targets >= 0) & valid_p
            loss_rel = L.relation_loss(
                out["relation"], out["super_relation"], targets, connected,
                jnp.ones(out["relation"].shape[1], jnp.float32),
                cfg.model.num_geometric, cfg.model.num_possessive,
                hierarchical=True)
            conn = L.connectivity_loss(out["connectivity"], connected,
                                       valid_p, tc.lambda_not_connected)
            loss = loss_rel + tc.lambda_connectivity * conn.loss
            if "structure_scores" in out:
                # VCTree supervised structure loss (the differentiable half
                # of the hybrid learning): pair scores -> GT relatedness in
                # either direction; without it Prim's argmax leaves the
                # score/rootness parameters gradient-free
                s = out["structure_scores"].astype(jnp.float32)
                rel = batch["rel"]
                related = (rel >= 0) | (rel.transpose(0, 2, 1) >= 0)
                b_, n_ = batch["cats"].shape
                vp = (batch["valid"][:, :, None]
                      & batch["valid"][:, None, :]
                      & ~jnp.eye(n_, dtype=bool)[None])
                bce = jnp.where(related, jax.nn.softplus(-s),
                                jax.nn.softplus(s))
                loss_struct = (jnp.sum(bce * vp)
                               / jnp.maximum(jnp.sum(vp), 1))
                loss = loss + loss_struct
                extra = {"loss_structure": loss_struct}
            else:
                extra = {}
            if predictor.mode != "predcls":
                lab = jax.nn.log_softmax(out["obj_logits"])
                v = batch["valid"]
                nll = -jnp.take_along_axis(
                    lab, batch["cats"][..., None], axis=-1)[..., 0]
                loss_obj = jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1)
                loss = loss + loss_obj
            loss_cs = jnp.float32(0.0)
            if cs_tables is not None:
                b_, n_ = batch["cats"].shape
                flat_cats = batch["cats"].reshape(b_ * n_)
                img = out["pair_img"]
                loss_cs = L.commonsense_loss(
                    out["relation"],
                    flat_cats[img * n_ + out["pair_sub"]],
                    flat_cats[img * n_ + out["pair_obj"]],
                    valid_p, cs_tables[0], cs_tables[1],
                    cfg.model.num_geometric, cfg.model.num_possessive,
                    cfg.model.num_classes, tc.lambda_cs_weak,
                    tc.lambda_cs_strong, hierarchical=True)
                loss = loss + tc.lambda_commonsense * loss_cs
            metrics = {"loss": loss, "loss_relationship": loss_rel,
                       "loss_connectivity": conn.loss,
                       "loss_commonsense": loss_cs, **extra}
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec
    repl = NamedSharding(mesh, PartitionSpec())
    data_sh = NamedSharding(mesh, PartitionSpec("data"))
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(repl, data_sh, repl),
                   out_shardings=(repl, repl))


def make_pnp_eval_step(predictor: HierarchicalPredictor, cfg,
                       tde: bool = False, mesh=None):
    """With tde=True the step scores each pair by Total Direct Effect
    (Tang et al. 2020, "Unbiased Scene Graph Generation from Biased
    Training" — the +TDE rows of reference README_PLUGANDPLAY.md:181-188):
    relation/super scores become factual − counterfactual, where the
    counterfactual forward sees mean visual features (labels and boxes
    intact).  The outputs are ranking scores, not log-probs — exactly how
    TDE is consumed downstream in SGB.

    With a mesh, batches/outputs are 'data'-sharded via GSPMD (batch must
    divide the axis).  TDE's batch-mean counterfactual stays a GLOBAL
    mean — the partitioner inserts the cross-shard reduction — so sharded
    results equal single-device results exactly."""
    def step(params, batch):
        out = _forward(predictor, params, batch, deterministic=True)
        if tde:
            out_cf = _forward(predictor, params, batch, deterministic=True,
                              counterfactual=True)
            out = dict(out)
            for k in ("relation", "super_relation"):
                out[k] = out[k] - out_cf[k]
        b, n = batch["cats"].shape
        s = batch["features"].shape[1]
        iou_ok = (pair_ops.eval_pair_filter(batch["boxes"], s)
                  .reshape(b * n * n) & out["pair_mask"])
        out["iou_ok"] = iou_ok
        return {k: out[k] for k in
                ("relation", "super_relation", "connectivity", "targets",
                 "pair_img", "pair_sub", "pair_obj", "pair_mask",
                 "iou_ok")}

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec
    data_sh = NamedSharding(mesh, PartitionSpec("data"))
    return jax.jit(step, in_shardings=(NamedSharding(
        mesh, PartitionSpec()), data_sh), out_shardings=data_sh)


def init_predictor_params(cfg, predictor: HierarchicalPredictor,
                          feature_dim: Optional[int] = None,
                          log_fn=print):
    n = cfg.data.max_objects
    d = feature_dim or cfg.model.num_img_feature
    z = jnp.zeros
    params = predictor.init(
        jax.random.PRNGKey(cfg.training.seed),
        z((1, n, d)), z((1, n, 4)), z((1, n), jnp.int32),
        jnp.ones((1, n), bool), z((1, n * n), jnp.int32),
        z((1, n * n), jnp.int32), jnp.ones((1, n * n), bool),
        z((1, n * n, d)))
    return apply_glove_init(cfg, params, log_fn=log_fn)


def apply_glove_init(cfg, params, log_fn=print):
    """GloVe label-embedding init for the context models (the reference's
    SGB graft targets initialize from GloVe vectors, reference
    README_PLUGANDPLAY.md:56-69).  When cfg.model.glove_embeddings points
    at a table built by tools/glove_embeddings.py, every `label_embed`
    embedding in the tree gets its resolved class rows replaced (the +1
    padding row and unresolved names keep the learned init).  Documented
    fallback: absent file -> learned init, with a log line."""
    import os

    path = getattr(cfg.model, "glove_embeddings", "")
    if not path:
        return params
    if not os.path.exists(path):
        # committed stand-in: the real GloVe txt is not downloadable in
        # every environment (this build's has zero egress — CAPABILITIES
        # 'environment-blocked'), so tools/glove_embeddings.py --synthetic
        # writes a deterministic name-hash table next to the real name;
        # prefer the real table whenever it exists.
        synth = path[:-len(".npz")] + ".synthetic.npz" \
            if path.endswith(".npz") else ""
        if synth and os.path.exists(synth):
            path = synth
        else:
            log_fn(f"glove_embeddings: {path} not found — context label "
                   f"embeddings keep their learned init (build the table "
                   f"with tools/glove_embeddings.py)")
            return params
    import numpy as np
    with np.load(path) as npz:
        vecs, found = npz["vectors"], npz["found"]
        source = str(npz["source"]) if "source" in npz else "glove"

    import flax
    flat = flax.traverse_util.flatten_dict(params)
    hit = False
    for key in list(flat):
        if key[-2] == "label_embed" and key[-1] == "embedding":
            tab = np.array(flat[key])       # writable copy
            if tab.shape[1] != vecs.shape[1]:
                raise ValueError(
                    f"glove_embeddings dim {vecs.shape[1]} != embed_dim "
                    f"{tab.shape[1]} at {'/'.join(key)}; rebuild the "
                    f"table with a matching GloVe dim")
            rows = np.nonzero(found[:tab.shape[0]])[0]
            tab[rows] = vecs[rows]
            flat[key] = jnp.asarray(tab, dtype=flat[key].dtype)
            hit = True
    if hit:
        log_fn(f"Initialized context label embeddings from {path} "
               f"(source={source}, {int(found.sum())}/{len(found)} "
               f"classes)")
        return flax.traverse_util.unflatten_dict(flat)
    return params


def make_predictor(cfg, family: str) -> HierarchicalPredictor:
    mode = {"pc": "predcls", "sgc": "sgcls", "sgd": "sgdet"}[
        cfg.training.eval_mode]
    return HierarchicalPredictor(
        family=family, num_classes=cfg.model.num_classes,
        num_geometric=cfg.model.num_geometric,
        num_possessive=cfg.model.num_possessive,
        num_semantic=cfg.model.num_semantic, mode=mode,
        box_scale=float(cfg.model.feature_size))


def checkpoint_name(family: str, cluster: str, epoch: int,
                    run_mode: str = "train") -> str:
    """Pnp{Family}Model[_CS]_{cluster}{epoch} — the pnp analogue of the
    flagship checkpoint naming (train.checkpoint.checkpoint_name); train_cs
    runs get the same _CS marker the flagship uses."""
    cs = "_CS" if run_mode in ("train_cs", "eval_cs") else ""
    return f"Pnp{family.capitalize()}Model{cs}_{cluster}{epoch}"


def fit_predictor(cfg, family: str,
                  train_batches_fn, test_batches_fn=None,
                  artifacts=None, featurize=None, steps_per_epoch=1000,
                  log_fn=print):
    """Training driver for a plug-and-play predictor family; mirrors
    train.loop.fit's orchestration (per-epoch loop + truncated test +
    per-epoch checkpoint).  Optimizer knobs come from cfg.training like
    the flagship loop; grad_clip_norm 0 falls back to 5.0 here because
    the freshly initialized context models spike early (documented
    deviation from the reference's unclipped SGD)."""
    import os

    from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib
    from scene_graph_commonsense_tpu.train import engine
    from scene_graph_commonsense_tpu.train.loop import lr_schedule

    tc = cfg.training
    predictor = make_predictor(cfg, family)
    params = init_predictor_params(cfg, predictor)
    cs_tables = None
    if tc.run_mode == "train_cs":
        if artifacts is None or artifacts.cs_aligned is None:
            raise ValueError("train_cs requires converted commonsense "
                             "triplet tables (run prepare_cs first)")
        cs_tables = (jnp.asarray(artifacts.cs_aligned),
                     jnp.asarray(artifacts.cs_violated))
        # the CS run continues from the baseline predictor when one exists
        # (the reference's train_cs resumes its baseline checkpoint,
        # reference train_test.py:83-94)
        base = os.path.join(tc.checkpoint_path, checkpoint_name(
            family, cfg.data.supcat_clustering, tc.num_epoch - 1))
        if os.path.exists(base):
            params = ckpt_lib.restore(base, params)
            log_fn(f"[pnp:{family}] resumed baseline weights from {base}")
    opt = engine.make_optimizer(lr_schedule(cfg, steps_per_epoch),
                                momentum=tc.momentum,
                                weight_decay=tc.weight_decay,
                                grad_clip_norm=tc.grad_clip_norm or 5.0)
    step = make_pnp_train_step(predictor, cfg, opt, cs_tables=cs_tables)
    estep = make_pnp_eval_step(predictor, cfg)
    state = TrainState(params, opt.init(params), jnp.int32(0))
    rng = jax.random.PRNGKey(tc.seed)

    for epoch in range(tc.start_epoch, tc.num_epoch):
        log_fn(f"[pnp:{family}] Start Training... EPOCH {epoch} / "
               f"{tc.num_epoch}")
        for i, batch in enumerate(train_batches_fn(epoch)):
            batch = dict(batch)
            # drop the augmented view BEFORE featurize: the pnp loss never
            # consumes it, and encoding it would waste a full frozen-DETR
            # forward per batch
            batch.pop("image_aug", None)
            batch.pop("features_aug", None)
            if featurize is not None:
                batch = featurize(batch)
            batch.pop("annot_path", None)
            state, metrics = step(state, batch, rng)
            if i % tc.print_freq == 0:
                m = jax.tree.map(float, metrics)
                log_fn(f"[pnp:{family}] epoch {epoch} batch {i} " +
                       " ".join(f"{k}={v:.4f}" for k, v in m.items()))
        path = os.path.join(tc.checkpoint_path, checkpoint_name(
            family, cfg.data.supcat_clustering, epoch, tc.run_mode))
        ckpt_lib.save(path, jax.device_get(state.params))
        log_fn(f"[pnp:{family}] Saved checkpoint {path}")
        if test_batches_fn is not None:
            res = run_eval_pc_predictor(
                cfg, predictor, state.params,
                map(_strip, test_batches_fn(epoch)), artifacts=artifacts,
                featurize=featurize,
                max_batches=100 if epoch < 2 else None, estep=estep)
            log_fn(f"[pnp:{family}] TEST epoch {epoch} "
                   f"R@k: {res['recall']} mR@k: {res['mean_recall']}")
    return predictor, state


def _strip(batch):
    batch = dict(batch)
    batch.pop("annot_path", None)
    batch.pop("image_aug", None)      # before featurize: unused by pnp
    batch.pop("features_aug", None)
    return batch


def run_eval_pc_predictor(cfg, predictor, params,
                          batches: Iterable[Dict], artifacts=None,
                          featurize=None, max_batches=None, use_cs=False,
                          estep=None, tde=False, mesh=None):
    """PredCLS evaluation of a predictor family with the standard
    vectorized Recall@k evaluator.  use_cs applies the commonsense
    triplet filtering (eval_cs) through the same dense tables as the
    flagship engine; tde scores pairs by Total Direct Effect (see
    make_pnp_eval_step).  Pass a prebuilt `estep` to reuse its jit cache
    across calls (fit_predictor does, once per run)."""
    from scene_graph_commonsense_tpu.eval.builders import (
        build_candidates, build_targets)
    from scene_graph_commonsense_tpu.eval.engines import _make_evaluators

    evaluator, _ = _make_evaluators(cfg, artifacts, predcls=True)
    if estep is None:
        estep = make_pnp_eval_step(predictor, cfg, tde=tde, mesh=mesh)
    if mesh is not None:
        # commit params to the replicated layout ONCE; otherwise every
        # batch's jit call re-broadcasts the whole weight tree to match
        # its in_shardings
        from jax.sharding import NamedSharding, PartitionSpec
        params = jax.device_put(params,
                                NamedSharding(mesh, PartitionSpec()))
    cs_a = cs_v = None
    if use_cs:
        if artifacts is None or artifacts.cs_aligned is None:
            raise ValueError("eval_cs requires converted commonsense "
                             "triplet tables (run prepare_cs first)")
        cs_a, cs_v = artifacts.cs_aligned, artifacts.cs_violated
    m = cfg.model
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        batch = _strip(batch)
        if featurize is not None:
            batch = featurize(batch)
        out = jax.tree.map(np.asarray, estep(params, batch))
        cand = build_candidates(
            out["relation"], out["connectivity"], out["super_relation"],
            out["pair_img"], out["pair_sub"], out["pair_obj"],
            out["pair_mask"], out["iou_ok"], np.asarray(batch["cats"]),
            np.asarray(batch["boxes"]), hierarchical=True,
            num_geometric=m.num_geometric, num_possessive=m.num_possessive,
            cs_aligned=cs_a, cs_violated=cs_v,
            num_obj_classes=m.num_classes)
        tgt = build_targets(np.asarray(batch["rel"]),
                            np.asarray(batch["cats"]),
                            np.asarray(batch["boxes"]),
                            np.asarray(batch["valid"]))
        evaluator.accumulate(cand, tgt)
    return evaluator.compute()
