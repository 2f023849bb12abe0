"""Epoch-level training driver.

The orchestration mirror of reference train_test.py:31-330: per-epoch loop,
step-decay LR schedule (x0.1 at the scheduler epochs), per-epoch checkpoint,
and a truncated PredCLS test pass after each epoch (100 batches for epochs
< 2, reference train_test.py:347-348).

Train-time recall (reference train_utils.py:105-110) comes from a separate
deterministic eval pass over the current batch at eval_freq instead of
reusing the training forward's outputs (which would pin them through the
backward pass).  Documented deviation (a loop artifact of the reference,
see train.losses): no per-column dynamic LR — uniform pair weighting in the
fixed grid makes the sqrt(live-fraction) modulation moot.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scene_graph_commonsense_tpu.constants import class_weights
from scene_graph_commonsense_tpu.data.pipeline import prefetch_iterator
from scene_graph_commonsense_tpu.eval.engines import run_eval_pc
from scene_graph_commonsense_tpu.parallel.mesh import (
    replicate_tree, shard_batch)
from scene_graph_commonsense_tpu.train import checkpoint as ckpt_lib
from scene_graph_commonsense_tpu.train import engine
from scene_graph_commonsense_tpu.utils.logging import (
    ResultRecorder, format_train_line, format_test_line)
from scene_graph_commonsense_tpu.utils.profiling import (
    ScalarWriter, StepProfiler, StepTimer)


def lr_schedule(cfg, steps_per_epoch: int):
    """Step decay: lr *= 0.1 at each scheduler epoch (reference
    train_test.py:138-139)."""
    base = cfg.training.learning_rate
    boundaries = {e * steps_per_epoch: 0.1
                  for e in cfg.training.scheduler_epochs}
    return optax.piecewise_constant_schedule(base, boundaries)


def eval_mesh(cfg, mesh):
    """The mesh to use for sharded evaluation, or None when the eval batch
    cannot be evenly sharded (shard_map requires the batch dimension to
    divide by the 'data' axis; falling back to single-device eval beats a
    trace-time crash)."""
    if mesh is None:
        return None
    shards = mesh.shape["data"]
    if shards <= 1 or cfg.training.batch_size % shards != 0:
        return None
    return mesh


def load_detr_featurizer(cfg, log_fn=print):
    """Builds the frozen DETR-101 featurizer: loads converted weights from
    cfg.model.detr_pretrained when present (random init with a loud
    warning otherwise — fine for plumbing tests, useless for recall).
    Returns (featurize_fn, detr_model, detr_params) so callers can also
    build the detection path from the same weights."""
    import os

    import flax.serialization

    from scene_graph_commonsense_tpu.models.detr import make_detr

    detr = make_detr(cfg)
    tmpl = detr.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                     jnp.ones((1, 64, 64), bool))
    ckpt = cfg.model.detr_pretrained
    if os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            detr_params = flax.serialization.from_bytes(tmpl, f.read())
    else:
        log_fn(f"WARNING: {ckpt} not found — using randomly initialized "
               f"DETR weights (convert the reference checkpoint with "
               f"models/weights.py for meaningful features)")
        detr_params = tmpl
    return make_detr_featurize_fn(cfg, detr, detr_params), detr, detr_params


def make_detr_featurize_fn(cfg, detr_model, detr_params):
    """Returns featurize(batch) -> batch with 'features' (and
    'features_aug' when an augmented image view is present) computed by the
    frozen DETR encoder (reference train_utils.py:9-18 run per batch under
    no_grad)."""
    from scene_graph_commonsense_tpu.models.detr import DETR

    # params as an argument (not a jit-captured constant): keeps XLA from
    # constant-folding the frozen weights and keeps the persistent
    # compile cache valid across checkpoints
    @jax.jit
    def _encode(params, images):
        return detr_model.apply(params, images,
                                method=DETR.encode_features)

    def encode(images):
        return _encode(detr_params, images)

    def featurize(batch):
        batch = dict(batch)
        need_plain = "features" not in batch and "image" in batch
        need_aug = "features_aug" not in batch and "image_aug" in batch
        if need_plain and need_aug:
            # One batch-2B dispatch beats two batch-B ones (~1.34x measured
            # on v5e at the bench shapes): the conv tail and encoder attain
            # higher MXU occupancy at the larger batch.
            both = encode(jnp.concatenate(
                [jnp.asarray(batch["image"]), jnp.asarray(batch["image_aug"])],
                axis=0))
            n = batch["image"].shape[0]
            batch["features"], batch["features_aug"] = both[:n], both[n:]
        elif need_plain:
            batch["features"] = encode(jnp.asarray(batch["image"]))
        elif need_aug:
            batch["features_aug"] = encode(jnp.asarray(batch["image_aug"]))
        batch.pop("image", None)
        batch.pop("image_aug", None)
        return batch

    return featurize


def fit(cfg, model, params, train_batches_fn: Callable[[int], Iterable],
        test_batches_fn: Optional[Callable[[int], Iterable]] = None,
        steps_per_epoch: int = 1000, artifacts=None, mesh=None,
        featurize: Optional[Callable[[Dict], Dict]] = None,
        chunk_size: int = 0, log_fn: Callable[[str], None] = print):
    """Full training run; returns the final TrainState."""
    tc = cfg.training
    opt = engine.make_optimizer(lr_schedule(cfg, steps_per_epoch),
                                momentum=tc.momentum,
                                weight_decay=tc.weight_decay,
                                grad_clip_norm=tc.grad_clip_norm,
                                momentum_dtype=tc.momentum_dtype)
    cs_tables = None
    if tc.run_mode == "train_cs":
        if artifacts is None or artifacts.cs_aligned is None:
            raise ValueError("train_cs requires converted commonsense "
                             "triplet tables (run prepare_cs first)")
        cs_tables = (artifacts.cs_aligned, artifacts.cs_violated)

    # resume: load the previous epoch's weights (reference
    # train_test.py:83-94 restores only the state_dict — the momentum
    # buffer starts fresh, matching torch.save of model weights alone)
    if tc.continue_train and tc.start_epoch > 0:
        name = ckpt_lib.checkpoint_name(
            cfg.model.hierarchical_pred, tc.run_mode,
            cfg.data.supcat_clustering, tc.start_epoch - 1)
        path = os.path.join(tc.checkpoint_path, name)
        if os.path.exists(path):
            params = ckpt_lib.restore(path, params)
            log_fn(f"Resumed relation weights from {path}")
        else:
            log_fn(f"WARNING: continue_train set but {path} not found — "
                   f"training from scratch")

    step = engine.make_train_step(model, cfg, opt, class_weights(
        cfg.data.dataset, cfg.data.supcat_clustering,
        faithful=tc.faithful_dynamics),
        cs_tables=cs_tables, mesh=mesh, chunk_size=chunk_size)
    opt_state = opt.init(params)
    # seed the schedule count at the resume point so the absolute-boundary
    # LR schedule stays aligned (a resumed run past a scheduler epoch must
    # not train at the undecayed rate)
    resume_step = tc.start_epoch * steps_per_epoch
    if resume_step:
        import optax.tree_utils as otu
        opt_state = otu.tree_set(opt_state,
                                 count=jnp.int32(resume_step))
    if mesh is not None:
        params = replicate_tree(mesh, params)
        opt_state = replicate_tree(mesh, opt_state)
    state = engine.TrainState(params, opt_state, jnp.int32(resume_step))

    recorder = ResultRecorder(tc.result_path, "train_results",
                              fresh=not tc.continue_train)
    test_recorder = ResultRecorder(tc.result_path, "test_results",
                                   fresh=not tc.continue_train)
    writer = ScalarWriter(tc.tensorboard_dir, enabled=tc.tensorboard)
    profiler = StepProfiler(tc.profile_dir, tc.profile_start_step,
                            tc.profile_num_steps)
    timer = StepTimer()
    rng = jax.random.PRNGKey(tc.seed)

    # train-time recall (reference accumulates Recall inside the train loop
    # at eval_freq, reference train_utils.py:105-110): a deterministic eval
    # pass over the current batch feeds a streaming evaluator
    from scene_graph_commonsense_tpu.eval.builders import (
        build_candidates, build_targets)
    from scene_graph_commonsense_tpu.eval.engines import _make_evaluators
    train_eval, _ = _make_evaluators(cfg, artifacts, predcls=True)
    train_estep = engine.make_eval_step(model, cfg,
                                        mesh=eval_mesh(cfg, mesh))

    # host-side step counter: int(state.step) would block on the device
    # every iteration (state.step is an output of the async-dispatched
    # jitted step), killing host/device pipelining
    host_step = int(state.step)
    overflow_warned = False

    # host-side prep (drop paths, featurize, shard/transfer) runs on the
    # prefetcher's background thread so it overlaps the device step —
    # the reference's num_workers=0 loader serializes exactly this work
    # (reference train_test.py:52)
    def _prep(batch, shard=True):
        if featurize is not None:
            batch = featurize(batch)
        else:
            batch = dict(batch)
        batch.pop("annot_path", None)
        if shard and mesh is not None:
            batch = shard_batch(mesh, batch)
        return batch

    def _prepped(batches, shard=True):
        prep = lambda b: _prep(b, shard)  # noqa: E731
        if tc.prefetch_batches > 0:
            return prefetch_iterator(batches, tc.prefetch_batches, prep)
        return map(prep, batches)

    for epoch in range(tc.start_epoch, tc.num_epoch):
        log_fn(f"Start Training... EPOCH {epoch} / {tc.num_epoch}")
        # per-epoch train recall, like the reference's in-epoch accumulation
        # (train_utils.py:105-110) — without the reset the printed recall
        # would be a cumulative average over all epochs
        train_eval.reset()
        t0 = time.time()
        for batch_count, batch in enumerate(_prepped(train_batches_fn(
                epoch))):
            profiler.step(host_step)
            state, metrics = step(state, batch, rng)
            host_step += 1
            timer.tick()

            recall = mean_recall = None
            if tc.eval_freq > 0 and batch_count % tc.eval_freq == 0:
                out = jax.tree.map(np.asarray,
                                   train_estep(state.params, batch))
                cand = build_candidates(
                    out["relation"], out["connectivity"],
                    out["super_relation"], out["pair_img"],
                    out["pair_sub"], out["pair_obj"], out["pair_mask"],
                    out["iou_ok"], np.asarray(batch["cats"]),
                    np.asarray(batch["boxes"]),
                    hierarchical=cfg.model.hierarchical_pred,
                    num_geometric=cfg.model.num_geometric,
                    num_possessive=cfg.model.num_possessive)
                tgt = build_targets(
                    np.asarray(batch["rel"]), np.asarray(batch["cats"]),
                    np.asarray(batch["boxes"]), np.asarray(batch["valid"]))
                train_eval.accumulate(cand, tgt)
                res = train_eval.compute()
                recall, mean_recall = res["recall"], res["mean_recall"]

            if (batch_count % tc.print_freq == 0):
                metrics = jax.tree.map(float, metrics)
                if not overflow_warned and (
                        metrics.get("pair_overflow", 0) > 0
                        or metrics.get("aug_pair_overflow", 0) > 0):
                    overflow_warned = True
                    log_fn("WARNING: packed pair buffer overflow — live "
                           "pairs exceed training.pair_capacity and the "
                           "excess is DROPPED (results can shift); raise "
                           "pair_capacity / aug_pair_capacity")
                lr = float(lr_schedule(cfg, steps_per_epoch)(host_step))
                imgs = (batch_count + 1) * tc.batch_size
                line = format_train_line(epoch, batch_count, lr, recall,
                                         mean_recall, losses=metrics)
                log_fn(f"{line}, {imgs / (time.time() - t0):.1f} img/s")
                recorder.add({"epoch": epoch, "batch": batch_count,
                              "lr": lr, **metrics})
                # TensorBoard scalar tag set mirrors reference
                # train_test.py:279-285 (the 5 loss terms + lr + timing)
                writer.scalars(metrics, host_step, prefix="train/")
                writer.scalar("train/lr", lr, host_step)
                writer.scalars(timer.summary(tc.batch_size),
                               host_step, prefix="perf/")

        # per-epoch checkpoint (reference train_test.py:311-322)
        name = ckpt_lib.checkpoint_name(
            cfg.model.hierarchical_pred, tc.run_mode,
            cfg.data.supcat_clustering, epoch)
        path = os.path.join(tc.checkpoint_path, name)
        ckpt_lib.save(path, jax.device_get(state.params))
        log_fn(f"Saved checkpoint {path}")

        if test_batches_fn is not None:
            max_batches = 100 if epoch < 2 else None  # train_test.py:347
            test_batches = _prepped(test_batches_fn(epoch), shard=False)
            res = run_eval_pc(cfg, model, state.params, test_batches,
                              artifacts=artifacts, max_batches=max_batches,
                              estep=train_estep)
            log_fn(format_test_line(epoch, res["recall"],
                                    res["mean_recall"],
                                    res.get("recall_zs")))
            test_recorder.add({"epoch": epoch,
                               "recall": list(map(float, res["recall"])),
                               "mean_recall": list(map(float,
                                                       res["mean_recall"]))})
            # test R@k scalars (reference train_test.py:446-450)
            for k, r in zip((20, 50, 100), res["recall"]):
                writer.scalar(f"test/R@{k}", r, epoch)
            for k, r in zip((20, 50, 100), res["mean_recall"]):
                writer.scalar(f"test/mR@{k}", r, epoch)
    profiler.close()
    writer.close()
    return state
