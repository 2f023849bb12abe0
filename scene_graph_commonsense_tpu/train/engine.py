"""Training and evaluation steps over the packed pair grid.

One jitted program per batch replaces the reference's per-pair Python loop
(reference train_test.py:136-330).  The local step is a pure function over a
batch shard; data parallelism wraps it in `shard_map` over the 'data' mesh
axis with `pmean`-reduced gradients — the XLA-collective analogue of the
reference's DDP/gloo all-reduce (reference train_test.py:25-28, 276).  Like
DDP, each shard computes masked-mean losses over its own pairs and gradients
are averaged across shards.

Batch pytree (all fixed shapes; B images, N = max_objects, S = feature_size):
  features:     (B, S, S, C)   frozen detector features
  features_aug: (B, S, S, C)   augmented view (training only; may be absent)
  depth:        (B, S, S, 1)   estimated depth map
  cats:         (B, N) int32   object classes (padding slots hold 0)
  super_mh:     (B, N, K) f32  super-class multi-hots
  boxes:        (B, N, 4) f32  (x_min, x_max, y_min, y_max) on the grid
  rel:          (B, N, N) int32 directed GT relations (-1 = none)
  valid:        (B, N) bool
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from scene_graph_commonsense_tpu.models.relation_head import (
    RelationClassifier)
from scene_graph_commonsense_tpu.ops import boxes as box_ops
from scene_graph_commonsense_tpu.ops import pairs as pair_ops
from scene_graph_commonsense_tpu.train import losses as L


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # Memoized compute-dtype copy of params (None until the first step, or
    # always None when compute_dtype is float32).  The forward would
    # otherwise re-cast the f32 master params every step — the fc1 kernel
    # cast alone reads 1 GB and writes 0.5 GB per step (~2.4 ms on v5e);
    # emitting the bf16 copy from the (already param-writing) update pass
    # costs only the 0.5 GB write.  Numerically identical: the same cast
    # of the same master values, just cached.
    compute_params: Any = None


def make_optimizer(learning_rate, momentum: float = 0.9,
                   weight_decay: float = 1e-4,
                   grad_clip_norm: float = 0.0,
                   momentum_dtype: str = "float32"):
    """SGD + momentum with coupled weight decay, matching torch.optim.SGD
    semantics (reference train_test.py:100-101): grad += wd * param before
    the momentum buffer update.  grad_clip_norm > 0 adds global-norm
    clipping — a deviation from the reference that tames the unnormalized
    SupCon term's gradient spikes (its 1/temperature-scaled dot products
    over 512-d unnormalized hiddens can exceed 1e3).
    momentum_dtype='bfloat16' halves the momentum buffer's HBM traffic
    (the fc1 buffer alone is 1 GB in f32) at a small numerical cost."""
    steps = []
    if grad_clip_norm > 0:
        steps.append(optax.clip_by_global_norm(grad_clip_norm))
    steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.sgd(learning_rate, momentum=momentum,
                           accumulator_dtype=jnp.dtype(momentum_dtype)))
    return optax.chain(*steps)


def _gather_streams(stream: jnp.ndarray, flat_idx: jnp.ndarray):
    return stream[flat_idx]


def _scatter_grid(vals: jnp.ndarray, packed: pair_ops.PackedPairs,
                  b: int, n: int) -> jnp.ndarray:
    """Scatters per-packed-pair values back onto the (B, N, N, ...) grid
    (faithful-dynamics losses are per grid cell).  Padding slots contribute
    zeros at flat position 0 — grid cell (0, 0, 0) is a self-pair and never
    live, so nothing real is clobbered.  Differentiable (scatter-add)."""
    flat = jnp.zeros((b * n * n,) + vals.shape[1:], vals.dtype)
    idx = jnp.where(packed.mask, packed.flat_id, 0)
    mb = packed.mask.reshape(packed.mask.shape + (1,) * (vals.ndim - 1))
    flat = flat.at[idx].add(jnp.where(mb, vals, 0))
    return flat.reshape((b, n, n) + vals.shape[1:])


def _chunked_pair_trunk(model: RelationClassifier, params, a, b, packed,
                        chunk_size: int, deterministic: bool,
                        dropout_rng=None):
    """Runs the heavy pair trunk in chunks via lax.map so the (P, S, S, 4h)
    gathered tensors never materialize at full pair capacity (HBM guard:
    remat + scan trades a little recompute for a flat memory profile)."""
    p_cap = packed.flat_sub.shape[0]
    if chunk_size <= 0 or chunk_size >= p_cap:
        a_s = _gather_streams(a, packed.flat_sub)
        b_o = _gather_streams(b, packed.flat_obj)
        return model.apply(
            params, a_s, b_o, deterministic,
            method=RelationClassifier.pair_trunk,
            rngs={"dropout": dropout_rng} if dropout_rng is not None else None)

    # pad the index buffers up to a whole number of chunks (index 0 is a
    # safe gather target; the padded rows' outputs are sliced off below) —
    # silently falling back to the unchunked path would materialize the
    # full-capacity gathered tensors the chunking exists to avoid
    n_chunks = -(-p_cap // chunk_size)
    pad = n_chunks * chunk_size - p_cap
    flat_sub = jnp.pad(packed.flat_sub, (0, pad))
    flat_obj = jnp.pad(packed.flat_obj, (0, pad))
    subs = flat_sub.reshape(n_chunks, chunk_size)
    objs = flat_obj.reshape(n_chunks, chunk_size)

    if dropout_rng is None:
        @jax.checkpoint
        def one_chunk(args):
            sub_idx, obj_idx = args
            return model.apply(
                params, _gather_streams(a, sub_idx),
                _gather_streams(b, obj_idx), deterministic,
                method=RelationClassifier.pair_trunk)

        h = jax.lax.map(one_chunk, (subs, objs))
    else:
        rngs = jax.random.split(dropout_rng, n_chunks)

        @jax.checkpoint
        def one_chunk(args):
            sub_idx, obj_idx, rng = args
            return model.apply(
                params, _gather_streams(a, sub_idx),
                _gather_streams(b, obj_idx), deterministic,
                method=RelationClassifier.pair_trunk,
                rngs={"dropout": rng})

        h = jax.lax.map(one_chunk, (subs, objs, rngs))
    return h.reshape(n_chunks * chunk_size, -1)[:p_cap]


def forward_pairs(model: RelationClassifier, params, batch: Dict[str, Any],
                  capacity: int, *, view: str = "features",
                  deterministic: bool = True, dropout_rng=None,
                  chunk_size: int = 0,
                  packed: Optional[pair_ops.PackedPairs] = None,
                  use_pallas_pool: bool = False,
                  pallas_interpret: bool = False
                  ) -> Tuple[Dict[str, jnp.ndarray], pair_ops.PackedPairs]:
    """Full pair-grid forward for one batch view: masks -> object streams ->
    packed pair gather -> trunk -> label-conditioned head.  A precomputed
    `packed` buffer (e.g. connected-pairs-only for the contrastive view)
    overrides the default all-valid-pairs packing."""
    b, n = batch["cats"].shape
    s = batch["features"].shape[1]
    masks = box_ops.boxes_to_masks(batch["boxes"], s,
                                   batch["features"].dtype)
    masks = masks * batch["valid"][:, :, None, None].astype(masks.dtype)
    if dropout_rng is not None:
        rng_s, rng_t, rng_h = jax.random.split(dropout_rng, 3)
    else:
        rng_s = rng_t = rng_h = None
    if packed is None:
        packed = pair_ops.pack_pairs(pair_ops.pair_validity(batch["valid"]),
                                     capacity)
    if use_pallas_pool:
        # fused gather+add+maxpool+relu (ops.pallas.pair_pool); custom-VJP
        # wrapper keeps the training path differentiable.  The object
        # streams come out of conv2 directly in the kernel's pool-group
        # layout (four offset stride-2 convs — no relayout transpose).
        from scene_graph_commonsense_tpu.ops.pallas.pair_pool import (
            pair_pool)
        a4, b4 = model.apply(
            params, batch[view], batch["depth"], masks,
            method=RelationClassifier.object_streams_grouped_from_image)
        pooled = pair_pool(a4, b4, packed.flat_sub, packed.flat_obj,
                           pallas_interpret, 0)
        h = model.apply(
            params, pooled, deterministic,
            method=RelationClassifier.pair_trunk_from_pooled,
            rngs={"dropout": rng_t} if rng_t is not None else None)
    else:
        a, bb = model.apply(
            params, batch[view], batch["depth"], masks,
            method=RelationClassifier.object_streams_from_image)
        h = _chunked_pair_trunk(model, params, a, bb, packed, chunk_size,
                                deterministic, rng_t)
    flat_cats = batch["cats"].reshape(b * n)
    flat_super = batch["super_mh"].reshape(b * n, -1) \
        if batch.get("super_mh") is not None else None
    c1 = flat_cats[packed.flat_sub]
    c2 = flat_cats[packed.flat_obj]
    s1 = flat_super[packed.flat_sub] if flat_super is not None else None
    s2 = flat_super[packed.flat_obj] if flat_super is not None else None
    out = model.apply(
        params, h, c1, c2, s1, s2, deterministic,
        method=RelationClassifier.pair_head,
        rngs={"dropout": rng_h} if rng_h is not None else None)
    out["sub_cat"] = c1
    out["obj_cat"] = c2
    return out, packed


def pair_targets(batch: Dict[str, Any], packed: pair_ops.PackedPairs):
    """(P,) GT relation per packed directed pair; -1 where unrelated."""
    b, n = batch["cats"].shape
    rel_flat = batch["rel"].reshape(b, n * n)
    rel = rel_flat[packed.img, packed.sub * n + packed.obj]
    return jnp.where(packed.mask, rel, -1)


def compute_losses(model_cfg, train_cfg, out, packed, targets,
                   class_weights, cs_tables=None,
                   loss_contrast=jnp.float32(0.0)):
    """All loss terms + scalar metrics for one batch shard (the contrastive
    term is computed by the caller over the connected-pairs buffer)."""
    m = model_cfg
    valid = packed.mask
    connected = (targets >= 0) & valid

    loss_rel = L.relation_loss(
        out["relation"], out["super_relation"], targets, connected,
        class_weights, m.num_geometric, m.num_possessive,
        m.hierarchical_pred)
    conn = L.connectivity_loss(out["connectivity"], connected, valid,
                               train_cfg.lambda_not_connected)
    loss_cs = jnp.float32(0.0)
    if cs_tables is not None:
        loss_cs = L.commonsense_loss(
            out["relation"], out["sub_cat"], out["obj_cat"], valid,
            cs_tables[0], cs_tables[1], m.num_geometric, m.num_possessive,
            m.num_classes, train_cfg.lambda_cs_weak,
            train_cfg.lambda_cs_strong, m.hierarchical_pred)

    total = loss_rel \
        + train_cfg.lambda_connectivity * conn.loss \
        + train_cfg.lambda_commonsense * loss_cs \
        + train_cfg.lambda_contrast * loss_contrast
    metrics = {
        "loss": total, "loss_relationship": loss_rel,
        "loss_connectivity": conn.loss, "loss_commonsense": loss_cs,
        "loss_contrast": loss_contrast,
        "num_connected": conn.num_connected,
        "num_not_connected": conn.num_not_connected,
        "num_connected_pred": conn.num_connected_pred,
        "connectivity_precision_hits": conn.precision_hits,
        "connectivity_recall_hits": conn.recall_hits,
        "num_pairs": packed.count,
    }
    return total, metrics


def make_train_step(model: RelationClassifier, cfg, optimizer,
                    class_weights: np.ndarray, cs_tables=None,
                    mesh: Optional[Mesh] = None, chunk_size: int = 0,
                    donate: bool = True,
                    use_pallas_pool: Optional[bool] = None,
                    pallas_interpret: bool = False):
    """Builds the jitted train step.  With a mesh, wraps the local step in
    shard_map over the 'data' axis (batch-sharded inputs, replicated params,
    pmean gradients over ICI).  The fused Pallas pair-assembly kernel (with
    its matmul-scatter backward) is used automatically on TPU backends,
    like make_eval_step."""
    if use_pallas_pool is None:
        use_pallas_pool = jax.devices()[0].platform not in ("cpu", "gpu")
    capacity = cfg.pair_capacity
    weights = jnp.asarray(class_weights)
    if cs_tables is not None:
        # device-resident dense membership tables: indexing a host numpy
        # array with a traced triplet id would fail under jit
        cs_tables = tuple(jnp.asarray(t) for t in cs_tables)
    shards = 1 if mesh is None else mesh.shape["data"]
    local_capacity = max(capacity // shards, 1)
    faithful = cfg.training.faithful_dynamics
    if faithful:
        # per-column parity math needs every valid pair present on the grid
        n_obj = cfg.data.max_objects
        local_capacity = max(cfg.training.batch_size // shards, 1) \
            * n_obj * (n_obj - 1)
    # connected pairs (= GT relations) are an order of magnitude sparser
    # than valid pairs; see TrainConfig.aug_pair_capacity.  Shrinking this
    # buffer shrinks the aug view's share of the conv3/fc1 FLOPs 1:1.
    if cfg.training.aug_pair_capacity > 0:
        # explicit global capacity, divided across shards (never fall
        # back to the default just because the division hits zero)
        aug_capacity = cfg.training.aug_pair_capacity // shards
    else:
        aug_capacity = local_capacity // 4
    aug_capacity = min(max(aug_capacity, 1), local_capacity)

    compute_dtype = jnp.dtype(cfg.model.compute_dtype)
    cache_compute = compute_dtype != jnp.float32

    def cast_compute(params):
        return jax.tree.map(lambda p: p.astype(compute_dtype)
                            if p.dtype == jnp.float32 else p, params)

    def local_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if mesh is not None:
            # per-shard dropout streams, like per-rank seeds under DDP
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        # memoized compute-dtype params (see TrainState.compute_params);
        # differentiating wrt the bf16 copy yields the same bf16 wgrads
        # XLA already produced, upcast below so the optimizer math and
        # the clip norm stay exactly f32.  The stepper wrapper pre-casts
        # a None field outside jit, so this fallback only fires for
        # direct local_step callers
        cparams = state.compute_params
        if cache_compute and cparams is None:
            cparams = cast_compute(state.params)

        def loss_fn(params):
            r1, r2 = jax.random.split(rng)
            out, packed = forward_pairs(
                model, params, batch, local_capacity, view="features",
                deterministic=False, dropout_rng=r1, chunk_size=chunk_size,
                use_pallas_pool=use_pallas_pool,
                pallas_interpret=pallas_interpret)
            targets = pair_targets(batch, packed)

            # Contrastive term: the SupCon loss only consumes CONNECTED
            # pairs' hidden states (reference train_utils.py:96-99), so the
            # augmented view runs over a connected-pairs-only packing at
            # reduced capacity — roughly half the aug-view pair-trunk FLOPs.
            loss_contrast = jnp.float32(0.0)
            aug_overflow = jnp.int32(0)
            if "features_aug" in batch:
                conn_grid = pair_ops.pair_validity(batch["valid"]) \
                    & (batch["rel"] >= 0)
                packed_c = pair_ops.pack_pairs(conn_grid, aug_capacity)
                aug_overflow = jnp.maximum(packed_c.count - aug_capacity, 0)
                out_aug, _ = forward_pairs(
                    model, params, batch, aug_capacity,
                    view="features_aug", deterministic=False,
                    dropout_rng=r2, chunk_size=chunk_size, packed=packed_c,
                    use_pallas_pool=use_pallas_pool,
                    pallas_interpret=pallas_interpret)
                pos, found = pair_ops.align_packings(packed, packed_c)
                feats = jnp.stack([out["hidden"][pos], out_aug["hidden"]],
                                  axis=1)
                labels = jnp.maximum(pair_targets(batch, packed_c), 0)
                loss_contrast = L.supcon_hierar_loss(
                    feats.astype(jnp.promote_types(feats.dtype,
                                                   jnp.float32)),
                    labels, found,
                    cfg.model.num_geometric, cfg.model.num_possessive)

            if faithful:
                b, n = batch["cats"].shape
                sup_grid = None
                if cfg.model.hierarchical_pred:
                    sup_grid = _scatter_grid(out["super_relation"],
                                             packed, b, n)
                total, metrics = L.faithful_losses(
                    cfg.model, cfg.training,
                    _scatter_grid(out["relation"], packed, b, n),
                    sup_grid,
                    _scatter_grid(out["connectivity"], packed, b, n),
                    batch["rel"], batch["valid"], weights,
                    sub_cats=batch["cats"], obj_cats=batch["cats"],
                    cs_tables=cs_tables, loss_contrast=loss_contrast)
            else:
                total, metrics = compute_losses(
                    cfg.model, cfg.training, out, packed, targets, weights,
                    cs_tables, loss_contrast=loss_contrast)
            # silent pair-dropping is the one place the static-shape
            # design can quietly change results — surface it as a metric
            # (the loop/engines warn host-side when it goes positive)
            metrics["pair_overflow"] = jnp.maximum(
                packed.count - local_capacity, 0).astype(jnp.float32)
            metrics["aug_pair_overflow"] = aug_overflow.astype(jnp.float32)
            return total, metrics

        if cache_compute:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(cparams)
            # optimizer math in the master-param dtype (f32 normally;
            # f64 under the x64 weight-parity harness)
            grads = jax.tree.map(lambda g, p: g.astype(p.dtype),
                                 grads, state.params)
        else:
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        if mesh is not None:
            # optional bf16 all-reduce: halves ICI bytes; the mean is
            # accumulated by the collective, params/updates stay f32
            ar_dtype = jnp.dtype(cfg.training.grad_allreduce_dtype)
            if ar_dtype != jnp.float32:
                grads = jax.tree.map(
                    lambda g: jax.lax.pmean(g.astype(ar_dtype), "data")
                    .astype(g.dtype), grads)
            else:
                grads = jax.lax.pmean(grads, "data")
            metrics = jax.lax.pmean(metrics, "data")
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if faithful:
            # dynamic LR at step time: scaling the post-momentum update by
            # s equals running torch SGD with lr*s for this step only
            # (reference train_test.py:192; the LAST column's value is the
            # one in effect when optimizer.step() fires)
            scale = metrics["lr_scale"]
            updates = jax.tree.map(lambda u: u * scale.astype(u.dtype),
                                   updates)
        params = optax.apply_updates(state.params, updates)
        new_compute = cast_compute(params) if cache_compute else None
        return TrainState(params, opt_state, state.step + 1,
                          new_compute), metrics

    def ensure_compute(state: TrainState) -> TrainState:
        """Pre-casts a None compute_params field OUTSIDE jit: the pytree
        structure of the traced state then never changes (None -> tree
        after step 1 would force a second full compile of the largest
        program in the system)."""
        if cache_compute and state.compute_params is None:
            state = state._replace(
                compute_params=cast_compute(state.params))
        return state

    if mesh is None:
        jitted = jax.jit(local_step, donate_argnums=(0,) if donate else ())

        def stepper1(state, batch, rng):
            return jitted(ensure_compute(state), batch, rng)

        return stepper1

    # in_specs must structurally match the batch dict, whose key set varies
    # (e.g. no features_aug in eval-style batches); build per key set
    cache = {}

    def stepper(state, batch, rng):
        state = ensure_compute(state)
        keys = frozenset(batch)
        if keys not in cache:
            sharded = jax.shard_map(
                local_step, mesh=mesh,
                in_specs=(P(), {k: P("data") for k in batch}, P()),
                out_specs=(P(), P()),
                check_vma=False)
            cache[keys] = jax.jit(
                sharded, donate_argnums=(0,) if donate else ())
        return cache[keys](state, batch, rng)

    return stepper


def make_eval_step(model: RelationClassifier, cfg, capacity: int = 0,
                   chunk_size: int = 0,
                   use_pallas_pool: Optional[bool] = None,
                   pallas_interpret: bool = False,
                   mesh: Optional[Mesh] = None):
    """Jitted deterministic forward returning everything the evaluator needs
    (relations, connectivity, packed indexing, overlap filter).  The fused
    Pallas pair-assembly kernel is used automatically on TPU backends.

    With a mesh, the step is shard_map-ed over the 'data' axis — the
    XLA-collective analogue of the reference's per-GPU eval processes
    (reference main.py:112-123 mp.spawns eval_pc per GPU with a
    DistributedSampler).  Each shard packs its own pair buffer at
    capacity/shards; pair_img is shifted to GLOBAL batch indices before
    the sharded outputs concatenate, so the host-side evaluator consumes
    exactly the single-device contract."""
    cap = capacity or cfg.pair_capacity
    if use_pallas_pool is None:
        platform = jax.devices()[0].platform
        use_pallas_pool = platform not in ("cpu", "gpu")
    shards = 1 if mesh is None else mesh.shape["data"]
    # ceil: no capacity slots are lost to the division.  Note the
    # truncation semantics still differ from single-device when
    # pair_capacity is set below worst case: each SHARD truncates at its
    # own bound, so a dense shard can drop pairs a global pack would have
    # kept.  The default capacity (full worst case) can never truncate.
    local_cap = max(-(-cap // shards), 1)

    def step(params, batch):
        out, packed = forward_pairs(model, params, batch, local_cap,
                                    deterministic=True,
                                    chunk_size=chunk_size,
                                    use_pallas_pool=use_pallas_pool,
                                    pallas_interpret=pallas_interpret)
        targets = pair_targets(batch, packed)
        s = batch["features"].shape[1]
        iou_ok_grid = pair_ops.eval_pair_filter(batch["boxes"], s)
        b, n = batch["cats"].shape
        iou_ok = iou_ok_grid.reshape(b, n * n)[
            packed.img, packed.sub * n + packed.obj] & packed.mask
        pair_img = packed.img
        if mesh is not None:
            pair_img = pair_img + jax.lax.axis_index("data") * b
        return {
            "relation": out["relation"],
            "super_relation": out["super_relation"],
            "connectivity": out["connectivity"],
            "targets": targets,
            "pair_img": pair_img, "pair_sub": packed.sub,
            "pair_obj": packed.obj, "pair_mask": packed.mask,
            "iou_ok": iou_ok,
            # per-shard truncation telemetry ((1,) so the sharded concat
            # yields one entry per shard; engines warn when count > cap)
            "pair_count": packed.count[None],
            "pair_capacity": jnp.full((1,), local_cap, jnp.int32),
        }

    if mesh is None:
        return jax.jit(step)
    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=P("data"), check_vma=False)
    return jax.jit(sharded)
