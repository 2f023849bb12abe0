"""Loss functions over the packed pair buffer.

All losses are pure, fully masked (no data-dependent shapes), and consume the
whole batch's pairs at once.  The reference computes them per pair-column
inside its Python loop (reference train_utils.py:21-157); the quantities here
are the same estimators expressed as masked means.

Deviation (documented): the reference's connectivity loss overwrites the
not-connected BCE term with the connected-pair BCE whenever a column contains
a connected pair (reference train_utils.py:70-91 rebinds `loss_connectivity`),
and its outer loop re-adds running loss totals once per remaining column
(reference train_test.py:219-258), which implicitly up-weights early columns.
Both are loop artifacts rather than modeling intent; this module implements
the clean estimator (single masked mean per term).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of values where mask, 0 if mask is empty (mirrors the reference's
    `0.0 if nan` guards, reference train_utils.py:56-71)."""
    mask = mask.astype(values.dtype)
    count = mask.sum()
    return jnp.where(count > 0, (values * mask).sum() / jnp.maximum(count, 1),
                     0.0)


def _weighted_nll(log_probs: jnp.ndarray, targets: jnp.ndarray,
                  weights: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.NLLLoss(weight=w) semantics: sum(w[y] * -logp[y]) / sum(w[y])
    over masked rows (reference train_test.py:109-112)."""
    safe_t = jnp.clip(targets, 0, log_probs.shape[-1] - 1)
    nll = -jnp.take_along_axis(log_probs, safe_t[:, None], axis=1)[:, 0]
    w = weights[safe_t] * mask.astype(log_probs.dtype)
    wsum = w.sum()
    return jnp.where(wsum > 0, (nll * w).sum() / jnp.maximum(wsum, 1e-12),
                     0.0)


def relation_loss(relation: jnp.ndarray,
                  super_relation: Optional[jnp.ndarray],
                  targets: jnp.ndarray, connected: jnp.ndarray,
                  class_weights: jnp.ndarray,
                  num_geometric: int, num_possessive: int,
                  hierarchical: bool) -> jnp.ndarray:
    """Relationship loss over connected pairs.

    Hierarchical (reference train_utils.py:116-151): unweighted NLL on the
    super-category head plus, per branch, a class-weighted NLL on the
    composed log p(rel, super) restricted to targets in that branch.
    Flat (reference train_utils.py:153-155): class-weighted cross-entropy.

    relation: (P, R) — log-probs (hierarchical) or logits (flat).
    targets:  (P,) int relation ids in super-category order (-1 = none).
    connected: (P,) bool.
    """
    connected = connected & (targets >= 0)
    if not hierarchical:
        logp = jax.nn.log_softmax(relation, axis=-1)
        return _weighted_nll(logp, targets, class_weights, connected)

    ng, npos = num_geometric, num_possessive
    # Super-category target: 0 geometric / 1 possessive / 2 semantic
    # (reference utils.py:28-35).
    sup_t = jnp.where(targets < ng, 0, jnp.where(targets < ng + npos, 1, 2))
    loss = _weighted_nll(super_relation, sup_t,
                         jnp.ones(3, super_relation.dtype), connected)
    branches = [(relation[:, :ng], 0, ng),
                (relation[:, ng:ng + npos], ng, npos),
                (relation[:, ng + npos:], ng + npos,
                 relation.shape[1] - ng - npos)]
    for block, offset, width in branches:
        in_branch = connected & (targets >= offset) \
            & (targets < offset + width)
        loss = loss + _weighted_nll(
            block, targets - offset,
            jax.lax.dynamic_slice(class_weights, (offset,), (width,)),
            in_branch)
    return loss


class ConnectivityStats(NamedTuple):
    loss: jnp.ndarray
    num_connected: jnp.ndarray
    num_not_connected: jnp.ndarray
    num_connected_pred: jnp.ndarray
    precision_hits: jnp.ndarray   # predicted-connected that are truly related
    recall_hits: jnp.ndarray      # truly-connected predicted as connected


def connectivity_loss(logits: jnp.ndarray, connected: jnp.ndarray,
                      valid: jnp.ndarray, lambda_not_connected: float
                      ) -> ConnectivityStats:
    """BCE-with-logits on the connectivity head over all valid directed
    pairs: target 1 for connected, 0 otherwise; the not-connected term is
    scaled by lambda_not_connected (reference train_utils.py:64-92)."""
    connected = connected & valid
    not_connected = valid & ~connected
    # Numerically stable BCE-with-logits.
    bce_pos = jax.nn.softplus(-logits)      # target 1
    bce_neg = jax.nn.softplus(logits)       # target 0
    loss = lambda_not_connected * _masked_mean(bce_neg, not_connected) \
        + _masked_mean(bce_pos, connected)
    prob = jax.nn.sigmoid(logits)
    pred_pos = (prob >= 0.5) & valid
    return ConnectivityStats(
        loss=loss,
        num_connected=connected.sum(),
        num_not_connected=not_connected.sum(),
        num_connected_pred=pred_pos.sum(),
        precision_hits=(pred_pos & connected).sum(),
        # same TP count as precision_hits; keep one thresholding rule
        # (jnp.round's half-to-even made prob==0.5 count inconsistently)
        recall_hits=((prob >= 0.5) & connected).sum())


def commonsense_loss(relation: jnp.ndarray, sub_cats: jnp.ndarray,
                     obj_cats: jnp.ndarray, valid: jnp.ndarray,
                     aligned_table: jnp.ndarray, violated_table: jnp.ndarray,
                     num_geometric: int, num_possessive: int,
                     num_classes: int, lambda_weak: float,
                     lambda_strong: float, hierarchical: bool) -> jnp.ndarray:
    """Commonsense penalty for train_cs (reference train_utils.py:36-60).

    Every prediction (per-branch argmax for hierarchical, global argmax for
    flat) forms a (sub, rel, obj) triplet; predictions absent from the
    LLM-aligned set pay lambda_weak * max-prob, predictions present in the
    violated set pay lambda_strong * max-prob.  Dictionary probes become O(1)
    dense-table lookups on triplet ids.

    aligned_table / violated_table: (C * R * C,) bool dense membership.
    """
    if hierarchical:
        ng, npos = num_geometric, num_possessive
        blocks = [relation[:, :ng], relation[:, ng:ng + npos],
                  relation[:, ng + npos:]]
        offsets = [0, ng, ng + npos]
        probs, preds = [], []
        for block, off in zip(blocks, offsets):
            p = jax.nn.softmax(block, axis=-1)
            probs.append(p.max(axis=-1))
            preds.append(block.argmax(axis=-1) + off)
        rel_prob = jnp.concatenate(probs)
        rel_pred = jnp.concatenate(preds)
        sub = jnp.concatenate([sub_cats] * 3)
        obj = jnp.concatenate([obj_cats] * 3)
        mask = jnp.concatenate([valid] * 3)
    else:
        p = jax.nn.softmax(relation, axis=-1)
        rel_prob = p.max(axis=-1)
        rel_pred = relation.argmax(axis=-1)
        sub, obj, mask = sub_cats, obj_cats, valid

    num_relations = relation.shape[-1]
    tid = (sub * num_relations + rel_pred) * num_classes + obj
    in_yes = aligned_table[tid]
    in_no = violated_table[tid]
    loss = lambda_weak * _masked_mean(rel_prob, mask & ~in_yes) \
        + lambda_strong * _masked_mean(rel_prob, mask & in_no)
    return loss


def faithful_losses(model_cfg, train_cfg, relation: jnp.ndarray,
                    super_relation: Optional[jnp.ndarray],
                    conn_logits: jnp.ndarray, rel_targets: jnp.ndarray,
                    valid: jnp.ndarray, class_weights: jnp.ndarray,
                    sub_cats: Optional[jnp.ndarray] = None,
                    obj_cats: Optional[jnp.ndarray] = None,
                    cs_tables=None,
                    loss_contrast=jnp.float32(0.0)):
    """Reference-faithful training dynamics, as masked grid math.

    The reference's triangular Python loop computes every loss term as a
    per-COLUMN mean (a column = one (subject_slot, object_slot) grid cell
    vectorized over the batch) and then accumulates columns with three
    loop artifacts the clean estimator (compute_losses) deliberately drops:

      * connectivity rebinding: a column with any connected row REPLACES
        its not-connected BCE term with the connected-row BCE (reference
        train_utils.py:70-92 rebinds `loss_connectivity`);
      * triangular re-accumulation: `losses += <running sums>` once per
        column-direction, so column-direction s (0-based, E total) is
        weighted (E - s) in the backward loss (reference
        train_test.py:219-258);
      * lambda_contrast is applied twice (train_test.py:268-272 folds it
        into loss_contrast AND the losses += line).

    All inputs are grid-shaped: relation (B, N, N, R) branch log-probs (or
    flat logits), super_relation (B, N, N, 3) or None, conn_logits
    (B, N, N), rel_targets (B, N, N) int (-1 = none), valid (B, N),
    sub/obj_cats (B, N) (only for train_cs).  Returns (total, metrics);
    metrics report the plain per-term column sums (what the reference's
    curr_loss_* values add up to) plus `lr_scale`, the dynamic-LR factor
    sqrt(#images at the batch-max object count / B) that train_test.py:192
    leaves in effect at optimizer.step() time.
    """
    m = model_cfg
    b, n = valid.shape
    dt = relation.dtype

    rv = valid[:, :, None] & valid[:, None, :] \
        & ~jnp.eye(n, dtype=bool)[None]
    connected = rv & (rel_targets >= 0)

    def cell_mean(v, mask):
        mk = mask.astype(dt)
        cnt = mk.sum(0)
        return jnp.where(cnt > 0, (v * mk).sum(0) / jnp.maximum(cnt, 1),
                         0.0)

    def cell_weighted_nll(logp, tgt, w, mask):
        safe = jnp.clip(tgt, 0, logp.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        ww = w[safe] * mask.astype(dt)
        wsum = ww.sum(0)
        return jnp.where(wsum > 0, (nll * ww).sum(0)
                         / jnp.maximum(wsum, 1e-12), 0.0)

    # --- connectivity with the rebinding quirk ---
    pos_cell = cell_mean(jax.nn.softplus(-conn_logits), connected)
    neg_cell = cell_mean(jax.nn.softplus(conn_logits), rv & ~connected)
    conn_cell = jnp.where(connected.any(0), pos_cell,
                          train_cfg.lambda_not_connected * neg_cell)

    # --- relationship per column ---
    ng, npos = m.num_geometric, m.num_possessive
    if m.hierarchical_pred:
        sup_t = jnp.where(rel_targets < ng, 0,
                          jnp.where(rel_targets < ng + npos, 1, 2))
        rel_cell = cell_weighted_nll(super_relation, sup_t,
                                     jnp.ones(3, dt), connected)
        branches = [(relation[..., :ng], 0, ng),
                    (relation[..., ng:ng + npos], ng, npos),
                    (relation[..., ng + npos:], ng + npos,
                     relation.shape[-1] - ng - npos)]
        for block, off, width in branches:
            in_b = connected & (rel_targets >= off) \
                & (rel_targets < off + width)
            rel_cell = rel_cell + cell_weighted_nll(
                block, rel_targets - off,
                jax.lax.dynamic_slice(class_weights, (off,), (width,)),
                in_b)
    else:
        logp = jax.nn.log_softmax(relation, axis=-1)
        rel_cell = cell_weighted_nll(logp, rel_targets, class_weights,
                                     connected)

    # --- commonsense per column (train_cs) ---
    cs_cell = jnp.zeros((n, n), dt)
    if cs_tables is not None:
        aligned, violated = cs_tables
        if m.hierarchical_pred:
            blocks = [(relation[..., :ng], 0),
                      (relation[..., ng:ng + npos], ng),
                      (relation[..., ng + npos:], ng + npos)]
        else:
            blocks = [(relation, 0)]
        probs, preds = [], []
        for block, off in blocks:
            p = jax.nn.softmax(block, axis=-1)
            probs.append(p.max(axis=-1))
            preds.append(block.argmax(axis=-1) + off)
        probs = jnp.stack(probs)                      # (K, B, N, N)
        preds = jnp.stack(preds)
        sub = jnp.broadcast_to(sub_cats[None, :, :, None], preds.shape)
        obj = jnp.broadcast_to(obj_cats[None, :, None, :], preds.shape)
        tid = (sub * relation.shape[-1] + preds) * m.num_classes + obj
        rvk = jnp.broadcast_to(rv[None], preds.shape)
        # entry means are over (branch, batch) within each column
        k = probs.shape[0]
        probs2 = probs.reshape(k * b, n, n)
        weak = (rvk & ~aligned[tid]).reshape(k * b, n, n)
        strong = (rvk & violated[tid]).reshape(k * b, n, n)
        cs_cell = train_cfg.lambda_cs_weak * cell_mean(probs2, weak) \
            + train_cfg.lambda_cs_strong * cell_mean(probs2, strong)

    # --- triangular re-accumulation weights ---
    n_per = valid.sum(1)
    n_max = n_per.max()
    e_total = (n_max * (n_max - 1)).astype(dt)
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    s_lower = 2 * (i * (i - 1) // 2 + j)              # direction 1 (i > j)
    s_upper = 2 * (j * (j - 1) // 2 + i) + 1          # direction 2 (i < j)
    s_idx = jnp.where(i > j, s_lower, s_upper).astype(dt)
    tri_w = jnp.maximum(e_total - s_idx, 0.0)

    lam_c = train_cfg.lambda_connectivity
    lam_cs = train_cfg.lambda_commonsense
    tri_total = (tri_w * (rel_cell + lam_c * conn_cell
                          + lam_cs * cs_cell)).sum()
    total = tri_total \
        + train_cfg.lambda_contrast ** 2 * loss_contrast  # applied twice

    prob = jax.nn.sigmoid(conn_logits)
    pred_pos = (prob >= 0.5) & rv
    metrics = {
        "loss": total,
        "loss_relationship": rel_cell.sum(),
        "loss_connectivity": conn_cell.sum(),
        "loss_commonsense": cs_cell.sum(),
        "loss_contrast": loss_contrast,
        "num_connected": connected.sum(),
        "num_not_connected": (rv & ~connected).sum(),
        "num_connected_pred": pred_pos.sum(),
        "connectivity_precision_hits": (pred_pos & connected).sum(),
        "connectivity_recall_hits": ((prob >= 0.5) & connected).sum(),
        "lr_scale": jnp.sqrt((n_per == n_max).mean(dtype=dt)),
    }
    return total, metrics


def supcon_hierar_loss(features: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray, num_geometric: int,
                       num_possessive: int, temperature: float = 0.07,
                       base_temperature: float = 0.07) -> jnp.ndarray:
    """Hierarchical supervised-contrastive loss (reference
    sup_contrast/losses.py:85-181) with padding masks.

    features: (M, 2, D) two views (plain + augmented) of each connected
    pair's hidden state; labels: (M,) relation id; valid: (M,) bool.
    The denominator of each anchor's softmax is restricted to samples whose
    relation shares the same super-category parent (geometric / possessive /
    semantic buckets).
    """
    m, n_views, d = features.shape
    parent = jnp.where(labels < num_geometric, 0,
                       jnp.where(labels < num_geometric + num_possessive,
                                 1, 2))
    # Zero out padded rows so their dot products vanish.
    feats = jnp.where(valid[:, None, None], features, 0.0)
    # contrast_feature = cat(unbind(features, dim=1)): view-major layout.
    z = jnp.concatenate([feats[:, i, :] for i in range(n_views)], axis=0)
    big_valid = jnp.tile(valid, n_views)
    big_labels = jnp.tile(labels, n_views)
    big_parent = jnp.tile(parent, n_views)

    logits = (z @ z.T) / temperature
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))

    same_label = (big_labels[:, None] == big_labels[None, :])
    same_parent = (big_parent[:, None] == big_parent[None, :])
    both_valid = big_valid[:, None] & big_valid[None, :]
    not_self = ~jnp.eye(m * n_views, dtype=bool)

    pos_mask = (same_label & not_self & both_valid).astype(logits.dtype)
    den_mask = (same_parent & not_self & both_valid).astype(logits.dtype)

    exp_logits = jnp.exp(logits) * den_mask
    log_prob = logits - jnp.log(exp_logits.sum(axis=1, keepdims=True) + 1e-7)
    mean_log_prob_pos = (pos_mask * log_prob).sum(axis=1) \
        / (pos_mask.sum(axis=1) + 1e-7)
    per_anchor = -(temperature / base_temperature) * mean_log_prob_pos
    return _masked_mean(per_anchor, big_valid)
