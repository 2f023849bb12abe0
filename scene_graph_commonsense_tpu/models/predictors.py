"""Plug-and-play hierarchical predictors: Motifs / Transformer / VCTree.

The reference demonstrates its hierarchy + commonsense methods by grafting
BayesHead onto Scene-Graph-Benchmark predictors (MotifHierarchicalPredictor
etc., reference README_PLUGANDPLAY.md:56-130).  This module is that
demonstration for the TPU framework: each predictor couples one of the
context encoders of models/context.py with

  pair hidden  h_p = W_s(ctx[sub]) * W_o(ctx[obj]) * W_u(union)     (Motifs'
               post-composition: elementwise product of projected subject /
               object contexts and the union visual feature)
  outputs      (rel1, rel2, rel3, super) — per-branch joint log-probs from
               a BayesHead, optionally shifted by a learned frequency-bias
               table over (sub_label, obj_label) pairs (Motifs' freq prior).

Outputs are flattened over (B·P,) pairs and plug directly into
plugandplay.hierarchical_relation_loss / hierarchical_postprocess, so the
whole stack mirrors "copy model_motifs_hierarchical.py, register
MotifHierarchicalPredictor" from the reference recipe.

Frequency bias composition: the flat SGB models add the (sub,obj)->rel
log-frequency to the predicate logits.  Here predicates partition into the
three super-category branches (constants.VG_RELATIONS_BY_SUPER ordering:
15 geometric | 11 possessive | 24 semantic), so the bias row splits into
per-branch segments added to the branch logits before their softmax, and
each segment's logsumexp is added to the super-category logits — making the
composed joint exactly softmax(head_logits + bias) marginalized the
hierarchical way.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.models.context import (
    MotifsContext, TransformerContext, VCTreeContext, VTransEContext)
from scene_graph_commonsense_tpu.models.relation_head import BayesianHead


class FrequencyBias(nn.Module):
    """Learned (sub_label, obj_label) -> predicate-logit table (Motifs'
    frequency baseline).  Initialize from data statistics by overwriting
    params['freq']['table']['embedding'] with log(P(rel|sub,obj)+eps)."""
    num_classes: int = 150
    num_relations: int = 50

    @nn.compact
    def __call__(self, sub_labels, obj_labels):
        c = self.num_classes + 1
        idx = (jnp.clip(sub_labels + 1, 0, self.num_classes) * c
               + jnp.clip(obj_labels + 1, 0, self.num_classes))
        return nn.Embed(c * c, self.num_relations, name="table",
                        embedding_init=nn.initializers.zeros)(idx)


# The hierarchical head with optional frequency bias IS the standalone
# BayesianHead (models/relation_head.py) — one implementation to keep in
# sync, with its T1/T2/T3 temperature support intact.
BiasedBayesHead = BayesianHead


_CONTEXTS = {"motifs": MotifsContext, "transformer": TransformerContext,
             "vctree": VCTreeContext, "vtranse": VTransEContext}


class HierarchicalPredictor(nn.Module):
    """Context encoder + Motifs pair composition + (biased) BayesHead.

    family: 'motifs' | 'transformer' | 'vctree' | 'vtranse'.

    __call__(feats (B,N,D), boxes (B,N,4), labels (B,N) int,
             valid (B,N) bool, pair_sub (B,P), pair_obj (B,P),
             pair_mask (B,P), union_feats (B,P,Du) or None)
      -> dict(rel1/rel2/rel3/super_relation over (B·P,), obj_logits
              (B,N,C), pair_mask (B·P,))
    """
    family: str = "motifs"
    hidden_dim: int = 256
    pair_dim: int = 512
    num_classes: int = 150
    num_geometric: int = 15
    num_possessive: int = 11
    num_semantic: int = 24
    mode: str = "predcls"
    use_freq_bias: bool = True
    box_scale: float = 32.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, labels, valid, pair_sub, pair_obj,
                 pair_mask, union_feats=None):
        if self.family not in _CONTEXTS:
            raise ValueError(f"unknown context family {self.family!r}; "
                             f"expected one of {sorted(_CONTEXTS)}")
        ctx_cls = _CONTEXTS[self.family]
        ctx, obj_logits = ctx_cls(
            hidden_dim=self.hidden_dim, num_classes=self.num_classes,
            mode=self.mode, box_scale=self.box_scale, dtype=self.dtype,
            name="context")(
            feats, boxes, labels, valid)

        take = jax.vmap(lambda c, i: c[i])     # (B,N,D),(B,P) -> (B,P,D)
        sub_rep = nn.Dense(self.pair_dim, dtype=self.dtype, name="post_sub")(
            take(ctx, pair_sub))
        obj_rep = nn.Dense(self.pair_dim, dtype=self.dtype, name="post_obj")(
            take(ctx, pair_obj))
        if self.family == "vtranse":
            # VTransE's translation embedding: subject + predicate ≈ object
            # in the projected space, so the predicate representation is
            # the difference W_o·obj − W_s·sub (Zhang et al. 2017 eq. 2)
            h = obj_rep - sub_rep
        else:
            h = sub_rep * obj_rep
        if union_feats is not None:
            h = h * nn.Dense(self.pair_dim, dtype=self.dtype,
                             name="post_union")(
                union_feats.astype(self.dtype))
        # the triple elementwise product compounds scale; normalize before
        # the classifier MLP (fuses into the surrounding GEMMs under XLA)
        h = nn.LayerNorm(name="pair_norm")(h)
        h = nn.relu(nn.Dense(self.pair_dim, dtype=self.dtype,
                             name="pair_mlp")(h))
        h = h.reshape(-1, self.pair_dim)

        bias = None
        if self.use_freq_bias:
            nr = (self.num_geometric + self.num_possessive
                  + self.num_semantic)
            if self.mode == "predcls":
                ls, lo = take(labels, pair_sub), take(labels, pair_obj)
            else:
                dec = jnp.argmax(obj_logits, axis=-1)
                ls, lo = take(dec, pair_sub), take(dec, pair_obj)
            bias = FrequencyBias(self.num_classes, nr, name="freq")(
                ls.reshape(-1), lo.reshape(-1))

        r1, r2, r3, sup = BayesianHead(
            num_geometric=self.num_geometric,
            num_possessive=self.num_possessive,
            num_semantic=self.num_semantic,
            dtype=self.dtype, name="head")(h, bias)
        # relatedness head (this framework's connectivity term; SGB models
        # carry the equivalent signal as a background predicate class)
        conn = nn.Dense(1, dtype=self.dtype, name="rel_conf")(
            h)[:, 0].astype(jnp.float32)
        return {"rel1": r1, "rel2": r2, "rel3": r3, "super_relation": sup,
                "relation": jnp.concatenate([r1, r2, r3], axis=1),
                "connectivity": conn, "obj_logits": obj_logits,
                "pair_mask": pair_mask.reshape(-1)}
