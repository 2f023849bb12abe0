"""Plug-and-play hierarchy + commonsense components.

The reference's second half is a recipe for grafting the hierarchical head
and commonsense validator onto Scene-Graph-Benchmark models (Neural Motifs,
VCTree, VTransE, TDE, NICE, IETrans; reference README_PLUGANDPLAY.md:56-158).
This module packages the same four components as a framework-agnostic JAX
library so any relation model producing per-pair hidden states can adopt
them:

  * BayesHead        — log-space hierarchical head (models.relation_head);
  * BayesHeadProd    — probability-space variant: p(rel|sup) * p(sup)
    (the 'Prod' head of README_PLUGANDPLAY.md:56-60);
  * hierarchical_relation_loss — super-category NLL + per-branch NLL on
    generic hidden-state logits (RelationHierarchicalLossComputation,
    README_PLUGANDPLAY.md:97-108);
  * hierarchical_postprocess — expands each pair into 3 ranked candidates
    (HierarchPostProcessor, README_PLUGANDPLAY.md:85-96);
  * CommonsenseValidator — inference-time LLM filter over the top-k
    predicted triplets (README_PLUGANDPLAY.md:131-158): rejected triplets'
    scores drop to -inf before re-sorting.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from scene_graph_commonsense_tpu.commonsense.cache import EdgeCache
from scene_graph_commonsense_tpu.commonsense.client import batch_query_edges
from scene_graph_commonsense_tpu.models.relation_head import BayesianHead \
    as BayesHead  # noqa: F401  (re-export under the plug-and-play name)
from scene_graph_commonsense_tpu.train.losses import relation_loss


class BayesHeadProd(nn.Module):
    """Probability-space hierarchical head: branch softmax times the
    super-category probability (the BayesHeadProd variant of the
    plug-and-play recipe)."""
    num_geometric: int = 15
    num_possessive: int = 11
    num_semantic: int = 24
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray):
        sup = jax.nn.softmax(
            nn.Dense(3, dtype=self.dtype, name="fc5")(h).astype(
                jnp.float32))
        branches = []
        for i, n in enumerate([self.num_geometric, self.num_possessive,
                               self.num_semantic]):
            logits = nn.Dense(n, dtype=self.dtype, name=f"fc3_{i + 1}")(h)
            branches.append(
                jax.nn.softmax(logits.astype(jnp.float32)) * sup[:, i:i + 1])
        return branches[0], branches[1], branches[2], sup


def hierarchical_relation_loss(rel1, rel2, rel3, super_rel, targets,
                               connected, class_weights=None):
    """RelationHierarchicalLossComputation equivalent over generic branch
    log-probabilities (already composed with log p(super))."""
    relation = jnp.concatenate([rel1, rel2, rel3], axis=1)
    r = relation.shape[1]
    if class_weights is None:
        class_weights = jnp.ones(r, relation.dtype)
    return relation_loss(relation, super_rel, targets, connected,
                         class_weights, rel1.shape[1], rel2.shape[1],
                         hierarchical=True)


def hierarchical_postprocess(rel1, rel2, rel3, pair_scores=None):
    """HierarchPostProcessor equivalent: each pair emits one candidate per
    super-category branch (argmax within the branch), ranked by the branch's
    max log-probability plus optional pair scores.

    Returns (rel_ids (3P,), scores (3P,), pair_index (3P,), order (3P,)) —
    order sorts candidates by descending score.
    """
    ng, npos = rel1.shape[1], rel2.shape[1]
    p = rel1.shape[0]
    rel_ids = jnp.concatenate([rel1.argmax(1), rel2.argmax(1) + ng,
                               rel3.argmax(1) + ng + npos])
    scores = jnp.concatenate([rel1.max(1), rel2.max(1), rel3.max(1)])
    if pair_scores is not None:
        scores = scores + jnp.tile(pair_scores, 3)
    pair_index = jnp.tile(jnp.arange(p), 3)
    order = jnp.argsort(-scores, stable=True)
    return rel_ids, scores, pair_index, order


class CommonsenseValidator:
    """Inference-time commonsense filter (the CommonsenseValidator of the
    plug-and-play recipe): queries the LLM about the top-k predicted
    triplets and returns +1/-1 per triplet; callers set rejected triplets'
    scores to -inf and re-sort (README_PLUGANDPLAY.md:141-155)."""

    def __init__(self, transport: Optional[Callable] = None,
                 top_k: int = 20, max_cache_size: int = 10000,
                 object_names: Optional[Sequence[str]] = None,
                 relation_names: Optional[Sequence[str]] = None):
        from scene_graph_commonsense_tpu.constants import (
            VG_OBJECTS, VG_RELATIONS_BY_SUPER)
        if transport is None:
            from scene_graph_commonsense_tpu.commonsense.client import (
                openai_completion_transport)
            transport = openai_completion_transport()
        self.transport = transport
        self.top_k = top_k
        self.cache = EdgeCache(max_cache_size)
        self.object_names = object_names or VG_OBJECTS
        self.relation_names = relation_names or VG_RELATIONS_BY_SUPER

    def query(self, sub_cats, rels, obj_cats) -> np.ndarray:
        """(K,) int arrays -> (K,) votes in {+1, -1}."""
        edges = [f"{self.object_names[int(s)]} "
                 f"{self.relation_names[int(r)]} "
                 f"{self.object_names[int(o)]}"
                 for s, r, o in zip(sub_cats, rels, obj_cats)]
        votes, _ = batch_query_edges(edges, self.cache, self.transport)
        return np.asarray(votes, np.int32)

    def filter_scores(self, scores: np.ndarray, sub_cats, rels,
                      obj_cats) -> np.ndarray:
        """Applies the -inf rejection to the top-k scored triplets and
        returns the new scores (callers re-sort)."""
        scores = np.asarray(scores, np.float64).copy()
        order = np.argsort(-scores, kind="stable")[:self.top_k]
        # already-filtered (-inf) candidates would waste paid LLM queries
        # and cache junk votes
        order = order[np.isfinite(scores[order])]
        if len(order) == 0:
            return scores
        votes = self.query(np.asarray(sub_cats)[order],
                           np.asarray(rels)[order],
                           np.asarray(obj_cats)[order])
        scores[order[votes == -1]] = -np.inf
        return scores
