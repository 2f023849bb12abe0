"""Object-context encoders for the plug-and-play model families.

The reference's plug-and-play half grafts the hierarchical head onto
Scene-Graph-Benchmark context models — Neural Motifs (biLSTM), the SGB
Transformer, and VCTree (reference README_PLUGANDPLAY.md:56-158; the
Scene-Graph-Benchmark.pytorch submodule itself is an empty pointer in the
reference checkout).  This module provides TPU-native re-designs of those
three context encoders over the framework's fixed (B, N_max) padded object
layout:

  * MaskedBiLSTM     — bidirectional LSTM via ``nn.scan`` whose carry is
    frozen at padded positions (static shapes; no pack_padded_sequence);
  * MotifsContext    — Neural Motifs object+edge contexts (Zellers et al.
    2018): stacked masked biLSTMs over [visual ⊕ label-embed ⊕ box-embed],
    with soft label decoding for SGCLS/SGDET;
  * TransformerContext — the SGB Transformer predictor's encoder: pre-LN
    self-attention blocks with a validity attention mask;
  * VCTreeContext    — VCTree (Tang et al. 2019) re-designed for XLA: the
    data-dependent tree is built by a fixed-iteration Prim maximum
    spanning arborescence under ``lax.fori_loop`` (N_max static), and the
    bidirectional TreeLSTM runs level-synchronously — each of the N_max
    level steps updates every node's candidate state in one batched GEMM
    and commits only the nodes at that depth (masks instead of recursion).

All encoders take (feats (B,N,D), boxes (B,N,4), labels (B,N) int,
valid (B,N) bool) and return per-object edge representations (B,N,H) plus
object-label logits (B,N,C) for the SGCLS/SGDET decoding path.

Word vectors: the reference's graft targets initialize label embeddings
from GloVe files on disk (reference README_PLUGANDPLAY.md:56-69); here the
``nn.Embed`` tables start learned, and ``train.pnp_engine.apply_glove_init``
overwrites them from a table built offline by ``tools/glove_embeddings.py``
when ``cfg.model.glove_embeddings`` exists (documented fallback: learned
init when no vectors are shipped).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def box_position_features(boxes: jnp.ndarray, size: float = 32.0
                          ) -> jnp.ndarray:
    """(…, 4) boxes in this framework's grid convention
    (x_min, x_max, y_min, y_max) on a `size`-sized grid -> (…, 9)
    normalized geometry features [x1, y1, x2, y2, cx, cy, w, h, area]
    (Motifs' encode_box_info).  Normalization keeps every feature O(1);
    unnormalized coordinates blow up the downstream bilinear scores."""
    b = boxes / size
    x1, x2, y1, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    w, h = x2 - x1, y2 - y1
    return jnp.stack([x1, y1, x2, y2, (x1 + x2) / 2, (y1 + y2) / 2,
                      w, h, w * h], axis=-1)


class _MaskedLSTMCell(nn.Module):
    """LSTM cell step that freezes the carry and zeroes the output at
    masked (padded) positions, so padding never pollutes the recurrence."""
    features: int

    @nn.compact
    def __call__(self, carry, xm):
        x, m = xm                               # x (B, D), m (B,)
        new_carry, y = nn.OptimizedLSTMCell(
            self.features, name="cell")(carry, x)
        m = m[:, None]
        carry = jax.tree.map(lambda n, o: jnp.where(m, n, o),
                             new_carry, carry)
        return carry, jnp.where(m, y, 0.0)


class MaskedBiLSTM(nn.Module):
    """Bidirectional masked LSTM over (B, N, D) with validity (B, N).

    Replaces torch's pack_padded_sequence raggedness with a static-shape
    scan: both directions run all N steps; masked steps are identity on
    the carry.  Works for arbitrary (non-prefix) masks.
    """
    features: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        B = xs.shape[0]
        m = valid.astype(bool)
        scan = nn.scan(_MaskedLSTMCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        zero = (jnp.zeros((B, self.features), xs.dtype),
                jnp.zeros((B, self.features), xs.dtype))
        _, fwd = scan(self.features, name="fwd")(zero, (xs, m))
        _, bwd = scan(self.features, name="bwd")(
            zero, (xs[:, ::-1], m[:, ::-1]))
        return jnp.concatenate([fwd, bwd[:, ::-1]], axis=-1)


class MotifsContext(nn.Module):
    """Neural Motifs object + edge context (Zellers et al. 2018, as plugged
    into by reference README_PLUGANDPLAY.md's model_motifs_hierarchical).

    obj_ctx  = biLSTM([feat ⊕ embed(label) ⊕ embed(box)])      (obj_layers)
    logits   = Dense(obj_ctx)        — label decoding for sgcls/sgdet
    edge_ctx = biLSTM([obj_ctx ⊕ embed(decoded label)])        (edge_layers)

    In 'predcls' mode decoded labels are the GT labels; otherwise the soft
    label distribution re-embeds through the same table (differentiable
    stand-in for Motifs' sequential argmax decode — documented deviation:
    no autoregressive label sampling, which XLA would serialize).
    """
    hidden_dim: int = 256
    embed_dim: int = 100
    num_classes: int = 150
    obj_layers: int = 1
    edge_layers: int = 1
    mode: str = "predcls"                      # predcls | sgcls | sgdet
    box_scale: float = 32.0                    # grid size boxes live on
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, labels, valid):
        embed = nn.Embed(self.num_classes + 1, self.embed_dim,
                         name="label_embed", dtype=self.dtype)
        pos = nn.Dense(32, dtype=self.dtype, name="box_embed")(
            box_position_features(boxes, self.box_scale).astype(
                self.dtype))
        lab = embed(jnp.clip(labels + 1, 0, self.num_classes))
        # GT labels are input features only in predcls; in sgcls/sgdet the
        # object class is the *prediction target*, so the input embedding
        # is the uniform 'unknown' slot (index 0) — no label leakage
        lab_in = lab if self.mode == "predcls" else embed(
            jnp.zeros_like(labels))
        x = jnp.concatenate([feats.astype(self.dtype), lab_in, pos],
                            axis=-1)
        for i in range(self.obj_layers):
            x = MaskedBiLSTM(self.hidden_dim, name=f"obj_lstm{i}")(x, valid)
        obj_ctx = x
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="decode")(obj_ctx).astype(jnp.float32)
        if self.mode == "predcls":
            dec = lab
        else:
            soft = jax.nn.softmax(logits).astype(self.dtype)
            dec = soft @ embed.embedding[1:]
        y = jnp.concatenate([obj_ctx, dec], axis=-1)
        for i in range(self.edge_layers):
            y = MaskedBiLSTM(self.hidden_dim, name=f"edge_lstm{i}")(y, valid)
        return y, logits


class TransformerContext(nn.Module):
    """SGB Transformer predictor's context: pre-LN self-attention encoder
    with padding masked out of the attention matrix.  The most TPU-friendly
    of the three families (pure batched GEMMs on the MXU)."""
    hidden_dim: int = 256
    embed_dim: int = 100
    num_classes: int = 150
    num_layers: int = 2
    num_heads: int = 4
    mode: str = "predcls"
    box_scale: float = 32.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, labels, valid):
        embed = nn.Embed(self.num_classes + 1, self.embed_dim,
                         name="label_embed", dtype=self.dtype)
        pos = nn.Dense(32, dtype=self.dtype, name="box_embed")(
            box_position_features(boxes, self.box_scale).astype(
                self.dtype))
        lab = embed(jnp.clip(labels + 1, 0, self.num_classes))
        # see MotifsContext: GT labels enter only in predcls mode
        lab_in = lab if self.mode == "predcls" else embed(
            jnp.zeros_like(labels))
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(
            jnp.concatenate([feats.astype(self.dtype), lab_in, pos],
                            axis=-1))
        attn_mask = (valid[:, None, None, :] & valid[:, None, :, None])
        for i in range(self.num_layers):
            h = nn.LayerNorm(name=f"ln_a{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                self.num_heads, dtype=self.dtype, name=f"attn{i}")(
                h, h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm(name=f"ln_m{i}")(x)
            h = nn.Dense(4 * self.hidden_dim, dtype=self.dtype,
                         name=f"mlp_in{i}")(h)
            h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                         name=f"mlp_out{i}")(nn.relu(h))
            x = x + h
        x = jnp.where(valid[..., None], x, 0.0)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="decode")(x).astype(jnp.float32)
        if self.mode != "predcls":
            soft = jax.nn.softmax(logits).astype(self.dtype)
            lab = soft @ embed.embedding[1:]
        edge = nn.Dense(2 * self.hidden_dim, dtype=self.dtype,
                        name="edge_proj")(
            jnp.concatenate([x, lab], axis=-1))
        return jnp.where(valid[..., None], edge, 0.0), logits


def prim_arborescence(scores: jnp.ndarray, valid: jnp.ndarray,
                      root: jnp.ndarray):
    """Maximum spanning arborescence over one image's N×N pair scores.

    VCTree builds its tree with a greedy max spanning tree on learned pair
    scores (Tang et al. 2019).  Data-dependent structure is hostile to XLA,
    so this runs Prim's algorithm as exactly N-1 ``fori_loop`` iterations
    over static (N,) state — each step one masked argmax over the N×N score
    matrix (vectorizes over the batch with vmap; N = N_max is static).

    Returns parent (N,) int32 — parent[i] = i for the root and for invalid
    nodes (self-loops make downstream gathers safe).
    """
    n = scores.shape[0]
    in_tree0 = (jnp.arange(n) == root) & valid
    parent0 = jnp.arange(n, dtype=jnp.int32)

    def body(_, state):
        in_tree, parent = state
        frontier = (in_tree[:, None] & ~in_tree[None, :] & valid[None, :])
        s = jnp.where(frontier, scores, -jnp.inf)
        flat = jnp.argmax(s)
        pi, ci = flat // n, flat % n
        ok = s.reshape(-1)[flat] > -jnp.inf
        in_tree = in_tree.at[ci].set(in_tree[ci] | ok)
        parent = parent.at[ci].set(
            jnp.where(ok, pi.astype(jnp.int32), parent[ci]))
        return in_tree, parent

    _, parent = jax.lax.fori_loop(0, n - 1, body, (in_tree0, parent0))
    return parent


def tree_depths(parent: jnp.ndarray) -> jnp.ndarray:
    """Depth of each node from parent pointers (roots/self-loops = 0) via
    N pointer-chasing iterations (static; N = N_max)."""
    n = parent.shape[0]

    def body(_, depth):
        is_root = parent == jnp.arange(n)
        return jnp.where(is_root, 0, depth[parent] + 1)

    return jax.lax.fori_loop(0, n, body, jnp.zeros((n,), jnp.int32))


class _TreeGRUStep(nn.Module):
    """One gated update h_i = GRU(x_i, msg_i) used by both TreeLSTM passes.

    A GRU-style cell (update + reset gates) over an aggregated neighbor
    message; applied to every node in one batched GEMM per level step."""
    features: int

    @nn.compact
    def __call__(self, x, msg):
        zr = nn.Dense(2 * self.features, name="gates")(
            jnp.concatenate([x, msg], axis=-1))
        z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
        cand = jnp.tanh(nn.Dense(self.features, name="cand")(
            jnp.concatenate([x, r * msg], axis=-1)))
        return (1 - z) * msg + z * cand


class VCTreeContext(nn.Module):
    """VCTree context (Tang et al. 2019) re-designed for TPU.

    1. Pair scores: bilinear form on projected object features plus a box
       overlap prior (the learnable half of VCTree's score matrix; the
       supervised score branch is a training detail of the original).
    2. Structure: Prim maximum spanning arborescence rooted at the
       highest-scoring valid object — fixed N-1 iterations (see
       prim_arborescence).
    3. Bidirectional TreeLSTM, level-synchronously: the down pass walks
       depths 0..N-1, each step computing the gated update for *all* nodes
       in one GEMM and committing only the nodes whose depth equals the
       level; the up pass walks depths max..0 aggregating child messages
       with segment_sum over the parent index.  O(N) GEMMs of size (B·N),
       no recursion, fully static.

    Returns (edge_ctx (B,N,2H), obj_logits (B,N,C)).
    """
    hidden_dim: int = 256
    embed_dim: int = 100
    num_classes: int = 150
    mode: str = "predcls"
    box_scale: float = 32.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, labels, valid):
        n = feats.shape[1]
        embed = nn.Embed(self.num_classes + 1, self.embed_dim,
                         name="label_embed", dtype=self.dtype)
        pos = nn.Dense(32, dtype=self.dtype, name="box_embed")(
            box_position_features(boxes, self.box_scale).astype(
                self.dtype))
        lab = embed(jnp.clip(labels + 1, 0, self.num_classes))
        # see MotifsContext: GT labels enter only in predcls mode
        lab_in = lab if self.mode == "predcls" else embed(
            jnp.zeros_like(labels))
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(
            jnp.concatenate([feats.astype(self.dtype), lab_in, pos],
                            axis=-1))
        x = jnp.where(valid[..., None], x, 0.0)

        # --- 1. pair scores (symmetrized bilinear + overlap prior) ---
        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="score_q")(x)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="score_k")(x)
        scores = jnp.einsum("bnd,bmd->bnm", q, k).astype(jnp.float32)
        scores = (scores + scores.transpose(0, 2, 1)) / jnp.sqrt(
            jnp.float32(self.hidden_dim))
        from scene_graph_commonsense_tpu.ops.nms import box_iou_xyxy
        xyxy = boxes[..., jnp.array([0, 2, 1, 3])]   # grid conv. -> xyxy
        scores = scores + box_iou_xyxy(xyxy[:, :, None], xyxy[:, None, :])
        # Prim's argmax gives the structure no gradient; expose the raw
        # score matrix so the trainer can add VCTree's supervised structure
        # loss (scores -> GT relatedness; the differentiable half of Tang
        # et al.'s hybrid learning)
        self.sow("intermediates", "pair_scores", scores)
        eye = jnp.eye(n, dtype=bool)
        scores = jnp.where(eye[None], -jnp.inf, scores)

        # --- 2. structure ---
        rootness = nn.Dense(1, dtype=self.dtype, name="rootness")(
            x)[..., 0].astype(jnp.float32)
        root = jnp.argmax(jnp.where(valid, rootness, -jnp.inf), axis=1)
        parent = jax.vmap(prim_arborescence)(scores, valid, root)
        depth = jax.vmap(tree_depths)(parent)

        # --- 3. level-synchronous bidirectional TreeLSTM ---
        down_cell = _TreeGRUStep(self.hidden_dim, name="down")
        up_cell = _TreeGRUStep(self.hidden_dim, name="up")
        vmask = valid[..., None]
        take_parent = jax.vmap(lambda h, p: h[p])

        h_down = jnp.zeros_like(x)
        for level in range(n):                 # root -> leaves
            msg = take_parent(h_down, parent)
            cand = down_cell(x, msg)
            commit = ((depth == level) & valid)[..., None]
            h_down = jnp.where(commit, cand, h_down)
        h_down = jnp.where(vmask, h_down, 0.0)

        h_up = jnp.zeros_like(x)
        seg_sum = jax.vmap(
            lambda h, p: jax.ops.segment_sum(h, p, num_segments=n))
        for level in range(n - 1, -1, -1):     # leaves -> root
            is_child = ((depth == level + 1) & valid &
                        (parent != jnp.arange(n)[None]))[..., None]
            msg = seg_sum(jnp.where(is_child, h_up, 0.0), parent)
            cand = up_cell(x, msg)
            commit = ((depth == level) & valid)[..., None]
            h_up = jnp.where(commit, cand, h_up)
        h_up = jnp.where(vmask, h_up, 0.0)

        ctx = jnp.concatenate([h_down, h_up], axis=-1)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="decode")(ctx).astype(jnp.float32)
        return ctx, logits


class VTransEContext(nn.Module):
    """VTransE feature extractor (Zhang et al. 2017), the fourth model
    family the reference composes with (reference
    README_PLUGANDPLAY.md:171-172: "VTransE + Ours").

    VTransE has no inter-object context propagation: each object's
    representation is a feed-forward projection of the paper's
    "classeme + location + visual" triple — here [visual ⊕ label-embed ⊕
    box geometry] through a 2-layer MLP.  The defining *translation
    embedding* composition (predicate ≈ W_o·obj − W_s·sub) lives in
    HierarchicalPredictor's pair stage.

    Same contract as the other contexts: (feats, boxes, labels, valid) ->
    (edge_ctx (B,N,2H), obj_logits (B,N,C)).
    """
    hidden_dim: int = 256
    embed_dim: int = 100
    num_classes: int = 150
    mode: str = "predcls"
    box_scale: float = 32.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes, labels, valid):
        embed = nn.Embed(self.num_classes + 1, self.embed_dim,
                         name="label_embed", dtype=self.dtype)
        pos = nn.Dense(32, dtype=self.dtype, name="box_embed")(
            box_position_features(boxes, self.box_scale).astype(
                self.dtype))
        lab = embed(jnp.clip(labels + 1, 0, self.num_classes))
        # see MotifsContext: GT labels enter only in predcls mode
        lab_in = lab if self.mode == "predcls" else embed(
            jnp.zeros_like(labels))
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(
            jnp.concatenate([feats.astype(self.dtype), lab_in, pos],
                            axis=-1))
        x = nn.relu(x)
        x = jnp.where(valid[..., None], x, 0.0)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="decode")(x).astype(jnp.float32)
        if self.mode != "predcls":
            soft = jax.nn.softmax(logits).astype(self.dtype)
            lab = soft @ embed.embedding[1:]
        edge = nn.Dense(2 * self.hidden_dim, dtype=self.dtype,
                        name="edge_proj")(jnp.concatenate([x, lab],
                                                          axis=-1))
        return jnp.where(valid[..., None], edge, 0.0), logits
