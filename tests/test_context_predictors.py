"""Plug-and-play model families: Motifs / Transformer / VCTree contexts
and the hierarchical predictors built on them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_graph_commonsense_tpu.models.context import (
    MaskedBiLSTM, MotifsContext, TransformerContext, VCTreeContext,
    VTransEContext, prim_arborescence, tree_depths)
from scene_graph_commonsense_tpu.models.predictors import (
    BiasedBayesHead, FrequencyBias, HierarchicalPredictor)

B, N, D, C = 2, 6, 16, 150


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    xy = rng.rand(B, N, 2) * 100
    wh = rng.rand(B, N, 2) * 50 + 1
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    labels = jnp.asarray(rng.randint(0, C, (B, N)), jnp.int32)
    valid = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
    return feats, boxes, labels, valid


def test_masked_bilstm_padding_invariance():
    """Garbage in padded positions must not change valid outputs."""
    feats, _, _, valid = _inputs()
    m = MaskedBiLSTM(8)
    params = m.init(jax.random.PRNGKey(0), feats, valid)
    out1 = m.apply(params, feats, valid)
    poisoned = feats.at[0, 4:].set(1e6)
    out2 = m.apply(params, poisoned, valid)
    np.testing.assert_allclose(out1[0, :4], out2[0, :4], atol=1e-6)
    assert np.all(np.asarray(out1[0, 4:]) == 0.0)


def _prim_oracle(scores, valid, root):
    """Plain-python Prim for comparison."""
    n = len(valid)
    in_tree = {root}
    parent = list(range(n))
    for _ in range(n - 1):
        best, arg = -np.inf, None
        for p in in_tree:
            for c in range(n):
                if valid[c] and c not in in_tree and scores[p, c] > best:
                    best, arg = scores[p, c], (p, c)
        if arg is None:
            break
        parent[arg[1]] = arg[0]
        in_tree.add(arg[1])
    return np.asarray(parent)


def test_prim_matches_oracle():
    rng = np.random.RandomState(1)
    for trial in range(5):
        n = 7
        s = rng.randn(n, n)
        s = (s + s.T) / 2
        np.fill_diagonal(s, -np.inf)
        valid = np.ones(n, bool)
        valid[5:] = trial % 2 == 0  # alternately drop last two
        root = 0
        got = np.asarray(prim_arborescence(
            jnp.asarray(s), jnp.asarray(valid), jnp.asarray(root)))
        want = _prim_oracle(s, valid, root)
        np.testing.assert_array_equal(got, want)


def test_tree_depths():
    #      0
    #     / \
    #    1   2
    #        |
    #        3
    parent = jnp.asarray([0, 0, 0, 2], jnp.int32)
    np.testing.assert_array_equal(np.asarray(tree_depths(parent)),
                                  [0, 1, 1, 2])


@pytest.mark.parametrize("ctx_cls", [MotifsContext, TransformerContext,
                                     VCTreeContext, VTransEContext])
def test_context_shapes_and_jit(ctx_cls):
    feats, boxes, labels, valid = _inputs()
    m = ctx_cls(hidden_dim=8, num_classes=C)
    params = m.init(jax.random.PRNGKey(0), feats, boxes, labels, valid)
    ctx, logits = jax.jit(m.apply)(params, feats, boxes, labels, valid)
    assert ctx.shape[:2] == (B, N) and logits.shape == (B, N, C)
    assert np.all(np.isfinite(np.asarray(ctx)))
    # padded rows produce zero context
    assert np.allclose(np.asarray(ctx)[0, 4:], 0.0)


def test_biased_head_matches_flat_softmax():
    """With bias, composed joint log-probs must equal
    log_softmax(concat(branch_logits) + bias) — the flat SGB composition."""
    h = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    bias = jnp.asarray(np.random.RandomState(1).randn(4, 50), jnp.float32)
    m = BiasedBayesHead()
    params = m.init(jax.random.PRNGKey(0), h, bias)
    r1, r2, r3, sup = m.apply(params, h, bias)
    joint = np.concatenate([r1, r2, r3], axis=1)
    # recompute flat: logits per branch + bias seg, flat softmax over 50
    p = params["params"]

    def dense(name, x):
        return x @ p[name]["kernel"] + p[name]["bias"]

    l1 = dense("fc3_1", h) + bias[:, :15]
    l2 = dense("fc3_2", h) + bias[:, 15:26]
    l3 = dense("fc3_3", h) + bias[:, 26:]
    sup_l = dense("fc5", h) + np.stack(
        [jax.nn.logsumexp(bias[:, :15], axis=1),
         jax.nn.logsumexp(bias[:, 15:26], axis=1),
         jax.nn.logsumexp(bias[:, 26:], axis=1)], axis=1)
    # hierarchical composition identity: within-branch softmax + branch
    # posterior == flat softmax over (logit + bias - branch logsumexp +
    # sup_logit) — check branch-internal ratios and sup marginals instead
    flat1 = jax.nn.log_softmax(l1) + jax.nn.log_softmax(sup_l)[:, 0:1]
    np.testing.assert_allclose(np.asarray(flat1), np.asarray(joint[:, :15]),
                               atol=1e-5)
    # each branch sums to its super-category probability
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(r1, axis=1)), np.asarray(sup[:, 0]),
        atol=1e-5)


def test_frequency_bias_lookup():
    m = FrequencyBias(num_classes=C)
    sub = jnp.asarray([0, 3], jnp.int32)
    obj = jnp.asarray([1, 4], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), sub, obj)
    tab = np.asarray(params["params"]["table"]["embedding"])
    out = np.asarray(m.apply(params, sub, obj))
    np.testing.assert_allclose(out[0], tab[(0 + 1) * 151 + (1 + 1)])
    np.testing.assert_allclose(out[1], tab[(3 + 1) * 151 + (4 + 1)])


@pytest.mark.parametrize("family", ["motifs", "transformer", "vctree",
                                    "vtranse"])
def test_predictor_end_to_end(family):
    feats, boxes, labels, valid = _inputs()
    P = 8
    rng = np.random.RandomState(2)
    pair_sub = jnp.asarray(rng.randint(0, 4, (B, P)), jnp.int32)
    pair_obj = jnp.asarray((rng.randint(1, 4, (B, P)) + pair_sub) % 4,
                           jnp.int32)
    pair_mask = jnp.ones((B, P), bool)
    union = jnp.asarray(rng.randn(B, P, 12), jnp.float32)
    m = HierarchicalPredictor(family=family, hidden_dim=8, pair_dim=16,
                              num_classes=C)
    params = m.init(jax.random.PRNGKey(0), feats, boxes, labels, valid,
                    pair_sub, pair_obj, pair_mask, union)
    out = jax.jit(m.apply)(params, feats, boxes, labels, valid, pair_sub,
                           pair_obj, pair_mask, union)
    assert out["rel1"].shape == (B * P, 15)
    assert out["rel2"].shape == (B * P, 11)
    assert out["rel3"].shape == (B * P, 24)
    assert out["super_relation"].shape == (B * P, 3)
    # valid joint distribution: logsumexp over all 50 == 0
    total = jax.nn.logsumexp(
        jnp.concatenate([out["rel1"], out["rel2"], out["rel3"]], axis=1),
        axis=1)
    np.testing.assert_allclose(np.asarray(total), 0.0, atol=1e-5)

    # trains: loss decreases over a few SGD steps
    from scene_graph_commonsense_tpu.plugandplay import (
        hierarchical_relation_loss)
    targets = jnp.asarray(rng.randint(0, 50, (B * P,)), jnp.int32)
    connected = jnp.ones((B * P,), bool)

    def loss_fn(p):
        o = m.apply(p, feats, boxes, labels, valid, pair_sub, pair_obj,
                    pair_mask, union)
        return hierarchical_relation_loss(
            o["rel1"], o["rel2"], o["rel3"], o["super_relation"], targets,
            connected)

    g = jax.grad(loss_fn)(params)
    l0 = float(loss_fn(params))
    p1 = jax.tree.map(lambda a, b: a - 0.1 * b, params, g)
    assert float(loss_fn(p1)) < l0


def test_predictor_sgcls_mode_decodes_labels():
    feats, boxes, labels, valid = _inputs()
    pair_sub = jnp.zeros((B, 2), jnp.int32)
    pair_obj = jnp.ones((B, 2), jnp.int32)
    pair_mask = jnp.ones((B, 2), bool)
    m = HierarchicalPredictor(family="transformer", hidden_dim=8,
                              pair_dim=16, num_classes=C, mode="sgcls")
    params = m.init(jax.random.PRNGKey(0), feats, boxes, labels, valid,
                    pair_sub, pair_obj, pair_mask)
    out = m.apply(params, feats, boxes, labels, valid, pair_sub, pair_obj,
                  pair_mask)
    assert out["obj_logits"].shape == (B, N, C)
