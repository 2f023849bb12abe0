"""Relation-classifier equivalence tests.

The factored pair trunk (per-object conv2a/conv2b + relu(a+b), pool-before-
relu, embedding-sum fc2) must be numerically identical to a naive
implementation of the reference math (reference model.py:138-186): 1x1 convs,
channel concat, full 3x3 conv, relu -> maxpool -> conv3 -> relu -> maxpool ->
fc1 -> relu -> concat one-hots -> fc2 -> relu -> heads.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.models.relation_head import (
    RelationClassifier, assemble_object_stack)


def make_model(hierarchical=True, use_super=True, num_classes=20,
               feature_size=16, hidden_dim=8, dtype=jnp.float32):
    return RelationClassifier(
        hidden_dim=hidden_dim, feature_size=feature_size,
        num_classes=num_classes, num_super_classes=5, num_relations=50,
        num_geometric=15, num_possessive=11, num_semantic=24,
        hierarchical=hierarchical, use_super=use_super, dtype=dtype)


def make_inputs(rng, p=6, s=16, hidden=8, num_classes=20, num_super=5):
    x_sub = rng.standard_normal((p, s, s, 2 * hidden + 1)).astype(np.float32)
    x_obj = rng.standard_normal((p, s, s, 2 * hidden + 1)).astype(np.float32)
    c1 = rng.integers(0, num_classes, p)
    c2 = rng.integers(0, num_classes, p)
    s1 = (rng.random((p, num_super)) < 0.3).astype(np.float32)
    s2 = (rng.random((p, num_super)) < 0.3).astype(np.float32)
    return (jnp.asarray(x_sub), jnp.asarray(x_obj), jnp.asarray(c1),
            jnp.asarray(c2), jnp.asarray(s1), jnp.asarray(s2))


def conv2d(x, kernel, bias=None, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias
    return y


def maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def naive_reference_forward(params, mdl, x_sub, x_obj, c1, c2, s1, s2):
    """Literal reference math from the factored parameter set."""
    p = params["params"]
    u = jnp.tanh(conv2d(x_sub, p["conv1_sub"]["kernel"],
                        p["conv1_sub"]["bias"], "VALID"))
    v = jnp.tanh(conv2d(x_obj, p["conv1_obj"]["kernel"],
                        p["conv1_obj"]["bias"], "VALID"))
    uv = jnp.concatenate([u, v], axis=-1)
    # full conv2 kernel: subject half ++ object half along in-channels
    k2 = jnp.concatenate([p["conv2_sub"]["kernel"],
                          p["conv2_obj"]["kernel"]], axis=2)
    h = jax.nn.relu(conv2d(uv, k2, p["conv2_obj"]["bias"]))
    h = maxpool2(h)                                      # reference order
    h = jax.nn.relu(conv2d(h, p["conv3"]["kernel"], p["conv3"]["bias"]))
    h = maxpool2(h)
    h = h.reshape(h.shape[0], -1)
    h = jax.nn.relu(h @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    # fc2 over the concatenated [h, onehot(c1), onehot(c2), s1, s2]
    cols = [p["fc2_h"]["kernel"], p["emb_c1"]["embedding"],
            p["emb_c2"]["embedding"]]
    feats = [h, jax.nn.one_hot(c1, mdl.num_classes),
             jax.nn.one_hot(c2, mdl.num_classes)]
    if mdl.use_super:
        cols += [p["fc2_s1"]["kernel"], p["fc2_s2"]["kernel"]]
        feats += [s1, s2]
    w2 = jnp.concatenate(cols, axis=0)
    hc = jnp.concatenate(feats, axis=1)
    pred = jax.nn.relu(hc @ w2 + p["fc2_h"]["bias"])
    conn = (pred @ p["fc4"]["kernel"] + p["fc4"]["bias"])[:, 0]
    if mdl.hierarchical:
        sup = jax.nn.log_softmax(pred @ p["fc5"]["kernel"] + p["fc5"]["bias"])
        rels = []
        for i, t in enumerate([mdl.T1, mdl.T2, mdl.T3]):
            w = p[f"fc3_{i + 1}"]
            rels.append(jax.nn.log_softmax(
                (pred @ w["kernel"] + w["bias"]) / t) + sup[:, i:i + 1])
        rel = jnp.concatenate(rels, axis=1)
        return rel, sup, conn, pred
    rel = pred @ p["fc3"]["kernel"] + p["fc3"]["bias"]
    return rel, None, conn, pred


def test_factored_equals_reference_math_hierarchical(rng):
    """Exact equivalence under float64 (f32 differs only by dot-accumulation
    order, verified separately below)."""
    with jax.enable_x64():
        mdl = make_model(hierarchical=True, dtype=jnp.float64)
        inputs = jax.tree.map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            make_inputs(rng))
        params = mdl.init(jax.random.PRNGKey(0), *inputs)
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        out = mdl.apply(params, *inputs)
        rel, sup, conn, pred = naive_reference_forward(params, mdl, *inputs)
        np.testing.assert_allclose(out["relation"], rel, atol=1e-10)
        np.testing.assert_allclose(out["super_relation"], sup, atol=1e-10)
        np.testing.assert_allclose(out["connectivity"], conn, atol=1e-10)
        np.testing.assert_allclose(out["hidden"], pred, atol=1e-10)


def test_factored_equals_reference_math_flat(rng):
    """f32 path: same semantics, bounded only by accumulation-order noise."""
    mdl = make_model(hierarchical=False, use_super=False)
    x_sub, x_obj, c1, c2, _, _ = make_inputs(rng)
    params = mdl.init(jax.random.PRNGKey(1), x_sub, x_obj, c1, c2)
    out = mdl.apply(params, x_sub, x_obj, c1, c2)
    rel, _, conn, pred = naive_reference_forward(
        params, mdl, x_sub, x_obj, c1, c2, None, None)
    np.testing.assert_allclose(out["relation"], rel, atol=5e-3)
    np.testing.assert_allclose(out["connectivity"], conn, atol=5e-3)
    assert out["relation"].shape == (x_sub.shape[0], 50)
    assert pred.shape == (x_sub.shape[0], 512)


def test_bayes_composition():
    """Each hierarchical block must normalize to its super-category
    probability: logsumexp(block) == log p(super) and the 50 composed
    log-probs sum to 1 in probability space (reference model.py:177-185)."""
    rng = np.random.default_rng(3)
    mdl = make_model(hierarchical=True)
    inputs = make_inputs(rng)
    params = mdl.init(jax.random.PRNGKey(2), *inputs)
    out = mdl.apply(params, *inputs)
    rel, sup = np.asarray(out["relation"]), np.asarray(out["super_relation"])
    from scipy.special import logsumexp
    np.testing.assert_allclose(logsumexp(rel[:, :15], axis=1), sup[:, 0],
                               atol=1e-4)
    np.testing.assert_allclose(logsumexp(rel[:, 15:26], axis=1), sup[:, 1],
                               atol=1e-4)
    np.testing.assert_allclose(logsumexp(rel[:, 26:], axis=1), sup[:, 2],
                               atol=1e-4)
    np.testing.assert_allclose(np.exp(rel).sum(axis=1), 1.0, atol=1e-4)


def test_assemble_object_stack(rng):
    b, n, s, c = 2, 3, 8, 4
    feats = jnp.asarray(rng.standard_normal((b, s, s, c)).astype(np.float32))
    depth = jnp.asarray(rng.standard_normal((b, s, s, 1)).astype(np.float32))
    masks = jnp.asarray((rng.random((b, n, s, s)) < 0.5).astype(np.float32))
    x = assemble_object_stack(feats, depth, masks)
    assert x.shape == (b, n, s, s, c + 1)
    f, d, m = np.asarray(feats), np.asarray(depth), np.asarray(masks)
    np.testing.assert_allclose(
        np.asarray(x)[..., :c], f[:, None] * m[..., None])
    np.testing.assert_allclose(
        np.asarray(x)[..., c:], d[:, None] * m[..., None])


def test_from_image_streams_match_assembled(rng):
    """object_streams[_grouped]_from_image (per-image conv1, mask folded in
    post-hoc) must match object_streams[_grouped] on the materialized
    masked stack exactly — the masking identity conv1(x*m) ==
    where(m, conv1(x), bias) holds for {0,1} masks."""
    b, n, s, hidden = 2, 3, 16, 8
    mdl = make_model(feature_size=s, hidden_dim=hidden)
    feats = jnp.asarray(
        rng.standard_normal((b, s, s, 2 * hidden)).astype(np.float32))
    depth = jnp.asarray(
        rng.standard_normal((b, s, s, 1)).astype(np.float32))
    masks = np.zeros((b, n, s, s), np.float32)
    for bi in range(b):
        for ni in range(n - 1):      # last object left all-zero (invalid)
            y0, x0 = rng.integers(0, s - 2, 2)
            y1, x1 = y0 + rng.integers(1, 3), x0 + rng.integers(1, 3)
            masks[bi, ni, y0:y1, x0:x1] = 1.0
    masks = jnp.asarray(masks)

    x0i = jnp.zeros((2, s, s, 2 * hidden + 1))
    c0 = jnp.zeros(2, jnp.int32)
    s0 = jnp.zeros((2, 5))
    params = mdl.init(jax.random.PRNGKey(0), x0i, x0i, c0, c0, s0, s0)

    stack = assemble_object_stack(feats, depth, masks)
    stack = stack.reshape((b * n,) + stack.shape[2:])

    a_ref, b_ref = mdl.apply(params, stack,
                             method=RelationClassifier.object_streams)
    a_new, b_new = mdl.apply(
        params, feats, depth, masks,
        method=RelationClassifier.object_streams_from_image)
    np.testing.assert_allclose(np.asarray(a_new), np.asarray(a_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b_new), np.asarray(b_ref),
                               atol=1e-5, rtol=1e-5)

    a4_ref, b4_ref = mdl.apply(
        params, stack, method=RelationClassifier.object_streams_grouped)
    a4_new, b4_new = mdl.apply(
        params, feats, depth, masks,
        method=RelationClassifier.object_streams_grouped_from_image)
    np.testing.assert_allclose(np.asarray(a4_new), np.asarray(a4_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b4_new), np.asarray(b4_ref),
                               atol=1e-5, rtol=1e-5)
