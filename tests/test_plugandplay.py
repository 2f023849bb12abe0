"""Plug-and-play components: heads, postprocessor, loss, validator."""

import numpy as np
import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.plugandplay import (
    BayesHead, BayesHeadProd, CommonsenseValidator,
    hierarchical_postprocess, hierarchical_relation_loss)


def test_bayes_head_log_vs_prod_consistent(rng):
    h = jnp.asarray(rng.standard_normal((6, 32)).astype(np.float32))
    log_head = BayesHead(num_geometric=5, num_possessive=4, num_semantic=3)
    params = log_head.init(jax.random.PRNGKey(0), h)
    r1, r2, r3, sup = log_head.apply(params, h)
    prod_head = BayesHeadProd(num_geometric=5, num_possessive=4,
                              num_semantic=3)
    p1, p2, p3, psup = prod_head.apply(params, h)   # same param structure
    np.testing.assert_allclose(np.exp(np.asarray(r1)), np.asarray(p1),
                               atol=1e-5)
    np.testing.assert_allclose(np.exp(np.asarray(sup)), np.asarray(psup),
                               atol=1e-5)
    # each head's composed scores sum to 1 across all 12 predicates
    total = np.asarray(p1).sum(1) + np.asarray(p2).sum(1) \
        + np.asarray(p3).sum(1)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def test_hierarchical_postprocess(rng):
    p, ng, npos, ns = 4, 5, 4, 3
    r1 = jnp.asarray(rng.standard_normal((p, ng)).astype(np.float32))
    r2 = jnp.asarray(rng.standard_normal((p, npos)).astype(np.float32))
    r3 = jnp.asarray(rng.standard_normal((p, ns)).astype(np.float32))
    rel_ids, scores, pair_index, order = hierarchical_postprocess(r1, r2, r3)
    assert rel_ids.shape == (3 * p,)
    ids = np.asarray(rel_ids)
    assert (ids[:p] < ng).all()
    assert ((ids[p:2 * p] >= ng) & (ids[p:2 * p] < ng + npos)).all()
    assert (ids[2 * p:] >= ng + npos).all()
    s = np.asarray(scores)
    assert (np.diff(s[np.asarray(order)]) <= 1e-6).all()


def test_hierarchical_relation_loss_runs(rng):
    p = 10
    r1 = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((p, 15)).astype(np.float32)))
    r2 = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((p, 11)).astype(np.float32)))
    r3 = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((p, 24)).astype(np.float32)))
    sup = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((p, 3)).astype(np.float32)))
    targets = jnp.asarray(rng.integers(0, 50, p))
    connected = jnp.asarray(rng.random(p) < 0.7)
    loss = hierarchical_relation_loss(r1, r2, r3, sup, targets, connected)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_commonsense_validator(rng):
    def transport(prompts):
        # approve anything mentioning 'man', reject the rest
        return ["Yes" if "man" in p else "No" for p in prompts]

    v = CommonsenseValidator(transport=transport, top_k=3)
    sub = np.array([1, 0, 2])        # man, tree, window
    rel = np.array([42, 42, 42])     # riding
    obj = np.array([67, 67, 67])     # horse
    votes = v.query(sub, rel, obj)
    np.testing.assert_array_equal(votes, [1, -1, -1])

    scores = np.array([5.0, 4.0, 3.0, 2.0])
    new = v.filter_scores(scores, np.array([1, 0, 2, 1]),
                          np.array([42] * 4), np.array([67] * 4))
    assert new[0] == 5.0             # approved stays
    assert np.isinf(new[1]) and new[1] < 0
    assert np.isinf(new[2]) and new[2] < 0
    assert new[3] == 2.0             # outside top_k: untouched
