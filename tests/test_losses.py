"""Loss functions vs naive (loop/dict-based) oracles of the reference math."""

import numpy as np
import jax.numpy as jnp

from scene_graph_commonsense_tpu.train import losses as L

NG, NP, NS = 15, 11, 24
R = NG + NP + NS


def log_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def make_hier_logprobs(rng, p):
    sup = log_softmax(rng.standard_normal((p, 3)))
    blocks = []
    for i, n in enumerate([NG, NP, NS]):
        blocks.append(log_softmax(rng.standard_normal((p, n)))
                      + sup[:, i:i + 1])
    return np.concatenate(blocks, axis=1).astype(np.float32), \
        sup.astype(np.float32)


def naive_weighted_nll(logp, targets, weights):
    num = sum(weights[t] * -logp[i, t] for i, t in enumerate(targets))
    den = sum(weights[t] for t in targets)
    return num / den


def test_relation_loss_hierarchical(rng):
    p = 40
    rel, sup = make_hier_logprobs(rng, p)
    targets = rng.integers(0, R, p)
    connected = rng.random(p) < 0.6
    w = rng.random(R).astype(np.float32) + 0.1

    got = float(L.relation_loss(jnp.asarray(rel), jnp.asarray(sup),
                                jnp.asarray(targets), jnp.asarray(connected),
                                jnp.asarray(w), NG, NP, hierarchical=True))

    idx = np.nonzero(connected)[0]
    sup_t = np.where(targets < NG, 0, np.where(targets < NG + NP, 1, 2))
    want = naive_weighted_nll(sup[idx], sup_t[idx], np.ones(3))
    for off, width in [(0, NG), (NG, NP), (NG + NP, NS)]:
        sel = idx[(targets[idx] >= off) & (targets[idx] < off + width)]
        if len(sel):
            want += naive_weighted_nll(rel[sel][:, off:off + width],
                                       targets[sel] - off,
                                       w[off:off + width])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_relation_loss_flat(rng):
    p = 30
    logits = rng.standard_normal((p, R)).astype(np.float32)
    targets = rng.integers(0, R, p)
    connected = rng.random(p) < 0.5
    w = rng.random(R).astype(np.float32) + 0.1
    got = float(L.relation_loss(jnp.asarray(logits), None,
                                jnp.asarray(targets), jnp.asarray(connected),
                                jnp.asarray(w), NG, NP, hierarchical=False))
    idx = np.nonzero(connected)[0]
    want = naive_weighted_nll(log_softmax(logits)[idx], targets[idx], w)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_relation_loss_empty_is_zero():
    rel, sup = make_hier_logprobs(np.random.default_rng(0), 5)
    got = L.relation_loss(jnp.asarray(rel), jnp.asarray(sup),
                          jnp.full(5, -1), jnp.zeros(5, bool),
                          jnp.ones(R), NG, NP, hierarchical=True)
    assert float(got) == 0.0


def test_connectivity_loss(rng):
    p = 50
    logits = rng.standard_normal(p).astype(np.float32) * 2
    connected = rng.random(p) < 0.3
    valid = rng.random(p) < 0.8
    lam = 0.7
    st = L.connectivity_loss(jnp.asarray(logits), jnp.asarray(connected),
                             jnp.asarray(valid), lam)
    cm = connected & valid
    nm = valid & ~connected

    def bce(x, t):
        return np.log1p(np.exp(-x)) if t == 1 else np.log1p(np.exp(x))

    want = lam * np.mean([bce(x, 0) for x in logits[nm]]) \
        + np.mean([bce(x, 1) for x in logits[cm]])
    np.testing.assert_allclose(float(st.loss), want, rtol=1e-5)
    prob = 1 / (1 + np.exp(-logits))
    assert int(st.num_connected) == cm.sum()
    assert int(st.num_not_connected) == nm.sum()
    assert int(st.num_connected_pred) == ((prob >= 0.5) & valid).sum()
    assert int(st.precision_hits) == ((prob >= 0.5) & valid & connected).sum()
    assert int(st.recall_hits) == (np.round(prob).astype(bool) & cm).sum()


def test_commonsense_loss_hierarchical(rng):
    p, c = 12, 10
    rel, _ = make_hier_logprobs(rng, p)
    sub = rng.integers(0, c, p)
    obj = rng.integers(0, c, p)
    valid = rng.random(p) < 0.8
    aligned = np.zeros(c * R * c, bool)
    violated = np.zeros(c * R * c, bool)
    aligned[rng.integers(0, c * R * c, 200)] = True
    violated[rng.integers(0, c * R * c, 100)] = True

    got = float(L.commonsense_loss(
        jnp.asarray(rel), jnp.asarray(sub), jnp.asarray(obj),
        jnp.asarray(valid), jnp.asarray(aligned), jnp.asarray(violated),
        NG, NP, num_classes=c, lambda_weak=0.1, lambda_strong=10.0,
        hierarchical=True))

    # oracle (reference train_utils.py:36-60)
    def softmax(x):
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    probs, preds = [], []
    for off, width in [(0, NG), (NG, NP), (NG + NP, NS)]:
        block = rel[:, off:off + width]
        probs.append(softmax(block).max(axis=1))
        preds.append(block.argmax(axis=1) + off)
    probs = np.concatenate(probs)
    preds = np.concatenate(preds)
    subs = np.concatenate([sub] * 3)
    objs = np.concatenate([obj] * 3)
    mask = np.concatenate([valid] * 3)
    tid = (subs * R + preds) * c + objs
    weak = probs[mask & ~aligned[tid]]
    strong = probs[mask & violated[tid]]
    want = 0.0
    if len(weak):
        want += 0.1 * weak.mean()
    if len(strong):
        want += 10.0 * strong.mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def naive_supcon_hierar(features, labels, t=0.07, base_t=0.07):
    """Direct port of the reference SupConLossHierar math in numpy
    (reference sup_contrast/losses.py:100-181), no padding."""
    m, n_views, d = features.shape
    parent = np.where(labels < 15, 0, np.where(labels < 26, 1, 2))
    z = np.concatenate([features[:, i] for i in range(n_views)], axis=0)
    labels_t = np.tile(labels, n_views)
    parent_t = np.tile(parent, n_views)
    logits = z @ z.T / t
    logits = logits - logits.max(axis=1, keepdims=True)
    mask = (labels_t[:, None] == labels_t[None, :]).astype(np.float64)
    same_parent = (parent_t[:, None] == parent_t[None, :]).astype(np.float64)
    logits_mask = 1.0 - np.eye(m * n_views)
    mask = mask * logits_mask
    den_mask = logits_mask * same_parent
    exp_logits = np.exp(logits) * den_mask
    log_prob = logits - np.log(exp_logits.sum(axis=1, keepdims=True) + 1e-7)
    mean_log_prob_pos = (mask * log_prob).sum(axis=1) / (mask.sum(axis=1)
                                                         + 1e-7)
    return (-(t / base_t) * mean_log_prob_pos).mean()


def test_supcon_hierar_matches_reference_math(rng):
    m, d = 14, 16
    # modest feature scale keeps exp() well-conditioned so f32 vs f64
    # agreement stays tight
    feats = 0.3 * rng.standard_normal((m, 2, d)).astype(np.float32)
    labels = rng.integers(0, R, m)
    want = naive_supcon_hierar(feats.astype(np.float64), labels)
    got = float(L.supcon_hierar_loss(jnp.asarray(feats), jnp.asarray(labels),
                                     jnp.ones(m, bool), NG, NP))
    # semantics verified exactly under float64 (diff ~1e-14); f32 exp/log
    # rounding accounts for the remaining gap
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_supcon_hierar_padding_invariance(rng):
    m, d, pad = 10, 8, 6
    feats = 0.3 * rng.standard_normal((m, 2, d)).astype(np.float32)
    labels = rng.integers(0, R, m)
    base = float(L.supcon_hierar_loss(jnp.asarray(feats), jnp.asarray(labels),
                                      jnp.ones(m, bool), NG, NP))
    feats_p = np.concatenate(
        [feats, rng.standard_normal((pad, 2, d)).astype(np.float32)])
    labels_p = np.concatenate([labels, rng.integers(0, R, pad)])
    valid = np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
    padded = float(L.supcon_hierar_loss(
        jnp.asarray(feats_p), jnp.asarray(labels_p), jnp.asarray(valid),
        NG, NP))
    np.testing.assert_allclose(padded, base, rtol=1e-4)
