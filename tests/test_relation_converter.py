"""Reference relation-head checkpoint conversion: a randomly initialized
torch-layout state dict run through literal torch-semantics math (NCHW convs,
C-major flatten, one-hot concat) must match our factored Flax model on the
converted params — exactly, under float64."""

import numpy as np
import jax
import jax.numpy as jnp

from scene_graph_commonsense_tpu.models.relation_head import (
    RelationClassifier)
from scene_graph_commonsense_tpu.models.weights import (
    convert_relation_state_dict)

H, FS, NC, NS = 8, 16, 20, 5          # hidden, feature size, classes, supers
NG, NP_, NSEM = 15, 11, 24


def make_torch_state(rng):
    st = {}

    def conv(name, cout, cin, k):
        st[f"{name}.weight"] = (rng.standard_normal((cout, cin, k, k))
                                / np.sqrt(cin * k * k))
        st[f"{name}.bias"] = 0.1 * rng.standard_normal(cout)

    def dense(name, cout, cin):
        st[f"{name}.weight"] = rng.standard_normal((cout, cin)) \
            / np.sqrt(cin)
        st[f"{name}.bias"] = 0.1 * rng.standard_normal(cout)

    conv("module.conv1_1", H, 2 * H + 1, 1)
    conv("module.conv1_2", H, 2 * H + 1, 1)
    conv("module.conv2_1", 4 * H, 2 * H, 3)
    conv("module.conv3_1", 8 * H, 4 * H, 3)
    dense("module.fc1", 4096, 8 * H * (FS // 4) ** 2)
    dense("module.fc2", 512, 4096 + 2 * (NC + NS))
    dense("module.fc3_1", NG, 512)
    dense("module.fc3_2", NP_, 512)
    dense("module.fc3_3", NSEM, 512)
    dense("module.fc4", 1, 512)
    dense("module.fc5", 3, 512)
    return st


def conv_nchw(x, w, b, padding):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + jnp.asarray(b)[None, :, None, None]


def maxpool_nchw(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def torch_semantics_forward(st, x_sub, x_obj, c1, c2, s1, s2):
    """Literal reference math in the torch layout (reference
    model.py:138-186)."""
    lin = lambda x, n: x @ jnp.asarray(st[f"module.{n}.weight"]).T \
        + jnp.asarray(st[f"module.{n}.bias"])  # noqa: E731
    u = jnp.tanh(conv_nchw(x_sub, st["module.conv1_1.weight"],
                           st["module.conv1_1.bias"], "VALID"))
    v = jnp.tanh(conv_nchw(x_obj, st["module.conv1_2.weight"],
                           st["module.conv1_2.bias"], "VALID"))
    h = jnp.concatenate([u, v], axis=1)
    h = jax.nn.relu(conv_nchw(h, st["module.conv2_1.weight"],
                              st["module.conv2_1.bias"], "SAME"))
    h = maxpool_nchw(h)
    h = jax.nn.relu(conv_nchw(h, st["module.conv3_1.weight"],
                              st["module.conv3_1.bias"], "SAME"))
    h = maxpool_nchw(h)
    h = h.reshape(h.shape[0], -1)            # C-major flatten (torch)
    h = jax.nn.relu(lin(h, "fc1"))
    hc = jnp.concatenate([h, jax.nn.one_hot(c1, NC), jax.nn.one_hot(c2, NC),
                          s1, s2], axis=1)
    pred = jax.nn.relu(lin(hc, "fc2"))
    conn = lin(pred, "fc4")[:, 0]
    sup = jax.nn.log_softmax(lin(pred, "fc5"))
    rels = []
    for i, name in enumerate(["fc3_1", "fc3_2", "fc3_3"]):
        rels.append(jax.nn.log_softmax(lin(pred, name)) + sup[:, i:i + 1])
    return jnp.concatenate(rels, axis=1), sup, conn


def test_relation_converter_exact_under_f64(rng):
    with jax.enable_x64():
        st = make_torch_state(rng)
        params = convert_relation_state_dict(
            st, hierarchical=True, use_super=True, num_classes=NC,
            num_super_classes=NS, hidden_dim=H, feature_size=FS)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)

        p = 5
        x_nchw = rng.standard_normal((p, 2 * H + 1, FS, FS))
        y_nchw = rng.standard_normal((p, 2 * H + 1, FS, FS))
        c1 = rng.integers(0, NC, p)
        c2 = rng.integers(0, NC, p)
        s1 = (rng.random((p, NS)) < 0.4).astype(np.float64)
        s2 = (rng.random((p, NS)) < 0.4).astype(np.float64)

        rel_t, sup_t, conn_t = torch_semantics_forward(
            st, jnp.asarray(x_nchw), jnp.asarray(y_nchw),
            jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(s1),
            jnp.asarray(s2))

        mdl = RelationClassifier(
            hidden_dim=H, feature_size=FS, num_classes=NC,
            num_super_classes=NS, num_relations=50, num_geometric=NG,
            num_possessive=NP_, num_semantic=NSEM, hierarchical=True,
            use_super=True, dtype=jnp.float64)
        out = mdl.apply(params, jnp.asarray(x_nchw).transpose(0, 2, 3, 1),
                        jnp.asarray(y_nchw).transpose(0, 2, 3, 1),
                        jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(s1),
                        jnp.asarray(s2))
        np.testing.assert_allclose(out["relation"], rel_t, atol=1e-9)
        np.testing.assert_allclose(out["super_relation"], sup_t, atol=1e-9)
        np.testing.assert_allclose(out["connectivity"], conn_t, atol=1e-9)
