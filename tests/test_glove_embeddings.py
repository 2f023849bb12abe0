"""GloVe label-embedding init for the pnp context models.

The reference's graft targets initialize object-label embeddings from
GloVe vectors (reference README_PLUGANDPLAY.md:56-69); here the offline
converter (tools/glove_embeddings.py) builds the table and
train.pnp_engine.apply_glove_init overwrites the `label_embed` rows at
predictor init.  Covers: multi-word-name averaging, OOV fallback rows,
dim-mismatch error, absent-file fallback, and that the hook reaches the
embedding through a real predictor tree.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from glove_embeddings import build_table  # noqa: E402

from scene_graph_commonsense_tpu.config import derive
from scene_graph_commonsense_tpu.constants import VG_OBJECTS
from scene_graph_commonsense_tpu.train import pnp_engine


@pytest.fixture
def glove_file(tmp_path):
    """Tiny GloVe txt covering a few VG tokens (dim 4)."""
    rows = {
        "man": [1, 0, 0, 0], "tree": [0, 1, 0, 0],
        "traffic": [2, 0, 2, 0], "light": [0, 2, 0, 2],
        "unrelated": [9, 9, 9, 9],
    }
    p = tmp_path / "glove.4d.txt"
    with open(p, "w") as f:
        for tok, v in rows.items():
            f.write(tok + " " + " ".join(str(x) for x in v) + "\n")
    return str(p)


def test_build_table_averages_multiword(glove_file):
    names = ["man", "traffic light", "xyzzy", "tree xyzzy"]
    vecs, found = build_table(names, glove_file)
    assert found.tolist() == [True, True, False, True]
    np.testing.assert_array_equal(vecs[0], [1, 0, 0, 0])
    # multi-word mean
    np.testing.assert_array_equal(vecs[1], [1, 1, 1, 1])
    # OOV name stays zero/unfound
    np.testing.assert_array_equal(vecs[2], 0)
    # partially-resolved name averages its in-vocab tokens only
    np.testing.assert_array_equal(vecs[3], [0, 1, 0, 0])


def _mini_cfg(tmp_path, dim):
    return derive(
        "vg", hierarchical_pred=True,
        model={"feature_size": 8, "hidden_dim": 16, "num_img_feature": 8,
               "glove_embeddings": os.path.join(tmp_path, "glove.npz")},
        data={"max_objects": 4},
        training={"eval_mode": "pc", "batch_size": 1})


def _write_table(tmp_path, n, dim, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    found = rng.random(n) < 0.8
    vecs[~found] = 0
    np.savez(os.path.join(tmp_path, "glove.npz"),
             vectors=vecs, found=found)
    return vecs, found


def test_apply_glove_init_replaces_rows(tmp_path):
    cfg = _mini_cfg(str(tmp_path), 100)
    vecs, found = _write_table(str(tmp_path), len(VG_OBJECTS), 100)
    pred = pnp_engine.make_predictor(cfg, "motifs")
    logs = []
    params = pnp_engine.init_predictor_params(cfg, pred,
                                              log_fn=logs.append)
    assert any("Initialized context label embeddings" in ln for ln in logs)
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    tabs = [np.asarray(v) for k, v in flat.items()
            if k[-2:] == ("label_embed", "embedding")]
    assert tabs, "motifs predictor has no label_embed"
    for tab in tabs:
        rows = np.nonzero(found)[0]
        np.testing.assert_allclose(tab[rows], vecs[rows], atol=1e-6)
        # unresolved rows keep the (nonzero) learned init
        miss = np.nonzero(~found)[0]
        assert np.abs(tab[miss]).sum() > 0


def test_apply_glove_init_fallback_and_mismatch(tmp_path):
    cfg = _mini_cfg(str(tmp_path), 100)
    pred = pnp_engine.make_predictor(cfg, "motifs")
    logs = []
    params = pnp_engine.init_predictor_params(cfg, pred,
                                              log_fn=logs.append)
    assert any("not found" in ln for ln in logs)  # documented fallback

    _write_table(str(tmp_path), len(VG_OBJECTS), 37)
    with pytest.raises(ValueError, match="dim 37"):
        pnp_engine.apply_glove_init(cfg, params, log_fn=logs.append)


def test_synthetic_stand_in_resolves_all_vg_classes():
    """The committed stand-in artifact (real GloVe is environment-blocked
    here — zero egress) must resolve every VG class deterministically and
    share token vectors across multiword names."""
    from glove_embeddings import build_synthetic_table

    vecs, found = build_synthetic_table(VG_OBJECTS, dim=100)
    assert found.all()
    vecs2, _ = build_synthetic_table(VG_OBJECTS, dim=100)
    np.testing.assert_array_equal(vecs, vecs2)      # deterministic
    # single-token names are unit vectors; multiword names are pooled
    norms = np.linalg.norm(vecs, axis=1)
    single = [i for i, n in enumerate(VG_OBJECTS) if len(n.split()) == 1]
    np.testing.assert_allclose(norms[single], 1.0, atol=1e-5)

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "datasets", "artifacts",
        "glove_labels_vg.synthetic.npz")
    assert os.path.exists(art), "committed stand-in table missing"
    with np.load(art) as npz:
        assert str(npz["source"]) == "synthetic-hash"
        np.testing.assert_array_equal(npz["vectors"], vecs)


def test_apply_glove_init_falls_back_to_committed_synthetic(tmp_path):
    """When the real-GloVe path is absent but its .synthetic.npz sibling
    exists, the hook loads the stand-in (non-fallback path exercised by a
    COMMITTED artifact, r4 verdict #8) and says so in the log line."""
    cfg = _mini_cfg(str(tmp_path), 100)
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((len(VG_OBJECTS), 100)).astype(np.float32)
    found = np.ones(len(VG_OBJECTS), bool)
    np.savez(os.path.join(tmp_path, "glove.synthetic.npz"),
             vectors=vecs, found=found, source="synthetic-hash")
    pred = pnp_engine.make_predictor(cfg, "motifs")
    logs = []
    params = pnp_engine.init_predictor_params(cfg, pred,
                                              log_fn=logs.append)
    assert any("source=synthetic-hash" in ln for ln in logs), logs
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    tabs = [np.asarray(v) for k, v in flat.items()
            if k[-2:] == ("label_embed", "embedding")]
    for tab in tabs:
        np.testing.assert_allclose(tab[:len(VG_OBJECTS)], vecs, atol=1e-6)
