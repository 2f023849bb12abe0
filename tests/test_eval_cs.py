"""eval_cs filtering, converted artifact tables, and DETR featurization."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
from test_engine import tiny_cfg, tiny_batch, init_params  # noqa: E402

from scene_graph_commonsense_tpu.data.artifacts import (  # noqa: E402
    VGArtifacts, load_vg_artifacts, triplet_table_from_ids)
from scene_graph_commonsense_tpu.eval import engines  # noqa: E402
from scene_graph_commonsense_tpu.models.relation_head import (  # noqa: E402
    make_relation_classifier)


def test_converted_artifacts_load():
    art = load_vg_artifacts("datasets/artifacts")
    assert art.zs_table is not None and art.zs_table.sum() == 4314
    assert art.train_table.sum() == 26033
    assert art.sub2super is not None and art.sub2super.shape == (150, 17)
    assert art.cs_aligned is not None and art.cs_aligned.any()
    assert art.cs_violated is not None and art.cs_violated.any()
    # zero-shot triplets never appear in training (reference
    # dataset_utils.py:282-284 invariant)
    assert not (art.zs_table & art.train_table).any()


def test_eval_cs_filters_confidences(rng):
    """eval_cs demotes candidates outside the aligned set / inside the
    violated set to -inf confidence (they still occupy ranked slots, like
    the reference's masking, reference evaluator.py:149-154): with exactly
    the GT triplets aligned, matching candidates float to the top and
    recall can only improve."""
    cfg = tiny_cfg()
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    batches = [tiny_batch(rng, cfg, with_aug=False)]
    res_plain = engines.run_eval_pc(cfg, model, params, batches)

    # an all-aligned set filters nothing -> identical recall
    everything = VGArtifacts(
        cs_aligned=np.ones(150 * 50 * 150, bool),
        cs_violated=np.zeros(150 * 50 * 150, bool))
    res_all = engines.run_eval_pc(cfg, model, params, batches,
                                  artifacts=everything, use_cs=True)
    assert res_all["recall"] == res_plain["recall"]

    # aligned = exactly the batch's GT triplets -> oracle commonsense:
    # recall@20 must not drop (matching candidates get promoted)
    batch = batches[0]
    rel = np.asarray(batch["rel"])
    cats = np.asarray(batch["cats"])
    img, i, j = np.nonzero(rel >= 0)
    gt = triplet_table_from_ids(cats[img, i], rel[img, i, j], cats[img, j])
    oracle = VGArtifacts(cs_aligned=gt,
                         cs_violated=np.zeros_like(gt))
    res_gt = engines.run_eval_pc(cfg, model, params, batches,
                                 artifacts=oracle, use_cs=True)
    assert res_gt["recall"][0] >= res_plain["recall"][0]
    assert res_gt["recall"][2] >= res_plain["recall"][2]


def test_detr_featurize_fn(rng):
    from scene_graph_commonsense_tpu.models.detr import DETR
    from scene_graph_commonsense_tpu.train.loop import make_detr_featurize_fn
    cfg = tiny_cfg()
    detr = DETR(num_classes=151, num_queries=4, d_model=16, nhead=2,
                num_encoder_layers=1, num_decoder_layers=1, dim_ff=32)
    img = jnp.zeros((1, 64, 64, 3))
    dparams = detr.init(jax.random.PRNGKey(0), img,
                        jnp.ones((1, 64, 64), bool))
    featurize = make_detr_featurize_fn(cfg, detr, dparams)
    img_a = np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32)
    img_b = np.random.default_rng(1).normal(
        size=(2, 64, 64, 3)).astype(np.float32)
    batch = {"image": img_a, "image_aug": img_b,
             "cats": np.zeros((2, 3), np.int32)}
    out = featurize(batch)
    assert out["features"].shape == (2, 2, 2, 16)   # stride 32
    assert out["features_aug"].shape == (2, 2, 2, 16)
    assert "image" not in out and "image_aug" not in out
    # the fused two-view encode must match per-view encodes
    solo = featurize({"image": img_a})["features"]
    solo_aug = featurize({"image": img_b})["features"]
    np.testing.assert_allclose(out["features"], solo, atol=1e-5)
    np.testing.assert_allclose(out["features_aug"], solo_aug, atol=1e-5)
