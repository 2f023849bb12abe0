"""OIv6 dataset, visualization dumps, depth normalization, clustering."""

import json

import numpy as np

from scene_graph_commonsense_tpu.config import derive
from scene_graph_commonsense_tpu.constants import OIV6_REORDER_BY_SUPER
from scene_graph_commonsense_tpu.data.oiv6 import OIV6Dataset, oiv6_batches
from scene_graph_commonsense_tpu.eval.recall import Candidates, Targets
from scene_graph_commonsense_tpu.eval.visualization import (
    save_visualization_results, visualization_record)


def make_oiv6_fixture(tmp_path, n_images=3):
    records = []
    for i in range(n_images):
        records.append({
            "img_fn": f"img{i}",
            "img_size": [200, 100],            # (w, h)
            "det_labels": [5, 17, 30],
            "bbox": [[0, 0, 50, 50], [60, 10, 120, 60], [10, 60, 90, 95]],
            "rel": [[0, 1, 2], [2, 0, 7]],
        })
    path = tmp_path / "vrd-test-anno.json"
    path.write_text(json.dumps(records))
    return str(path)


def test_oiv6_dataset(tmp_path):
    cfg = derive("oiv6", data={"max_objects": 6})
    path = make_oiv6_fixture(tmp_path)
    ds = OIV6Dataset(cfg, path, training=False)
    ex = ds.get_example(0)
    assert ex is not None
    assert ex["cats"].shape == (6,)
    np.testing.assert_array_equal(ex["cats"][:3], [5, 17, 30])
    # relation 2 ('wears') reorders to super slot 5
    assert ex["rel"][0, 1] == OIV6_REORDER_BY_SUPER[2]
    assert ex["rel"][2, 0] == OIV6_REORDER_BY_SUPER[7]
    # boxes rescaled 200x100 -> 32x32, canonical format well-formed
    b = ex["boxes"][ex["valid"]]
    assert (b[:, 1] >= b[:, 0]).all() and (b[:, 3] >= b[:, 2]).all()
    assert b.max() <= 32

    batches = list(oiv6_batches(ds, batch_size=2, shuffle=False))
    assert batches[0]["cats"].shape == (2, 6)
    assert "super_mh" not in batches[0]


def test_oiv6_eval_reports_wmap(tmp_path, rng):
    """OIv6 PredCLS eval reports weighted mAP alongside R@k."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import init_params
    from scene_graph_commonsense_tpu.eval.engines import run_eval_pc
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    from scene_graph_commonsense_tpu.data.synthetic import synthetic_batch

    cfg = derive("oiv6",
                 model={"feature_size": 16, "hidden_dim": 8,
                        "num_img_feature": 16, "compute_dtype": "float32"},
                 data={"max_objects": 5},
                 training={"batch_size": 2})
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    batch = synthetic_batch(rng, batch_size=2, max_objects=5,
                            feature_size=16, num_channels=16,
                            num_classes=601, num_super=17,
                            num_relations=30, with_aug=False)
    batch["super_mh"] = None
    res = run_eval_pc(cfg, model, params, [batch])
    assert "wmap_rel" in res and "wmap_phrase" in res
    assert 0 <= res["wmap_rel"] <= 1


def test_visualization_dump(tmp_path, rng):
    c = 8
    boxes = rng.integers(0, 32, (c, 4)).astype(np.float64)
    cand = Candidates(img=np.zeros(c, int), conf=rng.standard_normal(c),
                      rel=rng.integers(0, 50, c),
                      sub_cat=rng.integers(0, 150, c),
                      obj_cat=rng.integers(0, 150, c),
                      sub_box=boxes, obj_box=boxes)
    tgt = Targets(img=np.zeros(2, int), rel=np.array([3, -1]),
                  sub_cat=np.array([0, 1]), obj_cat=np.array([2, 3]),
                  sub_box=boxes[:2], obj_box=boxes[:2])
    rec = visualization_record(cand, tgt, 0, top_k=5, height=480, width=640)
    assert len(rec["predicted_graph"]) == 5
    assert len(rec["target_graph"]) == 1
    # ranked by confidence
    confs = [e["confidence"] for e in rec["predicted_graph"]]
    assert confs == sorted(confs, reverse=True)
    path = save_visualization_results(str(tmp_path), 0, cand, tgt,
                                      heights=[480], widths=[640])
    data = json.loads(open(path).read())
    assert len(data) == 1


def test_normalize_depth():
    from scene_graph_commonsense_tpu.data.depth import normalize_depth
    d = np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
    out = normalize_depth(d, 32)
    assert out.shape == (32, 32)
    # min-max scaling divides by the span (reference dataset_utils.py:108)
    np.testing.assert_allclose(out.max() - out.min(), 1.0, atol=1e-3)


def test_kmeans_cluster_and_map():
    import sys
    sys.path.insert(0, "tools")
    from token_embeddings import kmeans, cluster_and_map
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 0.1, (10, 4)),
                        rng.normal(5, 0.1, (15, 4)),
                        rng.normal(-5, 0.1, (25, 4))])
    assign = kmeans(x, 3, seed=1)
    assert len(np.unique(assign)) == 3
    index_map, sizes = cluster_and_map(assign)
    assert sorted(sizes) == [10, 15, 25]
    # permutation property
    assert sorted(index_map.tolist()) == list(range(50))
    # within-cluster order preserves original (frequency) order
    for c in range(3):
        members = np.nonzero(assign == c)[0]
        mapped = index_map[members]
        assert (np.diff(mapped) == 1).all()


def test_oiv6_features_dir_cache(tmp_path):
    """OIv6 honors the precomputed feature cache with the same wholesale
    partial-cache rejection as VGDataset."""
    path = make_oiv6_fixture(tmp_path)
    s, c = 8, 4
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    for i in range(3):
        np.savez_compressed(feat_dir / f"img{i}_features.npz",
                            features=np.full((s, s, c), float(i),
                                             np.float16))
    cfg = derive("oiv6", data={"max_objects": 6,
                               "features_dir": str(feat_dir)},
                 model={"feature_size": s, "num_img_feature": c})
    ds = OIV6Dataset(cfg, path, training=False)
    assert ds.use_feature_cache
    ex = ds.get_example(1)
    assert ex["features"].shape == (s, s, c)
    assert float(ex["features"][0, 0, 0]) == 1.0

    # remove one map -> wholesale rejection
    (feat_dir / "img2_features.npz").unlink()
    ds2 = OIV6Dataset(cfg, path, training=False)
    assert not ds2.use_feature_cache
    assert "features" not in ds2.get_example(1)


def test_prepare_depth_oiv6(tmp_path):
    """Offline OIv6 depth prep writes the per-image artifact OIV6Dataset
    consumes, resumes past existing outputs, and skips missing images
    (reference dataset_utils.py:203-228)."""
    import sys
    sys.path.insert(0, "tools")
    from prepare_depth_oiv6 import prepare_depth
    from scene_graph_commonsense_tpu.data.depth import normalize_depth

    annot = make_oiv6_fixture(tmp_path)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    from PIL import Image
    for i in range(2):                       # img2 deliberately missing
        Image.fromarray(np.full((20, 10, 3), 40 * (i + 1), np.uint8)) \
            .save(img_dir / f"img{i}.jpg")

    def fake_depth(image):
        # image-dependent raw prediction at native resolution
        return normalize_depth(
            np.tile(np.linspace(0, image.mean(), image.shape[1],
                                dtype=np.float32), (image.shape[0], 1)))

    out = tmp_path / "depth"
    stats = prepare_depth(annot, str(img_dir), str(out),
                          depth_fn=fake_depth, log_fn=lambda *a: None)
    assert stats == {"written": 2, "skipped": 0, "missing": 1}

    # resume: nothing rewritten, the missing image still retried
    stats2 = prepare_depth(annot, str(img_dir), str(out),
                           depth_fn=fake_depth, log_fn=lambda *a: None)
    assert stats2 == {"written": 0, "skipped": 2, "missing": 1}

    d0 = np.load(out / "img0_depth.npz")["depth"]
    assert d0.shape == (32, 32) and 0 <= d0.min() and d0.max() <= 1.0

    # the dataset picks the artifact up
    cfg = derive("oiv6", data={"max_objects": 6})
    assert cfg.model.use_depth
    ds = OIV6Dataset(cfg, annot, training=False, depth_dir=str(out))
    ex = ds.get_example(0)
    np.testing.assert_allclose(ex["depth"].reshape(32, 32), d0)
    # img2 has no artifact -> zero depth, not a crash
    assert ds.get_example(2)["depth"].sum() == 0.0

    # zero-depth fallback path (depth_fn=None) needs no images at all
    out2 = tmp_path / "depth0"
    stats3 = prepare_depth(annot, str(tmp_path / "nowhere"), str(out2),
                           depth_fn=None, log_fn=lambda *a: None)
    assert stats3["written"] == 3
    assert np.load(out2 / "img2_depth.npz")["depth"].sum() == 0.0

    # CLI wiring: real_batches honors cfg.data.depth_dir
    import main as cli
    cfg2 = derive("oiv6", data={
        "max_objects": 6, "depth_dir": str(out),
        "image_dir": str(img_dir),
        "annotation_test": annot, "annotation_train": annot})
    gen = cli.real_batches(cfg2, training=False)
    batch = next(gen())
    assert abs(float(batch["depth"].sum())) > 0.0
