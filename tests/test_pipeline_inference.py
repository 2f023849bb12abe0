"""Prefetching pipeline, native record pipeline, and the serving API."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from test_engine import tiny_cfg, tiny_batch, init_params  # noqa: E402

from scene_graph_commonsense_tpu.data.pipeline import (  # noqa: E402
    NativeRecordPipeline, prefetch_iterator)


def test_prefetch_iterator_order_and_transform():
    src = [{"i": i} for i in range(7)]
    got = list(prefetch_iterator(iter(src), prefetch=3,
                                 transform=lambda b: {"i": b["i"] * 2}))
    assert [b["i"] for b in got] == [0, 2, 4, 6, 8, 10, 12]


def test_prefetch_iterator_propagates_errors():
    def bad():
        yield {"i": 0}
        raise RuntimeError("boom")

    it = prefetch_iterator(bad(), prefetch=2)
    assert next(it)["i"] == 0
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_native_record_pipeline(tmp_path, rng):
    from scene_graph_commonsense_tpu.data.native import (
        build_library, write_sgrec)
    if build_library() is None:
        pytest.skip("g++ unavailable")
    from test_native import make_record
    s, k, n_max = 16, 5, 8
    paths = []
    for i in range(9):
        rec = make_record(rng, int(rng.integers(2, n_max + 1)), s, k)
        p = str(tmp_path / f"r{i}.sgrec")
        write_sgrec(p, *rec, feature_size=s, num_super=k)
        paths.append(p)
    # one corrupt record: pipeline must skip it and refill
    with open(tmp_path / "bad.sgrec", "wb") as f:
        f.write(b"garbage")
    paths.insert(3, str(tmp_path / "bad.sgrec"))

    pipe = NativeRecordPipeline(paths, batch_size=4, max_objects=n_max,
                                feature_size=s, num_super=k, shuffle=False)
    batches = list(pipe)
    assert len(batches) == 2          # 9 good records -> 2 full batches
    for b in batches:
        assert b["cats"].shape == (4, n_max)
        assert b["rel"].shape == (4, n_max, n_max)
        assert b["valid"].any(axis=1).all()   # no empty slots


def test_scene_graph_predictor(rng):
    from scene_graph_commonsense_tpu.inference import SceneGraphPredictor
    cfg = tiny_cfg()
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    predictor = SceneGraphPredictor(cfg, params, use_pallas_pool=False)
    batch = tiny_batch(rng, cfg, with_aug=False)
    graphs = predictor.predict(batch, top_k=10)
    assert len(graphs) == cfg.training.batch_size
    for edges in graphs:
        assert len(edges) <= 10
        for e in edges:
            assert 0 <= e["relation_id"] < 50
            assert np.isfinite(e["confidence"])
        confs = [e["confidence"] for e in edges]
        assert confs == sorted(confs, reverse=True)


def test_scene_graph_predictor_with_validator(rng):
    from scene_graph_commonsense_tpu.inference import SceneGraphPredictor
    from scene_graph_commonsense_tpu.plugandplay import CommonsenseValidator
    cfg = tiny_cfg()
    from scene_graph_commonsense_tpu.models.relation_head import (
        make_relation_classifier)
    model = make_relation_classifier(cfg)
    params = init_params(cfg, model, rng)
    validator = CommonsenseValidator(transport=lambda ps: ["No"] * len(ps),
                                     top_k=5)
    predictor = SceneGraphPredictor(cfg, params, validator=validator,
                                    use_pallas_pool=False)
    batch = tiny_batch(rng, cfg, with_aug=False)
    plain = SceneGraphPredictor(cfg, params,
                                use_pallas_pool=False).predict(batch, 10)
    filtered = predictor.predict(batch, top_k=10)
    # the all-No validator strikes the former top-5 of every image
    for p, f in zip(plain, filtered):
        top5 = {(e["subject_id"], e["relation_id"], e["object_id"],
                 e["confidence"]) for e in p[:5]}
        kept = {(e["subject_id"], e["relation_id"], e["object_id"],
                 e["confidence"]) for e in f}
        assert not (top5 & kept)


def test_sgrecords_native_path_matches_python_loader(tmp_path, rng):
    """tools/preprocess_vg.py --stage sgrecords + the C++ packer CLI path
    (main.native_batches) must reproduce the Python loader's batches
    exactly: same predicate merge/permutation, super-category multi-hot,
    padding, and attached cached features."""
    import argparse
    import os

    from scene_graph_commonsense_tpu.data.native import build_library
    if build_library() is None:
        pytest.skip("g++ unavailable")

    sys.path.insert(0, "tools")
    import main as cli
    from preprocess_vg import stage_sgrecords
    from scene_graph_commonsense_tpu.config import derive
    from scene_graph_commonsense_tpu.data.dataset import (
        VGDataset, batches_from_dataset)

    s = 32
    annot_dir = tmp_path / "annot"
    feat_dir = tmp_path / "features"
    annot_dir.mkdir(), feat_dir.mkdir()
    images = []
    for i in range(5):
        n = int(rng.integers(2, 7))
        rels, dirs = [], []
        for j in range(1, n):
            row = rng.integers(-1, 50, j).astype(np.int64)
            row[0] = 12 if j == 1 else row[0]   # exercise the wears merge
            d = np.where(row >= 0, rng.integers(0, 2, j).astype(np.float64),
                         -1.0)
            rels.append(row), dirs.append(d)
        np.savez(annot_dir / f"img{i:03d}_annotations.npz",
                 image_depth=rng.random((1, s, s)).astype(np.float32),
                 categories=rng.integers(0, 150, n),
                 bbox=np.sort(rng.integers(0, s, (n, 2, 2)), axis=-1)
                 .transpose(0, 2, 1).reshape(n, 4).astype(np.float32),
                 relationships=np.array(rels, dtype=object),
                 subj_or_obj=np.array(dirs, dtype=object),
                 super_categories=np.array(
                     [rng.integers(0, 17, int(rng.integers(1, 4)))
                      for _ in range(n)], dtype=object))
        np.savez(feat_dir / f"img{i:03d}_features.npz",
                 features=rng.random((s, s, 4)).astype(np.float32))
        images.append({"file_name": f"img{i:03d}.jpg"})
    instances = tmp_path / "instances_test.json"
    instances.write_text(json.dumps({"images": images}))

    cfg = derive("vg", data={
        "annot_dir": str(annot_dir), "features_dir": str(feat_dir),
        "annotation_test": str(instances),
        "sgrc_dir": str(tmp_path / "sgrc")},
        training={"batch_size": 2, "eval_mode": "pc"})
    wrote = stage_sgrecords(
        argparse.Namespace(split="test", out=str(tmp_path / "sgrc")),
        cfg, log_fn=lambda *a: None)
    assert wrote == 5

    native = list(cli.native_batches(cfg)())
    ds = VGDataset(cfg, {"images": images}, training=False,
                   load_images=False)
    python_b = list(batches_from_dataset(ds, 2, shuffle=False))
    assert len(native) == len(python_b) == 2
    for nb, pb in zip(native, python_b):
        assert set(nb) == set(pb)
        for k in pb:
            if k == "annot_path":
                want = [os.path.basename(p).split("_")[0].split(".")[0]
                        for p in pb[k]]
                got = [os.path.basename(p).split(".")[0] for p in nb[k]]
                assert got == want
            else:
                np.testing.assert_array_equal(
                    np.asarray(nb[k]), np.asarray(pb[k]), err_msg=k)

    # real_batches dispatches to the native path for PredCLS eval
    assert cli.real_batches(cfg, training=False).__qualname__ \
        == cli.native_batches(cfg).__qualname__
