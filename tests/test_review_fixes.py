"""Regression tests for the review findings in data/ eval/ commonsense/."""

import threading
import time

import numpy as np

from scene_graph_commonsense_tpu.commonsense.cache import (
    EdgeCache, ImageCache)
from scene_graph_commonsense_tpu.data import preprocess as pp
from scene_graph_commonsense_tpu.data.pipeline import prefetch_iterator
from scene_graph_commonsense_tpu.eval.visualization import _to_image_space


def test_merge_remaps_relationship_ids():
    """Relations referencing an absorbed duplicate box must be remapped to
    the surviving box, not dropped."""
    obj_data = [{"image_id": 1, "objects": [
        {"object_id": 10, "x": 0, "y": 0, "w": 10, "h": 10,
         "names": ["man"]},
        {"object_id": 11, "x": 0, "y": 0, "w": 10, "h": 10,
         "names": ["man"]},                      # exact duplicate -> merged
        {"object_id": 20, "x": 50, "y": 50, "w": 10, "h": 10,
         "names": ["horse"]},
    ]}]
    rel_data = [{"image_id": 1, "relationships": [
        {"predicate": ["riding"],
         "subject": {"object_id": 11, "name": "man"},
         "object": {"object_id": 20, "name": "horse"}},
    ]}]
    pp.merge_duplicate_boxes(obj_data)
    pp.remap_merged_relationships(obj_data, rel_data)
    assert len(obj_data[0]["objects"]) == 2
    # the absorbed id 11 now points at the survivor 10
    assert rel_data[0]["relationships"][0]["subject"]["object_id"] == 10
    assert "_id_remap" not in obj_data[0]


def test_merge_iou_true_union():
    b1 = np.array([0, 0, 10, 10])
    b2 = np.array([1, 1, 11, 11])
    want = 81 / (100 + 100 - 81)
    assert abs(pp._merge_iou(b1, b2) - want) < 1e-9


def test_edge_cache_put_updates_value():
    c = EdgeCache(max_cache_size=4)
    c.put("dog wearing hat", -1)
    c.put("dog wearing hat", 1)          # re-query returns a fresh vote
    assert c.get("dog wearing hat") == 1
    assert c.access_frequency["dog wearing hat"] == 2


def test_image_cache_keyed_by_bbox(tmp_path):
    from PIL import Image
    path = str(tmp_path / "img.jpg")
    arr = np.zeros((64, 64, 3), np.uint8)
    arr[:32] = 255                        # top half white
    Image.fromarray(arr).save(path)
    cache = ImageCache(image_size=64, feature_size=32)
    top = cache.get_image(path, bbox=[0, 64, 0, 32])
    bottom = cache.get_image(path, bbox=[0, 64, 32, 64])
    assert top != bottom                  # reference keyed by path only
    assert len(cache.cache) == 2


def test_to_image_space_axes():
    # grid box covering left half horizontally, full height
    box = [0, 16, 0, 32]                  # (x_min, x_max, y_min, y_max)
    out = _to_image_space(box, 32, height=600, width=1000)
    assert out[1] == 500                  # x_max scales by width
    assert out[3] == 600                  # y_max scales by height


def test_prefetch_abandoned_consumer_releases_producer():
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"i": i}

    n0 = threading.active_count()
    it = prefetch_iterator(gen(), prefetch=2)
    next(it)
    it.close()                            # consumer abandons early
    deadline = time.time() + 5
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0
    assert len(produced) < 100            # producer stopped early


def test_oiv6_partial_batch_padded():
    from scene_graph_commonsense_tpu.data import oiv6 as oiv6_mod

    class FakeDS:
        def __len__(self):
            return 5

        def get_example(self, i):
            n = 4
            return {"cats": np.full(n, i, np.int64),
                    "boxes": np.zeros((n, 4), np.float32),
                    "rel": np.full((n, n), -1, np.int64),
                    "valid": np.ones(n, bool)}

    batches = list(oiv6_mod.oiv6_batches(FakeDS(), batch_size=2,
                                         shuffle=False))
    assert len(batches) == 3              # 2 + 2 + padded final 1
    last = batches[-1]
    assert last["cats"].shape[0] == 2
    assert bool(last["valid"][1].any()) is False   # filler is all-invalid
    assert len(list(oiv6_mod.oiv6_batches(FakeDS(), batch_size=2,
                                          shuffle=False,
                                          drop_last=True))) == 2
