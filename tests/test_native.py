"""Native C++ batch packer vs the pure-Python loader."""

import os

import numpy as np
import pytest

from scene_graph_commonsense_tpu.data.native import (
    NativeBatchPacker, build_library, write_sgrec)
from scene_graph_commonsense_tpu.ops.pairs import directed_rel_from_lower


def make_record(rng, n, s=16, k=5):
    cats = rng.integers(0, 150, n).astype(np.int32)
    boxes = rng.integers(0, s, (n, 4)).astype(np.float32)
    super_mh = (rng.random((n, k)) < 0.3).astype(np.uint8)
    rels, dirs = [], []
    for i in range(1, n):
        row_r = rng.integers(-1, 50, i).astype(np.int32)
        row_d = np.where(row_r >= 0, rng.integers(0, 2, i), -1).astype(
            np.float32)
        row_r = np.where(row_d >= 0, row_r, -1)
        rels.append(row_r)
        dirs.append(row_d)
    depth = rng.random((s, s)).astype(np.float32)
    return cats, boxes, super_mh, rels, dirs, depth


@pytest.fixture(scope="module")
def native_available():
    if build_library() is None:
        pytest.skip("g++ unavailable")
    return True


def test_native_pack_matches_python(tmp_path, rng, native_available):
    s, k, n_max = 16, 5, 8
    paths, records = [], []
    for i, n in enumerate([3, 5, 8]):
        rec = make_record(rng, n, s, k)
        p = str(tmp_path / f"rec{i}.sgrec")
        write_sgrec(p, *rec, feature_size=s, num_super=k)
        paths.append(p)
        records.append(rec)

    packer = NativeBatchPacker(max_objects=n_max, feature_size=s,
                               num_super=k)
    out = packer.pack(paths)
    assert out["num_packed"] == 3
    assert out["ok"].all()
    for b, (cats, boxes, super_mh, rels, dirs, depth) in enumerate(records):
        n = len(cats)
        np.testing.assert_array_equal(out["cats"][b, :n], cats)
        np.testing.assert_array_equal(out["cats"][b, n:], 0)
        np.testing.assert_allclose(out["boxes"][b, :n], boxes)
        np.testing.assert_array_equal(out["valid"][b],
                                      np.arange(n_max) < n)
        np.testing.assert_allclose(out["super_mh"][b, :n],
                                   super_mh.astype(np.float32))
        np.testing.assert_allclose(out["depth"][b, ..., 0], depth)
        want_rel = directed_rel_from_lower(rels, dirs, n, n_max)
        np.testing.assert_array_equal(out["rel"][b], want_rel)


def test_native_pack_rejects_bad_records(tmp_path, rng, native_available):
    s, k = 16, 5
    # too many objects for the n_max=4 grid
    rec = make_record(rng, 6, s, k)
    p1 = str(tmp_path / "big.sgrec")
    write_sgrec(p1, *rec, feature_size=s, num_super=k)
    # garbage file
    p2 = str(tmp_path / "garbage.sgrec")
    with open(p2, "wb") as f:
        f.write(b"nonsense")
    # missing file
    p3 = str(tmp_path / "missing.sgrec")
    # one good record
    rec_ok = make_record(rng, 3, s, k)
    p4 = str(tmp_path / "good.sgrec")
    write_sgrec(p4, *rec_ok, feature_size=s, num_super=k)

    packer = NativeBatchPacker(max_objects=4, feature_size=s, num_super=k)
    out = packer.pack([p1, p2, p3, p4])
    assert out["num_packed"] == 1
    np.testing.assert_array_equal(out["ok"], [False, False, False, True])
    # rejected slots stay fully invalid
    assert not out["valid"][0].any()
    assert (out["rel"][1] == -1).all()


def test_native_pack_multithreaded(tmp_path, rng, native_available):
    s, k, n_max = 16, 5, 8
    paths = []
    for i in range(32):
        rec = make_record(rng, int(rng.integers(2, n_max + 1)), s, k)
        p = str(tmp_path / f"r{i}.sgrec")
        write_sgrec(p, *rec, feature_size=s, num_super=k)
        paths.append(p)
    p1 = NativeBatchPacker(max_objects=n_max, feature_size=s, num_super=k,
                           num_threads=1).pack(paths)
    p8 = NativeBatchPacker(max_objects=n_max, feature_size=s, num_super=k,
                           num_threads=8).pack(paths)
    for key in ("cats", "boxes", "rel", "valid", "super_mh", "depth"):
        np.testing.assert_array_equal(p1[key], p8[key])
