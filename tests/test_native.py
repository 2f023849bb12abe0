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


# ---------------------------------------------------------------------
# v2 records: native train packing (embedded image -> contrastive views)
# ---------------------------------------------------------------------

def _square_ref(image_u8, size):
    from scene_graph_commonsense_tpu.data.dataset import square_image
    return square_image(image_u8, size)


def test_native_resize_matches_pil(tmp_path, rng, native_available):
    """The C++ Pillow-replica triangle resampling must equal
    PIL.Image.resize(BILINEAR) EXACTLY — both views go through it, and
    converted-checkpoint parity rides on the pixel pipeline."""
    s, k = 8, 5
    packer = NativeBatchPacker(max_objects=8, feature_size=s, num_super=k)
    sizes = [(37, 53), (256, 171), (64, 64), (300, 500)]
    paths, raws = [], []
    for i, (h, w) in enumerate(sizes):
        raw = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rec = make_record(rng, 3, s, k)
        p = str(tmp_path / f"v2_{i}.sgrec")
        write_sgrec(p, *rec, feature_size=s, num_super=k, image=raw)
        paths.append(p)
        raws.append(raw)
    jitter = np.zeros((len(paths), 9), np.float32)   # apply = 0
    jitter[:, 1:5] = np.arange(4)
    out = packer.pack_train(paths, jitter, image_size=96, want_plain=True)
    assert out["ok"].all()
    for b, raw in enumerate(raws):
        want = _square_ref(raw, 96)
        np.testing.assert_allclose(out["image"][b], want, atol=1e-6,
                                   err_msg=f"plain view {b}")
        # apply=0 jitter: aug pipeline (float->trunc->resize) is identity
        np.testing.assert_allclose(out["image_aug"][b], want, atol=1e-6,
                                   err_msg=f"aug view {b}")


def test_native_jitter_matches_python(tmp_path, rng, native_available):
    """C++ ColorJitter vs data.dataset.apply_color_jitter with identical
    factors.  float32 rounding at the uint8 truncation boundary can flip
    isolated pixels by 1/255, so the gate is atol 2/255 everywhere plus
    a <2% budget for pixels off by more than 0.5/255."""
    from scene_graph_commonsense_tpu.data.dataset import (
        apply_color_jitter, color_jitter_params)
    s, k = 8, 5
    packer = NativeBatchPacker(max_objects=8, feature_size=s, num_super=k)
    prng = np.random.default_rng(7)
    paths, raws, jits = [], [], []
    for i in range(6):
        h, w = int(prng.integers(40, 200)), int(prng.integers(40, 200))
        raw = prng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rec = make_record(rng, 3, s, k)
        p = str(tmp_path / f"j{i}.sgrec")
        write_sgrec(p, *rec, feature_size=s, num_super=k, image=raw)
        apply, order, factors = color_jitter_params(prng)
        paths.append(p)
        raws.append(raw)
        jits.append((apply, order, factors))
    jitter = np.zeros((len(paths), 9), np.float32)
    for i, (apply, order, factors) in enumerate(jits):
        jitter[i, 0] = float(apply)
        jitter[i, 1:5] = order
        jitter[i, 5:9] = factors
    out = packer.pack_train(paths, jitter, image_size=128)
    assert out["ok"].all()
    assert "image" not in out                  # want_plain defaulted off
    applied = 0
    for b, (raw, (apply, order, factors)) in enumerate(zip(raws, jits)):
        img = raw.astype(np.float32)
        if apply:
            img = apply_color_jitter(img, order, factors)
            applied += 1
        want = _square_ref(img.astype(np.uint8), 128)
        got = out["image_aug"][b]
        diff = np.abs(got - want)
        assert diff.max() <= 2.0 / 255.0 + 1e-6, \
            f"view {b}: max diff {diff.max() * 255:.2f}/255"
        frac = float((diff > 0.5 / 255.0).mean())
        assert frac < 0.02, f"view {b}: {frac:.4f} pixels off by >0.5"
    assert applied, "rng produced no applied jitter; reseed the test"


def test_native_train_pack_annotations_and_rejects(tmp_path, rng,
                                                   native_available):
    """pack_train returns the same annotation payload as pack, and v1
    (image-less) records are rejected for training."""
    s, k, n_max = 16, 5, 8
    prng = np.random.default_rng(11)
    paths = []
    for i in range(4):
        rec = make_record(rng, int(rng.integers(2, n_max + 1)), s, k)
        raw = prng.integers(0, 256, (50, 60, 3)).astype(np.uint8)
        p = str(tmp_path / f"t{i}.sgrec")
        write_sgrec(p, *rec, feature_size=s, num_super=k,
                    image=None if i == 2 else raw)
        paths.append(p)
    packer = NativeBatchPacker(max_objects=n_max, feature_size=s,
                               num_super=k)
    jitter = np.zeros((4, 9), np.float32)
    jitter[:, 1:5] = np.arange(4)
    out = packer.pack_train(paths, jitter, image_size=64)
    np.testing.assert_array_equal(out["ok"], [True, True, False, True])
    ann = packer.pack(paths)                     # v1 reader skips images
    assert ann["ok"].all()
    for key in ("cats", "boxes", "rel", "super_mh", "depth"):
        good = out["ok"]
        np.testing.assert_array_equal(out[key][good],
                                      np.asarray(ann[key])[good])
