"""Closed-form box math vs the literal mask-materializing oracle."""

import numpy as np
import jax.numpy as jnp

from scene_graph_commonsense_tpu.ops import boxes as B


def random_boxes(rng, n, size=32):
    x0 = rng.integers(0, size, n)
    x1 = rng.integers(0, size + 1, n)
    y0 = rng.integers(0, size, n)
    y1 = rng.integers(0, size + 1, n)
    return np.stack([x0, x1, y0, y1], axis=1).astype(np.float32)


def naive_mask(box, size=32):
    m = np.zeros((size, size), dtype=bool)
    m[int(box[2]):int(box[3]), int(box[0]):int(box[1])] = True
    return m


def test_mask_iou_matches_mask_oracle(rng):
    a = random_boxes(rng, 200)
    b = random_boxes(rng, 200)
    got = np.asarray(B.mask_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(200):
        want = B.reference_mask_iou_numpy(a[i], b[i])
        assert abs(got[i] - want) < 1e-6, (a[i], b[i], got[i], want)


def test_mask_iou_broadcasts(rng):
    a = random_boxes(rng, 5)
    b = random_boxes(rng, 7)
    grid = np.asarray(B.mask_iou(jnp.asarray(a)[:, None, :],
                                 jnp.asarray(b)[None, :, :]))
    assert grid.shape == (5, 7)
    for i in range(5):
        for j in range(7):
            want = B.reference_mask_iou_numpy(a[i], b[j])
            assert abs(grid[i, j] - want) < 1e-6


def test_mask_intersection(rng):
    a = random_boxes(rng, 100)
    b = random_boxes(rng, 100)
    got = np.asarray(B.mask_intersection(jnp.asarray(a), jnp.asarray(b)))
    for i in range(100):
        want = (naive_mask(a[i]) & naive_mask(b[i])).sum()
        assert got[i] == want


def test_union_mask_iou_matches_oracle(rng):
    pa = random_boxes(rng, 50)
    pb = random_boxes(rng, 50)
    ta = random_boxes(rng, 50)
    tb = random_boxes(rng, 50)
    got = np.asarray(B.union_mask_iou(pa, pb, ta, tb))
    for i in range(50):
        mp = naive_mask(pa[i]) | naive_mask(pb[i])
        mt = naive_mask(ta[i]) | naive_mask(tb[i])
        union = (mp | mt).sum()
        want = 0.0 if union == 0 else (mp & mt).sum() / union
        assert abs(got[i] - want) < 1e-6


def test_boxes_to_masks_matches_scatter(rng):
    b = random_boxes(rng, 30)
    got = np.asarray(B.boxes_to_masks(jnp.asarray(b)))
    for i in range(30):
        np.testing.assert_array_equal(got[i], naive_mask(b[i]).astype(np.float32))


def test_boxes_to_masks_is_binary(rng):
    """The conv1 masking identity in relation_head._masked_entity_maps
    (`conv1(x*m) == where(m, conv1(x), bias)`) is exact ONLY for {0,1}
    masks.  If boxes_to_masks ever goes soft (e.g. antialiased edges),
    this must fail so the identity's precondition is re-examined."""
    b = random_boxes(rng, 50)
    # fractional box coordinates: the most likely trigger for soft edges
    bf = b + rng.random(b.shape) * 0.9
    for boxes in (b, bf):
        m = np.asarray(B.boxes_to_masks(jnp.asarray(boxes)))
        assert set(np.unique(m)) <= {0.0, 1.0}, np.unique(m)


def test_resize_box():
    # int-truncation semantics of reference utils.py:38-55
    box = [10, 20, 30, 45]  # x_min, y_min, x_max, y_max
    out = B.resize_box(box, (600, 800), (32, 32))
    assert out == [int(10 * 32 / 800), int(20 * 32 / 600),
                   int(30 * 32 / 800), int(45 * 32 / 600)]


def test_union_box():
    a = jnp.array([1.0, 5.0, 2.0, 6.0])
    b = jnp.array([3.0, 9.0, 0.0, 4.0])
    np.testing.assert_array_equal(np.asarray(B.union_box(a, b)),
                                  [1.0, 9.0, 0.0, 6.0])
