"""Pair-grid packing and target construction."""

import numpy as np
import jax.numpy as jnp

from scene_graph_commonsense_tpu.ops import pairs as P
from scene_graph_commonsense_tpu.ops import boxes as B


def test_pair_validity():
    valid = jnp.array([[True, True, False], [True, False, False]])
    ok = np.asarray(P.pair_validity(valid))
    assert ok.shape == (2, 3, 3)
    # image 0: pairs (0,1) and (1,0) only
    want0 = np.zeros((3, 3), bool)
    want0[0, 1] = want0[1, 0] = True
    np.testing.assert_array_equal(ok[0], want0)
    # image 1: single object -> no pairs
    assert not ok[1].any()


def test_pack_pairs_enumeration_order(rng):
    b, n = 3, 5
    valid = rng.random((b, n)) < 0.7
    valid[:, 0] = True  # ensure at least one object
    ok = P.pair_validity(jnp.asarray(valid))
    cap = b * n * (n - 1)
    packed = P.pack_pairs(ok, cap)
    ok_np = np.asarray(ok)
    expect = [(bi, i, j) for bi in range(b) for i in range(n)
              for j in range(n) if ok_np[bi, i, j]]
    count = int(packed.count)
    assert count == len(expect)
    got = list(zip(np.asarray(packed.img)[:count].tolist(),
                   np.asarray(packed.sub)[:count].tolist(),
                   np.asarray(packed.obj)[:count].tolist()))
    assert got == expect
    assert np.asarray(packed.mask)[:count].all()
    assert not np.asarray(packed.mask)[count:].any()
    # padding slots point at a legal (0, 1) pair of image 0
    np.testing.assert_array_equal(np.asarray(packed.sub)[count:], 0)
    np.testing.assert_array_equal(np.asarray(packed.obj)[count:], 1)
    # flat indices consistent
    np.testing.assert_array_equal(
        np.asarray(packed.flat_sub),
        np.asarray(packed.img) * n + np.asarray(packed.sub))


def test_pack_pairs_overflow_drops_tail():
    ok = jnp.ones((1, 4, 4), bool) & ~jnp.eye(4, dtype=bool)[None]
    packed = P.pack_pairs(ok, capacity=5)
    assert int(packed.count) == 12          # true pair count reported
    assert int(np.asarray(packed.mask).sum()) == 5


def test_gather_pair():
    vals = jnp.arange(2 * 3 * 4).reshape(2, 3, 4).astype(jnp.float32)
    ok = P.pair_validity(jnp.ones((2, 3), bool))
    packed = P.pack_pairs(ok, 12)
    subs = np.asarray(P.gather_pair(vals, packed, "sub"))
    objs = np.asarray(P.gather_pair(vals, packed, "obj"))
    v = np.asarray(vals)
    for k in range(int(packed.count)):
        bi = int(packed.img[k])
        np.testing.assert_array_equal(subs[k], v[bi, int(packed.sub[k])])
        np.testing.assert_array_equal(objs[k], v[bi, int(packed.obj[k])])


def test_directed_rel_round_trip(rng):
    n = 6
    rel = np.full((n, n), -1, dtype=np.int32)
    # sprinkle some directed edges; at most one per unordered pair
    # (the VG annotation stores one relation per pair,
    # reference dataset_utils.py:169)
    for i in range(n):
        for j in range(i):
            r = rng.integers(-1, 50)
            if r >= 0:
                if rng.random() < 0.5:
                    rel[i, j] = r
                else:
                    rel[j, i] = r
    rels, sos = P.lower_from_directed(rel, n)
    rel2 = P.directed_rel_from_lower(rels, sos, n, n)
    np.testing.assert_array_equal(rel, rel2)


def test_eval_pair_filter_matches_mask_overlap(rng):
    b, n = 2, 4
    boxes = np.stack([np.stack([rng.integers(0, 32, 4).astype(np.float32)
                                for _ in range(n)]) for _ in range(b)])
    # canonical format (x0, x1, y0, y1); make them well-formed
    boxes[..., 1] = boxes[..., 0] + rng.integers(0, 16, (b, n))
    boxes[..., 3] = boxes[..., 2] + rng.integers(0, 16, (b, n))
    got = np.asarray(P.eval_pair_filter(jnp.asarray(boxes)))
    for bi in range(b):
        for i in range(n):
            for j in range(n):
                inter = int(B.mask_intersection(
                    jnp.asarray(boxes[bi, i]), jnp.asarray(boxes[bi, j])))
                assert got[bi, i, j] == (inter > 0)


def test_align_packings(rng):
    b, n = 2, 5
    valid = jnp.ones((b, n), bool)
    ok = P.pair_validity(valid)
    rel = rng.integers(-1, 3, (b, n, n))
    conn = jnp.asarray(rel >= 0) & ok
    base = P.pack_pairs(ok, b * n * (n - 1))
    subset = P.pack_pairs(conn, 12)
    pos, found = P.align_packings(base, subset)
    pos, found = np.asarray(pos), np.asarray(found)
    for k in range(12):
        if not np.asarray(subset.mask)[k]:
            assert not found[k]
            continue
        assert found[k]
        assert int(base.img[pos[k]]) == int(subset.img[k])
        assert int(base.sub[pos[k]]) == int(subset.sub[k])
        assert int(base.obj[pos[k]]) == int(subset.obj[k])
