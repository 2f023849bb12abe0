"""Static-shape directed pair grid.

The reference processes object pairs with a triangular Python loop — for
every `graph_iter` (subject slot) an inner `edge_iter` loop launches one
small forward per pair column per direction, with a ragged `keep_in_batch`
re-batching scheme (reference train_test.py:190-258).  On TPU that shape
dynamism defeats the compiler, so this module replaces it with:

  * images padded to a fixed N = max_objects with a validity mask;
  * the full N x N *directed* pair grid per image (pair (i, j) means
    subject = object-slot i, object = object-slot j; the reference's "two
    directions" are simply (i, j) and (j, i));
  * a compaction step that packs all valid directed pairs of a batch into a
    fixed-capacity buffer so the expensive pair trunk runs as one large
    MXU-friendly batch instead of O(N^2) kernel launches.

All functions are pure and jit-safe (static output shapes).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from scene_graph_commonsense_tpu.ops import boxes as box_ops


class PackedPairs(NamedTuple):
    """A fixed-capacity buffer of directed pairs compacted across the batch.

    Attributes:
      img:  (P,) int32 image index in the batch for each pair slot.
      sub:  (P,) int32 subject object-slot within the image.
      obj:  (P,) int32 object object-slot within the image.
      flat_sub: (P,) int32 index into the flattened (B*N,) object axis.
      flat_obj: (P,) int32 index into the flattened (B*N,) object axis.
      mask: (P,) bool — slot holds a real pair (False = padding).
      count: () int32 — number of real pairs (== mask.sum(), may exceed P
        if capacity overflowed; overflowed pairs are dropped).
      flat_id: (P,) int32 — position in the flattened (B, N, N) grid;
        strictly increasing over live slots (enumeration order), enabling
        searchsorted alignment between two packings of the same grid.
    """
    img: jnp.ndarray
    sub: jnp.ndarray
    obj: jnp.ndarray
    flat_sub: jnp.ndarray
    flat_obj: jnp.ndarray
    mask: jnp.ndarray
    count: jnp.ndarray
    flat_id: jnp.ndarray


def pair_validity(valid: jnp.ndarray) -> jnp.ndarray:
    """(B, N) object validity -> (B, N, N) directed-pair validity
    (both endpoints valid, no self-pairs)."""
    v = valid.astype(bool)
    ok = v[:, :, None] & v[:, None, :]
    n = valid.shape[-1]
    return ok & ~jnp.eye(n, dtype=bool)


def pack_pairs(pair_ok: jnp.ndarray, capacity: int) -> PackedPairs:
    """Compacts True entries of a (B, N, N) pair-validity grid into a
    fixed-capacity index buffer.

    Uses a stable flat argsort on the negated mask: valid pairs keep their
    deterministic (image-major, subject-major) enumeration order, padding
    slots point at pair (0, 0, 1) of image 0 and are masked out.
    """
    b, n, _ = pair_ok.shape
    flat_ok = pair_ok.reshape(-1)
    order = jnp.argsort(~flat_ok, stable=True)  # valid-first, order-preserving
    slots = order[:capacity]
    mask = flat_ok[slots]
    img = (slots // (n * n)).astype(jnp.int32)
    rem = slots % (n * n)
    sub = (rem // n).astype(jnp.int32)
    obj = (rem % n).astype(jnp.int32)
    flat_id = jnp.where(mask, slots.astype(jnp.int32), jnp.int32(-1))
    # Park padding slots on a harmless in-range pair.
    img = jnp.where(mask, img, 0)
    sub = jnp.where(mask, sub, 0)
    obj = jnp.where(mask, obj, jnp.int32(1))
    return PackedPairs(
        img=img, sub=sub, obj=obj,
        flat_sub=img * n + sub, flat_obj=img * n + obj,
        mask=mask, count=flat_ok.sum().astype(jnp.int32),
        flat_id=flat_id)


def align_packings(base: PackedPairs, subset: PackedPairs):
    """For each live slot of `subset`, finds its slot index in `base`
    (both packings of the same (B, N, N) grid keep enumeration order, so
    live flat_ids are sorted ascending).  Returns (indices, found_mask)."""
    p = base.flat_id.shape[0]
    big = jnp.int32(2 ** 30)
    base_ids = jnp.where(base.mask, base.flat_id, big)
    sub_ids = jnp.where(subset.mask, subset.flat_id, big - 1)
    pos = jnp.clip(jnp.searchsorted(base_ids, sub_ids), 0, p - 1)
    found = subset.mask & (base_ids[pos] == sub_ids)
    return pos, found


def gather_pair(values: jnp.ndarray, pairs: PackedPairs,
                which: str) -> jnp.ndarray:
    """Gathers per-object values (B, N, ...) for each packed pair endpoint."""
    b, n = values.shape[:2]
    flat = values.reshape((b * n,) + values.shape[2:])
    idx = pairs.flat_sub if which == "sub" else pairs.flat_obj
    return flat[idx]


def eval_pair_filter(boxes: jnp.ndarray, size: int = 32) -> jnp.ndarray:
    """(B, N, 4) boxes -> (B, N, N) bool: the eval-time pair filter keeps a
    pair iff the two object masks overlap in at least one grid cell
    (reference train_test.py:404-408 computes sum(OR)/sum(AND) and keeps
    finite positives, which reduces to a non-empty intersection)."""
    inter = box_ops.mask_intersection(
        boxes[:, :, None, :], boxes[:, None, :, :], size)
    return inter > 0


# ---------------------------------------------------------------------------
# Data-side (numpy) target construction.
# ---------------------------------------------------------------------------

def directed_rel_from_lower(relationships: Sequence[np.ndarray],
                            subj_or_obj: Sequence[np.ndarray],
                            num_objects: int,
                            max_objects: int) -> np.ndarray:
    """Converts the reference's lower-triangular annotation into the directed
    (N, N) relation matrix.

    The annotation stores, for every object i >= 1, a length-i row where
    entry j holds the relation between objects i and j, with direction flag
    1 = "i is the subject", 0 = "j is the subject", -1 = unrelated
    (reference dataset_utils.py:156-184).  Output: rel[i, j] = relation id of
    the directed edge subject=i -> object=j, or -1.
    """
    rel = np.full((max_objects, max_objects), -1, dtype=np.int32)
    for i in range(1, num_objects):
        row_r = np.asarray(relationships[i - 1])
        row_d = np.asarray(subj_or_obj[i - 1])
        for j in range(i):
            if row_d[j] == 1:
                rel[i, j] = row_r[j]
            elif row_d[j] == 0:
                rel[j, i] = row_r[j]
    return rel


def lower_from_directed(rel: np.ndarray, num_objects: int):
    """Inverse of directed_rel_from_lower (for round-tripping with
    reference-format annotations)."""
    relationships, subj_or_obj = [], []
    for i in range(1, num_objects):
        row_r = np.full(i, -1, dtype=np.int64)
        row_d = np.full(i, -1.0, dtype=np.float32)
        for j in range(i):
            if rel[i, j] >= 0:
                row_r[j], row_d[j] = rel[i, j], 1.0
            elif rel[j, i] >= 0:
                row_r[j], row_d[j] = rel[j, i], 0.0
        relationships.append(row_r)
        subj_or_obj.append(row_d)
    return relationships, subj_or_obj
