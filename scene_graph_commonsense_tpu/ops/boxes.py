"""Box geometry on the feature grid.

Canonical box format throughout the framework: ``(x_min, x_max, y_min, y_max)``
in feature-grid coordinates (default 32x32), matching the reference's
annotation contract (reference dataset_utils.py:130, dataloader.py:121).
An object's occupancy mask is ``mask[y_min:y_max, x_min:x_max] = 1`` with
integer-truncated coordinates (reference train_test.py:164-169).

The reference computes IoU by materializing two 32x32 masks per box pair
(reference evaluator.py:84-94) — O(S^2) memory traffic per pair.  Here the
identical quantity is computed in closed form on integer rectangles, which
XLA vectorizes over entire candidate x target grids.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def resize_box(box, original_size, new_size):
    """Rescales one (x_min, y_min, x_max, y_max) box between image sizes and
    truncates to int, same semantics as reference utils.py:38-55."""
    ratio_h = new_size[0] / original_size[0]
    ratio_w = new_size[1] / original_size[1]
    xmin, ymin, xmax, ymax = box
    return [int(xmin * ratio_w), int(ymin * ratio_h),
            int(xmax * ratio_w), int(ymax * ratio_h)]


def _int_rect(boxes, size):
    """Integer-truncated, grid-clipped (x0, x1, y0, y1) rectangle, replicating
    the reference's `mask[int(b2):int(b3), int(b0):int(b1)] = 1` on an SxS
    grid (coordinates are non-negative by construction)."""
    b = jnp.asarray(boxes)
    r = jnp.clip(b.astype(jnp.int32), 0, size)
    return r[..., 0], r[..., 1], r[..., 2], r[..., 3]


def box_area(boxes, size: int = 32):
    """Number of grid cells the box mask covers."""
    x0, x1, y0, y1 = _int_rect(boxes, size)
    return jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)


def mask_iou(boxes_a, boxes_b, size: int = 32):
    """Mask-IoU between broadcastable batches of boxes.

    Bit-equivalent to the reference's mask-based IoU (reference
    evaluator.py:84-94): build both SxS masks from int-truncated coords,
    IoU = |A & B| / |A | B|, and 0 when the union is empty.
    """
    ax0, ax1, ay0, ay1 = _int_rect(boxes_a, size)
    bx0, bx1, by0, by1 = _int_rect(boxes_b, size)
    area_a = jnp.maximum(ax1 - ax0, 0) * jnp.maximum(ay1 - ay0, 0)
    area_b = jnp.maximum(bx1 - bx0, 0) * jnp.maximum(by1 - by0, 0)
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0)
    inter = iw * ih
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)


def mask_intersection(boxes_a, boxes_b, size: int = 32):
    """Grid-cell count of the mask intersection (used for the eval-time
    pair filter `sum(A & B) > 0`, reference train_test.py:404-408)."""
    ax0, ax1, ay0, ay1 = _int_rect(boxes_a, size)
    bx0, bx1, by0, by1 = _int_rect(boxes_b, size)
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0)
    return iw * ih


def union_mask_iou(pred_a, pred_b, tgt_a, tgt_b, size: int = 32):
    """IoU between the union masks of two box pairs (reference
    evaluator.py:97-115; used by the OIv6 phrase wmAP).

    The union of two axis-aligned rectangles is not a rectangle, so this uses
    inclusion-exclusion on the exact integer grid:
      |U_p & U_t| where U_p = A|B decomposes via
      |(A|B) & (C|D)| = |AC| + |AD| + |BC| + |BD| - |ABC| - |ABD| - |ACD|
                        - |BCD| + |ABCD|   (all rectangle intersections).
    """

    def rect(b):
        x0, x1, y0, y1 = _int_rect(b, size)
        return jnp.stack([x0, x1, y0, y1], axis=-1)

    def inter_n(*rects):
        x0 = rects[0][..., 0]
        x1 = rects[0][..., 1]
        y0 = rects[0][..., 2]
        y1 = rects[0][..., 3]
        for r in rects[1:]:
            x0 = jnp.maximum(x0, r[..., 0])
            x1 = jnp.minimum(x1, r[..., 1])
            y0 = jnp.maximum(y0, r[..., 2])
            y1 = jnp.minimum(y1, r[..., 3])
        return jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)

    A, B, C, D = rect(pred_a), rect(pred_b), rect(tgt_a), rect(tgt_b)
    area = lambda R: inter_n(R)  # noqa: E731
    union_p = area(A) + area(B) - inter_n(A, B)
    union_t = area(C) + area(D) - inter_n(C, D)
    inter = (inter_n(A, C) + inter_n(A, D) + inter_n(B, C) + inter_n(B, D)
             - inter_n(A, B, C) - inter_n(A, B, D) - inter_n(A, C, D)
             - inter_n(B, C, D) + inter_n(A, B, C, D))
    union = union_p + union_t - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0)


def union_box(box_a, box_b):
    """Smallest (x_min, x_max, y_min, y_max) box containing both inputs
    (reference utils.py:77-85)."""
    a, b = jnp.asarray(box_a), jnp.asarray(box_b)
    return jnp.stack([jnp.minimum(a[..., 0], b[..., 0]),
                      jnp.maximum(a[..., 1], b[..., 1]),
                      jnp.minimum(a[..., 2], b[..., 2]),
                      jnp.maximum(a[..., 3], b[..., 3])], axis=-1)


def boxes_to_masks(boxes, size: int = 32, dtype=jnp.float32):
    """(..., 4) boxes -> (..., S, S) occupancy masks via broadcasted iota
    (no scatter; shape-static and fusable)."""
    x0, x1, y0, y1 = _int_rect(boxes, size)
    ys = np.arange(size).reshape(size, 1)
    xs = np.arange(size).reshape(1, size)
    inside_y = (ys >= y0[..., None, None]) & (ys < y1[..., None, None])
    inside_x = (xs >= x0[..., None, None]) & (xs < x1[..., None, None])
    return (inside_y & inside_x).astype(dtype)


def reference_mask_iou_numpy(box_a, box_b, size: int = 32) -> float:
    """Literal mask-materializing IoU (numpy), kept as the test oracle for
    mask_iou's closed form."""
    ma = np.zeros((size, size), dtype=bool)
    mb = np.zeros((size, size), dtype=bool)
    ma[int(box_a[2]):int(box_a[3]), int(box_a[0]):int(box_a[1])] = True
    mb[int(box_b[2]):int(box_b[3]), int(box_b[0]):int(box_b[1])] = True
    union = np.logical_or(ma, mb).sum()
    if union == 0:
        return 0.0
    return float(np.logical_and(ma, mb).sum()) / float(union)
