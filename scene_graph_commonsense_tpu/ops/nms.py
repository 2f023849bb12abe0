"""Static-shape non-maximum suppression.

Replaces `torchvision.ops.nms` in the SGDET/SGCLS detection post-process
(reference evaluate.py:348-365).  The reference suppresses per class by
looping `torch.unique(categories)` in Python; here one fixed-shape greedy
pass handles all classes at once — cross-class pairs are simply never
suppressed — so the op jits with a static box count and vmaps over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou_xyxy(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Standard continuous IoU for (x1, y1, x2, y2) boxes (the convention
    torchvision.ops.nms consumes), broadcast over leading dims."""
    ax1, ay1, ax2, ay2 = jnp.moveaxis(boxes_a, -1, 0)
    bx1, by1, bx2, by2 = jnp.moveaxis(boxes_b, -1, 0)
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    area_b = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def class_aware_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                    classes: jnp.ndarray, valid: jnp.ndarray,
                    iou_threshold: float) -> jnp.ndarray:
    """Greedy per-class NMS with a static box count.

    Args:
      boxes:   (M, 4) float (x1, y1, x2, y2).
      scores:  (M,) float.
      classes: (M,) int — suppression only happens within a class.
      valid:   (M,) bool — padding slots are never kept nor suppress others.
      iou_threshold: suppress when IoU > threshold (strict, matching
        torchvision's `iou <= threshold` keep rule).

    Returns:
      (M,) bool keep mask in the original ordering.
    """
    m = boxes.shape[0]
    neg_inf = jnp.finfo(scores.dtype).min
    order = jnp.argsort(jnp.where(valid, scores, neg_inf),
                        descending=True, stable=True)
    sboxes = boxes[order]
    sclasses = classes[order]
    svalid = valid[order]

    iou = box_iou_xyxy(sboxes[:, None, :], sboxes[None, :, :])
    same_class = sclasses[:, None] == sclasses[None, :]
    suppresses = (iou > iou_threshold) & same_class  # row i suppresses col j

    def body(i, alive):
        keep_i = alive[i] & svalid[i]
        return alive & ~(keep_i & suppresses[i] &
                         (jnp.arange(m) > i))

    alive = jax.lax.fori_loop(0, m, body, jnp.ones((m,), dtype=bool))
    keep_sorted = alive & svalid
    # Scatter back to original ordering.
    keep = jnp.zeros((m,), dtype=bool).at[order].set(keep_sorted)
    return keep
