"""Static-shape detection post-processing for SGDET/SGCLS.

Replicates reference evaluate.py:311-368 without any data-dependent shapes:

  1. softmax over 151 logits; a query is an object iff its argmax is a real
     class (not the no-object slot);
  2. top-2 classes per query expand into 2 candidate slots each
     (`topk_cat`, reference evaluate.py:313-315);
  3. DETR's alphabetical class ids remap to the pipeline's frequency order
     (reference dataset_utils.py:606-614); slots remapped to the no-object
     id are dropped (reference evaluate.py:322-323);
  4. cxcywh -> xyxy, clamp to [0, 1], scale to the feature grid
     (reference evaluate.py:326-332);
  5. greedy per-class NMS (ops.nms) at iou 0.5 (reference
     evaluate.py:348-365);
  6. survivors compact into a fixed (B, max_objects) slot array, highest
     class confidence first (the reference keeps every survivor; capping at
     max_objects matches the dataset's own object cap, reference
     dataloader.py:119).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from scene_graph_commonsense_tpu.ops.nms import class_aware_nms


def postprocess_detections(pred_logits: jnp.ndarray,
                           pred_boxes: jnp.ndarray,
                           alp2fre: np.ndarray,
                           num_classes: int = 150,
                           topk_cat: int = 2,
                           feature_size: int = 32,
                           nms_iou: float = 0.5,
                           max_objects: int = 20) -> Dict[str, jnp.ndarray]:
    """pred_logits: (B, Q, C+1); pred_boxes: (B, Q, 4) normalized cxcywh.

    Returns fixed-shape per-image object slots:
      cats (B, N), cat_conf (B, N), boxes (B, N, 4) canonical
      (x_min, x_max, y_min, y_max) on the feature grid, valid (B, N).
    """
    b, q, _ = pred_logits.shape
    probs = jax.nn.softmax(pred_logits, axis=-1)
    has_object = probs.argmax(axis=-1) < num_classes            # (B, Q)
    top_vals, top_idx = jax.lax.top_k(probs, topk_cat)          # (B, Q, K)

    remap = jnp.asarray(alp2fre)
    cats = remap[top_idx]                                       # (B, Q, K)
    conf = top_vals
    valid = has_object[:, :, None] & (cats != num_classes)

    # cxcywh -> xyxy, clamp, scale (reference evaluate.py:326-332)
    cx, cy, w, h = jnp.moveaxis(pred_boxes, -1, 0)
    x1 = jnp.clip(cx - w / 2, 0, 1) * feature_size
    y1 = jnp.clip(cy - h / 2, 0, 1) * feature_size
    x2 = jnp.clip(cx + w / 2, 0, 1) * feature_size
    y2 = jnp.clip(cy + h / 2, 0, 1) * feature_size
    boxes_xyxy = jnp.stack([x1, y1, x2, y2], axis=-1)           # (B, Q, 4)
    boxes_xyxy = jnp.repeat(boxes_xyxy[:, :, None, :], topk_cat, axis=2)

    m = q * topk_cat
    cats = cats.reshape(b, m)
    conf = conf.reshape(b, m)
    valid = valid.reshape(b, m)
    boxes_xyxy = boxes_xyxy.reshape(b, m, 4)

    keep = jax.vmap(
        lambda bx, sc, cl, va: class_aware_nms(bx, sc, cl, va, nms_iou)
    )(boxes_xyxy, conf, cats, valid)

    # compact survivors into max_objects slots, highest confidence first
    neg_inf = jnp.finfo(conf.dtype).min
    score = jnp.where(keep, conf, neg_inf)
    order = jnp.argsort(score, axis=1, descending=True, stable=True)
    slots = order[:, :max_objects]
    gather = lambda a: jnp.take_along_axis(a, slots, axis=1)  # noqa: E731
    out_valid = gather(keep)
    out_cats = jnp.where(out_valid, gather(cats), 0)
    out_conf = jnp.where(out_valid, gather(conf), 0.0)
    bx = jnp.take_along_axis(boxes_xyxy, slots[..., None], axis=1)
    # canonical box format (x_min, x_max, y_min, y_max)
    out_boxes = jnp.stack([bx[..., 0], bx[..., 2], bx[..., 1], bx[..., 3]],
                          axis=-1)
    out_boxes = jnp.where(out_valid[..., None], out_boxes, 0.0)
    return {"cats": out_cats.astype(jnp.int32), "cat_conf": out_conf,
            "boxes": out_boxes, "valid": out_valid}
