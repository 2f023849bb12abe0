"""Static-shape class-aware NMS vs naive greedy oracle (and torchvision when
available)."""

import numpy as np
import jax.numpy as jnp

from scene_graph_commonsense_tpu.ops.nms import class_aware_nms, box_iou_xyxy


def naive_nms(boxes, scores, iou_thr):
    """Greedy NMS oracle, torchvision.ops.nms semantics."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            # IoU
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            area_i = max(0.0, boxes[i, 2] - boxes[i, 0]) * \
                max(0.0, boxes[i, 3] - boxes[i, 1])
            area_j = max(0.0, boxes[j, 2] - boxes[j, 0]) * \
                max(0.0, boxes[j, 3] - boxes[j, 1])
            union = area_i + area_j - inter
            iou = inter / union if union > 0 else 0.0
            if iou > iou_thr:
                suppressed[j] = True
    return sorted(keep)


def test_box_iou(rng):
    a = rng.random((10, 4)).astype(np.float32) * 32
    a[:, 2:] += a[:, :2]
    got = np.asarray(box_iou_xyxy(jnp.asarray(a)[:, None], jnp.asarray(a)[None]))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-6)


def test_class_aware_nms_matches_per_class_oracle(rng):
    m = 60
    boxes = rng.random((m, 4)).astype(np.float32) * 24
    boxes[:, 2:] = boxes[:, :2] + 1 + rng.random((m, 2)).astype(np.float32) * 8
    scores = rng.random(m).astype(np.float32)
    classes = rng.integers(0, 5, m)
    valid = np.ones(m, bool)
    valid[-7:] = False

    keep = np.asarray(class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), iou_threshold=0.5))

    # oracle: per-class greedy NMS over valid boxes (reference
    # evaluate.py:348-365)
    want = np.zeros(m, bool)
    for cls in np.unique(classes[valid]):
        idx = np.nonzero(valid & (classes == cls))[0]
        kept = naive_nms(boxes[idx], scores[idx], 0.5)
        want[idx[kept]] = True
    np.testing.assert_array_equal(keep, want)
    assert not keep[~valid].any()
