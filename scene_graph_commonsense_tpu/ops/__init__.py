from scene_graph_commonsense_tpu.ops import boxes, pairs, nms  # noqa: F401
