"""Serving-style scene-graph inference API.

One call from images (or precomputed features) + object hypotheses to ranked
scene graphs, optionally passed through the inference-time commonsense
validator — the deployment surface of the pipeline (the reference exposes
this flow only through its eval scripts).

Usage:
    predictor = SceneGraphPredictor(cfg, relation_params,
                                    detr_params=None, validator=None)
    graphs = predictor.predict(batch, top_k=50)
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from scene_graph_commonsense_tpu.constants import (
    VG_OBJECTS, VG_RELATIONS_BY_SUPER)
from scene_graph_commonsense_tpu.eval.builders import build_candidates
from scene_graph_commonsense_tpu.models.relation_head import (
    make_relation_classifier)
from scene_graph_commonsense_tpu.train import engine as engine_lib


class SceneGraphPredictor:
    """Batched scene-graph inference with the hierarchical relation head."""

    def __init__(self, cfg, relation_params, detr_model=None,
                 detr_params=None, validator=None,
                 use_pallas_pool: Optional[bool] = None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis; serving
        batches then shard over it (make_eval_step's sharded path).  The
        batch size must divide by the axis size — predict() validates
        this per call."""
        self.cfg = cfg
        self.model = make_relation_classifier(cfg)
        self.params = relation_params
        self.validator = validator
        self.mesh = mesh
        self.estep = engine_lib.make_eval_step(
            self.model, cfg, use_pallas_pool=use_pallas_pool, mesh=mesh)
        self.featurize = None
        if detr_model is not None and detr_params is not None:
            from scene_graph_commonsense_tpu.train.loop import (
                make_detr_featurize_fn)
            self.featurize = make_detr_featurize_fn(cfg, detr_model,
                                                    detr_params)

    def predict(self, batch: Dict, top_k: int = 50) -> List[List[Dict]]:
        """batch: engine batch contract ('features' or 'image' + objects).
        Returns, per image, the top_k ranked edges as dicts with names,
        ids, boxes, and confidence."""
        if self.featurize is not None:
            batch = self.featurize(batch)
        batch = {k: v for k, v in batch.items()
                 if k in ("features", "depth", "cats", "super_mh", "boxes",
                          "rel", "valid")}
        if "rel" not in batch:
            n = batch["cats"].shape[1]
            batch["rel"] = np.full(
                (batch["cats"].shape[0], n, n), -1, np.int32)
        if self.mesh is not None:
            shards = self.mesh.shape["data"]
            b = batch["cats"].shape[0]
            if b % shards != 0:
                raise ValueError(
                    f"batch size {b} does not divide the 'data' mesh axis "
                    f"({shards}); pad the request batch or build the "
                    f"predictor without a mesh")
        out = jax.tree.map(np.asarray, self.estep(self.params, batch))
        m = self.cfg.model
        cand = build_candidates(
            out["relation"], out["connectivity"], out["super_relation"],
            out["pair_img"], out["pair_sub"], out["pair_obj"],
            out["pair_mask"], out["iou_ok"], np.asarray(batch["cats"]),
            np.asarray(batch["boxes"]), hierarchical=m.hierarchical_pred,
            num_geometric=m.num_geometric, num_possessive=m.num_possessive)

        graphs: List[List[Dict]] = []
        for image in range(batch["cats"].shape[0]):
            sel = cand.img == image
            conf = cand.conf[sel]
            if self.validator is not None:
                conf = self.validator.filter_scores(
                    conf, cand.sub_cat[sel], cand.rel[sel],
                    cand.obj_cat[sel])
            order = np.argsort(-conf, kind="stable")[:min(top_k, len(conf))]
            edges = []
            for j in order:
                if not np.isfinite(conf[j]):
                    continue
                sid = int(cand.sub_cat[sel][j])
                rid = int(cand.rel[sel][j])
                oid = int(cand.obj_cat[sel][j])
                edges.append({
                    "subject": VG_OBJECTS[sid] if sid < len(VG_OBJECTS)
                    else str(sid),
                    "relation": VG_RELATIONS_BY_SUPER[rid]
                    if rid < len(VG_RELATIONS_BY_SUPER) else str(rid),
                    "object": VG_OBJECTS[oid] if oid < len(VG_OBJECTS)
                    else str(oid),
                    "subject_id": sid, "relation_id": rid, "object_id": oid,
                    "subject_box": cand.sub_box[sel][j].tolist(),
                    "object_box": cand.obj_box[sel][j].tolist(),
                    "confidence": float(conf[j]),
                })
            graphs.append(edges)
        return graphs
