from scene_graph_commonsense_tpu.models.relation_head import (  # noqa: F401
    BayesianHead, RelationClassifier)
