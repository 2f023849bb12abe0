from scene_graph_commonsense_tpu.eval.recall import (  # noqa: F401
    Evaluator, EvaluatorTop3, Candidates, Targets)
