"""Imports the LIVING reference implementation (/root/reference, torch) so
parity tests can compare this framework against the actual reference code
rather than a re-implementation of its semantics.

The reference imports a few packages that are not installed in this
environment (torchvision, torchmetrics, openai, cv2, requests, h5py).  None
of them are exercised by the code paths under test — model.py's forward and
evaluator.py's accumulate/compute — so lightweight stub modules are
registered before the import.  `torchvision._is_tracing` is the only stub
attribute ever called (reference utils.py:187, and only under torch.jit
tracing, which the tests never enable).
"""

from __future__ import annotations

import sys
import types

REFERENCE_DIR = "/root/reference"

_STUB_NAMES = ("torchmetrics", "openai", "cv2", "requests", "h5py")


def _install_stubs() -> None:
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.ops = types.ModuleType("torchvision.ops")
    tv._is_tracing = lambda: False
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.modules.setdefault("torchvision.ops", tv.ops)
    for name in _STUB_NAMES:
        sys.modules.setdefault(name, types.ModuleType(name))


def import_reference():
    """Returns the reference's (model, evaluator) modules, importing them
    from /root/reference on first use."""
    _install_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import evaluator  # noqa: F401  (reference evaluator.py)
    import model      # noqa: F401  (reference model.py)
    return model, evaluator


def reference_args(run_mode: str = "eval", hierarchical: bool = True,
                   dataset: str = "vg") -> dict:
    """Minimal args dict accepted by the reference Evaluator / classifiers
    (reference evaluator.py:21-83, model.py:105-128), pointing the triplet
    artifacts at the reference's real shipped .pt files."""
    annot = f"{REFERENCE_DIR}/datasets/vg_scene_graph_annot"
    return {
        "dataset": {
            "dataset": dataset,
            "train_triplets": f"{annot}/train_triplets.pt",
            "test_triplets": f"{annot}/test_triplets.pt",
            "zero_shot_triplets": f"{annot}/zero_shot_triplets.pt",
        },
        "models": {
            "hierarchical_pred": hierarchical,
            "feature_size": 32,
            "image_size": 1024,
            "num_geometric": 15,
            "num_possessive": 11,
            "num_semantic": 24,
            "topk_cat": 2,
            "llm_model": "gpt3.5",
        },
        "training": {
            "run_mode": run_mode,
            "eval_mode": "pc",
            "batch_size": 4,
            "verbose": False,
        },
    }
