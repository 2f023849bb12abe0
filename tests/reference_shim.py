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


def install_torchvision_shim() -> None:
    """Upgrades the torchvision/cv2 stubs with FUNCTIONAL implementations of
    the handful of library ops the reference dataloader uses
    (reference dataloader.py:39-51, 99-101), so the LIVING
    VisualGenomeDataset can run end to end in this torchvision-less
    environment:

      * ToTensor / Resize(antialias) / Normalize / Compose / RandomApply —
        faithful re-implementations on plain torch (Resize uses
        F.interpolate(bilinear, antialias=True), the same kernel
        torchvision's float-tensor path calls);
      * ColorJitter — identity.  The jittered view only feeds the
        contrastive term (reference train_test.py:152-154, 260-272); parity
        harnesses that use this shim run with lambda_contrast = 0;
      * cv2.imread / cv2.cvtColor via PIL (BGR byte-identical decode).

    These are library semantics, not reference first-party code — the
    reference's own logic (pkl loading, reorder maps, matrix building,
    filters) still executes unmodified.
    """
    import numpy as np
    import torch
    import torch.nn.functional as F

    _install_stubs()
    tv = sys.modules["torchvision"]
    tr = tv.transforms

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, x):
            if not isinstance(x, np.ndarray):
                x = np.asarray(x)          # PIL image
            if x.ndim == 2:
                x = x[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(
                x.transpose(2, 0, 1)))
            return t.float().div(255) if t.dtype == torch.uint8 \
                else t.float()

    class Resize:
        def __init__(self, size, max_size=None, antialias=True):
            self.size, self.max_size = size, max_size

        def __call__(self, x):
            h, w = x.shape[-2:]
            if isinstance(self.size, (tuple, list)):
                nh, nw = self.size
            else:
                # torchvision _compute_resized_output_size semantics
                short, long = (w, h) if w <= h else (h, w)
                ns, nl = self.size, int(self.size * long / short)
                if self.max_size is not None and nl > self.max_size:
                    ns = int(self.max_size * ns / nl)
                    nl = self.max_size
                (nw, nh) = (ns, nl) if w <= h else (nl, ns)
            return F.interpolate(x[None], size=(nh, nw), mode="bilinear",
                                 align_corners=False, antialias=True)[0]

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    class ColorJitter:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class RandomApply:
        def __init__(self, ts, p=0.5):
            self.ts, self.p = ts, p

        def __call__(self, x):
            if self.p < torch.rand(1):
                return x
            for t in self.ts:
                x = t(x)
            return x

    for name, cls in (("Compose", Compose), ("ToTensor", ToTensor),
                      ("Resize", Resize), ("Normalize", Normalize),
                      ("ColorJitter", ColorJitter),
                      ("RandomApply", RandomApply)):
        setattr(tr, name, cls)

    cv2 = sys.modules["cv2"]
    cv2.COLOR_BGR2RGB = 4

    def imread(path):
        from PIL import Image
        rgb = np.asarray(Image.open(path).convert("RGB"))
        return rgb[:, :, ::-1].copy()      # cv2 returns BGR

    def cvtColor(img, code):
        assert code == cv2.COLOR_BGR2RGB
        return img[:, :, ::-1].copy()

    cv2.imread = imread
    cv2.cvtColor = cvtColor


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
