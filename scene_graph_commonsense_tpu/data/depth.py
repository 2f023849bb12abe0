"""Monocular depth estimation for the offline annotation cache.

The reference runs MiDaS DPT_Large from torch.hub during offline data
preparation and caches a min-max-normalized 32x32 depth map per image
(reference prepare_datasets.py:52-53, dataset_utils.py:102-109).  Depth is a
cached input channel, never trained through, so the estimator stays an
offline tool: `make_midas_depth_fn` wraps torch-hub MiDaS when it is
available (weights on disk or egress), and callers fall back to zero depth
otherwise (the pipeline supports use_depth=False, reference
dataloader.py:113-114).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def normalize_depth(depth: np.ndarray, feature_size: int = 32) -> np.ndarray:
    """Resize to the feature grid and min-max scale (reference
    dataset_utils.py:107-108 divides by (max - min))."""
    from PIL import Image
    d = np.asarray(depth, np.float32)
    img = Image.fromarray(d)
    img = img.resize((feature_size, feature_size), Image.BILINEAR)
    d = np.asarray(img, np.float32)
    span = float(d.max() - d.min())
    if span > 0:
        d = d / span
    return d


def make_midas_depth_fn(model_type: str = "DPT_Large",
                        feature_size: int = 32,
                        device: str = "cpu") -> Optional[Callable]:
    """Returns depth_fn(image_rgb_uint8) -> (S, S) float32, or None when
    MiDaS cannot be loaded (no network / no cached weights)."""
    try:
        import torch
        midas = torch.hub.load("intel-isl/MiDaS", model_type,
                               trust_repo=True)
        transforms = torch.hub.load("intel-isl/MiDaS", "transforms",
                                    trust_repo=True)
        transform = (transforms.dpt_transform if "DPT" in model_type
                     else transforms.small_transform)
    except Exception:
        return None
    midas.to(device).eval()

    def depth_fn(image: np.ndarray) -> np.ndarray:
        import torch
        with torch.no_grad():
            inp = transform(image).to(device)
            pred = midas(inp)
        return normalize_depth(pred.squeeze().cpu().numpy(), feature_size)

    return depth_fn
