"""Checkpoint save/restore.

The reference torch.saves the relation head once per epoch from rank 0 with a
`{Hier|Flat}RelationModel_{Baseline|CS}_{cluster}{epoch}_0.pth` name pattern
(reference train_test.py:311-322).  Here orbax handles the (sharded) pytree;
the frozen DETR weights are converted once (models/weights.py) and never
re-saved, matching the reference.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def checkpoint_name(hierarchical: bool, run_mode: str, clustering: str,
                    epoch: int) -> str:
    """Reference-compatible checkpoint naming (train_test.py:311-319)."""
    head = "HierRelationModel" if hierarchical else "FlatRelationModel"
    tag = "CS" if run_mode in ("train_cs",) else "Baseline"
    return f"{head}_{tag}_{clustering}{epoch}"


def save(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), template)
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)
