"""Tensor parallelism for the wide relation-head layers (GSPMD path).

The relation head is ~290M params, dominated by fc1 (65536 x 4096) and the
label-conditioned fc2 block.  For data parallelism the framework uses
shard_map (train.engine); for model scaling beyond one chip's HBM this
module shards those layers over the mesh's 'model' axis with Megatron-style
layouts and lets the XLA GSPMD partitioner insert the collectives:

  fc1:    column-parallel (output dim sharded) -> activations sharded on
          the hidden axis, no communication;
  fc2_h:  row-parallel (input dim sharded) -> one reduce over 'model'
          (all label embeddings replicated, added after the reduce);
  everything else replicated.

Recipe: `shard_params(params, mesh)` -> `jax.jit(step)` on the sharded
pytree (the standard scaling-book flow: pick a mesh, annotate shardings,
let XLA insert collectives).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-path suffix -> PartitionSpec
_TP_RULES = {
    ("fc1", "kernel"): P(None, "model"),
    ("fc1", "bias"): P("model"),
    ("fc2_h", "kernel"): P("model", None),
}


def partition_spec_for_path(path) -> P:
    keys = tuple(getattr(k, "key", getattr(k, "name", None)) for k in path)
    for (mod, leaf), spec in _TP_RULES.items():
        if mod in keys and keys[-1] == leaf:
            return spec
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for the relation-head params under TP."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, partition_spec_for_path(path)),
        params)


def shard_params(params: Any, mesh: Mesh):
    """Places params on the mesh with the TP layout (fc1 column-parallel,
    fc2_h row-parallel, rest replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, partition_spec_for_path(path))),
        params)
