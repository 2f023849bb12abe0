"""Device mesh and sharding utilities.

The reference scales with one process per GPU + DDP over gloo (reference
main.py:103, train_test.py:25-28).  The TPU-native equivalent is a single
program laid out over a `jax.sharding.Mesh`:

  * axis 'data'  — batch sharding (data parallelism); gradients reduce with
    `lax.pmean` over ICI inside shard_map (see train.engine.make_train_step);
  * axis 'model' — optional tensor parallelism for the wide fc1/fc2 layers
    (the relation head is ~290M params, dominated by fc1's 65536x4096).

Multi-host extends the same mesh over DCN via jax.distributed.initialize;
no explicit process groups, barriers, or rendezvous are needed — program
order and collectives replace reference train_test.py:306/323's
monitored_barrier calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Builds a ('data', 'model') mesh.  data=-1 uses all remaining
    devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data <= 0:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Places a host batch onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate_tree(mesh: Mesh, tree):
    rep = replicate(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, rep), tree)


def init_multihost(coordinator_address=None, num_processes=None,
                   process_id=None) -> int:
    """Initializes multi-host JAX (DCN across hosts; ICI within a slice).

    Replaces the reference's gloo process-group rendezvous (reference
    train_test.py:25-28).  No-op when single-process (env vars absent and no
    explicit coordinator).  Returns the process index.
    """
    import os
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in \
            os.environ and num_processes is None:
        return jax.process_index() if jax.process_count() > 1 else 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()
