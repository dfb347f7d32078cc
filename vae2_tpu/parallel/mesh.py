"""Device mesh + sharding layout for VAE^2 training.

The TPU-native replacement for the reference's NCCL/DDP distribution
(reference tools/train.py:107-111, 225-229; SURVEY.md section 2 "Parallelism"):
a single jitted program over a ``Mesh`` with

- **data axis**: the batch is sharded; gradient all-reduce and global
  BatchNorm statistics (SyncBN semantics) fall out of XLA's SPMD
  partitioner automatically — no process groups, no queues.
- **spatial axis** (optional): the image H dimension is sharded for
  large-resolution recipes; XLA inserts halo exchanges for the convolutions.

Parameters and optimizer state are replicated (the model is ~25M params —
far below HBM; replication keeps every matmul local and all collectives on
the gradient tree).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(config=None, devices=None) -> Mesh:
    """Build a (data, spatial) mesh from TPU.MESH config."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    spatial = 1
    if config is not None:
        spatial = int(config.TPU.MESH.SPATIAL)
        data = int(config.TPU.MESH.DATA)
        if data > 0:
            assert data * spatial <= n, (
                f"mesh {data}x{spatial} exceeds {n} devices")
            n = data * spatial
            devices = devices[:n]
    assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Clips (B, H, W, C): batch over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_fn(mesh: Mesh) -> Callable[[Dict[str, Any]], Dict[str, Any]]:
    """Returns a host->device transfer fn placing each clip with the batch
    sharding. 1-D arrays (toy) shard on 'data' only.

    Multi-process: each host holds its own slice of the global batch (from
    ClipLoader's per-host shard); ``make_array_from_process_local_data``
    assembles the global sharded array (the DistributedSampler+DDP input
    contract, reference tools/train.py:129-141).
    """
    clip_s = batch_sharding(mesh)
    vec_s = NamedSharding(mesh, P("data"))
    multi_process = jax.process_count() > 1

    def put(batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in batch.items():
            s = clip_s if getattr(v, "ndim", 0) >= 3 else vec_s
            if multi_process:
                out[k] = jax.make_array_from_process_local_data(s, v)
            else:
                out[k] = jax.device_put(v, s)
        return out

    return put


def shard_state(state, mesh: Mesh):
    """Replicate the full train state across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
