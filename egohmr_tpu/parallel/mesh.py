"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.7: no DP/TP/PP anywhere;
NCCL never initialized). The TPU-native scaling story for this workload is
data parallelism over ICI: every component (backbone, PointNet, GCN, SMPL,
SDF) is batched per-sample with no cross-sample interaction, so a 1-D 'data'
mesh with fully-replicated params and batch-sharded activations puts XLA
collectives (psum for grads/metrics, pmean for cross-replica BN) on ICI with
zero code changes in the model itself.

Model parallelism is unnecessary at this scale (ResNet50 + 4-layer GCN fits
per-chip many times over), so sharded-parameter specs exist but default to
replication. For latency-bound small-batch serving there is an OPT-IN
Megatron-style tensor-parallel placement over a 2-D (data x model) mesh in
`parallel/tp.py`.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Place a host batch pytree with the leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
