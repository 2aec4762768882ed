"""Sharding rules: data-parallel batches + tensor-parallel channels.

Replaces the reference's DDP gradient allreduce (Accelerate,
``/root/reference/trainer.py:296-301, 1123``) with SPMD sharding annotations:

  * **DP**  — batch axis (incl. the 27-sub-volume batch_sample axis) sharded
    over the ``data`` mesh axis; XLA reduces gradients over ICI
    automatically.
  * **TP**  — output-channel axes of large conv kernels / dense layers
    sharded over the ``model`` mesh axis. Channels-last activations then
    carry a channel sharding and XLA inserts the all-gathers/reduce-scatters.

These are *rules*, not hand-written collectives — the scaling-book recipe:
pick a mesh, annotate shardings, let XLA place collectives.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch / sub-volume) axis."""
    return NamedSharding(mesh, P(axis))


def _leaf_spec(leaf, model_size: int, min_size: int) -> P:
    """Choose a PartitionSpec for one parameter leaf.

    Conv kernels are (kx, ky, kz, in, out); Dense are (in, out). Sharding the
    trailing (output-channel) axis over 'model' keeps the matmul's N
    dimension distributed — the standard Megatron-style column split.
    """
    if leaf.ndim >= 2 and leaf.size >= min_size and leaf.shape[-1] % model_size == 0:
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def param_shardings(
    params: Any,
    mesh: Mesh,
    model_axis: str = "model",
    min_size: int = 4096,
) -> Any:
    """NamedSharding tree for a parameter pytree.

    If the mesh has no ``model`` axis (pure DP), everything replicates.
    """
    if model_axis not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: replicate(mesh), params)
    model_size = mesh.shape[model_axis]
    if model_size == 1:
        return jax.tree_util.tree_map(lambda _: replicate(mesh), params)
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, model_size, min_size)),
        params,
    )
