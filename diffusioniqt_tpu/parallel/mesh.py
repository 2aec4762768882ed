"""Device mesh construction.

The reference's distributed runtime is HF Accelerate over torch.distributed
NCCL (``/root/reference/trainer.py:296-301``); the TPU-native equivalent is a
``jax.sharding.Mesh`` + NamedSharding-annotated jit, with XLA inserting the
collectives over ICI (SURVEY.md §2.2). No wrapper classes, no process groups:
one SPMD program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def create_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Create a mesh over the available devices.

    Default: a 1-D data mesh over all devices. Pass
    ``axis_names=('data', 'model'), axis_sizes=(4, 2)`` for a DP x TP mesh.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [1] * len(axis_names)
        axis_sizes[0] = n
    axis_sizes = tuple(axis_sizes)
    assert int(np.prod(axis_sizes)) == n, (
        f"mesh {axis_sizes} does not cover {n} devices"
    )
    dev_array = mesh_utils.create_device_mesh(axis_sizes, devices=devices)
    return Mesh(dev_array, tuple(axis_names))
