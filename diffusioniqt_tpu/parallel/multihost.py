"""Multi-host orchestration (SURVEY.md §2.2 elastic/multi-node row).

The reference relies on the Accelerate launcher + torch.distributed process
groups (trainer.py:296-303). The JAX equivalent is one call to
``jax.distributed.initialize`` per host before any backend use; afterwards
``jax.devices()`` spans the whole slice and every jitted computation is a
single SPMD program (ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialise JAX's multi-host runtime. No-ops on a single host.

    On Cloud TPU slices all arguments auto-detect from the metadata server;
    elsewhere pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if num_processes in (None, 1) and coordinator_address is None:
        return  # single-host

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    """Main-process predicate (the reference's accelerator.is_main_process,
    trainer.py:438-440) — gate checkpoint writes and logging on this."""
    import jax

    return jax.process_index() == 0


def local_batch_slice(global_batch: int):
    """The slice of a globally-sharded batch this host should feed.

    Raises on indivisible batches instead of silently dropping the
    remainder rows (which would also desynchronize the processes'
    collective shapes)."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"process_count {n}; pad the batch or adjust batch_size"
        )
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
