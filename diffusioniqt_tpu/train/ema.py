"""Exponential moving average of parameters.

Equivalent capability to the reference's ema-pytorch usage
(``/root/reference/trainer.py:361-362`` with library defaults:
beta=0.9999, update_after_step=100, update_every=10, inv_gamma=1,
power=2/3) — including the warm-up decay ramp, implemented as pure
functions over pytrees so the update jits and shards.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EMAState:
    params: Any
    step: jnp.ndarray  # int32 scalar — trainer optimizer steps seen

    @classmethod
    def create(cls, params) -> "EMAState":
        # deep copy: the online params' buffers get donated by the jitted
        # train step, so the EMA must own its own storage
        return cls(params=jax.tree_util.tree_map(jnp.copy, params),
                   step=jnp.zeros((), jnp.int32))


def ema_decay_schedule(
    step: jnp.ndarray,
    beta: float = 0.9999,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> jnp.ndarray:
    """ema-pytorch's ramped decay: 1 - (1 + epoch/inv_gamma)^(-power),
    clamped to [min_value, beta]; zero before warm-up ends (so the EMA copies
    the online params until ``update_after_step``)."""
    epoch = jnp.clip(step - update_after_step - 1, min=0).astype(jnp.float32)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** -power
    value = jnp.clip(value, min_value, beta)
    return jnp.where(step <= update_after_step, 0.0, value)


def ema_update(
    state: EMAState,
    new_params,
    step=None,
    beta: float = 0.9999,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> EMAState:
    """One EMA update (call every ``update_every`` optimiser steps).

    ``step`` is the trainer's optimizer-step count. ema-pytorch's internal
    counter advances on *every* trainer update (the reference calls
    ``EMA.update()`` each step and the wrapper gates the moving-average
    application internally, ``/root/reference/trainer.py:361-362,1062``),
    so the warm-up ramp must be driven by trainer steps, not by how many
    gated EMA applications have happened. Falls back to counting calls when
    ``step`` is omitted (legacy behaviour)."""
    step = state.step + 1 if step is None else jnp.asarray(step, jnp.int32)
    decay = ema_decay_schedule(
        step, beta=beta, update_after_step=update_after_step,
        inv_gamma=inv_gamma, power=power,
    )
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        state.params,
        new_params,
    )
    return EMAState(params=new_ema, step=step)
