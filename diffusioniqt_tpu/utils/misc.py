"""Small shared helpers."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


def exists(val: Any) -> bool:
    return val is not None


def default(val, d):
    if val is not None:
        return val
    return d() if callable(d) else d


def cast_tuple(val, length: Optional[int] = None) -> Tuple:
    """Reference ``cast_tuple`` semantics (imagen_pytorch3D.py:91-100)."""
    if isinstance(val, list):
        val = tuple(val)
    output = val if isinstance(val, tuple) else ((val,) * (length or 1))
    if length is not None and len(output) != length:
        raise ValueError(f"tuple length {len(output)} != expected {length}")
    return output


def pad_tuple_to_length(t: Tuple, length: int, fillvalue=None) -> Tuple:
    remain = length - len(t)
    if remain <= 0:
        return t
    return (*t, *((fillvalue,) * remain))


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation: x * tanh(softplus(x)) (the reference's default
    nonlinearity, e.g. imagen_pytorch3D.py:547)."""
    return x * jnp.tanh(jax.nn.softplus(x))
