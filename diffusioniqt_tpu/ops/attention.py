"""Attention compute ops: jnp reference + Pallas TPU kernel dispatch.

``scaled_dot_product_attention`` is the single entry point the model layer
uses. On TPU (and when shapes are kernel-friendly) it dispatches to the
fused Pallas flash-attention kernel; otherwise it falls back to the jnp
reference implementation, which XLA still fuses well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: float) -> jnp.ndarray:
    """Plain softmax attention. q: (B, Nq, D), k/v: (B, Nk, D).

    Matches the reference einsum chain (imagen_pytorch3D.py:1088-1099).
    Note the reference applies the scale to the *pre-context* energy computed
    before context tokens are concatenated; here scale applies to all keys —
    the uncontexted path (the one exercised by the IQT configs) is identical.
    """
    energy = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    att = jax.nn.softmax(energy, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", att, v)


def _flash_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


_FLASH_MIN_TOKENS = 4096  # below this the XLA-fused reference is faster


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Dispatching attention: Pallas flash kernel on TPU for long token
    counts (where the N^2 score matrix stops fitting cache), XLA-fused jnp
    otherwise (measured faster below ~4k tokens on v5e)."""
    if use_flash and k.shape[1] >= _FLASH_MIN_TOKENS and _flash_available():
        try:
            from diffusioniqt_tpu.ops.pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except Exception:
            pass  # fall back to the reference path on any kernel limitation
    return attention_reference(q, k, v, scale)
