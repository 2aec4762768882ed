"""Fused flash attention over volumetric patch tokens (Pallas TPU).

The reference materialises the full (N, N) score matrix
(``/root/reference/imagen_pytorch3D.py:1088-1099``); this kernel computes
``softmax(Q K^T) V`` tile-by-tile with online softmax so the scores never
leave VMEM — the standard TPU flash-attention structure (one grid cell per
(batch*head, q-tile, kv-tile), fp32 running max/sum/accumulator scratch).

Forward is a Pallas kernel; the backward pass recomputes attention with the
jnp reference under ``jax.custom_vjp`` (token counts here are small — a few
hundred to a few thousand patchified tokens — so recompute is cheaper than a
dedicated backward kernel's extra HBM traffic).

Inputs: q, k, v shaped (B, N, D) with B = batch * heads. Non-128-multiple
N and D are zero-padded and masked inside the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusioniqt_tpu.ops.attention import attention_reference

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
               scale: float, n_kv: int, block_k: int):
    """One (batch, q-tile, kv-tile) grid cell."""
    j = pl.program_id(2)
    n_kv_tiles = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)

    # mask padded kv columns (static shapes: n_kv is a python int)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = s + jnp.where(col < n_kv, 0.0, _MASK_VALUE)

    m_prev = m_ref[...][:, :1]                      # (block_q, 1)
    l_prev = l_ref[...][:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)      # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)                         # (block_q, block_k)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(j == n_kv_tiles - 1)
    def _store():
        l_final = l_ref[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    return _flash_forward(q, k, v, scale)


def _flash_forward(q, k, v, scale: float,
                   block_q: int = 128, block_k: int = 128):
    b, n_q, d = q.shape
    n_kv = k.shape[1]

    d_pad = max(-(-d // _LANES) * _LANES, _LANES)
    nq_pad = -(-n_q // block_q) * block_q
    nk_pad = -(-n_kv // block_k) * block_k

    qp = _pad_to(_pad_to(q, nq_pad, 1), d_pad, 2)
    kp = _pad_to(_pad_to(k, nk_pad, 1), d_pad, 2)
    vp = _pad_to(_pad_to(v, nk_pad, 1), d_pad, 2)

    grid = (b, nq_pad // block_q, nk_pad // block_k)

    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, n_kv=n_kv, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, d_pad), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_pad),
                                   lambda b, i, j: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
                pltpu.VMEM((block_q, _LANES), jnp.float32),  # l
                pltpu.VMEM((block_q, d_pad), jnp.float32),   # acc
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)

    return out[:, :n_q, :d]


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
