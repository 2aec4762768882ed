"""Pallas TPU kernel: 3x3x3 VALID conv over halo-padded sub-volumes.

The hot op of the whole framework: every ResnetBlock conv (reference
``imagen_pytorch3D.py:535-566``) is a 3^3 conv over (B, s+2, s+2, s+2, C)
halo-padded activations (zero halo for SAME semantics, neighbour halo for
boundary mode — both produced upstream).

XLA's conv3d lowering reaches only ~25-45 TFLOP/s on v5e at these shapes.
This kernel reformulates the conv as MXU matmuls:

  * grid cell = (batch, z-tile)
  * each input row z' (s+2, s+2, C) is expanded ONCE into its 9-shift
    patch matrix (s*s, 9C) — rows are shared by the 3 output rows that
    consume them (dz = 0,1,2), so expansion traffic is 1x, not 3x
  * output tile = sum of 3 large matmuls
      (tz*s*s, 9C) @ (9C, Cout)   for dz in 0..2
    with fp32 accumulation — M is thousands, K = 9C, exactly what the
    MXU wants.

Backward: jax.custom_vjp recomputes gradients through the lax.conv
reference (conv backward is itself a conv; a dedicated backward kernel is a
later optimisation — sampling, the headline benchmark, is forward-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_main_ref, x_next_ref, w_ref, o_ref, e_ref, *, tz: int,
                 s: int, c: int, cout: int, pair: bool):
    # assemble the per-row 9-shift patch matrices into VMEM scratch
    for zp in range(tz + 2):
        src = x_main_ref if zp < tz else x_next_ref
        zi = zp if zp < tz else zp - tz
        slab = src[0, zi]  # (s+2, s+2, C)
        if pair:
            # c == 64: write taps in 128-lane-aligned pairs so stores hit
            # full (sublane, lane) tiles instead of masked 64-offset writes
            for p in range(4):
                dy0, dx0 = divmod(2 * p, 3)
                dy1, dx1 = divmod(2 * p + 1, 3)
                a = slab[dy0:dy0 + s, dx0:dx0 + s, :].reshape(s * s, c)
                bq = slab[dy1:dy1 + s, dx1:dx1 + s, :].reshape(s * s, c)
                e_ref[zp, :, p * 2 * c:(p + 1) * 2 * c] = jnp.concatenate(
                    [a, bq], axis=-1
                )
            last = slab[2:2 + s, 2:2 + s, :].reshape(s * s, c)
            e_ref[zp, :, 8 * c:9 * c] = last
        else:
            for tap in range(9):
                dy, dx = divmod(tap, 3)
                shifted = slab[dy:dy + s, dx:dx + s, :].reshape(s * s, c)
                e_ref[zp, :, tap * c:(tap + 1) * c] = shifted

    # 3 large MXU matmuls per tile (M = tz*s*s, K = 9C, N = Cout); row z of
    # the output consumes expanded rows z, z+1, z+2 — expressed as shifted
    # slices of the shared expansion buffer
    acc = jnp.zeros((tz * s * s, cout), jnp.float32)
    for dz in range(3):
        lhs = e_ref[dz:dz + tz].reshape(tz * s * s, 9 * c)
        acc = acc + jnp.dot(lhs, w_ref[dz],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(tz, s, s, cout).astype(o_ref.dtype)


def _pick_tz(s: int) -> int:
    # z-tile: balance VMEM (expanded buffer) against grid overhead
    if s >= 32:
        return 8
    if s >= 16:
        return 8
    return s


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3d_valid(xh: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """VALID 3^3 conv: (B, s+2, s+2, s+2, C) x (3,3,3,C,Cout) -> (B, s, s, s, Cout)."""
    return _conv3d_valid_fwd_impl(xh, w)


def _conv3d_valid_fwd_impl(xh, w):
    b, sp2 = xh.shape[0], xh.shape[1]
    s = sp2 - 2
    c = xh.shape[-1]
    cout = w.shape[-1]
    tz = _pick_tz(s)
    n_tiles = s // tz
    assert s % tz == 0

    # weights: (3,3,3,C,Cout) -> (3, 9C, Cout), ordered to match the
    # (dy, dx, c) patch concat above
    w2 = jnp.transpose(w, (0, 1, 2, 3, 4)).reshape(3, 9 * c, cout)

    # pad z so the "next tile" spec never reads out of bounds
    xp = jnp.pad(xh, [(0, 0), (0, tz), (0, 0), (0, 0), (0, 0)])

    pair = (c == 64)
    kernel = functools.partial(_conv_kernel, tz=tz, s=s, c=c, cout=cout,
                               pair=pair)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, s, s, cout), xh.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, tz, sp2, sp2, c),
                             lambda bb, zt: (bb, zt, 0, 0, 0)),
                pl.BlockSpec((1, tz, sp2, sp2, c),
                             lambda bb, zt: (bb, zt + 1, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 whole
            ],
            out_specs=pl.BlockSpec((1, tz, s, s, cout),
                                   lambda bb, zt: (bb, zt, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((tz + 2, s * s, 9 * c), xh.dtype),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, xp, w2)
    return out


def _reference_conv(xh, w):
    return jax.lax.conv_general_dilated(
        xh, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(xh.dtype)


def _fwd(xh, w):
    return _conv3d_valid_fwd_impl(xh, w), (xh, w)


def _bwd(residuals, g):
    xh, w = residuals
    _, vjp = jax.vjp(_reference_conv, xh, w)
    return vjp(g.astype(xh.dtype))


conv3d_valid.defvjp(_fwd, _bwd)


def conv3d_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME 3^3 conv via the VALID kernel on a zero-padded input."""
    xh = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    return conv3d_valid(xh, w)
