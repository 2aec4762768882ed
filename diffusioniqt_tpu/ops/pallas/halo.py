"""Pallas TPU kernel: sub-volume halo exchange via direct DMA.

The boundary conv mode needs every (s, s, s, C) sub-volume padded to
(s+2, s+2, s+2, C) with real voxels from its 26 grid neighbours (zeros at
the merged volume's outer border) — the reference's ``boundary_pad``
(imagen_pytorch3D.py:37-46). XLA formulations (gather / 26 dynamic-update-
slices / per-axis concats) all run 20-50x below HBM bandwidth because of the
strided 8D access patterns they lower to.

This kernel does it as pure data movement: one grid cell per sub-volume,
27 async DMAs (center + 6 faces + 12 edges + 8 corners) from the neighbours'
HBM regions straight into the padded output — all in flight concurrently,
one wait pass at the end. Border regions copy from a zero VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _regions(s: int, d: int):
    """((src_start, len), dst_start) along one axis for grid offset d."""
    if d == -1:
        return (s - 1, 1), 0       # neighbour's last plane -> halo row 0
    if d == 1:
        return (0, 1), s + 1       # neighbour's first plane -> halo row s+1
    return (0, s), 1               # own interior


_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


def _halo_kernel(x_hbm, o_hbm, zeros_vmem, sem, *, s: int, f: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init_zeros():
        zeros_vmem[...] = jnp.zeros_like(zeros_vmem)

    rem = b % (f ** 3)
    gx = rem // (f * f)
    gy = (rem // f) % f
    gz = rem % f

    def make_copy(idx, dx, dy, dz):
        (sx, lx), tx = _regions(s, dx)
        (sy, ly), ty = _regions(s, dy)
        (sz, lz), tz = _regions(s, dz)
        nb = b + dx * f * f + dy * f + dz
        valid = (
            (gx + dx >= 0) & (gx + dx < f)
            & (gy + dy >= 0) & (gy + dy < f)
            & (gz + dz >= 0) & (gz + dz < f)
        )
        dst = o_hbm.at[b, pl.ds(tx, lx), pl.ds(ty, ly), pl.ds(tz, lz), :]
        real = lambda: pltpu.make_async_copy(
            x_hbm.at[nb, pl.ds(sx, lx), pl.ds(sy, ly), pl.ds(sz, lz), :],
            dst, sem.at[idx],
        )
        zero = lambda: pltpu.make_async_copy(
            zeros_vmem.at[pl.ds(0, lx), pl.ds(0, ly), pl.ds(0, lz), :],
            dst, sem.at[idx],
        )
        return valid, real, zero

    # start all 27 DMAs concurrently...
    for idx, (dx, dy, dz) in enumerate(_OFFSETS):
        valid, real, zero = make_copy(idx, dx, dy, dz)

        @pl.when(valid)
        def _start_real(real=real):
            real().start()

        if not (dx == 0 and dy == 0 and dz == 0):
            @pl.when(jnp.logical_not(valid))
            def _start_zero(zero=zero):
                zero().start()

    # ...then drain
    for idx, (dx, dy, dz) in enumerate(_OFFSETS):
        valid, real, zero = make_copy(idx, dx, dy, dz)

        @pl.when(valid)
        def _wait_real(real=real):
            real().wait()

        if not (dx == 0 and dy == 0 and dz == 0):
            @pl.when(jnp.logical_not(valid))
            def _wait_zero(zero=zero):
                zero().wait()


def halo_exchange_pallas(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """(B*f^3, s, s, s, C) -> (B*f^3, s+2, s+2, s+2, C), neighbour halos."""
    n, s = x.shape[0], x.shape[1]
    c = x.shape[-1]
    f = factor
    kernel = functools.partial(_halo_kernel, s=s, f=f)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s + 2, s + 2, s + 2, c), x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                # large enough for any border region (worst case: a face)
                pltpu.VMEM((s, s, s, c), x.dtype),
                pltpu.SemaphoreType.DMA((27,)),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(x)
