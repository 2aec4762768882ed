"""Fused Pallas TPU kernel: [GroupNorm -> scale-shift -> Mish -> boundary
halo -> VALID 3^3 conv] — the reference ``Block`` hot unit
(``/root/reference/imagen_pytorch3D.py:535-566``) in one kernel.

Round-1 profiling (PERF.md): at the flagship shape the plain-XLA pipeline
spends ~40% of forward time in the conv, ~22% in GroupNorm and ~17% in the
halo exchange. This kernel removes the normalize/Mish read+write pass and
the conv's separate input read by folding them into the conv's im2col
expansion:

  * GroupNorm statistics (cheap single-pass reduction) and the time
    scale-shift are folded host-side into per-(sub-volume, channel) affine
    coefficients ``v = mish(A * x + B)``.
  * The halo exchange runs on the RAW input (same thin-shell traffic), so
    halo voxels carry the NEIGHBOUR sub-volume's values; they must be
    normalized with the neighbour's statistics. Each sub-volume therefore
    gets a 27-region coefficient table (itself + 26 grid neighbours,
    missing neighbours = (A=0, B=0) so mish(0) = 0 — exactly the
    reference's post-activation zero padding, boundary_pad :37-46).
  * Inside the kernel each input plane is normalized+Mish'd on the VPU
    (region-piecewise affine via static row/column masks) and immediately
    expanded into the 9-shift patch matrix; the conv is 3 large MXU
    matmuls per z-tile with fp32 accumulation (same scheme as
    ops/pallas/conv3d.py).

Backward falls back to the plain jnp composition via ``jax.custom_vjp``
(sampling — the headline benchmark — is forward-only).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusioniqt_tpu.ops.volume import halo_exchange
from diffusioniqt_tpu.utils.misc import mish

# set True to run the kernel through the Pallas interpreter (CPU testing)
INTERPRET = False


# ---------------------------------------------------------------------------
# coefficient construction (XLA side, tiny arrays)
# ---------------------------------------------------------------------------

def groupnorm_affine(x, norm_scale, norm_bias, groups: int,
                     scale_shift=None, eps: float = 1e-5):
    """Fold [GroupNorm + bias + optional time (scale+1, shift)] into
    per-(sample, channel) affine coefficients A, B with ``y = A*x + B``.

    Single-pass fp32 statistics, matching blocks.subvol_group_norm(factor=1).
    """
    b, s = x.shape[0], x.shape[1]
    c = x.shape[-1]
    cg = c // groups
    xv = x.reshape(b, s * s * s, groups, cg)
    mean = jnp.mean(xv, axis=(1, 3), dtype=jnp.float32)         # (B, g)
    sq = jnp.mean(jnp.square(xv.astype(jnp.float32)), axis=(1, 3))
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean = jnp.repeat(mean, cg, axis=-1)                        # (B, C)
    rstd = jnp.repeat(rstd, cg, axis=-1)
    a = rstd * norm_scale.astype(jnp.float32)[None, :]
    bb = (norm_bias.astype(jnp.float32)[None, :] - mean * a)
    if scale_shift is not None:
        scale, shift = scale_shift
        scale = scale.reshape(scale.shape[0], -1).astype(jnp.float32)
        shift = shift.reshape(shift.shape[0], -1).astype(jnp.float32)
        if scale.shape[0] != b:  # broadcast a per-group embedding
            scale = jnp.repeat(scale, b // scale.shape[0], axis=0)
            shift = jnp.repeat(shift, b // shift.shape[0], axis=0)
        a = a * (scale + 1.0)
        bb = bb * (scale + 1.0) + shift
    return a, bb


def _neighbor_tables(a, bb, factor: int):
    """(B, C) coefficients -> (B, 27, C) region tables.

    Region r = r1*9 + r2*3 + r3, offsets (r-1) per grid axis in this repo's
    canonical sub-volume ordering (ops.volume). Missing neighbours get
    A = B = 0 (mish(0) = 0 = the reference's zero padding)."""
    n = a.shape[0]
    f = factor
    b_idx = jnp.arange(n)
    rem = b_idx % (f ** 3)
    g1, g2, g3 = rem // (f * f), (rem // f) % f, rem % f
    tabs_a, tabs_b = [], []
    for d1 in (-1, 0, 1):
        for d2 in (-1, 0, 1):
            for d3 in (-1, 0, 1):
                shift_b = (d1 * f + d2) * f + d3
                valid = ((g1 + d1 >= 0) & (g1 + d1 < f)
                         & (g2 + d2 >= 0) & (g2 + d2 < f)
                         & (g3 + d3 >= 0) & (g3 + d3 < f))
                va = jnp.roll(a, -shift_b, axis=0)
                vb = jnp.roll(bb, -shift_b, axis=0)
                m = valid[:, None]
                tabs_a.append(jnp.where(m, va, 0.0))
                tabs_b.append(jnp.where(m, vb, 0.0))
    return jnp.stack(tabs_a, axis=1), jnp.stack(tabs_b, axis=1)  # (B,27,C)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _fused_kernel(x_main_ref, x_next_ref, a_ref, b_ref, w_ref, o_ref, e_ref,
                  *, tz: int, s: int, c: int, cout: int, out_dtype):
    zt = pl.program_id(1)
    sp2 = s + 2

    # static (y, x) border masks for the plane-region select
    row = jax.lax.broadcasted_iota(jnp.int32, (sp2, sp2, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp2, sp2, 1), 1)
    y0, y2 = row == 0, row == sp2 - 1
    x0, x2 = col == 0, col == sp2 - 1

    def expand_plane(cz):
        """(9, C) z-region rows -> (sp2, sp2, C) piecewise-constant field."""
        field = jnp.broadcast_to(cz[4], (sp2, sp2, c))
        field = jnp.where(y0, cz[1][None, None, :], field)
        field = jnp.where(y2, cz[7][None, None, :], field)
        field = jnp.where(x0, cz[3][None, None, :], field)
        field = jnp.where(x2, cz[5][None, None, :], field)
        field = jnp.where(y0 & x0, cz[0][None, None, :], field)
        field = jnp.where(y0 & x2, cz[2][None, None, :], field)
        field = jnp.where(y2 & x0, cz[6][None, None, :], field)
        field = jnp.where(y2 & x2, cz[8][None, None, :], field)
        return field

    # hoist the three z-region coefficient fields out of the plane loop:
    # within a tile only the volume's first/last plane differ, so per plane
    # a single scalar-predicate select picks the right field
    af_lo, af_mid, af_hi = (expand_plane(a_ref[0, 0:9]),
                            expand_plane(a_ref[0, 9:18]),
                            expand_plane(a_ref[0, 18:27]))
    bf_lo, bf_mid, bf_hi = (expand_plane(b_ref[0, 0:9]),
                            expand_plane(b_ref[0, 9:18]),
                            expand_plane(b_ref[0, 18:27]))

    pair = (c % 2 == 0) and (c * 2) % 128 == 0

    for zp in range(tz + 2):
        src = x_main_ref if zp < tz else x_next_ref
        zi = zp if zp < tz else zp - tz
        slab = src[0, zi].astype(jnp.float32)  # (sp2, sp2, C) raw
        zin = zt * tz + zp
        rz_first = zin == 0
        rz_last = zin == sp2 - 1
        af = jnp.where(rz_first, af_lo, jnp.where(rz_last, af_hi, af_mid))
        bf = jnp.where(rz_first, bf_lo, jnp.where(rz_last, bf_hi, bf_mid))
        v32 = af * slab + bf
        # mish via the algebraic identity tanh(softplus(x)) =
        # (u^2 + 2u) / (u^2 + 2u + 2), u = e^x — ONE transcendental per
        # element instead of tanh+log1p+exp (Mosaic transcendentals
        # dominated earlier kernel versions). Clamp keeps u^2 finite;
        # for x>=20 the ratio is 1 to fp32 precision, matching mish(x)=x.
        u = jnp.exp(jnp.minimum(v32, 20.0))
        t_ = u * (u + 2.0)
        v = (v32 * t_ / (t_ + 2.0)).astype(e_ref.dtype)
        if pair:
            # write taps in 128-lane-aligned pairs (full-tile stores)
            for p in range(4):
                dy0, dx0 = divmod(2 * p, 3)
                dy1, dx1 = divmod(2 * p + 1, 3)
                a_ = v[dy0:dy0 + s, dx0:dx0 + s, :].reshape(s * s, c)
                b_ = v[dy1:dy1 + s, dx1:dx1 + s, :].reshape(s * s, c)
                e_ref[zp, :, p * 2 * c:(p + 1) * 2 * c] = jnp.concatenate(
                    [a_, b_], axis=-1
                )
            e_ref[zp, :, 8 * c:9 * c] = (
                v[2:2 + s, 2:2 + s, :].reshape(s * s, c)
            )
        else:
            for tap in range(9):
                dy, dx = divmod(tap, 3)
                e_ref[zp, :, tap * c:(tap + 1) * c] = (
                    v[dy:dy + s, dx:dx + s, :].reshape(s * s, c)
                )

    acc = jnp.zeros((tz * s * s, cout), jnp.float32)
    for dz in range(3):
        lhs = e_ref[dz:dz + tz].reshape(tz * s * s, 9 * c)
        acc = acc + jnp.dot(lhs, w_ref[dz],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(tz, s, s, cout).astype(out_dtype)


def _pick_tz(s: int) -> int:
    if s >= 16:
        return 8
    return s


def _fused_fwd_impl(xh, a_tab, b_tab, w, compute_dtype):
    b, sp2 = xh.shape[0], xh.shape[1]
    s = sp2 - 2
    c = xh.shape[-1]
    cout = w.shape[-1]
    tz = _pick_tz(s)
    assert s % tz == 0
    n_tiles = s // tz

    w2 = w.astype(compute_dtype).reshape(3, 9 * c, cout)
    xp = jnp.pad(xh, [(0, 0), (0, tz), (0, 0), (0, 0), (0, 0)])
    a_tab = a_tab.astype(jnp.float32)
    b_tab = b_tab.astype(jnp.float32)

    kernel = functools.partial(
        _fused_kernel, tz=tz, s=s, c=c, cout=cout, out_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, s, s, cout), compute_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, tz, sp2, sp2, c),
                             lambda bb_, zt: (bb_, zt, 0, 0, 0)),
                pl.BlockSpec((1, tz, sp2, sp2, c),
                             lambda bb_, zt: (bb_, zt + 1, 0, 0, 0)),
                pl.BlockSpec((1, 27, c), lambda bb_, zt: (bb_, 0, 0)),
                pl.BlockSpec((1, 27, c), lambda bb_, zt: (bb_, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 whole
            ],
            out_specs=pl.BlockSpec((1, tz, s, s, cout),
                                   lambda bb_, zt: (bb_, zt, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((tz + 2, s * s, 9 * c), compute_dtype),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(xp, xp, a_tab, b_tab, w2)


# ---------------------------------------------------------------------------
# public op with jnp reference + custom_vjp
# ---------------------------------------------------------------------------

def _reference_impl(x, norm_scale, norm_bias, scale_shift_packed, w,
                    groups: int, factor: int):
    """Plain-jnp composition (identical math; used for backward and tests)."""
    from diffusioniqt_tpu.models.blocks import subvol_group_norm

    xn = subvol_group_norm(x, norm_scale, 1, groups)
    xn = xn + norm_bias.astype(xn.dtype)
    if scale_shift_packed is not None:
        scale, shift = scale_shift_packed
        xn = xn * (scale + 1) + shift
    xn = mish(xn)
    xh = halo_exchange(xn, factor=factor)
    out = jax.lax.conv_general_dilated(
        xh, w.astype(xh.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_boundary_block(x, norm_scale, norm_bias, scale_shift, w,
                         groups: int, factor: int, compute_dtype=jnp.float32):
    """Fused [GN -> (scale, shift) -> Mish -> halo -> VALID conv].

    x: (B, s, s, s, C) raw split sub-volumes (B a multiple of factor^3);
    w: (3, 3, 3, C, Cout). Returns (B, s, s, s, Cout) in compute_dtype.
    ``scale_shift``: optional ((B,1,1,1,C), (B,1,1,1,C)) time conditioning.
    """
    a, bb = groupnorm_affine(x, norm_scale, norm_bias, groups,
                             scale_shift=scale_shift)
    a_tab, b_tab = _neighbor_tables(a, bb, factor)
    xh = halo_exchange(x.astype(compute_dtype), factor=factor)
    return _fused_fwd_impl(xh, a_tab, b_tab, w, compute_dtype)


def _fwd(x, norm_scale, norm_bias, scale_shift, w, groups, factor,
         compute_dtype):
    out = fused_boundary_block(x, norm_scale, norm_bias, scale_shift, w,
                               groups, factor, compute_dtype)
    return out, (x, norm_scale, norm_bias, scale_shift, w)


def _bwd(groups, factor, compute_dtype, residuals, g):
    x, norm_scale, norm_bias, scale_shift, w = residuals

    def ref(x_, ns_, nb_, ss_, w_):
        return _reference_impl(x_, ns_, nb_, ss_, w_, groups, factor).astype(
            compute_dtype
        )

    _, vjp = jax.vjp(ref, x, norm_scale, norm_bias, scale_shift, w)
    return vjp(g)


fused_boundary_block.defvjp(_fwd, _bwd)
