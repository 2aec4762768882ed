"""U-Net building blocks (Flax linen, channels-last NDHWC).

TPU-first re-design of the reference block zoo
(``/root/reference/imagen_pytorch3D.py:361-720``):
  Block           — GroupNorm → (time scale-shift) → Mish → Conv3x3x3
  ResnetBlock     — two Blocks + time MLP + squeeze-excite + residual 1x1
  SE3D            — squeeze-and-excitation channel attention
  Downsample      — pixel-unshuffle "SP-conv" (arXiv 2208.03641)
  PixelShuffleUpsample — 1x1 conv (ICNR init) + Mish + 3D pixel shuffle
  DeconvUpsample  — transposed-conv alternative
  CrossEmbedLayer — multi-kernel stem
  LearnedSinusoidalPosEmb — @crowsonkb learned Fourier time embedding

Everything is shaped so XLA keeps convs on the MXU: channels-last layout,
static shapes, and elementwise chains (norm/scale-shift/Mish) that XLA fuses
into the convolution. ``boundary`` mode swaps SAME convs for halo-gather +
VALID convs (see ops.volume.boundary_halo).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from diffusioniqt_tpu.ops.volume import (
    halo_exchange,
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
)
from diffusioniqt_tpu.utils.misc import mish

Dtype = Any


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned Fourier features over scalar conditioning (reference
    imagen_pytorch3D.py:518-533). Output dim = ``dim`` + 1."""

    dim: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.dim % 2 == 0
        half_dim = self.dim // 2
        weights = self.param(
            "weights", nn.initializers.normal(stddev=1.0), (half_dim,), jnp.float32
        )
        x = x[:, None].astype(jnp.float32)
        freqs = x * weights[None, :] * 2 * math.pi
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class ChanLayerNorm(nn.Module):
    """LayerNorm over the channel axis only, learned scale, no bias
    (reference ``LayerNorm``/``ChanLayerNorm``, imagen_pytorch3D.py:361-382)."""

    stable: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (feats,), jnp.float32)
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        if self.stable:
            x32 = x32 / jax.lax.stop_gradient(
                jnp.max(x32, axis=-1, keepdims=True)
            )
        eps = 1e-5
        var = jnp.var(x32, axis=-1, keepdims=True)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + eps) * g
        return out.astype(self.dtype or orig_dtype)


class SE3D(nn.Module):
    """Squeeze-and-excitation over (X,Y,Z) (reference imagen_pytorch3D.py:617-632).

    ``factor > 1``: merged-layout mode — pooling and gating happen per
    sub-volume of the merged volume (matching the reference's per-sub-volume
    batch semantics) via reshape-reductions."""

    reduction: int = 16
    factor: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        f = self.factor
        if f > 1:
            b, S = x.shape[0], x.shape[1]
            s = S // f
            y = x.reshape(b, f, s, f, s, f, s, c).mean(axis=(2, 4, 6))  # (b,f,f,f,c)
        else:
            y = jnp.mean(x, axis=(1, 2, 3))  # (B, C)
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False, dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        if f > 1:
            return x * _expand_subvol(y, x.shape[1])
        return x * y[:, None, None, None, :]


def subvol_stats_reshape(x: jnp.ndarray, factor: int):
    """View a merged volume (B, f*s, f*s, f*s, C) as
    (B, f, s, f, s, f, s, C) — a free reshape (no transpose) that exposes the
    sub-volume grid for per-sub-volume reductions."""
    b, S, _, _, c = x.shape
    f = factor
    s = S // f
    return x.reshape(b, f, s, f, s, f, s, c)


def subvol_group_norm(x: jnp.ndarray, scale: jnp.ndarray, factor: int,
                      groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over (spatial, channels-in-group), per batch element
    (factor=1) or per sub-volume of a merged volume (factor>1) — the
    reference's per-sub-volume semantics (imagen_pytorch3D.py:546).

    factor=1 uses single-pass E[x^2]-E[x]^2 statistics accumulated in fp32
    (25% less HBM traffic than the two-pass form at bf16; activations here
    are O(1) z-scores, so the cancellation loss is below bf16 resolution).
    """
    b, S, _, _, c = x.shape
    cg = c // groups
    orig_dtype = x.dtype
    if factor == 1:
        xv = x.reshape(b, S * S * S, groups, cg)
        mean = jnp.mean(xv, axis=(1, 3), dtype=jnp.float32, keepdims=True)
        sq = jnp.mean(jnp.square(xv.astype(jnp.float32)), axis=(1, 3),
                      keepdims=True)
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        out = (xv.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
        out = out.reshape(b, S, S, S, c) * scale.astype(jnp.float32)
        return out.astype(orig_dtype)
    f = factor
    s = S // f
    # per-sub-volume stats without any transposing/badly-tiled reshape of
    # the big activation: (b, f, s, f, s, f, s, c) is a layout-free view,
    # both reductions fuse into it, and the (groups, cg) split happens only
    # on the tiny (b, f, f, f, c) reduced arrays. The normalize itself is a
    # single fused multiply-add in the compute dtype (stats in fp32).
    xv = x.reshape(b, f, s, f, s, f, s, c)
    mean_c = jnp.mean(xv, axis=(2, 4, 6), dtype=jnp.float32)  # (b,f,f,f,c)
    sq_c = jnp.mean(jnp.square(xv.astype(jnp.float32)), axis=(2, 4, 6))
    mean = mean_c.reshape(b, f, f, f, groups, cg).mean(-1)    # (b,f,f,f,g)
    sq = sq_c.reshape(b, f, f, f, groups, cg).mean(-1)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean = jnp.repeat(mean, cg, axis=-1)                      # (b,f,f,f,c)
    rstd = jnp.repeat(rstd, cg, axis=-1)
    a = rstd * scale.astype(jnp.float32)
    bias_f = -mean * a
    # broadcast on the 8-D view; the multiply-add runs in the compute dtype
    # (stats/coefficients are fp32) so no full-resolution fp32 temp exists —
    # a and bias are O(1) z-score coefficients, safely representable
    av = a.astype(orig_dtype)[:, :, None, :, None, :, None, :]
    bv = bias_f.astype(orig_dtype)[:, :, None, :, None, :, None, :]
    out = xv * av + bv
    return out.reshape(b, S, S, S, c)


class Block(nn.Module):
    """GroupNorm → optional (scale+1, shift) → Mish → Conv3 (reference
    imagen_pytorch3D.py:535-566).

    ``boundary``: the reference implements boundary convs as
    merge→zero-pad→overlapping-halo-unfold→VALID conv per block
    (:37-46, :551-566). Two equivalent TPU formulations here:

      * split layout (``merged=False``): a 26-neighbour halo shell exchange
        (ops.volume.halo_exchange) followed by a VALID conv — identical
        values, ~3x faster than re-gathering the merged volume;
      * merged layout (``merged=True``): the input IS the merged volume, and
        [per-sub-volume halo + VALID conv] collapses to ONE SAME conv over
        it (the zero outer border and real inner neighbours come for free).
        No halo traffic at all, and XLA sees one large conv. GroupNorm keeps
        the reference's per-sub-volume statistics via the factor-blocked
        reshape view (subvol_group_norm).
    """

    dim_out: int
    groups: int = 8
    norm: bool = True
    boundary: bool = False
    factor: int = 3
    merged: bool = False
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale_shift=None) -> jnp.ndarray:
        if (
            self.use_pallas and self.boundary and not self.merged
            and self.norm and jax.default_backend() == "tpu"
        ):
            return self._fused_pallas(x, scale_shift)
        if self.norm:
            g = self.param("norm_scale", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
            bias = self.param("norm_bias", nn.initializers.zeros,
                              (x.shape[-1],), jnp.float32)
            x = subvol_group_norm(
                x, g, self.factor if self.merged else 1, self.groups
            )
            x = x + bias.astype(x.dtype)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = mish(x)
        if self.boundary and not self.merged:
            x = halo_exchange(x, factor=self.factor)
            padding = "VALID"
        else:
            padding = "SAME"
        # named for the selective remat policy (UNet3D.remat_policy='conv'):
        # saving conv inputs+outputs makes backward recompute only the
        # GN/Mish chain above, not the MXU-heavy convolutions
        x = checkpoint_name(x, "conv_in")
        return checkpoint_name(
            nn.Conv(
                self.dim_out, kernel_size=(3, 3, 3), padding=padding,
                dtype=self.dtype,
            )(x),
            "conv_out",
        )

    def _fused_pallas(self, x: jnp.ndarray, scale_shift) -> jnp.ndarray:
        """One Pallas kernel for [GN -> scale-shift -> Mish -> halo -> conv]
        (ops.pallas.fused_block). The conv weights live in the same nn.Conv
        child ("Conv_0") as the jnp path, so parameters are interchangeable;
        the dummy call below only materialises them (XLA dead-code-eliminates
        its compute)."""
        from diffusioniqt_tpu.ops.pallas.fused_block import (
            fused_boundary_block,
        )

        g = self.param("norm_scale", nn.initializers.ones,
                       (x.shape[-1],), jnp.float32)
        bias = self.param("norm_bias", nn.initializers.zeros,
                          (x.shape[-1],), jnp.float32)
        conv = nn.Conv(self.dim_out, kernel_size=(3, 3, 3), padding="VALID",
                       dtype=self.dtype, name="Conv_0")
        conv(jnp.zeros((1, 3, 3, 3, x.shape[-1]), x.dtype))
        kernel = conv.variables["params"]["kernel"]
        conv_bias = conv.variables["params"]["bias"]

        compute_dtype = self.dtype or x.dtype
        out = fused_boundary_block(
            x, g, bias, scale_shift, kernel,
            self.groups, self.factor, compute_dtype,
        )
        return out + conv_bias.astype(out.dtype)


def _expand_subvol(t: jnp.ndarray, spatial: int) -> jnp.ndarray:
    """(B, f, f, f, C) -> (B, f*s, f*s, f*s, C) by broadcasting each
    sub-volume's value over its s^3 region of the merged volume."""
    b, f, _, _, c = t.shape
    s = spatial // f
    t = t[:, :, None, :, None, :, None, :]
    t = jnp.broadcast_to(t, (b, f, s, f, s, f, s, c))
    return t.reshape(b, spatial, spatial, spatial, c)


class ResnetBlock(nn.Module):
    """Two Blocks + time scale-shift on the second + SE + residual
    (reference imagen_pytorch3D.py:568-614). Note the reference applies the
    time embedding to ``block2`` only, and ``block1`` is called *without*
    scale-shift — reproduced here.

    In ``boundary`` (merged-layout) mode the input is the merged volume and
    the per-sub-volume time embedding (B_sub, C) is broadcast over each
    sub-volume's region."""

    dim_out: int
    time_cond_dim: Optional[int] = None
    groups: int = 8
    use_se: bool = False
    boundary: bool = False
    factor: int = 3
    merged: bool = False
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_emb=None) -> jnp.ndarray:
        scale_shift = None
        if self.time_cond_dim is not None and time_emb is not None:
            t = mish(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype)(t)
            t = t[:, None, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = Block(
            self.dim_out, groups=self.groups, boundary=self.boundary,
            factor=self.factor, merged=self.merged,
            use_pallas=self.use_pallas, dtype=self.dtype,
        )(x)
        h = Block(
            self.dim_out, groups=self.groups, boundary=self.boundary,
            factor=self.factor, merged=self.merged,
            use_pallas=self.use_pallas, dtype=self.dtype,
        )(h, scale_shift=scale_shift)

        if self.use_se:
            h = SE3D(reduction=16,
                     factor=self.factor if self.merged else 1,
                     dtype=self.dtype)(h)

        if x.shape[-1] != self.dim_out:
            x = checkpoint_name(
                nn.Conv(self.dim_out, kernel_size=(1, 1, 1),
                        dtype=self.dtype)(x),
                "conv_out",
            )
        return h + x


def _icnr_init(scale: int = 2, base_init=None):
    """ICNR initializer for the pre-pixel-shuffle 1x1 conv: every r^3
    sub-position of an output channel starts identical, killing checkerboard
    artifacts (capability of reference ``PixelShuffleUpsample.init_conv_``,
    imagen_pytorch3D.py:477-484; here with the full r^3 repeat)."""
    base_init = base_init or nn.initializers.kaiming_uniform()
    r3 = scale ** 3

    def init(key, shape, dtype=jnp.float32):
        # shape = (1, 1, 1, in, out) with out = c_out * r^3
        out = shape[-1]
        base_shape = shape[:-1] + (out // r3,)
        base = base_init(key, base_shape, dtype)
        return jnp.repeat(base, r3, axis=-1)

    return init


class PixelShuffleUpsample(nn.Module):
    """1x1 conv (ICNR) → Mish → pixel-shuffle x2 (reference
    imagen_pytorch3D.py:459-487)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.dim_out * 8,
            kernel_size=(1, 1, 1),
            kernel_init=_icnr_init(scale=2),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        x = mish(x)
        return pixel_shuffle_3d(x, scale=2)


class DeconvUpsample(nn.Module):
    """Transposed-conv 2x upsample + Mish (reference ``Deconv3D``,
    imagen_pytorch3D.py:441-457).

    torch semantics ConvTranspose3d(k=3, s=2, p=1, output_padding=1)
    expressed as the exactly-equivalent dilated correlation:
    lhs_dilation=2, padding (k-1-p, k-1-p+op) = (1, 2) per axis. (flax's
    ``nn.ConvTranspose`` with SAME padding picks a different output
    alignment and does not flip kernels, so it cannot load reference
    weights bit-faithfully — verified empirically.)"""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2,
                                         out_axis=-1),
            (3, 3, 3, c_in, self.dim_out), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim_out,),
                          jnp.float32)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1, 1, 1), padding=[(1, 2)] * 3,
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        y = y + bias.astype(dtype)
        return mish(y)


class Downsample(nn.Module):
    """Pixel-unshuffle + 1x1 conv, the 'SP-conv' downsample (reference
    imagen_pytorch3D.py:489-496)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = pixel_unshuffle_3d(x, scale=2)
        return nn.Conv(self.dim_out, kernel_size=(1, 1, 1), dtype=self.dtype)(x)


class StridedDownsample(nn.Module):
    """Strided 3x3x3 conv downsample (reference ``Downsample2``,
    imagen_pytorch3D.py:498-504)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.dim_out, kernel_size=(3, 3, 3), strides=(2, 2, 2),
            padding="SAME", dtype=self.dtype,
        )(x)


class CrossEmbedLayer(nn.Module):
    """Multi-kernel conv stem; channel split halves per extra scale
    (reference imagen_pytorch3D.py:661-686)."""

    dim_out: int
    kernel_sizes: Tuple[int, ...] = (3, 7, 15)
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)
        dim_scales = [int(self.dim_out / (2 ** i)) for i in range(1, num_scales)]
        dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]
        fmaps = []
        for kernel, dim_scale in zip(kernel_sizes, dim_scales):
            pad = (kernel - self.stride) // 2
            fmaps.append(
                nn.Conv(
                    dim_scale,
                    kernel_size=(kernel,) * 3,
                    strides=(self.stride,) * 3,
                    padding=[(pad, pad)] * 3,
                    dtype=self.dtype,
                )(x)
            )
        return jnp.concatenate(fmaps, axis=-1)


class TrilinearUpsample(nn.Module):
    """Trilinear 2x upsample + 3x3x3 conv (reference ``Upsample``,
    imagen_pytorch3D.py:408-414)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from diffusioniqt_tpu.ops.volume import upsample_trilinear

        x = upsample_trilinear(x, scale=2, align_corners=False)
        return nn.Conv(self.dim_out, kernel_size=(3, 3, 3), padding="SAME",
                       dtype=self.dtype)(x)


class UpsampleCombiner(nn.Module):
    """Combine feature maps from all upsample stages before the final block
    (reference imagen_pytorch3D.py:688-720; disabled in its configs)."""

    dim: int
    enabled: bool = False
    dim_outs: Tuple[int, ...] = ()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, fmaps=None) -> jnp.ndarray:
        from diffusioniqt_tpu.ops.volume import resize_volume

        fmaps = fmaps or ()
        if not self.enabled or len(fmaps) == 0:
            return x
        target = x.shape[1]
        outs = []
        for fmap, dim_out in zip(fmaps, self.dim_outs):
            fmap = resize_volume(fmap, target)
            outs.append(Block(dim_out, dtype=self.dtype)(fmap))
        return jnp.concatenate([x, *outs], axis=-1)


class GlobalContext(nn.Module):
    """Attention-style squeeze-excitation (reference imagen_pytorch3D.py:634-659;
    unused alternative kept for capability parity)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        context = nn.Conv(1, kernel_size=(1, 1, 1), dtype=self.dtype)(x)
        xf = x.reshape(b, -1, x.shape[-1])  # (b, n, c)
        cf = jax.nn.softmax(context.reshape(b, -1), axis=-1)  # (b, n)
        pooled = jnp.einsum("bn,bnc->bc", cf, xf)[:, None, None, None, :]
        hidden = max(3, self.dim_out // 2)
        out = nn.Conv(hidden, kernel_size=(1, 1, 1), dtype=self.dtype)(pooled)
        out = mish(out)
        out = nn.Conv(self.dim_out, kernel_size=(1, 1, 1), dtype=self.dtype)(out)
        return jax.nn.sigmoid(out)
