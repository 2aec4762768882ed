"""Video / temporal U-Net (the ``imagen_video.Unet3D`` capability).

TPU-first re-design of ``/root/reference/imagen_video.py``:

  * ``PseudoConv3d``   — factorized spatial-2D + *causal* temporal-1D conv
    (make-a-video axial conv, reference :352-406). Both factors are expressed
    as 3D convs on the (B, F, H, W, C) layout — kernel (1,k,k) then (k,1,1)
    with left-only padding — so XLA maps them straight onto the MXU with no
    layout shuffles. The temporal factor initialises to identity (the
    reference's dirac intent, :370-371; here exact identity under causal
    padding).
  * ``VideoAttention``  — attention with null key/value, optional text
    context, causal masking, and T5-style continuous relative position bias
    (``DynamicPositionBias``, reference :410-525, :1119-1160).
  * temporal PEG conv, temporal attention wrapper (reference :1349-1354)
  * ``TemporalDownsample`` / ``TemporalPixelShuffleUpsample`` (:604-643)
  * ``PerceiverResampler`` text-token pooling (:228-347)
  * the full ``Unet3DVideo`` with text conditioning, lowres noise-level
    conditioning, ``ignore_time`` image mode, and per-resblock skip
    connections (:1162-1822).

Layout: channels-last video ``(B, F, H, W, C)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusioniqt_tpu.models.blocks import ChanLayerNorm, LearnedSinusoidalPosEmb
from diffusioniqt_tpu.utils.misc import cast_tuple, default, exists

Dtype = Any

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


class TokenLayerNorm(nn.Module):
    """Scale-only LayerNorm over the last axis (reference video ``LayerNorm``,
    imagen_video.py:172-185)."""

    stable: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        if self.stable:
            x32 = x32 / jax.lax.stop_gradient(
                jnp.max(x32, axis=-1, keepdims=True)
            )
        var = jnp.var(x32, axis=-1, keepdims=True)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * g
        return out.astype(self.dtype or x.dtype)


def _identity_temporal_init(kernel_size: int):
    """Init a causal temporal conv kernel (k,1,1,in,out) to the identity:
    with left-pad k-1, kernel tap k-1 reads x[t], so a diagonal there makes
    the conv a no-op at init (the reference's dirac intent, :370-371)."""

    def init(key, shape, dtype=jnp.float32):
        k, _, _, cin, cout = shape
        w = jnp.zeros(shape, dtype)
        eye = jnp.eye(cin, cout, dtype=dtype)
        return w.at[k - 1, 0, 0].set(eye)

    return init


class PseudoConv3d(nn.Module):
    """Spatial 2D conv + causal temporal 1D conv (reference ``Conv3d``,
    imagen_video.py:352-406)."""

    dim_out: int
    kernel_size: int = 3
    temporal_kernel_size: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, ignore_time: bool = False):
        k = self.kernel_size
        tk = self.temporal_kernel_size or k
        p = k // 2
        x = nn.Conv(
            self.dim_out, kernel_size=(1, k, k),
            padding=[(0, 0), (p, p), (p, p)], dtype=self.dtype,
            name="spatial",
        )(x)
        if ignore_time or k <= 1:
            return x
        x = nn.Conv(
            self.dim_out, kernel_size=(tk, 1, 1),
            padding=[(tk - 1, 0), (0, 0), (0, 0)],
            kernel_init=_identity_temporal_init(tk),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="temporal",
        )(x)
        return x


def spatial_conv2d(dim_out, kernel: int, padding: int = 0, dtype=None,
                   name=None, init_zero=False):
    """Frame-wise 2D conv expressed as a (1,k,k) 3D conv (reference
    ``Conv2d``, imagen_video.py:529-543)."""
    kw = {}
    if init_zero:
        kw = dict(kernel_init=nn.initializers.zeros,
                  bias_init=nn.initializers.zeros)
    return nn.Conv(
        dim_out, kernel_size=(1, kernel, kernel),
        padding=[(0, 0), (padding, padding), (padding, padding)],
        dtype=dtype, name=name, **kw,
    )


class DynamicPositionBias(nn.Module):
    """Continuous relative position bias MLP (reference
    imagen_video.py:1119-1160)."""

    dim: int
    heads: int
    depth: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, n: int):
        pos = jnp.arange(-n + 1, n, dtype=jnp.float32)[:, None]  # (2n-1, 1)
        h = nn.Dense(self.dim, dtype=self.dtype)(pos)
        h = TokenLayerNorm(dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        for _ in range(max(self.depth - 1, 0)):
            h = nn.Dense(self.dim, dtype=self.dtype)(h)
            h = TokenLayerNorm(dtype=self.dtype)(h)
            h = jax.nn.silu(h)
        h = nn.Dense(self.heads, dtype=self.dtype)(h)  # (2n-1, heads)

        i = jnp.arange(n)[:, None]
        j = jnp.arange(n)[None, :]
        indices = i - j + (n - 1)
        bias = h[indices]                       # (n, n, heads)
        return jnp.transpose(bias, (2, 0, 1))   # (heads, n, n)


def _l2norm(t):
    return t / jnp.clip(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)


class VideoAttention(nn.Module):
    """Token attention with null kv, optional context, causal + relative
    position bias (reference ``Attention``, imagen_video.py:410-525)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    context_dim: Optional[int] = None
    cosine_sim_attn: bool = False
    rel_pos_bias: bool = False
    rel_pos_bias_mlp_depth: int = 2
    init_zero: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None, attn_bias=None):
        b, n, _ = x.shape
        h = self.heads
        inner = self.dim_head * h
        scale = self.dim_head ** -0.5 if not self.cosine_sim_attn else 1.0
        sim_scale = 16.0 if self.cosine_sim_attn else 1.0

        x = TokenLayerNorm(dtype=self.dtype)(x)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype)(x)
        kv = nn.Dense(self.dim_head * 2, use_bias=False, dtype=self.dtype)(x)
        k, v = jnp.split(kv, 2, axis=-1)  # single-head kv (b, n, d)

        q = q.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)  # (b,h,n,d)
        q = q * scale

        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head), jnp.float32)
        nk = jnp.broadcast_to(null_kv[0][None, None], (b, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1][None, None], (b, 1, self.dim_head))
        k = jnp.concatenate([nk.astype(k.dtype), k], axis=-2)
        v = jnp.concatenate([nv.astype(v.dtype), v], axis=-2)

        if context is not None:
            assert self.context_dim is not None
            ctx = nn.LayerNorm(dtype=self.dtype)(context)
            ckv = nn.Dense(self.dim_head * 2, dtype=self.dtype)(ctx)
            ck, cv = jnp.split(ckv, 2, axis=-1)
            k = jnp.concatenate([ck, k], axis=-2)
            v = jnp.concatenate([cv, v], axis=-2)

        if self.cosine_sim_attn:
            q = _l2norm(q)
            k = _l2norm(k)

        sim = jnp.einsum("bhid,bjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * sim_scale

        if attn_bias is None and self.rel_pos_bias:
            attn_bias = DynamicPositionBias(
                dim=self.dim, heads=h, depth=self.rel_pos_bias_mlp_depth,
                dtype=self.dtype,
            )(n)
        if attn_bias is not None:
            null_bias = self.param("null_attn_bias",
                                   nn.initializers.normal(1.0), (h,),
                                   jnp.float32)
            num_prefix = sim.shape[-1] - n
            null_col = jnp.broadcast_to(
                null_bias[:, None, None], (h, n, num_prefix)
            )
            attn_bias = jnp.concatenate([null_col, attn_bias], axis=-1)
            sim = sim + attn_bias[None].astype(sim.dtype)

        if self.causal:
            i, j = sim.shape[-2:]
            causal_mask = jnp.triu(jnp.ones((i, j), bool), k=j - i + 1)
            sim = jnp.where(causal_mask, _NEG_INF, sim)

        if mask is not None:
            num_prefix = sim.shape[-1] - mask.shape[-1]
            mask = jnp.pad(mask, ((0, 0), (num_prefix, 0)),
                           constant_values=True)
            sim = jnp.where(mask[:, None, None, :], sim, _NEG_INF)

        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(out)
        if self.init_zero:
            out = TokenLayerNorm(dtype=self.dtype, name="out_norm_zero")(out)
            g0 = self.param("out_gate_zero", nn.initializers.zeros, (1,),
                            jnp.float32)
            out = out * g0
        else:
            out = TokenLayerNorm(dtype=self.dtype)(out)
        return out


class TemporalAttention(nn.Module):
    """Residual causal attention over frames, per spatial location (reference
    temporal_attn lambda, imagen_video.py:1354)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = True
    cosine_sim_attn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, f, hh, ww, c = x.shape
        tokens = x.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f, c)
        out = VideoAttention(
            dim=self.dim, dim_head=self.dim_head, heads=self.heads,
            causal=self.causal, cosine_sim_attn=self.cosine_sim_attn,
            rel_pos_bias=True, init_zero=True, dtype=self.dtype,
        )(tokens)
        out = out.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)
        return out + x


class TemporalPEG(nn.Module):
    """Residual causal depthwise temporal conv (positional encoding
    generator; reference imagen_video.py:1351-1352)."""

    dim: int
    causal: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = (2, 0) if self.causal else (1, 1)
        out = nn.Conv(
            self.dim, kernel_size=(3, 1, 1),
            padding=[pad, (0, 0), (0, 0)],
            feature_group_count=self.dim, dtype=self.dtype,
        )(x)
        return out + x


class SpatialDownsample(nn.Module):
    """Pixel-unshuffle SP-conv on (H, W) only (reference ``Downsample``,
    imagen_video.py:595-602)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, f, hh, ww, c = x.shape
        x = x.reshape(b, f, hh // 2, 2, ww // 2, 2, c)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5).reshape(
            b, f, hh // 2, ww // 2, c * 4
        )
        return nn.Conv(self.dim_out, kernel_size=(1, 1, 1), dtype=self.dtype)(x)


class SpatialPixelShuffleUpsample(nn.Module):
    """1x1 conv (ICNR) + spatial pixel shuffle x2 (reference
    imagen_video.py:564-593)."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        def icnr(key, shape, dtype=jnp.float32):
            base = nn.initializers.kaiming_uniform()(
                key, shape[:-1] + (shape[-1] // 4,), dtype
            )
            return jnp.repeat(base, 4, axis=-1)

        b, f, hh, ww, c = x.shape
        x = nn.Conv(self.dim_out * 4, kernel_size=(1, 1, 1),
                    kernel_init=icnr, bias_init=nn.initializers.zeros,
                    dtype=self.dtype)(x)
        x = jax.nn.silu(x)
        x = x.reshape(b, f, hh, ww, self.dim_out, 2, 2)
        x = x.transpose(0, 1, 2, 5, 3, 6, 4)
        return x.reshape(b, f, hh * 2, ww * 2, self.dim_out)


class TemporalDownsample(nn.Module):
    """Frame pixel-unshuffle + 1x1 conv (reference imagen_video.py:636-643)."""

    dim_out: int
    stride: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, f, hh, ww, c = x.shape
        s = self.stride
        x = x.reshape(b, f // s, s, hh, ww, c)
        x = x.transpose(0, 1, 3, 4, 5, 2).reshape(b, f // s, hh, ww, c * s)
        return nn.Conv(self.dim_out, kernel_size=(1, 1, 1), dtype=self.dtype)(x)


class TemporalPixelShuffleUpsample(nn.Module):
    """1x1 temporal conv (ICNR) + frame shuffle (reference
    imagen_video.py:604-634)."""

    dim_out: int
    stride: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = self.stride

        def icnr(key, shape, dtype=jnp.float32):
            base = nn.initializers.kaiming_uniform()(
                key, shape[:-1] + (shape[-1] // s,), dtype
            )
            return jnp.repeat(base, s, axis=-1)

        b, f, hh, ww, c = x.shape
        x = nn.Conv(self.dim_out * s, kernel_size=(1, 1, 1),
                    kernel_init=icnr, bias_init=nn.initializers.zeros,
                    dtype=self.dtype)(x)
        x = jax.nn.silu(x)
        x = x.reshape(b, f, hh, ww, self.dim_out, s)
        x = x.transpose(0, 1, 5, 2, 3, 4).reshape(b, f * s, hh, ww, self.dim_out)
        return x


class VideoBlock(nn.Module):
    """GroupNorm -> (scale-shift) -> SiLU -> PseudoConv3d (reference video
    ``Block``, imagen_video.py:671-698)."""

    dim_out: int
    groups: int = 8
    norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None, ignore_time: bool = False):
        if self.norm:
            x = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = jax.nn.silu(x)
        return PseudoConv3d(self.dim_out, 3, dtype=self.dtype)(
            x, ignore_time=ignore_time
        )


class VideoCrossAttention(nn.Module):
    """Cross attention to conditioning tokens with null kv (reference
    ``CrossAttention``, imagen_video.py:772-848); ``linear=True`` switches to
    the linear-attention variant (:848-886)."""

    dim: int
    context_dim: int
    dim_head: int = 64
    heads: int = 8
    linear: bool = False
    cosine_sim_attn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context):
        b, n, _ = x.shape
        h = self.heads
        inner = self.dim_head * h

        x = TokenLayerNorm(dtype=self.dtype)(x)
        context = TokenLayerNorm(dtype=self.dtype)(context)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype)(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype)(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(b, -1, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                             (2, self.dim_head), jnp.float32)
        nk = jnp.broadcast_to(null_kv[0][None, None, None],
                              (b, h, 1, self.dim_head)).astype(k.dtype)
        nv = jnp.broadcast_to(null_kv[1][None, None, None],
                              (b, h, 1, self.dim_head)).astype(v.dtype)
        k = jnp.concatenate([nk, k], axis=-2)
        v = jnp.concatenate([nv, v], axis=-2)

        if self.linear:
            q = jax.nn.softmax(q * self.dim_head ** -0.5, axis=-1)
            k = jax.nn.softmax(k, axis=-2)
            ctx_mat = jnp.einsum("bhnd,bhne->bhde", k, v)
            out = jnp.einsum("bhnd,bhde->bhne", q, ctx_mat)
        else:
            scale = self.dim_head ** -0.5 if not self.cosine_sim_attn else 1.0
            sim_scale = 16.0 if self.cosine_sim_attn else 1.0
            q = q * scale
            if self.cosine_sim_attn:
                q, k = _l2norm(q), _l2norm(k)
            sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                             preferred_element_type=jnp.float32) * sim_scale
            attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(out)
        return TokenLayerNorm(dtype=self.dtype)(out)


class VideoResnetBlock(nn.Module):
    """Video resnet block with optional token cross attention and global
    context gate (reference imagen_video.py:699-772)."""

    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    groups: int = 8
    linear_attn: bool = False
    use_gca: bool = False
    attn_dim_head: int = 64
    attn_heads: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None, cond=None, ignore_time: bool = False):
        scale_shift = None
        if self.time_cond_dim is not None and time_emb is not None:
            t = jax.nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype)(t)
            t = t[:, None, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)

        h = VideoBlock(self.dim_out, groups=self.groups, dtype=self.dtype)(
            x, ignore_time=ignore_time
        )

        if self.cond_dim is not None:
            assert cond is not None
            b, f, hh, ww, c = h.shape
            tokens = h.reshape(b, f * hh * ww, c)
            tokens = VideoCrossAttention(
                dim=self.dim_out, context_dim=self.cond_dim,
                dim_head=self.attn_dim_head, heads=self.attn_heads,
                linear=self.linear_attn, dtype=self.dtype,
            )(tokens, cond) + tokens
            h = tokens.reshape(b, f, hh, ww, c)

        h = VideoBlock(self.dim_out, groups=self.groups, dtype=self.dtype)(
            h, scale_shift=scale_shift, ignore_time=ignore_time
        )

        if self.use_gca:
            from diffusioniqt_tpu.models.blocks import GlobalContext

            h = h * GlobalContext(self.dim_out, dtype=self.dtype)(h)

        if x.shape[-1] != self.dim_out:
            x = spatial_conv2d(self.dim_out, 1, dtype=self.dtype)(x)
        return h + x


class VideoTransformerBlock(nn.Module):
    """Spatial-token attention + channel FF (reference ``TransformerBlock``,
    imagen_video.py:1004-1056); ``linear=True`` uses linear attention."""

    dim: int
    depth: int = 1
    heads: int = 8
    dim_head: int = 64
    ff_mult: float = 2.0
    context_dim: Optional[int] = None
    linear: bool = False
    cosine_sim_attn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        b, f, hh, ww, c = x.shape
        for _ in range(self.depth):
            tokens = x.reshape(b, f * hh * ww, c)
            if self.linear:
                attn_out = VideoCrossAttention(
                    dim=self.dim, context_dim=self.dim,
                    dim_head=self.dim_head, heads=self.heads, linear=True,
                    dtype=self.dtype,
                )(tokens, tokens)
            else:
                attn_out = VideoAttention(
                    dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                    context_dim=self.context_dim,
                    cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
                )(tokens, context=context)
            tokens = attn_out + tokens
            x = tokens.reshape(b, f, hh, ww, c)
            # channel feed-forward (1x1 convs)
            y = ChanLayerNorm(dtype=self.dtype)(x)
            y = nn.Dense(int(self.dim * self.ff_mult), use_bias=False,
                         dtype=self.dtype)(y)
            y = jax.nn.gelu(y)
            y = ChanLayerNorm(dtype=self.dtype)(y)
            y = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(y)
            x = y + x
        return x


class PerceiverResampler(nn.Module):
    """Latent attention pooling of text tokens (reference
    imagen_video.py:295-347)."""

    dim: int
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 32
    num_latents_mean_pooled: int = 4
    max_seq_len: int = 512
    ff_mult: float = 4.0
    cosine_sim_attn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, _ = x.shape
        pos_emb = self.param("pos_emb", nn.initializers.normal(1.0),
                             (self.max_seq_len, self.dim), jnp.float32)
        x_pos = x + pos_emb[:n].astype(x.dtype)

        latents = self.param("latents", nn.initializers.normal(1.0),
                             (self.num_latents, self.dim), jnp.float32)
        latents = jnp.broadcast_to(latents[None], (b,) + latents.shape).astype(x.dtype)

        if self.num_latents_mean_pooled > 0:
            pooled = jnp.mean(x, axis=1)
            pooled = TokenLayerNorm(dtype=self.dtype)(pooled)
            pooled = nn.Dense(self.dim * self.num_latents_mean_pooled,
                              dtype=self.dtype)(pooled)
            pooled = pooled.reshape(b, self.num_latents_mean_pooled, self.dim)
            latents = jnp.concatenate([pooled, latents], axis=-2)

        for _ in range(self.depth):
            latents = PerceiverAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
            )(x_pos, latents, mask=mask) + latents
            y = TokenLayerNorm(dtype=self.dtype)(latents)
            y = nn.Dense(int(self.dim * self.ff_mult), use_bias=False,
                         dtype=self.dtype)(y)
            y = jax.nn.gelu(y)
            y = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(y)
            latents = y + latents
        return latents


class PerceiverAttention(nn.Module):
    """(reference imagen_video.py:228-293)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    cosine_sim_attn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, latents, mask=None):
        b = x.shape[0]
        h = self.heads
        inner = self.dim_head * h
        scale = self.dim_head ** -0.5 if not self.cosine_sim_attn else 1.0
        sim_scale = 16.0 if self.cosine_sim_attn else 1.0

        x = nn.LayerNorm(dtype=self.dtype)(x)
        latents = nn.LayerNorm(dtype=self.dtype)(latents)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype)(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype)(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(b, -1, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        q = q * scale
        if self.cosine_sim_attn:
            q, k = _l2norm(q), _l2norm(k)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * sim_scale
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, latents.shape[-2])),
                           constant_values=True)
            sim = jnp.where(mask[:, None, None, :], sim, _NEG_INF)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, latents.shape[1], inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(out)
        return nn.LayerNorm(dtype=self.dtype)(out)


def _prob_mask_like(key, shape, prob):
    if prob == 1:
        return jnp.ones(shape, bool)
    if prob == 0:
        return jnp.zeros(shape, bool)
    return jax.random.uniform(key, shape) < prob


class Unet3DVideo(nn.Module):
    """The video U-Net (reference ``Unet3D``, imagen_video.py:1162-1822)."""

    dim: int
    text_embed_dim: int = 768
    num_resnet_blocks: Union[int, Tuple[int, ...]] = 1
    cond_dim: Optional[int] = None
    num_time_tokens: int = 2
    learned_sinu_pos_emb_dim: int = 16
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    temporal_strides: Union[int, Tuple[int, ...]] = 1
    cond_images_channels: int = 0
    channels: int = 3
    channels_out: Optional[int] = None
    attn_dim_head: int = 64
    attn_heads: int = 8
    ff_mult: float = 2.0
    lowres_cond: bool = False
    layer_attns: Union[bool, Tuple[bool, ...]] = False
    layer_attns_depth: Union[int, Tuple[int, ...]] = 1
    attend_at_middle: bool = True
    time_rel_pos_bias_depth: int = 2
    time_causal_attn: bool = True
    layer_cross_attns: Union[bool, Tuple[bool, ...]] = True
    use_linear_attn: bool = False
    use_linear_cross_attn: bool = False
    cond_on_text: bool = True
    max_text_len: int = 256
    init_dim: Optional[int] = None
    resnet_groups: Union[int, Tuple[int, ...]] = 8
    init_conv_kernel_size: int = 7
    init_cross_embed: bool = True
    init_cross_embed_kernel_sizes: Tuple[int, ...] = (3, 7, 15)
    attn_pool_text: bool = True
    attn_pool_num_latents: int = 32
    memory_efficient: bool = False
    init_conv_to_final_conv_residual: bool = False
    use_global_context_attn: bool = True
    scale_skip_connection: bool = True
    final_resnet_block: bool = True
    final_conv_kernel_size: int = 3
    cosine_sim_attn: bool = False
    self_cond: bool = False
    pixel_shuffle_upsample: bool = True
    dtype: Optional[Dtype] = None

    def cast_model_parameters(self, *, lowres_cond, channels, channels_out,
                              text_embed_dim=None, cond_on_text=None,
                              **_ignored):
        changes = dict(lowres_cond=lowres_cond, channels=channels,
                       channels_out=channels_out)
        if text_embed_dim is not None:
            changes["text_embed_dim"] = text_embed_dim
        if cond_on_text is not None:
            changes["cond_on_text"] = cond_on_text
        current = {k: getattr(self, k) for k in changes}
        if current == changes:
            return self
        return dataclasses.replace(self, **changes)

    @property
    def total_temporal_divisor(self) -> int:
        strides = cast_tuple(self.temporal_strides, len(self.dim_mults))
        out = 1
        for s in strides:
            out *= s
        return out

    @nn.compact
    def __call__(
        self,
        x,                     # (B, F, H, W, C)
        time_steps,            # unused; API parity with UNet3D
        time,                  # (B,) log-SNR conditioning
        *,
        lowres_cond_img=None,
        lowres_noise_times=None,
        text_embeds=None,
        text_mask=None,
        cond_images=None,
        self_cond=None,
        cond_drop_prob: float = 0.0,
        ignore_time: bool = False,
        deterministic: bool = True,
    ):
        del time_steps
        assert x.ndim == 5, "video input must be (B, F, H, W, C)"
        b, frames = x.shape[0], x.shape[1]
        assert ignore_time or frames % self.total_temporal_divisor == 0

        num_layers = len(self.dim_mults)
        num_blocks = cast_tuple(self.num_resnet_blocks, num_layers)
        groups = cast_tuple(self.resnet_groups, num_layers)
        layer_attns = cast_tuple(self.layer_attns, num_layers)
        layer_attns_depth = cast_tuple(self.layer_attns_depth, num_layers)
        layer_cross = cast_tuple(self.layer_cross_attns, num_layers)
        temporal_strides = cast_tuple(self.temporal_strides, num_layers)

        init_dim = self.init_dim or self.dim
        channels_out = self.channels_out or self.channels
        cond_dim = self.cond_dim or self.dim
        time_cond_dim = self.dim * 4 * (2 if self.lowres_cond else 1)

        # --- conditioning concat ------------------------------------------
        if self.self_cond:
            sc = self_cond if self_cond is not None else jnp.zeros_like(x)
            x = jnp.concatenate([x, sc], axis=-1)
        assert not (self.lowres_cond and lowres_cond_img is None)
        assert not (self.lowres_cond and lowres_noise_times is None)
        if lowres_cond_img is not None:
            x = jnp.concatenate([x, lowres_cond_img], axis=-1)
        if self.cond_images_channels > 0:
            assert cond_images is not None
            if cond_images.shape[2] != x.shape[2]:
                cond_images = jax.image.resize(
                    cond_images,
                    cond_images.shape[:2] + x.shape[2:4] + cond_images.shape[-1:],
                    "trilinear",
                )
            x = jnp.concatenate([cond_images, x], axis=-1)

        # --- init conv -----------------------------------------------------
        if self.init_cross_embed:
            kernel_sizes = sorted(self.init_cross_embed_kernel_sizes)
            dim_scales = [int(init_dim / (2 ** i))
                          for i in range(1, len(kernel_sizes))]
            dim_scales = [*dim_scales, init_dim - sum(dim_scales)]
            fmaps = [
                spatial_conv2d(ds, k, padding=k // 2, dtype=self.dtype)(x)
                for k, ds in zip(kernel_sizes, dim_scales)
            ]
            x = jnp.concatenate(fmaps, axis=-1)
        else:
            k = self.init_conv_kernel_size
            x = spatial_conv2d(init_dim, k, padding=k // 2,
                               dtype=self.dtype)(x)

        if not ignore_time:
            x = TemporalPEG(init_dim, causal=self.time_causal_attn,
                            dtype=self.dtype)(x)
            x = TemporalAttention(
                dim=init_dim, dim_head=self.attn_dim_head,
                heads=self.attn_heads, causal=self.time_causal_attn,
                cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
            )(x)

        init_conv_residual = x if self.init_conv_to_final_conv_residual else None

        # --- time conditioning --------------------------------------------
        th = LearnedSinusoidalPosEmb(self.learned_sinu_pos_emb_dim)(time)
        th = nn.Dense(time_cond_dim, dtype=self.dtype)(th)
        time_hiddens = jax.nn.silu(th)
        time_tokens = nn.Dense(cond_dim * self.num_time_tokens,
                               dtype=self.dtype)(time_hiddens)
        time_tokens = time_tokens.reshape(b, self.num_time_tokens, cond_dim)
        t = nn.Dense(time_cond_dim, dtype=self.dtype)(time_hiddens)

        if self.lowres_cond:
            lh = LearnedSinusoidalPosEmb(self.learned_sinu_pos_emb_dim)(
                lowres_noise_times
            )
            lh = nn.Dense(time_cond_dim, dtype=self.dtype)(lh)
            lh = jax.nn.silu(lh)
            lowres_tokens = nn.Dense(cond_dim * self.num_time_tokens,
                                     dtype=self.dtype)(lh)
            lowres_tokens = lowres_tokens.reshape(
                b, self.num_time_tokens, cond_dim
            )
            lowres_t = nn.Dense(time_cond_dim, dtype=self.dtype)(lh)
            t = t + lowres_t
            time_tokens = jnp.concatenate([time_tokens, lowres_tokens],
                                          axis=-2)

        # --- text conditioning (reference :1670-1728) ----------------------
        text_tokens = None
        if text_embeds is not None and self.cond_on_text:
            if cond_drop_prob in (0.0, 1.0):
                keep = _prob_mask_like(None, (b,), 1 - cond_drop_prob)
            else:
                keep = _prob_mask_like(
                    self.make_rng("cond_drop"), (b,), 1 - cond_drop_prob
                )
            keep_embed = keep[:, None, None]
            keep_hidden = keep[:, None]

            text_tokens = nn.Dense(cond_dim, dtype=self.dtype)(text_embeds)
            text_tokens = text_tokens[:, :self.max_text_len]
            if text_mask is not None:
                text_mask = text_mask[:, :self.max_text_len]
            remainder = self.max_text_len - text_tokens.shape[1]
            if remainder > 0:
                text_tokens = jnp.pad(
                    text_tokens, ((0, 0), (0, remainder), (0, 0))
                )
            if text_mask is not None:
                if remainder > 0:
                    text_mask = jnp.pad(text_mask, ((0, 0), (0, remainder)))
                keep_embed = text_mask[..., None] & keep_embed

            null_text_embed = self.param(
                "null_text_embed", nn.initializers.normal(1.0),
                (1, self.max_text_len, cond_dim), jnp.float32,
            )
            text_tokens = jnp.where(
                keep_embed, text_tokens, null_text_embed.astype(text_tokens.dtype)
            )

            if self.attn_pool_text:
                text_tokens = PerceiverResampler(
                    dim=cond_dim, depth=2, dim_head=self.attn_dim_head,
                    heads=self.attn_heads,
                    num_latents=self.attn_pool_num_latents,
                    cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
                )(text_tokens)

            mean_pooled = jnp.mean(text_tokens, axis=-2)
            text_hiddens = nn.LayerNorm(dtype=self.dtype)(mean_pooled)
            text_hiddens = nn.Dense(time_cond_dim, dtype=self.dtype)(text_hiddens)
            text_hiddens = jax.nn.silu(text_hiddens)
            text_hiddens = nn.Dense(time_cond_dim, dtype=self.dtype)(text_hiddens)
            null_text_hidden = self.param(
                "null_text_hidden", nn.initializers.normal(1.0),
                (1, time_cond_dim), jnp.float32,
            )
            text_hiddens = jnp.where(
                keep_hidden, text_hiddens,
                null_text_hidden.astype(text_hiddens.dtype),
            )
            t = t + text_hiddens

        c = time_tokens if text_tokens is None else jnp.concatenate(
            [time_tokens, text_tokens], axis=-2
        )
        c = nn.LayerNorm(dtype=self.dtype)(c)

        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        mid_dim = dims[-1]
        skip_scale = (2 ** -0.5) if self.scale_skip_connection else 1.0

        if self.memory_efficient:
            x = VideoResnetBlock(
                init_dim, time_cond_dim=time_cond_dim, groups=groups[0],
                use_gca=self.use_global_context_attn,
                attn_dim_head=self.attn_dim_head, attn_heads=self.attn_heads,
                dtype=self.dtype, name="init_resnet_block",
            )(x, t, ignore_time=ignore_time)

        # --- down path -----------------------------------------------------
        hiddens = []
        for ind, (dim_in, dim_out_lvl) in enumerate(in_out):
            is_last = ind == num_layers - 1
            current_dim = dim_in
            layer_cond_dim = cond_dim if (
                layer_cross[ind]
                or (not layer_cross[ind] and self.use_linear_cross_attn)
            ) else None
            linear_cross = not layer_cross[ind] and self.use_linear_cross_attn

            if self.memory_efficient:
                x = SpatialDownsample(dim_out_lvl, dtype=self.dtype,
                                      name=f"down{ind}_pre")(x)
                current_dim = dim_out_lvl

            x = VideoResnetBlock(
                current_dim, cond_dim=layer_cond_dim,
                time_cond_dim=time_cond_dim, groups=groups[ind],
                linear_attn=linear_cross, attn_dim_head=self.attn_dim_head,
                attn_heads=self.attn_heads, dtype=self.dtype,
                name=f"down{ind}_init",
            )(x, t, cond=c, ignore_time=ignore_time)

            for bi in range(num_blocks[ind]):
                x = VideoResnetBlock(
                    current_dim, time_cond_dim=time_cond_dim,
                    groups=groups[ind], use_gca=self.use_global_context_attn,
                    attn_dim_head=self.attn_dim_head,
                    attn_heads=self.attn_heads, dtype=self.dtype,
                    name=f"down{ind}_block{bi}",
                )(x, t, ignore_time=ignore_time)
                hiddens.append(x)

            if layer_attns[ind]:
                x = VideoTransformerBlock(
                    dim=current_dim, depth=layer_attns_depth[ind],
                    heads=self.attn_heads, dim_head=self.attn_dim_head,
                    ff_mult=self.ff_mult, context_dim=cond_dim,
                    cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
                    name=f"down{ind}_attn",
                )(x, context=c)
            elif self.use_linear_attn:
                x = VideoTransformerBlock(
                    dim=current_dim, depth=layer_attns_depth[ind],
                    heads=self.attn_heads, dim_head=self.attn_dim_head,
                    ff_mult=self.ff_mult, linear=True, dtype=self.dtype,
                    name=f"down{ind}_attn",
                )(x)

            if not ignore_time:
                x = TemporalPEG(current_dim, causal=self.time_causal_attn,
                                dtype=self.dtype, name=f"down{ind}_peg")(x)
                x = TemporalAttention(
                    dim=current_dim, dim_head=self.attn_dim_head,
                    heads=self.attn_heads, causal=self.time_causal_attn,
                    cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
                    name=f"down{ind}_tattn",
                )(x)

            hiddens.append(x)

            if temporal_strides[ind] > 1 and not ignore_time:
                x = TemporalDownsample(
                    current_dim, stride=temporal_strides[ind],
                    dtype=self.dtype, name=f"down{ind}_tdown",
                )(x)

            if not self.memory_efficient:
                if not is_last:
                    x = SpatialDownsample(dim_out_lvl, dtype=self.dtype,
                                          name=f"down{ind}_post")(x)
                else:
                    a = spatial_conv2d(dim_out_lvl, 3, padding=1,
                                       dtype=self.dtype,
                                       name=f"down{ind}_post_a")(x)
                    bb = spatial_conv2d(dim_out_lvl, 1, dtype=self.dtype,
                                        name=f"down{ind}_post_b")(x)
                    x = a + bb

        # --- middle --------------------------------------------------------
        x = VideoResnetBlock(
            mid_dim, cond_dim=cond_dim, time_cond_dim=time_cond_dim,
            groups=groups[-1], attn_dim_head=self.attn_dim_head,
            attn_heads=self.attn_heads, dtype=self.dtype, name="mid_block1",
        )(x, t, cond=c, ignore_time=ignore_time)

        if self.attend_at_middle:
            bsz, f, hh, ww, cc = x.shape
            tokens = x.reshape(bsz, f * hh * ww, cc)
            tokens = VideoAttention(
                dim=mid_dim, dim_head=self.attn_dim_head,
                heads=self.attn_heads, cosine_sim_attn=self.cosine_sim_attn,
                dtype=self.dtype, name="mid_attn",
            )(tokens) + tokens
            x = tokens.reshape(bsz, f, hh, ww, cc)

        if not ignore_time:
            x = TemporalPEG(mid_dim, causal=self.time_causal_attn,
                            dtype=self.dtype, name="mid_peg")(x)
            x = TemporalAttention(
                dim=mid_dim, dim_head=self.attn_dim_head,
                heads=self.attn_heads, causal=self.time_causal_attn,
                cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
                name="mid_tattn",
            )(x)

        x = VideoResnetBlock(
            mid_dim, cond_dim=cond_dim, time_cond_dim=time_cond_dim,
            groups=groups[-1], attn_dim_head=self.attn_dim_head,
            attn_heads=self.attn_heads, dtype=self.dtype, name="mid_block2",
        )(x, t, cond=c, ignore_time=ignore_time)

        # --- up path -------------------------------------------------------
        upsample_cls = (
            SpatialPixelShuffleUpsample if self.pixel_shuffle_upsample else None
        )
        rev_in_out = list(reversed(in_out))
        rev_blocks = list(reversed(num_blocks))
        rev_groups = list(reversed(groups))
        rev_attns = list(reversed(layer_attns))
        rev_attn_depths = list(reversed(layer_attns_depth))
        rev_cross = list(reversed(layer_cross))
        rev_tstrides = list(reversed(temporal_strides))

        for ind, (dim_in_lvl, dim_out_lvl) in enumerate(rev_in_out):
            is_last = ind == num_layers - 1
            layer_cond_dim = cond_dim if (
                rev_cross[ind]
                or (not rev_cross[ind] and self.use_linear_cross_attn)
            ) else None
            linear_cross = not rev_cross[ind] and self.use_linear_cross_attn

            if rev_tstrides[ind] > 1 and not ignore_time:
                x = TemporalPixelShuffleUpsample(
                    dim_out_lvl, stride=rev_tstrides[ind], dtype=self.dtype,
                    name=f"up{ind}_tup",
                )(x)

            skip = hiddens.pop() * skip_scale
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = VideoResnetBlock(
                dim_out_lvl, cond_dim=layer_cond_dim,
                time_cond_dim=time_cond_dim, groups=rev_groups[ind],
                linear_attn=linear_cross, attn_dim_head=self.attn_dim_head,
                attn_heads=self.attn_heads, dtype=self.dtype,
                name=f"up{ind}_init",
            )(x, t, cond=c, ignore_time=ignore_time)

            for bi in range(rev_blocks[ind]):
                skip = hiddens.pop() * skip_scale
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
                x = VideoResnetBlock(
                    dim_out_lvl, time_cond_dim=time_cond_dim,
                    groups=rev_groups[ind],
                    use_gca=self.use_global_context_attn,
                    attn_dim_head=self.attn_dim_head,
                    attn_heads=self.attn_heads, dtype=self.dtype,
                    name=f"up{ind}_block{bi}",
                )(x, t, ignore_time=ignore_time)

            if rev_attns[ind]:
                x = VideoTransformerBlock(
                    dim=dim_out_lvl, depth=rev_attn_depths[ind],
                    heads=self.attn_heads, dim_head=self.attn_dim_head,
                    ff_mult=self.ff_mult, context_dim=cond_dim,
                    cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
                    name=f"up{ind}_attn",
                )(x, context=c)

            if not ignore_time:
                x = TemporalPEG(dim_out_lvl, causal=self.time_causal_attn,
                                dtype=self.dtype, name=f"up{ind}_peg")(x)
                x = TemporalAttention(
                    dim=dim_out_lvl, dim_head=self.attn_dim_head,
                    heads=self.attn_heads, causal=self.time_causal_attn,
                    cosine_sim_attn=self.cosine_sim_attn, dtype=self.dtype,
                    name=f"up{ind}_tattn",
                )(x)

            if not is_last or self.memory_efficient:
                x = SpatialPixelShuffleUpsample(
                    dim_in_lvl, dtype=self.dtype, name=f"up{ind}_upsample",
                )(x)

        # --- final ---------------------------------------------------------
        if init_conv_residual is not None:
            x = jnp.concatenate([x, init_conv_residual], axis=-1)

        if self.final_resnet_block:
            x = VideoResnetBlock(
                self.dim, time_cond_dim=time_cond_dim, groups=groups[0],
                use_gca=True, attn_dim_head=self.attn_dim_head,
                attn_heads=self.attn_heads, dtype=self.dtype,
                name="final_res_block",
            )(x, t, ignore_time=ignore_time)

        if lowres_cond_img is not None:
            x = jnp.concatenate([x, lowres_cond_img.astype(x.dtype)], axis=-1)

        k = self.final_conv_kernel_size
        return spatial_conv2d(
            channels_out, k, padding=k // 2, dtype=jnp.float32,
            name="final_conv", init_zero=True,
        )(x.astype(jnp.float32))
