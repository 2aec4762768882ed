"""Volumetric attention suite (Flax linen, channels-last).

Re-design of the reference's three selectable ``att_type`` paths
(``/root/reference/imagen_pytorch3D.py:723-1186``):

  * ``LinearAttention``        — O(N) softmax(q over d)·softmax(k over N)
                                 attention over voxel tokens (:926-1016)
  * ``SoftMaxAttention``       — full quadratic attention (:1018-1106);
                                 routed through a fused kernel on TPU
  * ``ViT3D``                  — patch-embed + transformer encoder +
                                 trilinear-upsample reconstruction (:871-910)
  plus the Patchify token reduction (:913-924), transformer block wrappers
  (:1118-1186) and ChanFeedForward (:1108-1116).

Attention operates on tokens from the *merged* batch_sample volume (global
receptive field across the 27 sub-volumes) — the merge/split lives in the
U-Net; these modules just see a (B, X, Y, Z, C) feature map.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusioniqt_tpu.models.blocks import ChanLayerNorm
from diffusioniqt_tpu.ops.volume import upsample_trilinear
from diffusioniqt_tpu.utils.misc import mish

Dtype = Any


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3D conv + pointwise 1x1 (reference
    ``depthwise_separable_conv3d``, imagen_pytorch3D.py:858-869)."""

    dim_out: int
    kernel_size: int = 3
    stride: int = 1
    padding: str | int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim_in = x.shape[-1]
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * 3
        x = nn.Conv(
            dim_in,
            kernel_size=(self.kernel_size,) * 3,
            strides=(self.stride,) * 3,
            padding=pad,
            feature_group_count=dim_in,
            dtype=self.dtype,
        )(x)
        return nn.Conv(self.dim_out, kernel_size=(1, 1, 1), dtype=self.dtype)(x)


class Patchify(nn.Module):
    """Token reduction before attention (reference imagen_pytorch3D.py:913-924)."""

    emb_size: int
    patch_size: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ChanLayerNorm(dtype=self.dtype)(x)
        return DepthwiseSeparableConv(
            self.emb_size, kernel_size=self.patch_size, stride=self.patch_size,
            dtype=self.dtype,
        )(x)


class PatchReconstruct(nn.Module):
    """Trilinear upsample + depthwise separable conv + ChanLayerNorm
    (reference reconstruct, imagen_pytorch3D.py:952-959)."""

    dim: int
    patch_size: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_trilinear(x, scale=self.patch_size, align_corners=True)
        x = DepthwiseSeparableConv(self.dim, kernel_size=3, stride=1, padding=1,
                                   dtype=self.dtype)(x)
        return ChanLayerNorm(dtype=self.dtype)(x)


def _split_heads(t: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(B, X, Y, Z, h*d) -> (B*h, N, d)."""
    b = t.shape[0]
    n = t.shape[1] * t.shape[2] * t.shape[3]
    d = t.shape[-1] // heads
    t = t.reshape(b, n, heads, d)
    t = jnp.transpose(t, (0, 2, 1, 3))
    return t.reshape(b * heads, n, d)


def _merge_heads(t: jnp.ndarray, heads: int, spatial) -> jnp.ndarray:
    """(B*h, N, d) -> (B, X, Y, Z, h*d)."""
    bh, n, d = t.shape
    b = bh // heads
    t = t.reshape(b, heads, n, d)
    t = jnp.transpose(t, (0, 2, 1, 3)).reshape(b, n, heads * d)
    x, y, z = spatial
    return t.reshape(b, x, y, z, heads * d)


class _QKVConv(nn.Module):
    """Dropout → 1x1 conv → depthwise 3x3 conv, no biases (the reference's
    q/k/v projections, imagen_pytorch3D.py:960-976)."""

    inner_dim: int
    dropout: float = 0.05
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        x = nn.Conv(self.inner_dim, kernel_size=(1, 1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        return nn.Conv(
            self.inner_dim, kernel_size=(3, 3, 3), use_bias=False, padding="SAME",
            feature_group_count=self.inner_dim, dtype=self.dtype,
        )(x)


class LinearAttention(nn.Module):
    """O(N) linear attention over voxel tokens (reference
    imagen_pytorch3D.py:926-1016)."""

    dim: int
    dim_head: int = 32
    heads: int = 8
    dropout: float = 0.05
    patch_size: int = 2
    patch: bool = False
    context_dim: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, fmap, context=None, deterministic: bool = True):
        if self.patch:
            fmap = Patchify(self.dim, self.patch_size, dtype=self.dtype)(fmap)

        h = self.heads
        inner_dim = self.dim_head * h
        spatial = fmap.shape[1:4]
        scale = self.dim_head ** -0.5

        fmap = ChanLayerNorm(dtype=self.dtype)(fmap)
        q = _QKVConv(inner_dim, self.dropout, dtype=self.dtype)(fmap, deterministic)
        k = _QKVConv(inner_dim, self.dropout, dtype=self.dtype)(fmap, deterministic)
        v = _QKVConv(inner_dim, self.dropout, dtype=self.dtype)(fmap, deterministic)
        q, k, v = (_split_heads(t, h) for t in (q, k, v))

        if context is not None:
            ctx = nn.LayerNorm(dtype=self.dtype)(context)
            ctx = nn.Dense(inner_dim * 2, use_bias=False, dtype=self.dtype)(ctx)
            ck, cv = jnp.split(ctx, 2, axis=-1)
            ck = ck.reshape(ck.shape[0], ck.shape[1], h, -1)
            cv = cv.reshape(cv.shape[0], cv.shape[1], h, -1)
            ck = jnp.transpose(ck, (0, 2, 1, 3)).reshape(-1, ck.shape[1], self.dim_head)
            cv = jnp.transpose(cv, (0, 2, 1, 3)).reshape(-1, cv.shape[1], self.dim_head)
            k = jnp.concatenate([k, ck], axis=-2)
            v = jnp.concatenate([v, cv], axis=-2)

        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=-2)
        q = q * scale

        context_mat = jnp.einsum("bnd,bne->bde", k, v)
        out = jnp.einsum("bnd,bde->bne", q, context_mat)
        out = _merge_heads(out, h, spatial)

        out = mish(out)
        out = nn.Conv(self.dim, kernel_size=(1, 1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = ChanLayerNorm(dtype=self.dtype)(out)
        if self.patch:
            out = PatchReconstruct(self.dim, self.patch_size, dtype=self.dtype)(out)
        return out


class SoftMaxAttention(nn.Module):
    """Full quadratic attention over voxel tokens (reference
    imagen_pytorch3D.py:1018-1106). On TPU the inner product chain is the
    MXU-bound hot path; the fused Pallas flash-attention kernel is used when
    enabled (ops.pallas.flash_attention)."""

    dim: int
    dim_head: int = 32
    heads: int = 8
    dropout: float = 0.05
    patch_size: int = 2
    patch: bool = False
    context_dim: Optional[int] = None
    use_flash: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, fmap, context=None, deterministic: bool = True):
        if self.patch:
            fmap = Patchify(self.dim, self.patch_size, dtype=self.dtype)(fmap)

        h = self.heads
        inner_dim = self.dim_head * h
        spatial = fmap.shape[1:4]
        scale = self.dim_head ** -0.5

        fmap = ChanLayerNorm(dtype=self.dtype)(fmap)
        q = _QKVConv(inner_dim, self.dropout, dtype=self.dtype)(fmap, deterministic)
        k = _QKVConv(inner_dim, self.dropout, dtype=self.dtype)(fmap, deterministic)
        v = _QKVConv(inner_dim, self.dropout, dtype=self.dtype)(fmap, deterministic)
        q, k, v = (_split_heads(t, h) for t in (q, k, v))

        if context is not None:
            ctx = nn.LayerNorm(dtype=self.dtype)(context)
            ctx = nn.Dense(inner_dim * 2, use_bias=False, dtype=self.dtype)(ctx)
            ck, cv = jnp.split(ctx, 2, axis=-1)
            ck = ck.reshape(ck.shape[0], ck.shape[1], h, -1)
            cv = cv.reshape(cv.shape[0], cv.shape[1], h, -1)
            ck = jnp.transpose(ck, (0, 2, 1, 3)).reshape(-1, ck.shape[1], self.dim_head)
            cv = jnp.transpose(cv, (0, 2, 1, 3)).reshape(-1, cv.shape[1], self.dim_head)
            k = jnp.concatenate([k, ck], axis=-2)
            v = jnp.concatenate([v, cv], axis=-2)

        from diffusioniqt_tpu.ops.attention import scaled_dot_product_attention

        out = scaled_dot_product_attention(q, k, v, scale=scale,
                                           use_flash=self.use_flash)
        out = _merge_heads(out, h, spatial)

        out = mish(out)
        out = nn.Conv(self.dim, kernel_size=(1, 1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = ChanLayerNorm(dtype=self.dtype)(out)
        if self.patch:
            out = PatchReconstruct(self.dim, self.patch_size, dtype=self.dtype)(out)
        return out


class ChanFeedForward(nn.Module):
    """1x1-conv MLP with channel layer-norms (reference
    imagen_pytorch3D.py:1108-1116)."""

    dim: int
    mult: float = 2.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.mult)
        x = ChanLayerNorm(dtype=self.dtype)(x)
        x = nn.Conv(hidden, kernel_size=(1, 1, 1), use_bias=False, dtype=self.dtype)(x)
        x = jax.nn.gelu(x)
        x = ChanLayerNorm(dtype=self.dtype)(x)
        return nn.Conv(self.dim, kernel_size=(1, 1, 1), use_bias=False,
                       dtype=self.dtype)(x)


class AttentionTransformerBlock(nn.Module):
    """depth x (attention + ChanFeedForward) with residuals — covers both
    Linear- and SoftMax- variants (reference imagen_pytorch3D.py:1118-1186)."""

    dim: int
    att_type: str = "linear"  # 'linear' | 'softmax'
    depth: int = 1
    heads: int = 8
    dim_head: int = 32
    ff_mult: float = 2.0
    patch_size: int = 2
    patch: bool = False
    context_dim: Optional[int] = None
    use_flash: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        for _ in range(self.depth):
            if self.att_type == "linear":
                attn = LinearAttention(
                    dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                    patch_size=self.patch_size, patch=self.patch,
                    context_dim=self.context_dim, dtype=self.dtype,
                )
            else:
                attn = SoftMaxAttention(
                    dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                    patch_size=self.patch_size, patch=self.patch,
                    context_dim=self.context_dim, use_flash=self.use_flash,
                    dtype=self.dtype,
                )
            x = attn(x, context=context, deterministic=deterministic) + x
            x = ChanFeedForward(dim=self.dim, mult=self.ff_mult,
                                dtype=self.dtype)(x) + x
        return x


class MultiHeadAttention(nn.Module):
    """Token-space MHA for ViT3D (reference imagen_pytorch3D.py:811-838)."""

    emb_size: int
    num_heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_flash: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, _ = x.shape
        h = self.num_heads
        inner = self.dim_head * h
        qkv = nn.Dense(inner * 3, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, h, self.dim_head, 3)
        qkv = jnp.transpose(qkv, (4, 0, 2, 1, 3))  # (3, b, h, n, d)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q.reshape(b * h, n, self.dim_head)
        k = k.reshape(b * h, n, self.dim_head)
        v = v.reshape(b * h, n, self.dim_head)

        from diffusioniqt_tpu.ops.attention import scaled_dot_product_attention

        out = scaled_dot_product_attention(
            q, k, v, scale=self.dim_head ** -0.5, use_flash=self.use_flash
        )
        out = out.reshape(b, h, n, self.dim_head)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, inner)
        out = nn.Dropout(rate=self.dropout, deterministic=deterministic)(out)
        return nn.Dense(self.emb_size, dtype=self.dtype)(out)


class FeedForwardBlock(nn.Module):
    """ViT feed-forward; 'local' LocalViT variant uses convs over the token
    cube (reference imagen_pytorch3D.py:774-809)."""

    emb_size: int
    expansion: int = 4
    drop_p: float = 0.0
    patch_num: int = 4
    local: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.local:
            b, n, c = x.shape
            p = self.patch_num
            vol = x.reshape(b, p, p, p, c)
            vol = nn.Conv(self.emb_size * self.expansion, kernel_size=(1, 1, 1),
                          dtype=self.dtype)(vol)
            vol = mish(vol)
            vol = DepthwiseSeparableConv(
                self.emb_size * self.expansion, kernel_size=3, stride=1, padding=1,
                dtype=self.dtype,
            )(vol)
            vol = mish(vol)
            vol = nn.Conv(self.emb_size, kernel_size=(1, 1, 1), dtype=self.dtype)(vol)
            vol = nn.Dropout(rate=self.drop_p, deterministic=deterministic)(vol)
            return vol.reshape(b, n, self.emb_size)
        x = nn.Dense(self.expansion * self.emb_size, dtype=self.dtype)(x)
        x = mish(x)
        x = nn.Dropout(rate=self.drop_p, deterministic=deterministic)(x)
        return nn.Dense(self.emb_size, dtype=self.dtype)(x)


class TransformerEncoderBlock(nn.Module):
    """Pre-norm MHA + FF with residuals (reference imagen_pytorch3D.py:723-749)."""

    emb_size: int
    num_heads: int = 8
    dim_head: int = 64
    drop_p: float = 0.0
    forward_expansion: int = 4
    forward_drop_p: float = 0.0
    patch_num: int = 4
    local: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        res = x
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = MultiHeadAttention(
            self.emb_size, num_heads=self.num_heads, dim_head=self.dim_head,
            dropout=self.drop_p, dtype=self.dtype,
        )(y, deterministic=deterministic)
        y = nn.Dropout(rate=self.drop_p, deterministic=deterministic)(y)
        x = y + res

        res = x
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = FeedForwardBlock(
            self.emb_size, expansion=self.forward_expansion,
            drop_p=self.forward_drop_p, patch_num=self.patch_num,
            local=self.local, dtype=self.dtype,
        )(y, deterministic=deterministic)
        y = nn.Dropout(rate=self.drop_p, deterministic=deterministic)(y)
        return y + res


class ViT3D(nn.Module):
    """Patch-embed → transformer encoder → trilinear-upsample reconstruction
    (reference imagen_pytorch3D.py:871-910)."""

    in_channels: int
    patch_size: int = 8
    num_heads: int = 8
    dim_head: int = 64
    img_size: int = 96
    depth: int = 1
    drop_p: float = 0.1
    forward_drop_p: float = 0.3
    forward_expansion: int = 2
    local: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        emb_size = self.in_channels
        p = self.img_size // self.patch_size

        # patch embedding (reference PatchEmbedding, :841-856)
        tok = DepthwiseSeparableConv(
            emb_size, kernel_size=self.patch_size, stride=self.patch_size,
            dtype=self.dtype,
        )(x)
        b = tok.shape[0]
        tok = tok.reshape(b, p * p * p, emb_size)
        positions = self.param(
            "positions", nn.initializers.normal(stddev=1.0),
            (p ** 3, emb_size), jnp.float32,
        )
        tok = tok + positions.astype(tok.dtype)

        for _ in range(self.depth):
            tok = TransformerEncoderBlock(
                emb_size, num_heads=self.num_heads, dim_head=self.dim_head,
                drop_p=self.drop_p, forward_expansion=self.forward_expansion,
                forward_drop_p=self.forward_drop_p, patch_num=p,
                local=self.local, dtype=self.dtype,
            )(tok, deterministic=deterministic)

        # reconstruction (reference :897-903)
        tok = nn.LayerNorm(dtype=self.dtype)(tok)
        vol = tok.reshape(b, p, p, p, emb_size)
        vol = upsample_trilinear(vol, scale=self.patch_size, align_corners=True)
        vol = DepthwiseSeparableConv(emb_size, kernel_size=3, stride=1, padding=1,
                                     dtype=self.dtype)(vol)
        return ChanLayerNorm(dtype=self.dtype)(vol)
