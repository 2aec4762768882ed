"""2D slice U-Net (the ``imagen_pytorch2D`` capability).

The reference carries a lightly IQT-modified copy of upstream 2D imagen
(``/root/reference/imagen_pytorch2D.py``: lowres conditioning required
:2234-2235, ``condition_on_text=False`` default :1464, same continuous-time
scheduler). Rather than translating that 2.2k-line file, this module is the
2D instantiation of this framework's U-Net design — the same block grammar
as models.unet3d (GroupNorm→scale-shift→Mish→conv blocks, SE, SP-conv
down / pixel-shuffle up, linear + softmax attention over tokens, learned
sinusoidal log-SNR embedding) on ``(B, H, W, C)`` slices.

Works with diffusion.gaussian.Imagen / diffusion.elucidated.ElucidatedImagen
via ``spatial_dims=2``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusioniqt_tpu.models.blocks import ChanLayerNorm, LearnedSinusoidalPosEmb
from diffusioniqt_tpu.utils.misc import cast_tuple, mish

Dtype = Any


class SE2D(nn.Module):
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False,
                     dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype)(y)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class Block2D(nn.Module):
    dim_out: int
    groups: int = 8
    norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None):
        if self.norm:
            x = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = mish(x)
        return nn.Conv(self.dim_out, kernel_size=(3, 3), padding="SAME",
                       dtype=self.dtype)(x)


class ResnetBlock2D(nn.Module):
    dim_out: int
    time_cond_dim: Optional[int] = None
    groups: int = 8
    use_se: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_cond_dim is not None and time_emb is not None:
            t = mish(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype)(t)
            scale_shift = jnp.split(t[:, None, None, :], 2, axis=-1)
        h = Block2D(self.dim_out, groups=self.groups, dtype=self.dtype)(x)
        h = Block2D(self.dim_out, groups=self.groups, dtype=self.dtype)(
            h, scale_shift=scale_shift
        )
        if self.use_se:
            h = SE2D(dtype=self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, kernel_size=(1, 1), dtype=self.dtype)(x)
        return h + x


class Downsample2D(nn.Module):
    """Pixel-unshuffle SP-conv."""

    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        x = x.reshape(b, hh // 2, 2, ww // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, hh // 2, ww // 2, c * 4)
        return nn.Conv(self.dim_out, kernel_size=(1, 1), dtype=self.dtype)(x)


class PixelShuffleUpsample2D(nn.Module):
    dim_out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        def icnr(key, shape, dtype=jnp.float32):
            base = nn.initializers.kaiming_uniform()(
                key, shape[:-1] + (shape[-1] // 4,), dtype
            )
            return jnp.repeat(base, 4, axis=-1)

        b, hh, ww, _ = x.shape
        x = nn.Conv(self.dim_out * 4, kernel_size=(1, 1), kernel_init=icnr,
                    bias_init=nn.initializers.zeros, dtype=self.dtype)(x)
        x = mish(x)
        x = x.reshape(b, hh, ww, self.dim_out, 2, 2)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(b, hh * 2, ww * 2, self.dim_out)


class Attention2D(nn.Module):
    """Token attention over the full 2D grid; linear or softmax."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    linear: bool = True
    use_flash: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = self.heads
        inner = self.dim_head * h
        x_in = x
        x = ChanLayerNorm(dtype=self.dtype)(x)
        qkv = nn.Conv(inner * 3, kernel_size=(1, 1), use_bias=False,
                      dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            t = t.reshape(b, hh * ww, h, self.dim_head)
            return t.transpose(0, 2, 1, 3).reshape(b * h, hh * ww, self.dim_head)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = self.dim_head ** -0.5

        if self.linear:
            q = jax.nn.softmax(q, axis=-1) * scale
            k = jax.nn.softmax(k, axis=-2)
            ctx = jnp.einsum("bnd,bne->bde", k, v)
            out = jnp.einsum("bnd,bde->bne", q, ctx)
        else:
            from diffusioniqt_tpu.ops.attention import scaled_dot_product_attention

            out = scaled_dot_product_attention(q, k, v, scale=scale,
                                               use_flash=self.use_flash)
        out = out.reshape(b, h, hh * ww, self.dim_head)
        out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, inner)
        out = nn.Conv(self.dim, kernel_size=(1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = ChanLayerNorm(dtype=self.dtype)(out)
        return out + x_in


class UNet2D(nn.Module):
    """2D conditional diffusion U-Net for MRI slices."""

    dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    num_resnet_blocks: Union[int, Tuple[int, ...]] = 2
    channels: int = 1
    channels_out: Optional[int] = None
    lowres_cond: bool = False
    self_cond: bool = False
    cond_images_channels: int = 0
    learned_sinu_pos_emb_dim: int = 16
    init_dim: Optional[int] = None
    resnet_groups: Union[int, Tuple[int, ...]] = 8
    use_se_attn: bool = True
    att_type: str = "linear"  # 'linear' | 'softmax' | 'none'
    attn_heads: int = 8
    attn_dim_head: int = 32
    layer_attns: Union[bool, Tuple[bool, ...]] = False
    attend_at_middle: bool = False
    final_resnet_block: bool = True
    use_flash: bool = True
    dtype: Optional[Dtype] = None

    def cast_model_parameters(self, *, lowres_cond, channels, channels_out,
                              **_ignored):
        if (lowres_cond == self.lowres_cond and channels == self.channels
                and channels_out == self.channels_out):
            return self
        return dataclasses.replace(self, lowres_cond=lowres_cond,
                                   channels=channels, channels_out=channels_out)

    @nn.compact
    def __call__(self, x, time_steps, time, *, lowres_cond_img=None,
                 cond_images=None, self_cond=None, cond_drop_prob: float = 0.0,
                 deterministic: bool = True):
        del time_steps, cond_drop_prob
        num_layers = len(self.dim_mults)
        num_blocks = cast_tuple(self.num_resnet_blocks, num_layers)
        groups = cast_tuple(self.resnet_groups, num_layers)
        layer_attns = cast_tuple(self.layer_attns, num_layers)
        init_dim = self.init_dim or self.dim
        channels_out = self.channels_out or self.channels
        time_cond_dim = self.dim * 4

        if self.self_cond:
            sc = self_cond if self_cond is not None else jnp.zeros_like(x)
            x = jnp.concatenate([x, sc], axis=-1)
        if self.lowres_cond:
            assert lowres_cond_img is not None
        if lowres_cond_img is not None:
            x = jnp.concatenate([x, lowres_cond_img], axis=-1)
        if self.cond_images_channels > 0:
            assert cond_images is not None
            x = jnp.concatenate([cond_images, x], axis=-1)

        x = nn.Conv(init_dim, kernel_size=(3, 3), padding="SAME",
                    dtype=self.dtype, name="init_conv")(x)

        t = LearnedSinusoidalPosEmb(self.learned_sinu_pos_emb_dim)(time)
        t = nn.Dense(time_cond_dim, dtype=self.dtype)(t)
        t = mish(t)
        t = nn.Dense(time_cond_dim, dtype=self.dtype)(t)

        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        mid_dim = dims[-1]

        hiddens = []
        for ind, (dim_in, dim_out_lvl) in enumerate(in_out):
            is_last = ind == num_layers - 1
            x = ResnetBlock2D(dim_in, time_cond_dim=time_cond_dim,
                              groups=groups[ind], use_se=self.use_se_attn,
                              dtype=self.dtype, name=f"down{ind}_init")(x, t)
            if layer_attns[ind] and self.att_type != "none":
                x = Attention2D(dim=dim_in, heads=self.attn_heads,
                                dim_head=self.attn_dim_head,
                                linear=self.att_type == "linear",
                                use_flash=self.use_flash, dtype=self.dtype,
                                name=f"down{ind}_attn")(x)
            for bi in range(num_blocks[ind]):
                x = ResnetBlock2D(dim_in, time_cond_dim=time_cond_dim,
                                  groups=groups[ind], use_se=self.use_se_attn,
                                  dtype=self.dtype,
                                  name=f"down{ind}_block{bi}")(x, t)
            if not is_last:
                hiddens.append(x)
                x = Downsample2D(dim_out_lvl, dtype=self.dtype,
                                 name=f"down{ind}_post")(x)
            else:
                x = nn.Conv(dim_out_lvl, kernel_size=(1, 1), dtype=self.dtype,
                            name=f"down{ind}_post")(x)

        if self.attend_at_middle and self.att_type != "none":
            x = Attention2D(dim=mid_dim, heads=self.attn_heads,
                            dim_head=self.attn_dim_head,
                            linear=self.att_type == "linear",
                            use_flash=self.use_flash, dtype=self.dtype,
                            name="mid_attn")(x)
        x = ResnetBlock2D(mid_dim, time_cond_dim=time_cond_dim,
                          groups=groups[-1], use_se=self.use_se_attn,
                          dtype=self.dtype, name="mid_block")(x, t)

        rev_in_out = list(reversed(in_out))
        rev_blocks = list(reversed(num_blocks))
        rev_groups = list(reversed(groups))
        for ind, (dim_out_lvl, dim_in_lvl) in enumerate(rev_in_out):
            is_last = ind == num_layers - 1
            if not is_last:
                x = PixelShuffleUpsample2D(dim_out_lvl, dtype=self.dtype,
                                           name=f"up{ind}_upsample")(x)
                skip = hiddens.pop()
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ResnetBlock2D(dim_out_lvl, time_cond_dim=time_cond_dim,
                              groups=rev_groups[ind], use_se=self.use_se_attn,
                              dtype=self.dtype, name=f"up{ind}_init")(x, t)
            for bi in range(rev_blocks[ind]):
                x = ResnetBlock2D(dim_out_lvl, time_cond_dim=time_cond_dim,
                                  groups=rev_groups[ind],
                                  use_se=self.use_se_attn, dtype=self.dtype,
                                  name=f"up{ind}_block{bi}")(x, t)

        if self.final_resnet_block:
            x = ResnetBlock2D(self.dim, time_cond_dim=time_cond_dim,
                              groups=groups[0], use_se=self.use_se_attn,
                              dtype=self.dtype, name="final_res_block")(x, t)
        return nn.Conv(channels_out, kernel_size=(1, 1), dtype=jnp.float32,
                       name="final_conv")(x.astype(jnp.float32))
