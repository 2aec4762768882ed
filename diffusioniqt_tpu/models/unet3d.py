"""The 3D IQT U-Net (Flax linen, channels-last, static shapes).

TPU-first re-design of the reference ``Unet``
(``/root/reference/imagen_pytorch3D.py:1188-1737``). Semantics preserved:

  * init conv (plain 3x3x3 or multi-kernel CrossEmbed stem), optionally
    VALID + boundary halo (:1286-1291, :1587-1589)
  * learned-sinusoidal log-SNR time embedding -> MLP (:1305-1316)
  * down path per level: [optional pre-downsample] -> init ResnetBlock ->
    [optional transformer over the *merged* batch_sample volume] ->
    N ResnetBlocks -> post-downsample (:1363-1414, :1604-1629)
  * optional middle attention+ResnetBlock gated by ``deep_feature``
    (:1417-1434, :1633-1649)
  * up path: pixel-shuffle (or deconv) upsample + skip concat + ResnetBlocks
    (:1437-1456, :1657-1663)
  * final ResnetBlock + 1x1 conv out (:1473-1477)

The batch_sample merge/split around attention (:1610-1622) is a pure
reshape/transpose pair here (ops.volume), keeping the op XLA-layout-friendly
and shardable: the sub-volume axis folds into batch for convs and into space
for attention.

Deliberate fixes over the reference (documented deviations):
  * attention feature sizes are derived from the *actual* current spatial
    extent (the reference records the pre-downsample size when
    ``memory_efficient=True``, :1376-1379);
  * when ``batch_sample=False`` attention runs per-volume instead of
    assuming a 27-sub-volume batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusioniqt_tpu.models.attention import AttentionTransformerBlock, ViT3D
from diffusioniqt_tpu.models.blocks import (
    Block,
    CrossEmbedLayer,
    DeconvUpsample,
    Downsample,
    LearnedSinusoidalPosEmb,
    PixelShuffleUpsample,
    ResnetBlock,
)
from diffusioniqt_tpu.ops.volume import (
    resize_volume,
    subvolumes_to_volume,
    volume_to_subvolumes,
)
from diffusioniqt_tpu.utils.misc import cast_tuple, mish

Dtype = Any


class UNet3D(nn.Module):
    """3D conditional diffusion U-Net."""

    dim: int = 64
    img_size: int = 96  # spatial edge of the (merged, if batch_sample) input
    num_resnet_blocks: Union[int, Tuple[int, ...]] = 1
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    channels_out: Optional[int] = None
    cond_images_channels: int = 0
    lowres_cond: bool = False
    self_cond: bool = False

    # time embedding
    learned_sinu_pos_emb_dim: int = 16

    # attention
    att_type: str = "vit"  # 'vit' | 'linear' | 'softmax'
    attn_dim_head: int = 64
    attn_heads: int = 8
    attend_at_middle: bool = True
    attend_at_middle_depth: int = 1
    attend_at_middle_heads: int = 8
    attend_at_enc: Union[bool, Tuple[bool, ...]] = False
    attend_at_enc_depth: Union[int, Tuple[int, ...]] = 1
    attend_at_enc_heads: Union[int, Tuple[int, ...]] = 8
    att_drop: float = 0.1
    att_forward_drop: float = 0.3
    att_forward_expansion: int = 2
    att_localvit: bool = True
    init_patch_size: int = 8  # reference hardcodes patch_size = 8 (:1361)
    use_flash: bool = True

    # structure
    init_dim: Optional[int] = 32
    resnet_groups: Union[int, Tuple[int, ...]] = 8
    init_conv_kernel_size: int = 3
    init_cross_embed: bool = True
    init_cross_embed_kernel_sizes: Tuple[int, ...] = (3, 7, 15)
    memory_efficient: bool = False
    use_se_attn: bool = True
    scale_skip_connection: bool = False
    final_resnet_block: bool = True
    final_conv_kernel_size: int = 1
    pixel_shuffle_upsample: bool = True

    # patch geometry
    boundary: bool = False
    batch_sample: bool = True
    batch_sample_factor: int = 3
    deep_feature: bool = True
    # merged-boundary execution: when boundary+batch_sample, run the whole
    # forward on the merged volume — [per-sub-volume halo + VALID conv]
    # collapses to one SAME conv (no halo traffic; XLA sees large convs).
    # Requires the diffusion time to be shared within each sub-volume group,
    # which batch_sample guarantees (reference imagen_pytorch3D.py:2428-2432).
    # Off by default: measured on v5e, XLA's conv throughput at 8x96^3 is
    # ~69 TF vs ~110 TF at 216x32^3 (batch-heavy small-spatial wins), so the
    # split layout + halo exchange is faster at flagship scale.
    merged_boundary: bool = False
    # fused [GN -> scale-shift -> Mish -> halo -> conv] Pallas kernel on the
    # split boundary path (ops.pallas.fused_block); TPU-only, jnp fallback
    use_pallas: bool = False
    # rematerialize ResnetBlocks on the backward pass (jax.checkpoint) —
    # trades ~30% more FLOPs for activation memory, the standard TPU lever
    # for training models larger than HBM allows
    remat: bool = False
    # None = full-block recompute; 'conv' = keep conv inputs/outputs
    # (checkpoint_name tags in blocks.Block) and recompute only the
    # bandwidth-bound GN/Mish/SE chain — no MXU recompute
    remat_policy: Optional[str] = None

    dtype: Optional[Dtype] = None

    # ------------------------------------------------------------------
    def cast_model_parameters(self, *, lowres_cond: bool, channels: int,
                              channels_out: int, **_ignored) -> "UNet3D":
        """Re-instantiate with cascading-DDPM-correct conditioning (reference
        ``cast_model_parameters``, imagen_pytorch3D.py:1482-1500)."""
        if (
            lowres_cond == self.lowres_cond
            and channels == self.channels
            and channels_out == self.channels_out
        ):
            return self
        return dataclasses.replace(
            self, lowres_cond=lowres_cond, channels=channels,
            channels_out=channels_out,
        )

    # ------------------------------------------------------------------
    def _attention(self, name: str, dim: int, *, depth: int, heads: int,
                   img_size: int, patch_size: int):
        if self.att_type == "vit":
            return ViT3D(
                in_channels=dim, patch_size=patch_size, num_heads=heads,
                dim_head=self.attn_dim_head, img_size=img_size, depth=depth,
                drop_p=self.att_drop, forward_drop_p=self.att_forward_drop,
                forward_expansion=self.att_forward_expansion,
                local=self.att_localvit, dtype=self.dtype, name=name,
            )
        return AttentionTransformerBlock(
            dim=dim, att_type=self.att_type, depth=depth, heads=heads,
            dim_head=self.attn_dim_head, ff_mult=self.att_forward_expansion,
            patch_size=patch_size, patch=True, use_flash=self.use_flash,
            dtype=self.dtype, name=name,
        )

    @property
    def _merged_mode(self) -> bool:
        return self.merged_boundary and self.boundary and self.batch_sample

    def _attend_merged(self, x, attn, deterministic, residual=True):
        """Merge 27 sub-volumes -> full volume, attend (global receptive
        field), split back (reference imagen_pytorch3D.py:1610-1622). In
        merged-boundary mode the data is already the merged volume.

        ``residual=False`` for the middle slot: the reference adds the
        outer residual only around encoder attention (``x += res``,
        :1622); its mid path assigns ``res = x`` but never adds it back
        (:1636-1642 — the transformer block's internal residuals are the
        only ones there)."""
        res = x
        if self.batch_sample and not self._merged_mode:
            x = subvolumes_to_volume(x, factor=self.batch_sample_factor)
        x = attn(x, deterministic=deterministic)
        if self.batch_sample and not self._merged_mode:
            x = volume_to_subvolumes(x, factor=self.batch_sample_factor)
        return x + res if residual else x

    # ------------------------------------------------------------------
    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (B, s, s, s, C) noisy input
        time_steps: jnp.ndarray,   # raw t in [0,1] (kept for API parity)
        time: jnp.ndarray,         # log-SNR conditioning values, (B,)
        *,
        lowres_cond_img: Optional[jnp.ndarray] = None,
        cond_images: Optional[jnp.ndarray] = None,
        self_cond: Optional[jnp.ndarray] = None,
        cond_drop_prob: float = 0.0,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del time_steps, cond_drop_prob  # unconditional IQT path; API parity
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)

        num_layers = len(self.dim_mults)
        num_blocks = cast_tuple(self.num_resnet_blocks, num_layers)
        groups = cast_tuple(self.resnet_groups, num_layers)
        attend_enc = cast_tuple(self.attend_at_enc, num_layers)
        attend_enc_depth = cast_tuple(self.attend_at_enc_depth, num_layers)
        attend_enc_heads = cast_tuple(self.attend_at_enc_heads, num_layers)

        init_dim = self.init_dim or self.dim
        channels_out = self.channels_out or self.channels
        time_cond_dim = self.dim * 4

        # --- conditioning concat (reference :1569-1584) -------------------
        if self.self_cond:
            sc = self_cond if self_cond is not None else jnp.zeros_like(x)
            x = jnp.concatenate([x, sc.astype(compute_dtype)], axis=-1)
        if self.lowres_cond:
            assert lowres_cond_img is not None, "low resolution conditioning image must be present"
        if lowres_cond_img is not None:
            x = jnp.concatenate([x, lowres_cond_img.astype(compute_dtype)], axis=-1)
        if self.cond_images_channels > 0:
            assert cond_images is not None, "conditioning images not supplied"
            cond_images = resize_volume(cond_images, x.shape[1]).astype(compute_dtype)
            x = jnp.concatenate([cond_images, x], axis=-1)

        # --- init conv (reference :1286-1291, :1587-1589) -----------------
        merged = self._merged_mode
        if merged:
            # merged-boundary execution: fold the sub-volume axis into space
            # once; every [halo + VALID conv] below becomes a SAME conv over
            # the merged volume (identical values, zero halo traffic)
            x = subvolumes_to_volume(x, factor=self.batch_sample_factor)
        elif self.boundary:
            # reference: boundary_pad before init conv (:1587-1588)
            from diffusioniqt_tpu.ops.volume import halo_exchange

            x = halo_exchange(x, factor=self.batch_sample_factor)
        if self.init_cross_embed:
            assert not self.boundary, "boundary mode requires the plain init conv"
            x = CrossEmbedLayer(
                init_dim, kernel_sizes=self.init_cross_embed_kernel_sizes,
                stride=1, dtype=self.dtype, name="init_conv",
            )(x)
        else:
            k = self.init_conv_kernel_size
            x = nn.Conv(
                init_dim, kernel_size=(k, k, k),
                padding="SAME" if (merged or not self.boundary) else "VALID",
                dtype=self.dtype, name="init_conv",
            )(x)

        # --- time conditioning (reference :1305-1316, :1597-1599) ---------
        if merged:
            # batch_sample shares one diffusion time across each group's
            # sub-volumes (reference :2428-2432) — one embedding per group
            time = time[:: self.batch_sample_factor ** 3]
        t = LearnedSinusoidalPosEmb(self.learned_sinu_pos_emb_dim,
                                    name="sinu_pos_emb")(time)
        t = nn.Dense(time_cond_dim, dtype=self.dtype, name="time_hidden")(t)
        t = mish(t)
        t = nn.Dense(time_cond_dim, dtype=self.dtype, name="time_cond")(t)

        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        mid_dim = dims[-1]

        upsample_cls = (
            PixelShuffleUpsample if self.pixel_shuffle_upsample else DeconvUpsample
        )
        skip_scale = (2 ** -0.5) if self.scale_skip_connection else 1.0

        # track the merged-volume spatial edge and vit patch size per level
        cur_size = self.img_size
        patch_size = self.init_patch_size

        rb = dict(boundary=self.boundary, factor=self.batch_sample_factor,
                  merged=merged, use_pallas=self.use_pallas, dtype=self.dtype)
        if self.remat:
            policy = None
            if self.remat_policy == "conv":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_in", "conv_out")
            elif self.remat_policy is not None:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}")
            resnet_block = nn.remat(ResnetBlock, policy=policy)
        else:
            resnet_block = ResnetBlock

        # --- down path (reference :1363-1414, :1604-1629) -----------------
        hiddens = []
        skip_dims = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind == (num_layers - 1)
            current_dim = dim_in

            if self.memory_efficient:
                x = Downsample(dim_out, dtype=self.dtype,
                               name=f"down{ind}_pre")(x)
                current_dim = dim_out
                cur_size //= 2

            x = resnet_block(
                current_dim, time_cond_dim=time_cond_dim, groups=groups[ind],
                use_se=self.use_se_attn, name=f"down{ind}_init", **rb,
            )(x, t)

            if attend_enc[ind]:
                attn = self._attention(
                    f"down{ind}_attn", current_dim,
                    depth=attend_enc_depth[ind], heads=attend_enc_heads[ind],
                    img_size=cur_size, patch_size=patch_size,
                )
                x = self._attend_merged(x, attn, deterministic)

            for bi in range(num_blocks[ind]):
                x = resnet_block(
                    current_dim, time_cond_dim=time_cond_dim,
                    groups=groups[ind], use_se=self.use_se_attn,
                    name=f"down{ind}_block{bi}", **rb,
                )(x, t)

            if not is_last:
                hiddens.append(x)
                skip_dims.append(current_dim)

            if self.memory_efficient:
                x = nn.Conv(dim_out, kernel_size=(1, 1, 1), dtype=self.dtype,
                            name=f"down{ind}_post")(x)
            elif not is_last:
                x = Downsample(dim_out, dtype=self.dtype,
                               name=f"down{ind}_post")(x)
                cur_size //= 2
            else:
                x = nn.Conv(dim_out, kernel_size=(1, 1, 1), dtype=self.dtype,
                            name=f"down{ind}_post")(x)

            if not is_last:
                patch_size = max(patch_size // 2, 1)

        # --- middle (reference :1417-1434, :1633-1649) --------------------
        if self.deep_feature:
            if self.attend_at_middle:
                attn = self._attention(
                    "mid_attn", mid_dim, depth=self.attend_at_middle_depth,
                    heads=self.attend_at_middle_heads, img_size=cur_size,
                    patch_size=patch_size,
                )
                x = self._attend_merged(x, attn, deterministic,
                                        residual=False)
            x = resnet_block(
                mid_dim, time_cond_dim=time_cond_dim, groups=groups[-1],
                name="mid_block", **rb,
            )(x, t)

        # --- up path (reference :1442-1456, :1657-1663) -------------------
        rev_in_out = list(reversed(in_out))
        rev_blocks = list(reversed(num_blocks))
        rev_groups = list(reversed(groups))
        for ind, (dim_out_lvl, dim_in_lvl) in enumerate(rev_in_out):
            if ind == 0:
                dim_in_lvl = mid_dim
            is_last = ind == (num_layers - 1)

            # memory_efficient downsamples at *every* level, so every up
            # level must upsample to restore resolution (fixes a dead-end in
            # the reference's unexercised efficient path, :1447-1453)
            if not is_last or self.memory_efficient:
                x = upsample_cls(dim_out_lvl, dtype=self.dtype,
                                 name=f"up{ind}_upsample")(x)
            if not is_last:
                skip = hiddens.pop() * skip_scale
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = resnet_block(
                dim_out_lvl, time_cond_dim=time_cond_dim,
                groups=rev_groups[ind], use_se=self.use_se_attn,
                name=f"up{ind}_init", **rb,
            )(x, t)

            for bi in range(rev_blocks[ind]):
                x = resnet_block(
                    dim_out_lvl, time_cond_dim=time_cond_dim,
                    groups=rev_groups[ind], use_se=self.use_se_attn,
                    name=f"up{ind}_block{bi}", **rb,
                )(x, t)

        # --- final (reference :1473-1477, :1676-1682) ---------------------
        if self.final_resnet_block:
            x = resnet_block(
                self.dim, time_cond_dim=time_cond_dim, groups=groups[0],
                use_se=self.use_se_attn, name="final_res_block", **rb,
            )(x, t)
        k = self.final_conv_kernel_size
        out = nn.Conv(
            channels_out, kernel_size=(k, k, k),
            padding="SAME" if k > 1 else "VALID",
            dtype=jnp.float32, name="final_conv",
        )(x.astype(jnp.float32))
        if merged:
            out = volume_to_subvolumes(out, factor=self.batch_sample_factor)
        return out


class NullUnet(nn.Module):
    """Identity placeholder for untrained cascade stages (reference
    imagen_pytorch3D.py:1688-1698)."""

    lowres_cond: bool = False
    channels: int = 1
    channels_out: int = 1

    def cast_model_parameters(self, *args, **kwargs):
        return self

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        _ = self.param("dummy", nn.initializers.zeros, (1,), jnp.float32)
        return x


def SRUnet256(**kwargs) -> UNet3D:
    """Super-resolution preset (reference imagen_pytorch3D.py:1714-1724)."""
    defaults = dict(
        dim=128, dim_mults=(1, 2, 4, 8), num_resnet_blocks=(2, 4, 8, 8),
        attn_heads=8, memory_efficient=True,
    )
    return UNet3D(**{**defaults, **kwargs})


def BaseUnet64(**kwargs) -> UNet3D:
    """Base-stage preset (reference imagen_pytorch3D.py:1702-1712)."""
    defaults = dict(
        dim=512, dim_mults=(1, 2, 3, 4), num_resnet_blocks=3,
        attn_heads=8, memory_efficient=False,
    )
    return UNet3D(**{**defaults, **kwargs})


def SRUnet1024(**kwargs) -> UNet3D:
    """High-res SR preset (reference imagen_pytorch3D.py:1726-1737)."""
    defaults = dict(
        dim=128, dim_mults=(1, 2, 4, 8), num_resnet_blocks=(2, 4, 8, 8),
        attn_heads=8, memory_efficient=True,
    )
    return UNet3D(**{**defaults, **kwargs})


def iqt_unet_from_config(cfg) -> UNet3D:
    """Build the IQT SR U-Net exactly as the reference entry scripts do
    (reference train.py:83-116 / test.py:77-108)."""
    train = cfg.train
    img_size = train.patch_size
    return UNet3D(
        dim=train.dim,
        img_size=img_size,
        dim_mults=train.dim_mults,
        channels=train.channels,
        num_resnet_blocks=train.num_resnet_blocks,
        init_conv_kernel_size=3,
        lowres_cond=True,
        init_cross_embed=False,
        att_type=train.att_type,
        attn_dim_head=train.att_head_dim,
        attend_at_middle=train.att_mid,
        attend_at_middle_depth=train.att_mid_depth,
        attend_at_middle_heads=train.att_mid_heads,
        attend_at_enc=train.att_enc,
        attend_at_enc_depth=train.att_enc_depth,
        attend_at_enc_heads=train.att_enc_heads,
        att_drop=train.att_drop,
        att_forward_drop=train.att_forward_drop,
        att_forward_expansion=train.att_forward_expansion,
        att_localvit=train.att_localvit,
        init_dim=train.init_dim,
        resnet_groups=train.resnet_groups,
        memory_efficient=train.efficient,
        use_se_attn=train.use_se,
        pixel_shuffle_upsample=True,
        boundary=train.boundary,
        batch_sample=train.batch_sample,
        batch_sample_factor=train.batch_sample_factor,
        deep_feature=train.deep_feature,
        use_pallas=train.use_pallas,
        remat=train.remat,
        remat_policy=train.remat_policy,
        dtype=jnp.bfloat16 if train.compute_dtype == "bfloat16" else jnp.float32,
    )
