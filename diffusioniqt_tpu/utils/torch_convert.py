"""torch -> flax weight conversion for the reference IQT U-Net.

Maps a reference ``Unet`` state dict (``/root/reference/
imagen_pytorch3D.py:1188-1737``; persisted via ``utils.py:15-61`` /
``imagen_pytorch3D.py:1504-1536``) onto this repo's
``diffusioniqt_tpu.models.unet3d.UNet3D`` flax parameter tree, so published
reference checkpoints can be loaded and so whole-model numerical parity can
be tested (tests/test_model_parity.py).

Layout rules:
  * torch Conv3d weight (out, in, k1, k2, k3) -> flax kernel
    (k1, k2, k3, in, out)
  * torch Linear weight (out, in) -> flax Dense kernel (in, out)
  * torch GroupNorm weight/bias -> Block ``norm_scale``/``norm_bias``
  * pixel (un)shuffle channel orderings are identical on both sides
    (c slowest, then the three scale positions pairing spatial axes in
    order), so SP-conv / pixel-shuffle conv weights copy through directly.

Structural map (torch module path -> flax param collection name):
  init_conv                  -> init_conv   (CrossEmbed: convs.{i} -> Conv_{i})
  to_time_hiddens.0          -> sinu_pos_emb
  to_time_hiddens.1          -> time_hidden
  to_time_cond.0             -> time_cond
  downs.{i}.0 (pre-ds)       -> down{i}_pre/Conv_0
  downs.{i}.1 (init block)   -> down{i}_init
  downs.{i}.3.{b}            -> down{i}_block{b}
  downs.{i}.4 (post)         -> down{i}_post[/Conv_0 when SP-conv]
  mid_block                  -> mid_block
  ups.{i}.0 (pixel-shuffle)  -> up{i}_upsample/Conv_0
  ups.{i}.1 (init block)     -> up{i}_init
  ups.{i}.2.{b}              -> up{i}_block{b}
  final_res_block            -> final_res_block
  final_conv                 -> final_conv
(reference ``norm_cond`` is an unused LayerNorm on the text path and is
dropped.)

Attention slots map as:
  downs.{i}.2 / mid_attn    -> down{i}_attn / mid_attn, with the three
  reference families (LinearAttention :926-1016, SoftMaxAttention
  :1018-1106, ViT3D :871-910) converted by ``_attn_module``; Deconv3D
  upsamples (:441-457) convert via spatial kernel flip (torch transposed
  convs correlate with flipped kernels relative to lax.conv_transpose).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv(sd: Dict[str, Any], key: str) -> Dict[str, jnp.ndarray]:
    w = _np(sd[f"{key}.weight"])
    out = {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return out


def _dense(sd: Dict[str, Any], key: str) -> Dict[str, jnp.ndarray]:
    w = _np(sd[f"{key}.weight"])
    out = {"kernel": jnp.asarray(w.T)}
    if f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return out


def _block(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """reference ``Block`` (GroupNorm -> Mish -> Conv3d, :535-566)."""
    out: Dict[str, Any] = {"Conv_0": _conv(sd, f"{prefix}.project")}
    if f"{prefix}.groupnorm.weight" in sd:
        out["norm_scale"] = jnp.asarray(_np(sd[f"{prefix}.groupnorm.weight"]))
        out["norm_bias"] = jnp.asarray(_np(sd[f"{prefix}.groupnorm.bias"]))
    return out


def _resnet_block(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """reference ``ResnetBlock`` (:568-614) -> flax ``ResnetBlock``.

    Flax child names follow linen call-order auto-numbering:
    Dense_0 (time MLP), Block_0/Block_1, SE3D_0 (Dense_0/Dense_1),
    Conv_0 (residual 1x1, only when in/out dims differ).
    """
    out: Dict[str, Any] = {}
    if f"{prefix}.time_mlp.1.weight" in sd:
        out["Dense_0"] = _dense(sd, f"{prefix}.time_mlp.1")
    out["Block_0"] = _block(sd, f"{prefix}.block1")
    out["Block_1"] = _block(sd, f"{prefix}.block2")
    if f"{prefix}.se.fc.0.weight" in sd:
        out["SE3D_0"] = {
            "Dense_0": {"kernel": jnp.asarray(_np(sd[f"{prefix}.se.fc.0.weight"]).T)},
            "Dense_1": {"kernel": jnp.asarray(_np(sd[f"{prefix}.se.fc.2.weight"]).T)},
        }
    if f"{prefix}.res_conv.weight" in sd:
        out["Conv_0"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _chan_ln(sd: Dict[str, Any], key: str) -> Dict[str, Any]:
    """reference ``ChanLayerNorm`` (g of shape (C,1,1,1), :361-382) ->
    flax ``ChanLayerNorm`` {g: (C,)}."""
    return {"g": jnp.asarray(_np(sd[f"{key}.g"]).reshape(-1))}


def _layer_norm(sd: Dict[str, Any], key: str) -> Dict[str, Any]:
    """torch nn.LayerNorm -> flax nn.LayerNorm {scale, bias}."""
    return {
        "scale": jnp.asarray(_np(sd[f"{key}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{key}.bias"])),
    }


def _dsconv(sd: Dict[str, Any], key: str) -> Dict[str, Any]:
    """reference ``depthwise_separable_conv3d`` (:858-869) ->
    flax ``DepthwiseSeparableConv`` {Conv_0: depthwise, Conv_1: pointwise}."""
    return {
        "Conv_0": _conv(sd, f"{key}.depthwise"),
        "Conv_1": _conv(sd, f"{key}.pointwise"),
    }


def _deconv_upsample(sd: Dict[str, Any], key: str) -> Dict[str, Any]:
    """reference ``Deconv3D`` ConvTranspose3d(k=3, s=2, p=1, op=1)
    (:441-457) -> flax ``DeconvUpsample``/ConvTranspose.

    torch's transposed conv correlates with *flipped* kernels relative to
    ``lax.conv_transpose(transpose_kernel=False)``, and its weight layout is
    (in, out, k, k, k): flip the spatial axes and permute to
    (k, k, k, in, out)."""
    w = _np(sd[f"{key}.weight"])
    kernel = w[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1).copy()
    out = {"kernel": jnp.asarray(kernel)}
    if f"{key}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return out


def _attention(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """reference ``LinearAttention``/``SoftMaxAttention`` (identical state
    dict layouts, :926-1106) -> flax LinearAttention/SoftMaxAttention.

    Head layouts agree (torch 'b (h c) x y z' and flax reshape(..., h, d)
    are both head-major), so conv weights copy through; the unused text
    ``to_context`` path is dropped."""
    out: Dict[str, Any] = {}
    if f"{prefix}.patch_embed.norm.g" in sd:
        out["Patchify_0"] = {
            "ChanLayerNorm_0": _chan_ln(sd, f"{prefix}.patch_embed.norm"),
            "DepthwiseSeparableConv_0": _dsconv(
                sd, f"{prefix}.patch_embed.projection"),
        }
        out["PatchReconstruct_0"] = {
            "DepthwiseSeparableConv_0": _dsconv(sd, f"{prefix}.reconstruct.1"),
            "ChanLayerNorm_0": _chan_ln(sd, f"{prefix}.reconstruct.2"),
        }
    out["ChanLayerNorm_0"] = _chan_ln(sd, f"{prefix}.norm")
    for i, proj in enumerate(("to_q", "to_k", "to_v")):
        out[f"_QKVConv_{i}"] = {
            "Conv_0": _conv(sd, f"{prefix}.{proj}.1"),
            "Conv_1": _conv(sd, f"{prefix}.{proj}.2"),
        }
    out["Conv_0"] = _conv(sd, f"{prefix}.to_out.0")
    out["ChanLayerNorm_1"] = _chan_ln(sd, f"{prefix}.to_out.1")
    return out


def _chan_feed_forward(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """reference ``ChanFeedForward`` Sequential (:1108-1116)."""
    return {
        "ChanLayerNorm_0": _chan_ln(sd, f"{prefix}.0"),
        "Conv_0": _conv(sd, f"{prefix}.1"),
        "ChanLayerNorm_1": _chan_ln(sd, f"{prefix}.3"),
        "Conv_1": _conv(sd, f"{prefix}.4"),
    }


def _feed_forward_block(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """reference ViT ``FeedForwardBlock`` (:774-809), local (conv) or plain
    (linear) variant, read through the ``net.`` registration."""
    if f"{prefix}.net.0.1.weight" in sd:  # LocalViT conv feed-forward
        return {
            "Conv_0": _conv(sd, f"{prefix}.net.0.1"),
            "DepthwiseSeparableConv_0": _dsconv(sd, f"{prefix}.net.1.0"),
            "Conv_1": _conv(sd, f"{prefix}.net.2.0"),
        }
    return {
        "Dense_0": _dense(sd, f"{prefix}.net.0"),
        "Dense_1": _dense(sd, f"{prefix}.net.3"),
    }


def _vit3d(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """reference ``ViT3D`` (:871-910; encoder :723-838) -> flax ViT3D.

    The qkv Linear packs channels as (h, d, qkv) on both sides, so Dense
    kernels transpose straight through."""
    out: Dict[str, Any] = {
        "DepthwiseSeparableConv_0": _dsconv(
            sd, f"{prefix}.patch_embedding.projection.0"),
        "positions": jnp.asarray(
            _np(sd[f"{prefix}.patch_embedding.positions"])),
    }
    d = 0
    while f"{prefix}.transformer_encoder.layers.{d}.block.0.fn.0.weight" in sd:
        p = f"{prefix}.transformer_encoder.layers.{d}.block"
        out[f"TransformerEncoderBlock_{d}"] = {
            "LayerNorm_0": _layer_norm(sd, f"{p}.0.fn.0"),
            "MultiHeadAttention_0": {
                "Dense_0": _dense(sd, f"{p}.0.fn.1.qkv"),
                "Dense_1": _dense(sd, f"{p}.0.fn.1.projection"),
            },
            "LayerNorm_1": _layer_norm(sd, f"{p}.1.fn.0"),
            "FeedForwardBlock_0": _feed_forward_block(sd, f"{p}.1.fn.1"),
        }
        d += 1
    assert d > 0, f"no transformer encoder layers found under {prefix}"
    out["LayerNorm_0"] = _layer_norm(sd, f"{prefix}.reconstruction.0")
    out["DepthwiseSeparableConv_1"] = _dsconv(sd, f"{prefix}.reconstruction.3")
    out["ChanLayerNorm_0"] = _chan_ln(sd, f"{prefix}.reconstruction.4")
    return out


def _attn_module(sd: Dict[str, Any], prefix: str,
                 att_type: str) -> Dict[str, Any]:
    """Convert one attention slot (``downs.{i}.2`` / ``mid_attn``): ViT3D is
    self-identifying by its keys; Linear vs SoftMax transformer blocks share
    a state-dict layout and map onto the flax child class chosen by
    ``att_type`` (the reference picks the class from the config the same
    way, :1392-1401)."""
    if f"{prefix}.patch_embedding.positions" in sd:
        return _vit3d(sd, prefix)
    cls = "LinearAttention" if att_type == "linear" else "SoftMaxAttention"
    out: Dict[str, Any] = {}
    d = 0
    while f"{prefix}.layers.{d}.0.norm.g" in sd:
        out[f"{cls}_{d}"] = _attention(sd, f"{prefix}.layers.{d}.0")
        out[f"ChanFeedForward_{d}"] = _chan_feed_forward(
            sd, f"{prefix}.layers.{d}.1")
        d += 1
    assert d > 0, f"no attention layers found under {prefix}"
    return out


def strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Select and strip ``prefix`` (e.g. ``unets.1.``) from a state dict."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_iqt_unet_state_dict(sd: Dict[str, Any],
                                att_type: str = "linear") -> Dict[str, Any]:
    """Reference ``Unet`` state dict -> flax ``{"params": ...}`` variables.

    The structure (level count, blocks per level, memory_efficient,
    cross-embed stem, attention slots, deconv vs pixel-shuffle upsample) is
    inferred from the keys themselves; ``att_type`` ('linear' | 'softmax')
    disambiguates the two transformer-block families, whose torch state
    dicts are key-identical (ViT3D self-identifies).
    """
    params: Dict[str, Any] = {}

    # --- stem ------------------------------------------------------------
    if "init_conv.weight" in sd:
        params["init_conv"] = _conv(sd, "init_conv")
    elif "init_conv.convs.0.weight" in sd:
        ce: Dict[str, Any] = {}
        i = 0
        while f"init_conv.convs.{i}.weight" in sd:
            ce[f"Conv_{i}"] = _conv(sd, f"init_conv.convs.{i}")
            i += 1
        params["init_conv"] = ce
    else:
        raise KeyError("no init_conv found in state dict")

    params["sinu_pos_emb"] = {
        "weights": jnp.asarray(_np(sd["to_time_hiddens.0.weights"]))
    }
    params["time_hidden"] = _dense(sd, "to_time_hiddens.1")
    params["time_cond"] = _dense(sd, "to_time_cond.0")

    # --- down path ---------------------------------------------------------
    n_down = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"downs\.(\d+)\.", k))
    )
    for i in range(n_down):
        if f"downs.{i}.0.1.weight" in sd:  # SP-conv pre-downsample
            params[f"down{i}_pre"] = {"Conv_0": _conv(sd, f"downs.{i}.0.1")}
        params[f"down{i}_init"] = _resnet_block(sd, f"downs.{i}.1")
        if any(k.startswith(f"downs.{i}.2.") for k in sd):
            params[f"down{i}_attn"] = _attn_module(
                sd, f"downs.{i}.2", att_type)
        b = 0
        while f"downs.{i}.3.{b}.block1.project.weight" in sd:
            params[f"down{i}_block{b}"] = _resnet_block(sd, f"downs.{i}.3.{b}")
            b += 1
        if f"downs.{i}.4.1.weight" in sd:  # SP-conv downsample Sequential
            params[f"down{i}_post"] = {"Conv_0": _conv(sd, f"downs.{i}.4.1")}
        elif f"downs.{i}.4.weight" in sd:  # plain 1x1 conv (last level)
            params[f"down{i}_post"] = _conv(sd, f"downs.{i}.4")

    # --- middle -------------------------------------------------------------
    if any(k.startswith("mid_attn.") for k in sd):
        params["mid_attn"] = _attn_module(sd, "mid_attn", att_type)
    if "mid_block.block1.project.weight" in sd:
        params["mid_block"] = _resnet_block(sd, "mid_block")

    # --- up path -------------------------------------------------------------
    n_up = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"ups\.(\d+)\.", k))
    )
    for i in range(n_up):
        if f"ups.{i}.0.net.0.weight" in sd:  # pixel-shuffle upsample
            params[f"up{i}_upsample"] = {"Conv_0": _conv(sd, f"ups.{i}.0.net.0")}
        elif f"ups.{i}.0.deconv.0.weight" in sd:  # Deconv3D upsample
            params[f"up{i}_upsample"] = _deconv_upsample(
                sd, f"ups.{i}.0.deconv.0")
        params[f"up{i}_init"] = _resnet_block(sd, f"ups.{i}.1")
        b = 0
        while f"ups.{i}.2.{b}.block1.project.weight" in sd:
            params[f"up{i}_block{b}"] = _resnet_block(sd, f"ups.{i}.2.{b}")
            b += 1

    # --- final ----------------------------------------------------------------
    if "final_res_block.block1.project.weight" in sd:
        params["final_res_block"] = _resnet_block(sd, "final_res_block")
    params["final_conv"] = _conv(sd, "final_conv")
    return {"params": params}


def convert_reference_checkpoint(
    obj: Any, unet_number: Optional[int] = None, use_ema: bool = False,
    att_type: str = "linear",
) -> Dict[str, Any]:
    """Convert a reference checkpoint object into flax UNet3D variables.

    Accepts, in order of probing (reference persistence formats):
      * a trainer bundle dict with ``model`` (and optionally ``ema``) keys
        (``/root/reference/trainer.py:813-878``);
      * a model-only dict with ``state_dict`` (+ ``config``)
        (``imagen_pytorch3D.py:1504-1536``);
      * a raw ``Imagen`` state dict (keys ``unets.{i}.*``) — pass
        ``unet_number`` (1-based) to pick the stage;
      * a raw ``Unet`` state dict.
    """
    sd = obj
    if isinstance(sd, dict) and "model" in sd and any(
        hasattr(v, "shape") or isinstance(v, np.ndarray)
        for v in (sd.get("model") or {}).values()
    ):
        if use_ema:
            if "ema" not in sd:
                raise KeyError(
                    "use_ema=True but the checkpoint has no 'ema' entry"
                )
            ema = sd["ema"]
            # A trainer bundle stores ema = self.ema_unets.state_dict(), an
            # nn.ModuleList of ema-pytorch EMA wrappers, so keys are
            # '{i}.ema_model.*' / '{i}.online_model.*'
            # (/root/reference/trainer.py:859, ema-pytorch EMA attrs). A
            # bare EMA wrapper state dict uses 'ema_model.*'.
            indices = sorted({
                int(m.group(1))
                for k in ema
                if (m := re.match(r"(\d+)\.ema_model\.", k))
            })
            prefixes = []
            if unet_number is not None:
                prefixes.append(f"{unet_number - 1}.ema_model.")
            elif len(indices) == 1:
                prefixes.append(f"{indices[0]}.ema_model.")
            elif indices:
                raise AssertionError(
                    f"EMA entry holds unets {indices}; pass unet_number "
                    "(1-based) to pick the stage"
                )
            prefixes.append("ema_model.")
            for prefix in prefixes:
                picked = {
                    k[len(prefix):]: v
                    for k, v in ema.items()
                    if k.startswith(prefix)
                }
                if picked:
                    sd = picked
                    break
            else:
                raise KeyError(
                    "use_ema=True but no '{i}.ema_model.*' / 'ema_model.*' "
                    f"keys found in the 'ema' entry (got e.g. "
                    f"{sorted(ema)[:3]}); refusing to silently fall back "
                    "to the online weights"
                )
            # the EMA wraps ONE unet — unet selection is done
            if not any(k.startswith("unets.") for k in sd):
                return convert_iqt_unet_state_dict(sd, att_type=att_type)
        else:
            sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if any(k.startswith("unets.") for k in sd):
        assert unet_number is not None, (
            "state dict holds a full Imagen; pass unet_number (1-based)"
        )
        sd = strip_prefix(sd, f"unets.{unet_number - 1}.")
    return convert_iqt_unet_state_dict(sd, att_type=att_type)


def reference_subvolume_permutation(factor: int = 3) -> np.ndarray:
    """Batch permutation mapping this repo's sub-volume ordering to the
    reference's.

    This repo splits volumes row-major over the (gx, gy, gz) grid:
    ``b_ours = (gx*f + gy)*f + gz`` (ops.volume.volume_to_subvolumes).
    The reference's unfold/permute pair (``utils_mine.py:25-67``) produces
    ``b_ref = (gz*f + gy)*f + gx`` — the *last* spatial axis slowest.
    Both are internal conventions (weights are ordering-independent; the
    merged volume is identical), but batch-aligned comparisons and any
    exchange of split tensors need this map:
    ``x_ours = x_ref[perm]`` and ``out_ref = out_ours[inverse]`` with
    ``perm[b_ours] = b_ref``.
    """
    f = factor
    perm = np.empty(f ** 3, np.int64)
    for gx in range(f):
        for gy in range(f):
            for gz in range(f):
                perm[(gx * f + gy) * f + gz] = (gz * f + gy) * f + gx
    return perm


def load_torch_checkpoint(path: str, **kwargs) -> Dict[str, Any]:
    """torch.load a reference ``.pt`` file and convert (CPU, weights only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return convert_reference_checkpoint(obj, **kwargs)
