"""MedicalNet 3D perceptual loss — faithful backbone + weight converter.

The reference's ``MedPercept`` (``/root/reference/percept_loss.py:104-126``)
loads the MedicalNet (Med3D) ResNet-10 checkpoint
``resnet_10_23dataset.pth`` and sums L1 feature distances at
[post-relu(conv1), layer1, layer2] plus Gram-style L1 at [conv1, bn1]
(``percept_loss.py:29-103``). That external checkpoint cannot be fetched in
this image, so this module provides:

  * :class:`MedicalNetResNet10` — the Med3D ResNet-10 trunk in flax
    (conv1 7^3/s2 -> BN -> relu -> maxpool 3^3/s2 -> BasicBlock x4 with
    type-B downsample), with BatchNorm folded to eval-mode per-channel
    affine (the reference always runs it in ``.eval()``);
  * :func:`load_medicalnet_state_dict` — converts the torch checkpoint
    (handles the ``module.`` DataParallel prefix the reference strips,
    percept_loss.py:115-118) into flax params, folding BN running stats;
  * :class:`MedicalNetPerceptual` — the loss with the reference's wired
    call semantics (optional 2x trilinear resize, feature taps
    {relu1, layer1, layer2}; Gram taps opt-in — the reference passes
    ``style_layers=[]``, percept_loss.py:122-126).

With no checkpoint, fixed-seed random weights give a documented
random-feature perceptual proxy (as metrics.perceptual).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_BN_EPS = 1e-5


class _Affine(nn.Module):
    """Eval-mode BatchNorm as per-channel scale/bias."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _max_pool_3d(x, window=3, stride=2, pad=1):
    return nn.max_pool(
        x, (window,) * 3, strides=(stride,) * 3,
        padding=[(pad, pad)] * 3,
    )


class _BasicBlock(nn.Module):
    """Med3D BasicBlock: conv3-bn-relu-conv3-bn (+ type-B downsample)."""

    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        # explicit (1,1) padding: flax "SAME" at stride 2 pads (0,1) on even
        # extents, shifting windows by one voxel vs torch's padding=1
        y = nn.Conv(self.filters, (3, 3, 3), strides=(self.strides,) * 3,
                    padding=[(1, 1)] * 3, use_bias=False, name="conv1")(x)
        y = _Affine(name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.filters, (3, 3, 3), padding="SAME", use_bias=False,
                    name="conv2")(y)
        y = _Affine(name="bn2")(y)
        if self.strides != 1 or x.shape[-1] != self.filters:
            residual = nn.Conv(self.filters, (1, 1, 1),
                               strides=(self.strides,) * 3, use_bias=False,
                               name="downsample_conv")(x)
            residual = _Affine(name="downsample_bn")(residual)
        return jax.nn.relu(y + residual)


class MedicalNetResNet10(nn.Module):
    """Med3D ResNet-10 trunk; returns the reference's 6 block outputs
    [conv1, bn1, relu1, maxpool, layer1, layer2] (+ optional layer3/4)."""

    num_layers: int = 2  # layers used by the reference loss

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        x = nn.Conv(64, (7, 7, 7), strides=(2, 2, 2), padding=[(3, 3)] * 3,
                    use_bias=False, name="conv1")(x)
        outs.append(x)
        x = _Affine(name="bn1")(x)
        outs.append(x)
        x = jax.nn.relu(x)
        outs.append(x)
        x = _max_pool_3d(x)
        outs.append(x)
        for i, (filters, strides) in enumerate(
            ((64, 1), (128, 2), (256, 2), (512, 2))[: self.num_layers]
        ):
            x = _BasicBlock(filters, strides, name=f"layer{i + 1}")(x)
            outs.append(x)
        return outs


def _fold_bn(sd: Dict[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    rm = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    rv = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = w / np.sqrt(rv + _BN_EPS)
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(b - rm * scale)}


def _conv(sd: Dict[str, Any], key: str) -> Dict[str, jnp.ndarray]:
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    return {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}


def load_medicalnet_state_dict(sd: Dict[str, Any],
                               num_layers: int = 2) -> Dict[str, Any]:
    """MedicalNet ``resnet_10_23dataset.pth`` state dict -> flax params.

    Accepts the raw checkpoint dict (with ``state_dict`` key), the
    DataParallel-prefixed form (``module.*``), or a plain state dict.
    """
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    params: Dict[str, Any] = {
        "conv1": _conv(sd, "conv1"),
        "bn1": _fold_bn(sd, "bn1"),
    }
    for i in range(num_layers):
        name = f"layer{i + 1}"
        block = {
            "conv1": _conv(sd, f"{name}.0.conv1"),
            "bn1": _fold_bn(sd, f"{name}.0.bn1"),
            "conv2": _conv(sd, f"{name}.0.conv2"),
            "bn2": _fold_bn(sd, f"{name}.0.bn2"),
        }
        if f"{name}.0.downsample.0.weight" in sd:
            block["downsample_conv"] = _conv(sd, f"{name}.0.downsample.0")
            block["downsample_bn"] = _fold_bn(sd, f"{name}.0.downsample.1")
        params[name] = block
    return {"params": params}


class MedicalNetPerceptual:
    """The reference loss (percept_loss.py:78-103): optional 2x trilinear
    resize, L1 feature taps at blocks {2, 4, 5} (relu1, layer1, layer2) and
    optional L1 Gram taps. Input (B, X, Y, Z, 1).

    ``style_layers`` defaults to ``()`` because the reference's wired call
    path (``MedPercept.forward`` -> ``MedPerceptualLoss``,
    percept_loss.py:122-126) passes ``style_layers=[]`` — its loss carries
    no Gram terms. Pass ``style_layers=(0, 1)`` for the conv1/bn1 Gram taps
    that ``MedPerceptualLoss`` *supports* but never receives."""

    def __init__(self, params=None, resize: bool = True, seed: int = 0,
                 input_size: int = 32, num_layers: int = 2,
                 style_layers: tuple = ()):
        self.model = MedicalNetResNet10(num_layers=num_layers)
        if params is None:
            x = jnp.zeros((1, input_size, input_size, input_size, 1))
            params = self.model.init(jax.random.PRNGKey(seed), x)
        self.params = params
        self.resize = resize
        self.style_layers = tuple(style_layers)

    @staticmethod
    def _gram(feat: jnp.ndarray) -> jnp.ndarray:
        b, c = feat.shape[0], feat.shape[-1]
        flat = feat.reshape(b, -1, c)
        return jnp.einsum("bnc,bnd->bcd", flat, flat)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.resize:
            size = pred.shape[1] * 2
            shape = (pred.shape[0],) + (size,) * 3 + (pred.shape[-1],)
            pred = jax.image.resize(pred, shape, "trilinear")
            target = jax.image.resize(target, shape, "trilinear")
        f_pred = self.model.apply(self.params, pred)
        f_tgt = self.model.apply(
            self.params, jax.lax.stop_gradient(target)
        )
        loss = jnp.zeros(())
        for i in (2, 4, 5):  # relu1, layer1, layer2
            loss = loss + jnp.mean(jnp.abs(f_pred[i] - f_tgt[i]))
        for i in self.style_layers:  # e.g. (0, 1) = conv1, bn1 Gram
            loss = loss + jnp.mean(
                jnp.abs(self._gram(f_pred[i]) - self._gram(f_tgt[i]))
            )
        return loss


def medicalnet_perceptual_from_checkpoint(path: str,
                                          resize: bool = True):
    """Build the loss from a torch MedicalNet checkpoint file."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in (sd.get("state_dict", sd)).items()}
    return MedicalNetPerceptual(params=load_medicalnet_state_dict(sd),
                                resize=resize)
