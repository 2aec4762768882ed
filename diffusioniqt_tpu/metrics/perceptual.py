"""Perceptual losses (reference ``percept_loss.py`` + the 2D VGG-LPIPS path).

The reference offers two perceptual terms:
  * 2D VGG LPIPS over extracted slices (imagen_pytorch3D.py:1775-1778,
    :2372-2385 — torchmetrics LPIPS)
  * 3D MedicalNet-ResNet10 perceptual + Gram style loss
    (percept_loss.py:30-126; requires an external pretrained checkpoint and
    is disabled in the reference configs, imagen_pytorch3D.py:1779-1783)

Both depend on pretrained weights this zero-egress image cannot fetch, so:
  * ``MedPerceptualLoss`` is a full flax 3D ResNet-10 feature pyramid +
    perceptual/Gram loss. Pass pretrained params when available; otherwise
    random (fixed-seed) features — a known-valid perceptual proxy
    (random-feature perceptual losses are well-studied) clearly labelled.
  * ``volume_to_slices`` reproduces the reference's 3D→stacked-2D-RGB slice
    extraction (utils_mine.py:69-101) so a torch VGG-LPIPS can be plugged in
    where weights exist.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class _BasicBlock3D(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3, 3), strides=(self.strides,) * 3,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.filters, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1, 1),
                               strides=(self.strides,) * 3, use_bias=False,
                               dtype=self.dtype)(residual)
        return jax.nn.relu(y + residual)


class ResNet10Features(nn.Module):
    """3D ResNet-10 feature pyramid (MedicalNet-style backbone,
    reference percept_loss.py:30-80)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        x = nn.Conv(64, (7, 7, 7), strides=(2, 2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        feats.append(x)
        for filters, strides in ((64, 1), (128, 2), (256, 2), (512, 2)):
            x = _BasicBlock3D(filters, strides, dtype=self.dtype)(x)
            feats.append(x)
        return feats


def _gram(feat: jnp.ndarray) -> jnp.ndarray:
    b = feat.shape[0]
    c = feat.shape[-1]
    flat = feat.reshape(b, -1, c)
    n = flat.shape[1]
    return jnp.einsum("bnc,bnd->bcd", flat, flat) / n


class MedPerceptualLoss:
    """3D perceptual + optional Gram style loss (reference ``MedPercept``,
    percept_loss.py:104-126)."""

    def __init__(self, params=None, style_weight: float = 0.0,
                 seed: int = 0, input_size: int = 32):
        self.model = ResNet10Features()
        if params is None:
            x = jnp.zeros((1, input_size, input_size, input_size, 1))
            params = self.model.init(jax.random.PRNGKey(seed), x)
        self.params = params
        self.style_weight = style_weight

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        f_pred = self.model.apply(self.params, pred)
        f_tgt = self.model.apply(self.params, jax.lax.stop_gradient(target))
        loss = jnp.zeros(())
        for a, b in zip(f_pred, f_tgt):
            loss = loss + jnp.mean((a - b) ** 2)
            if self.style_weight > 0:
                loss = loss + self.style_weight * jnp.mean(
                    (_gram(a) - _gram(b)) ** 2
                )
        return loss / len(f_pred)


def volume_to_slices(volume: jnp.ndarray, target_size: int = 224) -> jnp.ndarray:
    """3D volume -> stacked 3-channel 2D slices for 2D LPIPS (reference
    ``volume_to_slices``, utils_mine.py:69-101). Input (B, X, Y, Z, 1);
    output (N, target, target, 3)."""
    slices = []
    depth = volume.shape[3]
    for d in range(0, depth - 2, 9):
        coronal = jnp.concatenate(
            [volume[:, :, :, d + i, :] for i in range(3)], axis=-1
        )  # (B, X, Y, 3)
        sagittal = jnp.concatenate(
            [volume[:, :, d + i, :, 0:1] for i in range(3)], axis=-1
        )  # (B, X, Z, 3)
        for s in (coronal, sagittal):
            s = (s - s.min()) / (s.max() - s.min() + 1e-8)
            s = jax.image.resize(
                s, (s.shape[0], target_size, target_size, 3), "bilinear"
            )
            slices.append(s)
    return jnp.concatenate(slices, axis=0)
