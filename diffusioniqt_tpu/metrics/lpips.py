"""LPIPS (Learned Perceptual Image Patch Similarity) in flax.

The reference uses ``torchmetrics`` VGG-LPIPS in two places:
  * as an auxiliary *training loss* over slice stacks extracted from the
    predicted / target volumes (``/root/reference/imagen_pytorch3D.py:
    1775-1778, 2372-2385`` — ``loss + 0.1 * lpips(slices(pred),
    slices(target))``);
  * as an *evaluation metric* over central slices of the stitched volume
    (``/root/reference/test_all.py:43, 68-81``).

This module re-implements the standard LPIPS formulation (Zhang et al. 2018,
"vgg" variant) natively in flax so both uses run inside jit on TPU:
VGG16 feature taps at relu1_2 .. relu5_3, channel-unit-normalized feature
differences, per-layer non-negative 1x1 "lin" heads, spatial mean, layer sum.

Pretrained VGG16 / lin weights cannot be fetched in this zero-egress image,
so the default is **fixed-seed random VGG features with uniform lin heads** —
a documented proxy (random-feature perceptual distances are rank-correlated
with trained ones; see e.g. "On the surprising effectiveness of random
features"). When a torch checkpoint IS available (torchvision VGG16
``features.*`` state dict and/or an ``lpips``/torchmetrics LPIPS state dict),
:func:`load_torch_vgg16` / :func:`load_torch_lpips` convert it so results
match the reference metric.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffusioniqt_tpu.metrics.perceptual import volume_to_slices

# (channels, num convs) per VGG16 block; taps after each block's last relu
_VGG16_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# torchvision ``features`` Sequential indices of the conv layers, per block
_TV_CONV_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))

# LPIPS ScalingLayer constants (Zhang et al. reference implementation)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk, returning the 5 standard LPIPS feature taps.

    Channels-last (N, H, W, 3) input. Conv parameter names are
    ``conv{block}_{i}`` so the torchvision converter can address them.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        for bi, (ch, n_convs) in enumerate(_VGG16_BLOCKS):
            if bi > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"conv{bi}_{ci}", dtype=self.dtype)(x)
                x = jax.nn.relu(x)
            feats.append(x)
        return feats


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable LPIPS distance over batches of (N, H, W, 3) images.

    ``normalize=True`` semantics (the reference's torchmetrics flag,
    test_all.py:43): inputs are expected in [0, 1] and mapped to [-1, 1]
    before the scaling layer.
    """

    def __init__(
        self,
        vgg_params=None,
        lin_weights: Optional[Sequence[np.ndarray]] = None,
        seed: int = 0,
        image_size: int = 224,
    ):
        self.net = VGG16Features()
        if vgg_params is None:
            x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            vgg_params = self.net.init(jax.random.PRNGKey(seed), x)
        self.vgg_params = vgg_params
        if lin_weights is None:
            # uniform average over channels (the "lpips=False / baseline"
            # variant of the original paper) — used when no trained lin
            # heads are available
            lin_weights = [
                jnp.full((ch,), 1.0 / ch, jnp.float32)
                for ch, _ in _VGG16_BLOCKS
            ]
        self.lin_weights = [jnp.asarray(w, jnp.float32) for w in lin_weights]

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Mean LPIPS distance between image batches ``a`` and ``b``."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def prep(x):
            x = x.astype(jnp.float32) * 2.0 - 1.0  # normalize=True
            return (x - shift) / scale

        fa = self.net.apply(self.vgg_params, prep(a))
        fb = self.net.apply(self.vgg_params, prep(b))
        total = jnp.zeros(a.shape[0], jnp.float32)
        for xa, xb, w in zip(fa, fb, self.lin_weights):
            d = jnp.square(_unit_normalize(xa) - _unit_normalize(xb))
            # non-negative 1x1 lin head + spatial mean
            per_px = jnp.einsum("nhwc,c->nhw", d, jnp.maximum(w, 0.0))
            total = total + per_px.mean(axis=(1, 2))
        return total.mean()


# ---------------------------------------------------------------------------
# torch checkpoint converters
# ---------------------------------------------------------------------------

def load_torch_vgg16(state_dict) -> dict:
    """Convert a torchvision VGG16 ``features.*`` state dict (or a full
    VGG16 state dict containing those keys) into :class:`VGG16Features`
    flax params.

    torch conv weights are (out, in, kh, kw); flax wants (kh, kw, in, out).
    """
    params = {}
    for bi, idxs in enumerate(_TV_CONV_IDX):
        for ci, tv_idx in enumerate(idxs):
            for prefix in (f"features.{tv_idx}", str(tv_idx),
                           f"net.slice{bi + 1}.{tv_idx}"):
                wk, bk = f"{prefix}.weight", f"{prefix}.bias"
                if wk in state_dict:
                    w = np.asarray(state_dict[wk], np.float32)
                    b = np.asarray(state_dict[bk], np.float32)
                    params[f"conv{bi}_{ci}"] = {
                        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "bias": jnp.asarray(b),
                    }
                    break
        if f"conv{bi}_0" not in params:
            raise KeyError(
                f"VGG16 block {bi} conv weights not found in state dict"
            )
    return {"params": params}


def load_torch_lpips(state_dict) -> List[np.ndarray]:
    """Extract the 5 trained LPIPS ``lin`` head weights from an ``lpips``
    package / torchmetrics LPIPS state dict (keys ``lin{i}.model.1.weight``
    with shape (1, C, 1, 1))."""
    out = []
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                    f"net.lin{i}.model.1.weight"):
            if key in state_dict:
                w = np.asarray(state_dict[key], np.float32).reshape(-1)
                out.append(w)
                break
        else:
            raise KeyError(f"LPIPS lin{i} weights not found in state dict")
    return out


def lpips_from_torch_checkpoint(path: str) -> LPIPS:
    """Build an :class:`LPIPS` from a ``.pt``/``.pth`` file holding VGG16
    features and (optionally) trained lin heads."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    vgg_params = load_torch_vgg16(sd)
    try:
        lin = load_torch_lpips(sd)
    except KeyError:
        lin = None
    return LPIPS(vgg_params=vgg_params, lin_weights=lin)


# ---------------------------------------------------------------------------
# volume-level entry points (training loss + evaluation metric)
# ---------------------------------------------------------------------------

def make_lpips_fn(weights_path: Optional[str] = None, seed: int = 0,
                  target_size: int = 224):
    """Training-loss LPIPS over volumes (reference
    ``imagen_pytorch3D.py:2372-2385``): extract slice stacks from pred and
    target with :func:`volume_to_slices` and return the mean LPIPS distance.

    Jit/grad-compatible (pure jnp); plugged into ``Imagen(lpips_fn=...)``.
    """
    model = (lpips_from_torch_checkpoint(weights_path)
             if weights_path else LPIPS(seed=seed, image_size=target_size))

    def lpips_fn(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred_rgb = volume_to_slices(pred, target_size=target_size)
        target_rgb = volume_to_slices(
            jax.lax.stop_gradient(target), target_size=target_size
        )
        return model(pred_rgb, target_rgb)

    return lpips_fn


def lpips_volume_metric(gt: np.ndarray, pred: np.ndarray,
                        model: Optional[LPIPS] = None) -> float:
    """Evaluation-side slice-wise LPIPS over a full stitched volume
    (reference ``test_all.py:68-81``): central +/-40 window sampled every 10
    slices along axis 1, each slice min-max normalized and stacked to RGB.
    """
    if model is None:
        model = LPIPS()
    gt = np.asarray(gt, np.float32)
    pred = np.asarray(pred, np.float32)
    n = gt.shape[1]
    half_window = min(40, n // 2)
    start = max(n // 2 - half_window, 0)
    end = min(n // 2 + half_window, n)
    vals = []
    for idx in range(start, end, 10):
        g = gt[:, idx]
        p = pred[:, idx]
        g = (g - g.min()) / (g.max() - g.min() + 1e-12)
        p = (p - p.min()) / (p.max() - p.min() + 1e-12)
        g_rgb = jnp.asarray(np.stack((g,) * 3, axis=-1))[None]
        p_rgb = jnp.asarray(np.stack((p,) * 3, axis=-1))[None]
        vals.append(float(model(g_rgb, p_rgb)))
    return float(np.mean(vals)) if vals else float("nan")
