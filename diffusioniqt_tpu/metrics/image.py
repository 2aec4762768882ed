"""Image quality metrics in jnp (SSIM / MS-SSIM / PSNR for 3D volumes).

Port of the reference's metric surface (``/root/reference/metrics.py:17-34``),
which wraps torchmetrics:
  * ``PSNR``  — min-max normalise pred and target independently, then PSNR
    with data_range=1.0 (metrics.py:17-21)
  * ``SSIM``  — kernel_size=3 gaussian-window SSIM (metrics.py:23-30)
  * ``MSSIM`` — multi-scale SSIM, torchmetrics defaults (metrics.py:32-34)

Implemented from the SSIM/MS-SSIM definitions (Wang et al.) so the values
match torchmetrics within fp32 tolerance. Volumes are channels-last
``(B, X, Y, Z, C)``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _min_max_norm(x: jnp.ndarray) -> jnp.ndarray:
    return (x - x.min()) / (x.max() - x.min())


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR over the full batch tensor (torchmetrics default reduction)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def PSNR(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Reference ``PSNR``: min-max normalise each input, data_range=1.0."""
    return psnr(_min_max_norm(pred), _min_max_norm(target), data_range=1.0)


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter3d(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable 3D gaussian filter on (B, X, Y, Z, C), VALID padding."""
    k = jnp.asarray(k1d)
    c = x.shape[-1]

    def conv_axis(v, axis):
        size = k.shape[0]
        # depthwise separable kernel: (kx, ky, kz, in_per_group=1, out=c)
        ks = [1, 1, 1]
        ks[axis - 1] = size
        kern = jnp.broadcast_to(
            k.reshape(ks + [1, 1]), tuple(ks) + (1, c)
        )
        return jax.lax.conv_general_dilated(
            v, kern, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )

    x = conv_axis(x, 1)
    x = conv_axis(x, 2)
    x = conv_axis(x, 3)
    return x


def ssim3d(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_contrast_sensitivity: bool = False,
):
    """Gaussian-window SSIM for 3D volumes (B, X, Y, Z, C)."""
    k1d = _gaussian_kernel1d(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter3d(pred, k1d)
    mu_y = _filter3d(target, k1d)
    mu_xx = _filter3d(pred * pred, k1d)
    mu_yy = _filter3d(target * target, k1d)
    mu_xy = _filter3d(pred * target, k1d)

    sigma_x = mu_xx - mu_x ** 2
    sigma_y = mu_yy - mu_y ** 2
    sigma_xy = mu_xy - mu_x * mu_y

    cs_map = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs_map

    ssim_val = ssim_map.mean()
    if return_contrast_sensitivity:
        return ssim_val, cs_map.mean()
    return ssim_val


def SSIM(pred, target, kernel_size: int = 3, data_range=None):
    """Reference ``SSIM``: kernel_size=3; when data_range is None both inputs
    are min-max normalised first (metrics.py:23-30)."""
    if data_range is None:
        pred = _min_max_norm(pred)
        target = _min_max_norm(target)
        data_range = 1.0
    return ssim3d(pred, target, data_range=data_range, kernel_size=kernel_size)


_MSSSIM_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool3d(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    ) / 8.0


def MSSIM(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    betas: Sequence[float] = _MSSSIM_BETAS,
) -> jnp.ndarray:
    """Multi-scale SSIM, torchmetrics defaults (reference metrics.py:32-34).

    Scales that would shrink the volume below the filter size are dropped
    (with the remaining beta weights renormalised) so small test volumes
    yield a defined value instead of NaN."""
    min_edge = min(pred.shape[1:4])
    if min_edge < kernel_size:
        kernel_size = max(3, min_edge if min_edge % 2 else min_edge - 1)
    feasible = 1
    while feasible < len(betas) and min_edge // (2 ** feasible) >= kernel_size:
        feasible += 1
    if feasible < len(betas):
        total = sum(betas[:feasible])
        betas = [b / total for b in betas[:feasible]]
    vals = []
    for i, beta in enumerate(betas):
        is_last = i == len(betas) - 1
        if is_last:
            s = ssim3d(pred, target, data_range=data_range,
                       kernel_size=kernel_size, sigma=sigma)
            vals.append(jnp.clip(s, 1e-6))
        else:
            _, cs = ssim3d(pred, target, data_range=data_range,
                           kernel_size=kernel_size, sigma=sigma,
                           return_contrast_sensitivity=True)
            vals.append(jnp.clip(cs, 1e-6))
            pred = _avg_pool3d(pred)
            target = _avg_pool3d(target)
    vals = jnp.stack(vals)
    betas = jnp.asarray(betas)
    return jnp.prod(vals ** betas)
