"""Property tests for image metrics (no torchmetrics in this image, so we
verify definitional properties and closed-form cases)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusioniqt_tpu.metrics.image import MSSIM, PSNR, SSIM, psnr, ssim3d


def test_psnr_known_value():
    pred = jnp.zeros((1, 8, 8, 8, 1))
    target = jnp.full((1, 8, 8, 8, 1), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
    np.testing.assert_allclose(float(psnr(pred, target)), 20.0, rtol=1e-5)


def test_PSNR_minmax_invariance():
    """Reference PSNR min-max normalises both inputs, so affine rescaling of
    either input leaves it unchanged."""
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (1, 8, 8, 8, 1))
    b = a + 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
    v1 = float(PSNR(a, b))
    v2 = float(PSNR(a * 3 + 7, b))
    np.testing.assert_allclose(v1, v2, rtol=1e-4)


def test_ssim_identity_is_one():
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 12, 12, 12, 1))
    assert float(ssim3d(x, x, kernel_size=3)) > 0.9999


def test_ssim_decreases_with_noise():
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 16, 1))
    small = x + 0.01 * jax.random.normal(jax.random.PRNGKey(4), x.shape)
    big = x + 0.3 * jax.random.normal(jax.random.PRNGKey(5), x.shape)
    s_small = float(ssim3d(small, x, kernel_size=3))
    s_big = float(ssim3d(big, x, kernel_size=3))
    assert s_small > s_big


def test_SSIM_reference_api():
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 12, 12, 12, 1))
    v = float(SSIM(x, x))
    assert v > 0.999


def test_mssim_identity():
    # needs >= 11 * 2^4 = 176? No: each scale halves; with 5 scales the last
    # scale needs >= kernel 11 -> start at 11*16 = 176 is too big for a unit
    # test; use kernel_size 3 so 3*16=48 suffices.
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 48, 48, 48, 1))
    v = float(MSSIM(x, x, kernel_size=3))
    assert v > 0.999


def test_mssim_orders_quality():
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 48, 48, 48, 1))
    near = x + 0.02 * jax.random.normal(jax.random.PRNGKey(9), x.shape)
    far = x + 0.5 * jax.random.normal(jax.random.PRNGKey(10), x.shape)
    assert float(MSSIM(near, x, kernel_size=3)) > float(MSSIM(far, x, kernel_size=3))
