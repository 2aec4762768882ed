"""Numerical parity against PyTorch (CPU) for the core compute blocks.

The reference is pure torch; these tests port weights between torch modules
and our flax modules and require fp32 agreement — the 'match the reference
within fp32 tolerance' contract (SURVEY.md §7) at the op level:

  GroupNorm / Mish / Conv3d / the full Block / pixel-shuffle / SE.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diffusioniqt_tpu.models.blocks import Block, SE3D
from diffusioniqt_tpu.ops.volume import (
    from_torch_layout,
    pixel_shuffle_3d,
    to_torch_layout,
)
from diffusioniqt_tpu.utils.misc import mish


def _np(x):
    return np.asarray(x, np.float32)


def test_mish_matches_torch():
    x = np.random.default_rng(0).standard_normal((64,)).astype(np.float32)
    want = torch.nn.functional.mish(torch.tensor(x)).numpy()
    got = _np(mish(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv3d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 8, 8, 8)).astype(np.float32)  # NCDHW
    w = rng.standard_normal((6, 4, 3, 3, 3)).astype(np.float32) * 0.2
    b = rng.standard_normal((6,)).astype(np.float32)

    tconv = torch.nn.Conv3d(4, 6, 3, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(w))
        tconv.bias.copy_(torch.tensor(b))
        want = tconv(torch.tensor(x)).numpy()

    # flax kernel layout: (kx, ky, kz, in, out); torch: (out, in, kx, ky, kz)
    kernel = jnp.transpose(jnp.asarray(w), (2, 3, 4, 1, 0))
    xj = from_torch_layout(jnp.asarray(x))
    out = jax.lax.conv_general_dilated(
        xj, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + jnp.asarray(b)
    got = _np(to_torch_layout(out))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 16, 4, 4, 4)).astype(np.float32)
    g = rng.standard_normal((16,)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)

    tgn = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.tensor(g))
        tgn.bias.copy_(torch.tensor(b))
        want = tgn(torch.tensor(x)).numpy()

    from diffusioniqt_tpu.models.blocks import subvol_group_norm

    xj = from_torch_layout(jnp.asarray(x))
    out = subvol_group_norm(xj, jnp.asarray(g), 1, 4) + jnp.asarray(b)
    got = _np(to_torch_layout(out))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_block_matches_torch_composition():
    """Full Block (GN -> scale-shift -> Mish -> Conv3d) vs the torch
    composition the reference uses (imagen_pytorch3D.py:535-566)."""
    rng = np.random.default_rng(3)
    cin, cout = 8, 8
    x = rng.standard_normal((2, cin, 6, 6, 6)).astype(np.float32)
    scale = rng.standard_normal((2, cout)).astype(np.float32) * 0.1
    shift = rng.standard_normal((2, cout)).astype(np.float32) * 0.1

    block = Block(dim_out=cout, groups=4, dtype=jnp.float32)
    xj = from_torch_layout(jnp.asarray(x))
    ss = (jnp.asarray(scale)[:, None, None, None, :],
          jnp.asarray(shift)[:, None, None, None, :])
    params = block.init(jax.random.PRNGKey(0), xj, scale_shift=ss)
    got = _np(to_torch_layout(block.apply(params, xj, scale_shift=ss)))

    # torch composition with the same weights
    g = _np(params["params"]["norm_scale"])
    gb = _np(params["params"]["norm_bias"])
    kernel = _np(params["params"]["Conv_0"]["kernel"])  # (3,3,3,in,out)
    bias = _np(params["params"]["Conv_0"]["bias"])

    tx = torch.tensor(x)
    tgn = torch.nn.GroupNorm(4, cin, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.tensor(g))
        tgn.bias.copy_(torch.tensor(gb))
        h = tgn(tx)
        h = h * (torch.tensor(scale)[:, :, None, None, None] + 1) + \
            torch.tensor(shift)[:, :, None, None, None]
        h = torch.nn.functional.mish(h)
        tconv = torch.nn.Conv3d(cin, cout, 3, padding=1)
        tconv.weight.copy_(torch.tensor(kernel).permute(4, 3, 0, 1, 2))
        tconv.bias.copy_(torch.tensor(bias))
        want = tconv(h).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pixel_shuffle_matches_torch_3d_formula():
    """pixel_shuffle_3d vs the reference PixelShuffle3D view/permute
    (imagen_pytorch3D.py:427-439) executed in torch."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 3, 3, 3)).astype(np.float32)  # NCDHW

    t = torch.tensor(x)
    b, c, d, h, w = t.shape
    scale = 2
    n_out = c // scale ** 3
    view = t.contiguous().view(b, n_out, scale, scale, scale, d, h, w)
    want = view.permute(0, 1, 5, 2, 6, 3, 7, 4).contiguous().view(
        b, n_out, d * scale, h * scale, w * scale
    ).numpy()

    xj = from_torch_layout(jnp.asarray(x))
    got = _np(to_torch_layout(pixel_shuffle_3d(xj, 2)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_se3d_matches_torch():
    rng = np.random.default_rng(5)
    c = 32
    x = rng.standard_normal((2, c, 4, 4, 4)).astype(np.float32)

    se = SE3D(reduction=16, dtype=jnp.float32)
    xj = from_torch_layout(jnp.asarray(x))
    params = se.init(jax.random.PRNGKey(0), xj)
    got = _np(to_torch_layout(se.apply(params, xj)))

    w1 = _np(params["params"]["Dense_0"]["kernel"])  # (c, c//16)
    w2 = _np(params["params"]["Dense_1"]["kernel"])  # (c//16, c)
    t = torch.tensor(x)
    y = t.mean(dim=(2, 3, 4))
    y = torch.relu(y @ torch.tensor(w1))
    y = torch.sigmoid(y @ torch.tensor(w2))
    want = (t * y[:, :, None, None, None]).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
