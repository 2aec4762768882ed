"""Round-trip and golden tests for the patch geometry ops (SURVEY.md §4:
'stitching round-trip tests: convertVolume2subVolume ∘ merge_sub_volumes = id')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.ops.volume import (
    boundary_halo,
    halo_exchange,
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
    resize_volume,
    subvolumes_to_volume,
    upsample_trilinear,
    volume_to_subvolumes,
)


@pytest.mark.slow
def test_halo_exchange_matches_boundary_halo():
    """Both fast halo variants must equal the reference merge->pad->unfold
    halo (boundary_pad, imagen_pytorch3D.py:37-46)."""
    from diffusioniqt_tpu.ops.volume import (
        _halo_exchange_dus,
        _halo_exchange_roll,
    )

    for b_groups in (1, 2, 4):
        x = jax.random.normal(jax.random.PRNGKey(5), (27 * b_groups, 4, 4, 4, 3))
        ref = boundary_halo(x, factor=3, halo=1)
        for fn in (halo_exchange, _halo_exchange_dus, _halo_exchange_roll):
            got = fn(x, 3)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_split_merge_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 6, 3))
    sub = volume_to_subvolumes(x, factor=3)
    assert sub.shape == (2 * 27, 2, 2, 2, 3)
    back = subvolumes_to_volume(sub, factor=3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_merge_split_roundtrip():
    sub = jax.random.normal(jax.random.PRNGKey(1), (27, 4, 4, 4, 2))
    full = subvolumes_to_volume(sub, factor=3)
    assert full.shape == (1, 12, 12, 12, 2)
    back = volume_to_subvolumes(full, factor=3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(sub))


def test_split_block_content():
    """Sub-volume b=(gx*f+gy)*f+gz must equal the corresponding slice."""
    f, s = 3, 4
    vol = jnp.arange(1 * (f * s) ** 3 * 1, dtype=jnp.float32).reshape(
        1, f * s, f * s, f * s, 1
    )
    sub = volume_to_subvolumes(vol, factor=f)
    for gx in range(f):
        for gy in range(f):
            for gz in range(f):
                b = (gx * f + gy) * f + gz
                want = vol[0, gx * s:(gx + 1) * s, gy * s:(gy + 1) * s, gz * s:(gz + 1) * s]
                np.testing.assert_array_equal(np.asarray(sub[b]), np.asarray(want))


def test_boundary_halo_matches_manual():
    """Halo blocks must equal overlapping slices of the zero-padded volume
    (reference boundary_pad semantics, imagen_pytorch3D.py:37-46)."""
    f, s = 3, 4
    vol = jax.random.normal(jax.random.PRNGKey(2), (1, f * s, f * s, f * s, 2))
    sub = volume_to_subvolumes(vol, factor=f)
    halo = boundary_halo(sub, factor=f, halo=1)
    assert halo.shape == (27, s + 2, s + 2, s + 2, 2)

    padded = jnp.pad(vol, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    for gx in range(f):
        for gy in range(f):
            for gz in range(f):
                b = (gx * f + gy) * f + gz
                want = padded[
                    0,
                    gx * s:gx * s + s + 2,
                    gy * s:gy * s + s + 2,
                    gz * s:gz * s + s + 2,
                ]
                np.testing.assert_array_equal(np.asarray(halo[b]), np.asarray(want))


def test_boundary_halo_interior_continuity():
    """Interior seams see *real* neighbour voxels, not zeros."""
    f, s = 3, 4
    vol = jnp.ones((1, f * s, f * s, f * s, 1))
    sub = volume_to_subvolumes(vol, factor=f)
    halo = boundary_halo(sub, factor=f, halo=1)
    # center block (1,1,1) is fully interior: its halo is all ones
    b = (1 * f + 1) * f + 1
    np.testing.assert_array_equal(np.asarray(halo[b]), 1.0)
    # corner block (0,0,0) has zero-padding on the low faces
    assert float(halo[0, 0, 0, 0, 0]) == 0.0
    assert float(halo[0, 1, 1, 1, 0]) == 1.0


def test_boundary_equivalence_same_conv_on_merged():
    """The load-bearing identity behind the fast boundary path:
    VALID conv on halo blocks == SAME conv on the merged volume, re-split.
    (reference boundary_pad + VALID conv, imagen_pytorch3D.py:37-46,551-566
    vs. models.blocks.Block merged mode)."""
    f, s, c = 3, 4, 2
    key = jax.random.PRNGKey(7)
    sub = jax.random.normal(key, (f ** 3, s, s, s, c))
    kernel = jax.random.normal(jax.random.PRNGKey(8), (3, 3, 3, c, 5))

    def conv(x, padding):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    # reference formulation: halo + VALID per sub-volume
    halo = boundary_halo(sub, factor=f, halo=1)
    ref = conv(halo, "VALID")

    # fast formulation: SAME conv on merged, split back
    merged = subvolumes_to_volume(sub, factor=f)
    fast = volume_to_subvolumes(conv(merged, "SAME"), factor=f)

    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pixel_shuffle_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 4, 16))
    up = pixel_shuffle_3d(x, scale=2)
    assert up.shape == (2, 8, 8, 8, 2)
    back = pixel_unshuffle_3d(up, scale=2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pixel_shuffle_constant_channels():
    """A channel block that is constant across the r^3 sub-positions maps to
    a constant spatial block."""
    x = jnp.zeros((1, 2, 2, 2, 8))
    x = x.at[..., :].set(jnp.arange(8, dtype=jnp.float32))
    x = jnp.where(jnp.arange(8) < 8, 5.0, 0.0) * jnp.ones((1, 2, 2, 2, 8))
    up = pixel_shuffle_3d(x, scale=2)
    np.testing.assert_array_equal(np.asarray(up), 5.0)


def test_resize_volume_identity_and_shape():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 8, 1))
    same = resize_volume(x, 8)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))
    up = resize_volume(x, 16, method="trilinear")
    assert up.shape == (1, 16, 16, 16, 1)


def test_upsample_trilinear_align_corners_linear_ramp():
    """align_corners interpolation of a linear ramp stays linear and keeps
    endpoint values."""
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1, 1)
    x = jnp.broadcast_to(x, (1, 4, 2, 2, 1))
    up = upsample_trilinear(x, scale=2, align_corners=True)
    got = np.asarray(up[0, :, 0, 0, 0])
    want = np.linspace(0.0, 3.0, 8, dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
