"""Shape tests for the video U-Net (pseudo-3D conv + temporal attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.models.unet_video import (
    PseudoConv3d,
    TemporalAttention,
    Unet3DVideo,
)


def test_pseudo_conv3d_identity_temporal_init():
    """The temporal factor must start as the identity (dirac intent)."""
    model = PseudoConv3d(dim_out=4, kernel_size=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 6, 6, 4))
    params = model.init(jax.random.PRNGKey(1), x)
    out_time = model.apply(params, x, ignore_time=False)
    out_no_time = model.apply(params, x, ignore_time=True)
    # identity temporal conv => same result with/without the temporal factor
    np.testing.assert_allclose(
        np.asarray(out_time), np.asarray(out_no_time), rtol=1e-5, atol=1e-5
    )


def test_temporal_attention_shape():
    model = TemporalAttention(dim=8, dim_head=4, heads=2)
    x = jnp.zeros((2, 4, 3, 3, 8))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == x.shape


def video_unet(**kwargs):
    defaults = dict(
        dim=8, dim_mults=(1, 2), num_resnet_blocks=1, channels=1,
        init_dim=8, resnet_groups=4, attn_dim_head=4, attn_heads=2,
        layer_attns=(False, True), layer_cross_attns=(False, True),
        init_cross_embed=False, init_conv_kernel_size=3,
        cond_on_text=True, text_embed_dim=16, max_text_len=8,
        attn_pool_num_latents=4, memory_efficient=False,
        temporal_strides=(1, 2), dtype=jnp.float32,
    )
    return Unet3DVideo(**{**defaults, **kwargs})


def _run(model, x, **kwargs):
    t = jnp.zeros((x.shape[0],), jnp.float32)
    params = jax.jit(model.init, static_argnames=("ignore_time",))(
        jax.random.PRNGKey(0), x, t, t, **kwargs
    )
    out = jax.jit(model.apply, static_argnames=("ignore_time",))(
        params, x, t, t, **kwargs
    )
    return out


@pytest.mark.slow
def test_video_unet_text_conditioned():
    model = video_unet()
    x = jnp.zeros((2, 4, 16, 16, 1))
    text = jnp.zeros((2, 6, 16))
    mask = jnp.ones((2, 6), bool)
    out = _run(model, x, text_embeds=text, text_mask=mask)
    assert out.shape == x.shape


@pytest.mark.slow
def test_video_unet_ignore_time_image_mode():
    model = video_unet(temporal_strides=(1, 1))
    x = jnp.zeros((1, 3, 16, 16, 1))  # 3 frames not divisible by anything
    text = jnp.zeros((1, 4, 16))
    out = _run(model, x, text_embeds=text, ignore_time=True)
    assert out.shape == x.shape


@pytest.mark.slow
def test_video_unet_lowres_cond():
    model = video_unet(lowres_cond=True, cond_on_text=False,
                       layer_cross_attns=(False, False))
    x = jnp.zeros((1, 4, 16, 16, 1))
    lowres = jnp.zeros_like(x)
    lowres_times = jnp.zeros((1,), jnp.float32)
    out = _run(model, x, lowres_cond_img=lowres,
               lowres_noise_times=lowres_times)
    assert out.shape == x.shape


def test_video_unet_cast_model_parameters():
    m = video_unet()
    m2 = m.cast_model_parameters(lowres_cond=True, channels=1, channels_out=1)
    assert m2.lowres_cond
