"""Cascade smoke: text-conditional video U-Net inside the EDM wrapper
(the reference's elucidated + imagen_video pairing, SURVEY.md §2 rows 11-12).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen
from diffusioniqt_tpu.models.unet_video import Unet3DVideo
from diffusioniqt_tpu.utils.t5 import hash_text_encode


def tiny_video_unet(**kwargs):
    defaults = dict(
        dim=8, dim_mults=(1, 2), num_resnet_blocks=1, channels=1,
        init_dim=8, resnet_groups=4, attn_dim_head=4, attn_heads=2,
        layer_attns=(False, False), layer_cross_attns=(False, True),
        init_cross_embed=False, init_conv_kernel_size=3,
        cond_on_text=True, text_embed_dim=16, max_text_len=8,
        attn_pool_num_latents=4, temporal_strides=(1, 1),
        dtype=jnp.float32,
    )
    return Unet3DVideo(**{**defaults, **kwargs})


@pytest.fixture(scope="module")
def video_edm():
    edm = ElucidatedImagen(
        unets=[tiny_video_unet()],
        image_sizes=(16,),
        channels=1,
        cond_drop_prob=0.0,
        auto_normalize_img=True,
        num_sample_steps=3,
        dynamic_thresholding=False,
        norm="min-max",
    )
    # init with video-shaped inputs
    unet = edm.unets[0]
    x = jnp.zeros((1, 4, 16, 16, 1))
    t = jnp.zeros((1,))
    text = jnp.zeros((1, 8, 16))
    params = [jax.jit(unet.init)(jax.random.PRNGKey(0), x, t, t,
                                 text_embeds=text)]
    return edm, params


def test_video_edm_training_loss(video_edm):
    edm, params = video_edm
    key = jax.random.PRNGKey(1)
    videos = jax.random.uniform(key, (1, 4, 16, 16, 1))
    emb, mask = hash_text_encode(["a brain mri"], dim=16, max_length=8,
                                 return_attn_mask=True)
    loss = edm.forward(params, key, videos, unet_number=1,
                       text_embeds=jnp.asarray(emb),
                       text_mask=jnp.asarray(mask))
    assert jnp.isfinite(loss)


def test_video_edm_sampling(video_edm):
    edm, params = video_edm
    emb, mask = hash_text_encode(["a brain mri"], dim=16, max_length=8,
                                 return_attn_mask=True)
    out = edm.sample(
        params, jax.random.PRNGKey(2), batch_size=1, video_frames=4,
        text_embeds=jnp.asarray(emb), text_mask=jnp.asarray(mask),
    )
    assert out.shape == (1, 4, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
