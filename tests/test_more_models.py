"""2D U-Net, EDM trainer path, model-config factories, pallas kernels
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.models.unet2d import UNet2D


def test_unet2d_shapes():
    model = UNet2D(dim=8, dim_mults=(1, 2), num_resnet_blocks=1, channels=1,
                   init_dim=8, resnet_groups=4, lowres_cond=True,
                   layer_attns=(False, True), att_type="linear",
                   attn_heads=2, attn_dim_head=4, dtype=jnp.float32)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, t,
                                 lowres_cond_img=x)
    out = jax.jit(model.apply)(params, x, t, t, lowres_cond_img=x)
    assert out.shape == (2, 16, 16, 1)
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_unet2d_in_imagen_2d_mode():
    """The 2D slice model driven by the same diffusion wrappers."""
    from diffusioniqt_tpu.diffusion.gaussian import Imagen
    from diffusioniqt_tpu.models.unet3d import NullUnet

    model = UNet2D(dim=8, dim_mults=(1, 2), num_resnet_blocks=1, channels=1,
                   init_dim=8, resnet_groups=4, att_type="none",
                   dtype=jnp.float32)
    imagen = Imagen(
        unets=[NullUnet(), model], image_sizes=(16, 16), channels=1,
        timesteps=4, pred_objectives="x_start", dynamic_thresholding=False,
        auto_normalize_img=False, cond_drop_prob=0.0, norm="min-max",
        spatial_dims=2,
    )
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=2)
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (2, 16, 16, 1))
    loss, *_ = imagen.forward(params, key, images, images * 0.5, unet_number=2)
    assert jnp.isfinite(loss)
    out = imagen.sample(params, key, batch_size=2, start_at_unet_number=2,
                        start_image_or_video=images)
    assert out.shape == (2, 16, 16, 1)


@pytest.mark.slow
def test_edm_trainer_path():
    from diffusioniqt_tpu.data.datasets import FakeIQTDataset
    from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen
    from diffusioniqt_tpu.models.unet3d import NullUnet, UNet3D
    from diffusioniqt_tpu.train.trainer import ImagenTrainer
    from tests.test_trainer import tiny_cfg

    unet = UNet3D(dim=8, img_size=8, dim_mults=(1, 2), num_resnet_blocks=1,
                  channels=1, init_dim=8, resnet_groups=4,
                  init_cross_embed=False, att_type="linear",
                  attend_at_middle=False, attend_at_enc=(False, False),
                  batch_sample=False, deep_feature=False, dtype=jnp.float32)
    edm = ElucidatedImagen(
        unets=[NullUnet(), unet], image_sizes=(8, 8), channels=1,
        auto_normalize_img=False, cond_drop_prob=0.0, num_sample_steps=4,
        dynamic_thresholding=False, norm="min-max",
    )
    cfg = tiny_cfg()
    trainer = ImagenTrainer(configs=cfg, imagen=edm,
                            gradient_accumulation_steps=1, lr=1e-3)
    trainer.add_train_dataset(FakeIQTDataset(size=8, length=8), batch_size=4)
    losses = [trainer.train_step(unet_number=2) for _ in range(4)]
    assert np.isfinite(losses).all()

    lowres = jnp.zeros((2, 8, 8, 8, 1))
    out = trainer.sample(batch_size=2, start_at_unet_number=2,
                         start_image_or_video=lowres)
    assert out.shape == (2, 8, 8, 8, 1)


def test_model_config_factories():
    from diffusioniqt_tpu.model_configs import ImagenConfig, UnetConfig

    unet_cfg = {
        "kind": "unet3d", "dim": 8, "dim_mults": [1, 2], "channels": 1,
        "kwargs": {
            "num_resnet_blocks": 1, "init_dim": 8, "resnet_groups": 4,
            "init_cross_embed": False, "attend_at_middle": False,
            "attend_at_enc": [False, False], "batch_sample": False,
            "deep_feature": False, "img_size": 8,
        },
    }
    cfg = ImagenConfig.from_dict({
        "unets": [{"kind": "null"}, unet_cfg],
        "image_sizes": [8, 8], "channels": 1, "timesteps": 4,
        "pred_objectives": "x_start", "cond_drop_prob": 0.0,
        "dynamic_thresholding": False, "norm": "z-score",
        "min_bound": -0.7,
    })
    imagen = cfg.create()
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=1)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 8, 8, 8, 1))
    loss, *_ = imagen.forward(params, key, x, x * 0.5, unet_number=2)
    assert jnp.isfinite(loss)


def test_pallas_flash_attention_interpret():
    """Flash attention kernel vs reference, interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from diffusioniqt_tpu.ops.attention import attention_reference
    from diffusioniqt_tpu.ops.pallas.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 100, 32))
    want = attention_reference(q, k, v, scale=32 ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_pallas_conv3d_interpret():
    """Pallas conv kernel vs lax.conv, interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from diffusioniqt_tpu.ops.pallas.conv3d import (
        _reference_conv,
        conv3d_valid,
    )

    xh = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 10, 10, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 8, 8)) * 0.1
    want = _reference_conv(xh, w)
    with pltpu.force_tpu_interpret_mode():
        got = conv3d_valid(xh, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
