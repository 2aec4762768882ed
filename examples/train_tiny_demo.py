"""End-to-end demo (the reference's ``imagen_train.ipynb`` equivalent):
build a tiny cascade, train on random volumes, sample, print metrics.

Run: python examples/train_tiny_demo.py  (CPU-friendly)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusioniqt_tpu.utils.platform import ensure_platform

ensure_platform()

import jax.numpy as jnp
import numpy as np

from diffusioniqt_tpu.config import Config
from diffusioniqt_tpu.data.datasets import FakeIQTDataset
from diffusioniqt_tpu.diffusion.gaussian import Imagen
from diffusioniqt_tpu.metrics.image import PSNR, SSIM
from diffusioniqt_tpu.models.unet3d import NullUnet, UNet3D
from diffusioniqt_tpu.train.trainer import ImagenTrainer


def main():
    cfg = Config()
    cfg.train.patch_size_sub = 16
    cfg.train.batch_sample = False
    cfg.eval.repeat = 1

    unet = UNet3D(
        dim=16, img_size=16, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=16, resnet_groups=8, init_cross_embed=False,
        att_type="linear", attend_at_middle=False, attend_at_enc=(False, False),
        use_se_attn=True, batch_sample=False, deep_feature=False,
        dtype=jnp.float32,
    )
    imagen = Imagen(
        unets=[NullUnet(), unet],
        image_sizes=(16, 16), channels=1, timesteps=16,
        pred_objectives="x_start", dynamic_thresholding=False,
        auto_normalize_img=False, cond_drop_prob=0.0,
        min_bound=-0.72, norm="z-score",
    )
    trainer = ImagenTrainer(
        configs=cfg, imagen=imagen, gradient_accumulation_steps=1, lr=2e-3,
    )
    trainer.add_train_dataset(FakeIQTDataset(size=16, length=16), batch_size=8)
    trainer.add_valid_dataset(FakeIQTDataset(size=16, length=4, seed=1),
                              batch_size=4)

    print("training...")
    for step in range(30):
        loss = trainer.train_step(unet_number=2)
        if step % 10 == 0:
            print(f"  step {step}: loss {loss:.4f}")

    print("sampling (reference notebook cell 12 equivalent)...")
    lowres = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 16, 1)),
        jnp.float32,
    )
    samples = trainer.sample(
        batch_size=2, start_at_unet_number=2, start_image_or_video=lowres,
    )
    print("  samples:", samples.shape,
          "ssim vs lowres:", float(SSIM(samples, lowres)),
          "psnr:", float(PSNR(samples, lowres)))


if __name__ == "__main__":
    main()
