"""End-to-end trainer smoke: fake data -> train a few steps -> loss drops,
EMA tracks, checkpoints round-trip, sampling runs (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.config import Config
from diffusioniqt_tpu.data.datasets import FakeIQTDataset
from diffusioniqt_tpu.diffusion.gaussian import Imagen
from diffusioniqt_tpu.models.unet3d import NullUnet, UNet3D
from diffusioniqt_tpu.train.trainer import ImagenTrainer


def tiny_cfg():
    cfg = Config()
    cfg.train.patch_size_sub = 8
    cfg.train.batch_sample = False
    cfg.train.timesteps = 8
    cfg.train.pred_obj = "x_start"
    cfg.train.compute_dtype = "float32"
    cfg.eval.repeat = 1
    return cfg


def tiny_imagen(cfg):
    unet = UNet3D(
        dim=8, img_size=8, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=8, resnet_groups=4, init_cross_embed=False,
        att_type="linear", attend_at_middle=False, attend_at_enc=(False, False),
        use_se_attn=True, boundary=False, batch_sample=False,
        deep_feature=False, dtype=jnp.float32,
    )
    return Imagen(
        unets=[NullUnet(), unet],
        image_sizes=(8, 8),
        channels=1,
        timesteps=cfg.train.timesteps,
        pred_objectives=cfg.train.pred_obj,
        dynamic_thresholding=False,
        p2_loss_weight_gamma=0.0,
        auto_normalize_img=False,
        cond_drop_prob=0.0,
        min_bound=cfg.data.min_bound,
        norm="z-score",
    )


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_cfg()
    imagen = tiny_imagen(cfg)
    trainer = ImagenTrainer(
        configs=cfg, imagen=imagen, gradient_accumulation_steps=2,
        ema_update_after_step=1, ema_update_every=1, lr=2e-3,
    )
    ds = FakeIQTDataset(size=8, length=8, seed=0)
    trainer.add_train_dataset(ds, batch_size=4)
    trainer.add_valid_dataset(FakeIQTDataset(size=8, length=4, seed=1),
                              batch_size=4)

    losses = [trainer.train_step(unet_number=2) for _ in range(12)]
    return cfg, trainer, losses


def test_loss_decreases(trained):
    _, _, losses = trained
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_steps_counted(trained):
    _, trainer, _ = trained
    assert trainer.num_steps_taken(2) == 12


def test_ema_tracks(trained):
    _, trainer, _ = trained
    ema = trainer.ema_states[1]
    assert int(ema.step) == 12
    # warm-up phase (step <= update_after_step handled): ema should be close
    # to online params but not the init
    diff = jax.tree_util.tree_map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))), ema.params,
        trainer.params[1],
    )
    max_diff = max(jax.tree_util.tree_leaves(diff))
    assert max_diff < 1.0


def test_valid_step(trained):
    _, trainer, _ = trained
    loss, preds, noisy, [hrs, lowres], ssim, psnr = trainer.valid_step(
        unet_number=2
    )
    assert np.isfinite(loss)
    assert preds.shape[0] == hrs.shape[0]
    assert np.isfinite(ssim) and np.isfinite(psnr)
    assert -1.0 <= ssim <= 1.0


def test_valid_step_sample(trained):
    """Sampling-based validation (reference valid_step2)."""
    cfg, trainer, _ = trained
    losses, preds, [hrs, lrs], ssim, psnr = trainer.valid_step_sample(
        unet_number=2
    )
    assert np.isfinite(losses).all()
    assert preds.shape == hrs.shape == lrs.shape
    assert np.isfinite(ssim) and np.isfinite(psnr)


def test_sampling_from_trainer(trained):
    _, trainer, _ = trained
    lowres = jnp.zeros((2, 8, 8, 8, 1))
    out = trainer.sample(
        batch_size=2, start_at_unet_number=2, start_image_or_video=lowres,
        return_all_unet_outputs=True,
    )
    assert out[0].shape == (2, 8, 8, 8, 1)


def test_checkpoint_roundtrip(trained, tmp_path):
    cfg, trainer, _ = trained
    path = os.path.join(str(tmp_path), "ckpt")
    trainer.save(path)

    imagen2 = tiny_imagen(cfg)
    trainer2 = ImagenTrainer(configs=cfg, imagen=imagen2)
    trainer2.prepare()
    trainer2.load(path)

    assert trainer2.steps == trainer.steps
    a = jax.tree_util.tree_leaves(trainer.params[1])
    b = jax.tree_util.tree_leaves(trainer2.params[1])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_rolling_checkpoint_folder(tmp_path):
    cfg = tiny_cfg()
    imagen = tiny_imagen(cfg)
    trainer = ImagenTrainer(
        configs=cfg, imagen=imagen,
        checkpoint_path=str(tmp_path / "ckpts"), checkpoint_every=1,
        max_checkpoints_keep=2, gradient_accumulation_steps=1,
    )
    ds = FakeIQTDataset(size=8, length=4, seed=0)
    trainer.add_train_dataset(ds, batch_size=2)
    for _ in range(4):
        trainer.train_step(unet_number=2)
    assert len(trainer.all_checkpoints_sorted) == 2

    # auto-resume from latest
    imagen2 = tiny_imagen(cfg)
    trainer2 = ImagenTrainer(
        configs=cfg, imagen=imagen2,
        checkpoint_path=str(tmp_path / "ckpts"), checkpoint_every=1,
    )
    assert trainer2.steps[1] == 4


@pytest.mark.slow
def test_chunked_sample_matches_manual_chunks(trained):
    """Chunked sampling (batch 8, max 2) must equal the concatenation of
    per-chunk sample() calls following the same key schedule — i.e. the
    chunk plumbing (EMA params, start-image slicing, concat) is exact
    (reference imagen_sample_in_chunks, trainer.py:201-219)."""
    _, trainer, _ = trained
    lowres = jnp.asarray(
        np.random.default_rng(3).standard_normal((8, 8, 8, 8, 1)),
        jnp.float32,
    )
    key = jax.random.PRNGKey(7)
    out = trainer.sample(
        batch_size=8, max_batch_size=2, key=key,
        start_at_unet_number=2, start_image_or_video=lowres,
    )
    assert out.shape == (8, 8, 8, 8, 1)

    k = key
    manual = []
    for i in range(4):
        k, sub = jax.random.split(k)
        manual.append(trainer.sample(
            batch_size=2, key=sub, start_at_unet_number=2,
            start_image_or_video=lowres[2 * i:2 * i + 2],
        ))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.concatenate(manual)), rtol=1e-5,
        atol=1e-5,
    )


def test_valid_step_sample_chunked(trained):
    """valid_step_sample(max_batch_size=2) on batch-4 val data must run the
    chunked path and produce the same shapes/finite metrics as unchunked."""
    _, trainer, _ = trained
    losses, preds, [hrs, lrs], ssim, psnr = trainer.valid_step_sample(
        unet_number=2, max_batch_size=2,
    )
    assert np.isfinite(losses).all()
    assert preds.shape == hrs.shape == lrs.shape
    assert np.isfinite(ssim) and np.isfinite(psnr)


def test_async_step_and_transfer_dtype():
    """sync=False returns a device scalar (pipelined stepping) and
    transfer_dtype='bfloat16' halves the H2D bytes; training still
    converges to the same ballpark as the fp32 sync path."""
    cfg = tiny_cfg()
    cfg.train.transfer_dtype = "bfloat16"
    imagen = tiny_imagen(cfg)
    trainer = ImagenTrainer(
        configs=cfg, imagen=imagen, gradient_accumulation_steps=2,
        ema_update_after_step=1, ema_update_every=1, lr=2e-3,
    )
    trainer.add_train_dataset(FakeIQTDataset(size=8, length=8, seed=0),
                              batch_size=4)

    losses = [trainer.train_step(unet_number=2, sync=False)
              for _ in range(8)]
    # device scalars, not floats, until explicitly converted
    assert not isinstance(losses[0], float)
    vals = [float(x) for x in losses]
    assert all(np.isfinite(v) for v in vals)
    assert np.mean(vals[-3:]) < np.mean(vals[:3])  # converging
    assert trainer.steps[1] == 8


def test_edm_loss_decreases():
    """The elucidated (EDM) training path converges under the trainer, not
    just the Gaussian one: lognormal-sigma preconditioned loss drops over a
    short fake-data run (reference elucidated_imagen.py:706-882 semantics)."""
    from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen

    cfg = tiny_cfg()
    unet = UNet3D(
        dim=8, img_size=8, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=8, resnet_groups=4, init_cross_embed=False,
        att_type="linear", attend_at_middle=False, attend_at_enc=(False, False),
        use_se_attn=True, boundary=False, batch_sample=False,
        deep_feature=False, dtype=jnp.float32,
    )
    edm = ElucidatedImagen(
        unets=[NullUnet(), unet],
        image_sizes=(8, 8),
        channels=1,
        auto_normalize_img=False,
        cond_drop_prob=0.0,
        num_sample_steps=6,
        dynamic_thresholding=False,
        norm="z-score",
    )
    trainer = ImagenTrainer(
        configs=cfg, imagen=edm, gradient_accumulation_steps=2,
        ema_update_after_step=1, ema_update_every=1, lr=2e-3,
    )
    trainer.add_train_dataset(FakeIQTDataset(size=8, length=8, seed=0),
                              batch_size=4)

    losses = [trainer.train_step(unet_number=2) for _ in range(16)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
