"""Regression tests for the round-3 correctness fixes (VERDICT.md round 2
items 6-9 + ADVICE.md round 2): trajectory axis handling under chunk/mesh,
EDM validation predictions, EMA ramp semantics, trainer RNG checkpointing,
non-uniform sampling routing, ragged mesh-sample groups, use_ema checkpoint
conversion, and NaN NIfTI scl_slope."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.parallel.mesh import create_mesh
from diffusioniqt_tpu.train.trainer import ImagenTrainer
from tests.test_trainer import tiny_cfg, tiny_imagen


@pytest.fixture(scope="module")
def trainer():
    cfg = tiny_cfg()
    tr = ImagenTrainer(
        configs=cfg, imagen=tiny_imagen(cfg), gradient_accumulation_steps=1,
    )
    tr.prepare()
    return tr


def _start(batch, seed=7):
    return jax.random.normal(
        jax.random.PRNGKey(seed), (batch, 8, 8, 8, 1), jnp.float32
    )


# ---------------------------------------------------------------------------
# trajectories under chunking / mesh (VERDICT round-2 weak #4)


def test_chunked_sample_trajectory_batch_axis(trainer):
    """return_trajectory under max_batch_size: trajectories are step-major
    (T, B, ...) so chunk concatenation must join axis 1, not axis 0."""
    out, noisy, x0 = trainer.sample(
        batch_size=4, max_batch_size=2, key=jax.random.PRNGKey(0),
        start_at_unet_number=2, start_image_or_video=_start(4),
        return_trajectory=True,
    )
    T = trainer.imagen.noise_schedulers[1].timesteps
    assert out.shape == (4, 8, 8, 8, 1)
    assert noisy.shape == (T, 4, 8, 8, 8, 1)
    assert x0.shape == (T, 4, 8, 8, 8, 1)


def test_mesh_sample_trajectory_unpad_axis(trainer):
    """return_trajectory on a mesh with a padded batch: the unpad slice must
    act on the trajectory's batch axis (axis 1), not the step axis."""
    trainer.mesh = create_mesh(("data",), (8,))
    try:
        out, noisy, x0 = trainer.sample(
            batch_size=5, key=jax.random.PRNGKey(1),
            start_at_unet_number=2, start_image_or_video=_start(5),
            return_trajectory=True,
        )
    finally:
        trainer.mesh = None
    T = trainer.imagen.noise_schedulers[1].timesteps
    assert out.shape[0] == 5
    assert noisy.shape[:2] == (T, 5)
    assert x0.shape[:2] == (T, 5)


def test_mesh_sample_ragged_group_batch(trainer):
    """ADVICE round-2: a batch_sample-geometry batch that is not a multiple
    of the 27-sub-volume group (e.g. a max_batch_size remainder chunk) must
    pad UP, never return fewer rows than requested."""
    trainer.mesh = create_mesh(("data",), (1,), devices=jax.devices()[:1])
    trainer.imagen.batch_sample = True  # group = 3^3 = 27
    try:
        out = trainer.sample(
            batch_size=28, key=jax.random.PRNGKey(2),
            start_at_unet_number=2, start_image_or_video=_start(28),
        )
    finally:
        trainer.imagen.batch_sample = False
        trainer.mesh = None
    assert out.shape[0] == 28
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# EDM validation predictions (VERDICT round-2 weak #5)


def test_edm_valid_step_returns_real_predictions():
    from diffusioniqt_tpu.data.datasets import FakeIQTDataset
    from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen
    from diffusioniqt_tpu.models.unet3d import NullUnet
    from tests.test_trainer import tiny_cfg

    cfg = tiny_cfg()
    base = tiny_imagen(cfg)
    edm = ElucidatedImagen(
        unets=[NullUnet(), base.unets[1]], image_sizes=(8, 8), channels=1,
        auto_normalize_img=False, cond_drop_prob=0.0, num_sample_steps=4,
        dynamic_thresholding=False, norm="z-score",
    )
    tr = ImagenTrainer(configs=cfg, imagen=edm, gradient_accumulation_steps=1)
    tr.add_valid_dataset(FakeIQTDataset(size=8, length=4, seed=3),
                         batch_size=4)
    loss, preds, noisy, [hrs, lowres], ssim, psnr = tr.valid_step(
        unet_number=2
    )
    assert np.isfinite(loss)
    # the qualitative dumps must hold the model's denoised output and the
    # noised input — not the ground truth copied twice
    assert preds.shape == hrs.shape
    assert not np.allclose(preds, hrs)
    assert not np.allclose(noisy, hrs)
    # EDM denoised output is an x0 estimate: SSIM/PSNR must be computed
    assert np.isfinite(ssim) and np.isfinite(psnr)


# ---------------------------------------------------------------------------
# EMA ramp semantics (VERDICT round-2 weak #3)


def test_ema_ramp_counts_trainer_steps():
    """EMAState.step must track trainer optimizer steps (ema-pytorch counts
    every trainer update), so with update_every=10 the ramp advances 10 per
    EMA application, not 1."""
    from diffusioniqt_tpu.train.ema import EMAState, ema_update

    params = {"w": jnp.ones((4,))}
    state = EMAState.create(params)
    # trainer applies the gated update at steps 10, 20, ... passing the step
    for s in (10, 20, 30):
        state = ema_update(state, {"w": jnp.full((4,), 2.0)}, jnp.asarray(s))
    assert int(state.step) == 30


def test_ema_decay_matches_ema_pytorch_ramp():
    """Decay at trainer step s (after warmup) is the ema-pytorch ramp
    1 - (1 + epoch)^(-2/3) with epoch = s - update_after_step - 1."""
    from diffusioniqt_tpu.train.ema import ema_decay_schedule

    s = 1000
    got = float(ema_decay_schedule(jnp.asarray(s), update_after_step=100))
    want = 1.0 - (1.0 + (s - 101)) ** (-2.0 / 3.0)
    assert got == pytest.approx(want, rel=1e-6)
    # before warmup ends the EMA copies the online params (decay 0)
    assert float(ema_decay_schedule(jnp.asarray(50), update_after_step=100)) == 0.0


# ---------------------------------------------------------------------------
# trainer RNG checkpointing (VERDICT round-2 weak #6)


def test_rng_checkpoint_resume_determinism(tmp_path):
    """save -> load -> train_step must reproduce the exact same loss as
    continuing the original trainer (PRNG stream restored)."""
    from diffusioniqt_tpu.data.datasets import FakeIQTDataset

    cfg = tiny_cfg()
    tr = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg),
                       gradient_accumulation_steps=1)
    ds = FakeIQTDataset(size=8, length=4, seed=0)
    tr.add_train_dataset(ds, batch_size=4)
    tr.train_step(unet_number=2)

    path = os.path.join(str(tmp_path), "ckpt")
    tr.save(path)

    batch = next(iter(tr.train_dl))
    loss_cont = tr.train_step(unet_number=2, batch=batch)

    tr2 = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg),
                        gradient_accumulation_steps=1)
    tr2.prepare()
    tr2.load(path)
    loss_resumed = tr2.train_step(unet_number=2, batch=batch)
    assert loss_resumed == pytest.approx(loss_cont, rel=1e-6)


# ---------------------------------------------------------------------------
# non-uniform sampling schedule routing (VERDICT round-2 missing #5)


def test_non_uniform_sampling_routed():
    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.diffusion.gaussian import Imagen
    from diffusioniqt_tpu.models.unet3d import NullUnet

    cfg = tiny_cfg()
    base = tiny_imagen(cfg)
    imagen = Imagen(
        unets=[NullUnet(), base.unets[1]], image_sizes=(8, 8), channels=1,
        timesteps=8, pred_objectives="x_start", dynamic_thresholding=False,
        p2_loss_weight_gamma=0.0, auto_normalize_img=False,
        cond_drop_prob=0.0, norm="z-score", non_uniform_times=True,
    )
    params = imagen.init_params(jax.random.PRNGKey(0), 2)
    out = imagen.sample(
        params, jax.random.PRNGKey(1), batch_size=2,
        start_at_unet_number=2, start_image_or_video=_start(2),
    )
    assert out.shape == (2, 8, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))

    # config plumbing: Train.non_uniform_sampling reaches the wrapper
    c = Config()
    c.train.non_uniform_sampling = True
    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config

    im2 = imagen_from_config(c, [NullUnet(), base.unets[1]])
    assert im2.non_uniform_times is True


def test_non_uniform_schedule_is_denser_near_zero():
    from diffusioniqt_tpu.core.schedules import (
        GaussianDiffusionContinuousTimes,
    )

    sched = GaussianDiffusionContinuousTimes(timesteps=16)
    t_cur, t_next = sched.get_sampling_timesteps_non_uniform(1, gamma=10.0)
    ts = np.asarray(t_cur[:, 0])
    assert ts[0] == pytest.approx(1.0)
    assert float(t_next[-1, 0]) == pytest.approx(0.0)
    assert np.all(np.diff(ts) < 0)  # strictly decreasing
    # exp(-10 t) weighting concentrates points at small t
    assert np.sum(ts < 0.5) > np.sum(ts >= 0.5)


# ---------------------------------------------------------------------------
# use_ema checkpoint conversion (ADVICE round-2 #1)


def test_convert_reference_checkpoint_use_ema_prefix():
    """A trainer bundle stores ema as an nn.ModuleList state dict with
    '{i}.ema_model.*' keys (reference trainer.py:859 via ema-pytorch);
    use_ema=True must pick those (not silently fall back to the online
    weights) and raise when absent."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout unavailable")
    from diffusioniqt_tpu.utils.torch_convert import (
        convert_reference_checkpoint,
    )
    from tests.test_model_parity import _build_pair
    from ref_compat import load_reference_module

    mod = load_reference_module("imagen_pytorch3D")
    ref, _ours, _vars = _build_pair(
        mod, img_size=16, boundary=False, batch_sample=False,
    )
    online_sd = {k: v.clone() for k, v in ref.state_dict().items()}
    ema_sd = {k: v + 1.0 for k, v in online_sd.items()}
    bundle = {
        "model": {f"unets.1.{k}": v for k, v in online_sd.items()},
        "ema": {
            **{f"1.ema_model.{k}": v for k, v in ema_sd.items()},
            **{f"1.online_model.{k}": v for k, v in online_sd.items()},
            "1.initted": torch.tensor(True),
            "1.step": torch.tensor(100),
        },
    }
    vars_ema = convert_reference_checkpoint(bundle, unet_number=2,
                                            use_ema=True)
    vars_online = convert_reference_checkpoint(bundle, unet_number=2,
                                               use_ema=False)
    a = np.asarray(vars_ema["params"]["final_conv"]["kernel"])
    b = np.asarray(vars_online["params"]["final_conv"]["kernel"])
    np.testing.assert_allclose(a, b + 1.0, atol=1e-6)

    with pytest.raises(KeyError):
        convert_reference_checkpoint(
            {"model": bundle["model"]}, unet_number=2, use_ema=True
        )
    with pytest.raises(KeyError):
        convert_reference_checkpoint(
            {"model": bundle["model"], "ema": {"junk": online_sd["final_conv.weight"]}},
            unet_number=2, use_ema=True,
        )


# ---------------------------------------------------------------------------
# NaN scl_slope (ADVICE round-2 #5)


def test_nifti_nan_scl_slope_means_no_scaling(tmp_path):
    """nibabel treats a non-finite scl_slope as 'no scaling'; the fallback
    reader must not multiply the volume to NaN."""
    import struct

    from diffusioniqt_tpu.data import nifti

    path = str(tmp_path / "x.nii")
    vol = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    nifti.write(path, vol)
    with open(path, "r+b") as fh:
        fh.seek(112)  # scl_slope offset in the NIfTI-1 header
        fh.write(struct.pack("<f", float("nan")))
    data, _ = nifti.read(path)
    np.testing.assert_allclose(data, vol)
    assert np.isfinite(data).all()


# ---------------------------------------------------------------------------
# valid_step_sample with batch_sample flagship geometry (VERDICT weak #8)


@pytest.mark.slow
def test_valid_step_sample_batch_sample_geometry():
    """Sampling-based validation with 96^3->27x32^3-style geometry (here
    24^3 -> 27x8^3): the batch_sample split, chunking and SSIM merge paths
    must compose."""
    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.data.datasets import FakeIQTDataset
    from diffusioniqt_tpu.diffusion.gaussian import Imagen
    from diffusioniqt_tpu.models.unet3d import NullUnet, UNet3D

    cfg = Config()
    cfg.train.patch_size_sub = 8
    cfg.train.batch_sample = True
    cfg.train.batch_sample_factor = 3
    cfg.train.timesteps = 4
    cfg.train.pred_obj = "x_start"
    cfg.train.compute_dtype = "float32"
    cfg.eval.repeat = 1

    unet = UNet3D(
        dim=8, img_size=24, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=8, resnet_groups=4, init_cross_embed=False,
        att_type="linear", attend_at_middle=False,
        attend_at_enc=(False, False), use_se_attn=True, boundary=True,
        batch_sample=True, batch_sample_factor=3, deep_feature=False,
        dtype=jnp.float32,
    )
    imagen = Imagen(
        unets=[NullUnet(), unet], image_sizes=(8, 8), channels=1,
        timesteps=4, pred_objectives="x_start", dynamic_thresholding=False,
        p2_loss_weight_gamma=0.0, auto_normalize_img=False,
        cond_drop_prob=0.0, min_bound=cfg.data.min_bound, norm="z-score",
        batch_sample=True,
    )
    tr = ImagenTrainer(configs=cfg, imagen=imagen,
                       gradient_accumulation_steps=1)
    # dataset yields whole 24^3 patches; the trainer splits to 27x8^3
    tr.add_valid_dataset(FakeIQTDataset(size=24, length=2, seed=0),
                         batch_size=1)
    losses, preds, [hrs, lrs], ssim, psnr = tr.valid_step_sample(
        unet_number=2, max_batch_size=27,
    )
    assert preds.shape == hrs.shape == lrs.shape
    assert preds.shape[1:] == (8, 8, 8, 1) and preds.shape[0] == 2 * 27
    assert np.isfinite(losses).all()
    assert np.isfinite(ssim) and np.isfinite(psnr)
