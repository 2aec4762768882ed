"""Round-5 regression tests.

1. EDM classifier-free guidance: ``preconditioned_network_forward`` must
   honor ``cond_scale`` (the reference routes every EDM model eval through
   ``unet.forward_with_cond_scale`` — /root/reference/elucidated_imagen.py
   :489,508); round 4 accepted the kwarg but silently ignored it.
2. EDM lowres conditioning noise: the IQT path passes the conditioning
   CLEAN in training and sampling (mirroring the Gaussian wrapper and the
   3D reference, imagen_pytorch3D.py:2303-2304); the upstream text-to-image
   aug is preserved behind ``lowres_noise_aug=True``.
3. EDM sampling under a device mesh: the segmented Heun sampler with
   mesh-sharded inputs must be numerically identical to single-device
   sampling (the v5e-8 north-star serving combination).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen
from diffusioniqt_tpu.models.unet3d import NullUnet
from tests.test_diffusion import tiny_unet


# ---------------------------------------------------------------------------
# 1. classifier-free guidance


@pytest.fixture(scope="module")
def video_edm_cfg():
    from tests.test_cascade_video import tiny_video_unet

    edm = ElucidatedImagen(
        unets=[tiny_video_unet()],
        image_sizes=(16,),
        channels=1,
        cond_drop_prob=0.1,  # enables CFG
        auto_normalize_img=True,
        num_sample_steps=3,
        dynamic_thresholding=False,
        norm="min-max",
    )
    unet = edm.unets[0]
    x = jnp.zeros((1, 4, 16, 16, 1))
    t = jnp.zeros((1,))
    text = jnp.zeros((1, 8, 16))
    params = [jax.jit(unet.init)(jax.random.PRNGKey(0), x, t, t,
                                 text_embeds=text)]
    # at init the attention out-projections are zero-initialized (imagen
    # convention), so text conditioning contributes nothing and CFG would
    # be vacuously a no-op — perturb every param so conditioning is live
    k = jax.random.PRNGKey(42)
    leaves, treedef = jax.tree_util.tree_flatten(params[0])
    keys = jax.random.split(k, len(leaves))
    leaves = [
        leaf + 0.05 * jax.random.normal(kk, leaf.shape, leaf.dtype)
        if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
        for leaf, kk in zip(leaves, keys)
    ]
    params = [jax.tree_util.tree_unflatten(treedef, leaves)]
    return edm, params


def _video_fwd(edm, params, cond_scale):
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 4, 16, 16, 1))
    text = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16))
    mask = jnp.ones((1, 8), bool)
    return edm.preconditioned_network_forward(
        edm.unets[0], params[0], x, 1.7, edm.hparams[0],
        clamp=False, cond_scale=cond_scale,
        text_embeds=text, text_mask=mask,
    )


def test_edm_cfg_changes_conditioned_output(video_edm_cfg):
    """cond_scale > 1 must change a text-conditioned unet's output, and the
    CFG mix is linear in cond_scale: D(2) == 2*D(1) - D(0) exactly."""
    edm, params = video_edm_cfg
    d0 = np.asarray(_video_fwd(edm, params, 0.0))   # pure null-conditioned
    d1 = np.asarray(_video_fwd(edm, params, 1.0))   # no guidance
    d2 = np.asarray(_video_fwd(edm, params, 2.0))   # guided

    assert not np.allclose(d2, d1), "cond_scale=2 must differ from 1"
    assert not np.allclose(d0, d1), "null-conditioned must differ"
    np.testing.assert_allclose(d2, 2 * d1 - d0, rtol=1e-4, atol=1e-5)


def test_edm_cfg_scale_one_single_eval(video_edm_cfg):
    """cond_scale == 1.0 must not add a second network eval (bit-unchanged
    vs the default path)."""
    edm, params = video_edm_cfg
    default = np.asarray(_video_fwd(edm, params, 1.0))
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 4, 16, 16, 1))
    text = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16))
    mask = jnp.ones((1, 8), bool)
    explicit_default = np.asarray(edm.preconditioned_network_forward(
        edm.unets[0], params[0], x, 1.7, edm.hparams[0],
        clamp=False, text_embeds=text, text_mask=mask,
    ))
    np.testing.assert_array_equal(default, explicit_default)


def test_edm_cfg_noop_for_unconditional_unet():
    """The 3D IQT unet ignores cond_drop_prob (it has no droppable
    conditioning), so guidance must be an exact no-op — not a crash."""
    edm = ElucidatedImagen(
        unets=[tiny_unet()], image_sizes=(8,), channels=1,
        cond_drop_prob=0.1, auto_normalize_img=False,
        num_sample_steps=4, dynamic_thresholding=False, norm="min-max",
    )
    params = edm.init_params(jax.random.PRNGKey(0), batch_size=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 1))
    d1 = np.asarray(edm.preconditioned_network_forward(
        edm.unets[0], params[0], x, 0.9, edm.hparams[0],
        clamp=False, cond_scale=1.0))
    d2 = np.asarray(edm.preconditioned_network_forward(
        edm.unets[0], params[0], x, 0.9, edm.hparams[0],
        clamp=False, cond_scale=2.0))
    np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# 2. lowres conditioning noise aug


def _sr_edm(lowres_noise_aug):
    edm = ElucidatedImagen(
        unets=[NullUnet(), tiny_unet()],
        image_sizes=(8, 8),
        channels=1,
        cond_drop_prob=0.0,
        auto_normalize_img=False,
        num_sample_steps=4,
        dynamic_thresholding=False,
        norm="z-score",
        min_bound=-0.72,
        lowres_noise_aug=lowres_noise_aug,
    )
    params = edm.init_params(jax.random.PRNGKey(0), batch_size=2)
    return edm, params


def test_edm_forward_clean_conditioning_when_aug_off():
    edm, params = _sr_edm(lowres_noise_aug=False)
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (2, 8, 8, 8, 1))
    lowres = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 1))
    loss, denoised, noised, lowres_noisy = edm.forward(
        params, key, images, lowres, unet_number=2, return_outputs=True)
    assert jnp.isfinite(loss)
    # norm='z-score' + auto_normalize off => normalize_img is identity:
    # the conditioning reaches the network untouched
    np.testing.assert_array_equal(np.asarray(lowres_noisy),
                                  np.asarray(lowres))


def test_edm_forward_noised_conditioning_when_aug_on():
    edm, params = _sr_edm(lowres_noise_aug=True)
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (2, 8, 8, 8, 1))
    lowres = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 1))
    _, _, _, lowres_noisy = edm.forward(
        params, key, images, lowres, unet_number=2, return_outputs=True)
    assert not np.allclose(np.asarray(lowres_noisy), np.asarray(lowres))


def test_edm_from_config_defaults_to_clean_conditioning():
    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.diffusion.elucidated import (
        elucidated_imagen_from_config,
    )

    cfg = Config()
    cfg.train.elucidated = True
    edm = elucidated_imagen_from_config(cfg, [NullUnet(), tiny_unet()])
    assert edm.lowres_noise_aug is False

    cfg.train.edm_lowres_noise_aug = True
    edm2 = elucidated_imagen_from_config(cfg, [NullUnet(), tiny_unet()])
    assert edm2.lowres_noise_aug is True


def test_edm_sample_clean_conditioning_when_aug_off():
    """With aug off, cascade sampling must feed the stage-1 output into
    stage 2 unmodified (observable: two different sample keys that share
    the stage-2 sampling key... simplest observable — sampling runs and the
    conditioning branch takes the clean path without consuming the noise
    key, so results differ from the aug-on wrapper given identical keys)."""
    edm_off, params = _sr_edm(lowres_noise_aug=False)
    edm_on, _ = _sr_edm(lowres_noise_aug=True)
    key = jax.random.PRNGKey(7)
    start = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 8, 1))
    out_off = np.asarray(edm_off.sample(
        params, key, batch_size=2, start_at_unet_number=2,
        start_image_or_video=start))
    out_on = np.asarray(edm_on.sample(
        params, key, batch_size=2, start_at_unet_number=2,
        start_image_or_video=start))
    assert out_off.shape == (2, 8, 8, 8, 1)
    assert np.all(np.isfinite(out_off))
    assert not np.allclose(out_off, out_on)


# ---------------------------------------------------------------------------
# 3. EDM sampling under the mesh (north-star serving combination)


def test_edm_mesh_sampling_matches_single_device():
    """Segmented EDM Heun sampling with the patch batch sharded over the
    'data' mesh axis is numerically identical to single-device sampling
    (trainer routing: _mesh_sample -> eager segment launches,
    train/trainer.py:695-704)."""
    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.parallel.mesh import create_mesh
    from diffusioniqt_tpu.train.trainer import ImagenTrainer

    cfg = Config()
    cfg.train.patch_size_sub = 8
    cfg.train.batch_sample = False
    cfg.train.elucidated = True
    cfg.train.compute_dtype = "float32"
    edm = ElucidatedImagen(
        unets=[NullUnet(), tiny_unet()],
        image_sizes=(8, 8),
        channels=1,
        cond_drop_prob=0.0,
        auto_normalize_img=False,
        num_sample_steps=6,
        dynamic_thresholding=False,
        norm="z-score",
        min_bound=-0.72,
        lowres_noise_aug=False,
        max_steps_per_launch=2,  # 5 Heun steps -> segments 2+2+1
    )
    trainer = ImagenTrainer(configs=cfg, imagen=edm,
                            gradient_accumulation_steps=1)
    trainer.prepare()

    key = jax.random.PRNGKey(3)
    start = jax.random.normal(jax.random.PRNGKey(7), (8, 8, 8, 8, 1),
                              jnp.float32)
    ref = trainer.sample(batch_size=8, start_image_or_video=start,
                         start_at_unet_number=2, key=key)
    trainer.mesh = create_mesh(("data",), (8,))
    try:
        out = trainer.sample(batch_size=8, start_image_or_video=start,
                             start_at_unet_number=2, key=key)
    finally:
        trainer.mesh = None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
