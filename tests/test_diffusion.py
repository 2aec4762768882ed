"""End-to-end diffusion wrapper tests: loss + ancestral/EDM sampling on fake
data (the 'tiny config 1' smoke from SURVEY.md §4 / BASELINE.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen
from diffusioniqt_tpu.diffusion.gaussian import Imagen
from diffusioniqt_tpu.models.unet3d import NullUnet, UNet3D


def tiny_unet(**kwargs):
    defaults = dict(
        dim=8, img_size=8, dim_mults=(1, 2), num_resnet_blocks=1,
        channels=1, init_dim=8, resnet_groups=4, init_cross_embed=False,
        att_type="linear", attend_at_middle=False, attend_at_enc=(False, False),
        use_se_attn=True, boundary=False, batch_sample=False,
        deep_feature=False, dtype=jnp.float32,
    )
    return UNet3D(**{**defaults, **kwargs})


@pytest.fixture(scope="module")
def imagen_and_params():
    imagen = Imagen(
        unets=[NullUnet(), tiny_unet()],
        image_sizes=(8, 8),
        channels=1,
        timesteps=8,
        pred_objectives="x_start",
        dynamic_thresholding=False,
        p2_loss_weight_gamma=0.0,
        auto_normalize_img=False,
        cond_drop_prob=0.0,
        min_bound=-0.72,
        norm="z-score",
        loss_type="l2",
    )
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=2)
    return imagen, params


def test_forward_loss_finite(imagen_and_params):
    imagen, params = imagen_and_params
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (2, 8, 8, 8, 1))
    lowres = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 1))
    loss, pred, x_noisy, lowres_noisy = imagen.forward(
        params, key, images, lowres, unet_number=2
    )
    assert jnp.isfinite(loss)
    assert pred.shape == images.shape
    assert x_noisy.shape == images.shape
    np.testing.assert_array_equal(np.asarray(lowres_noisy), np.asarray(lowres))


def test_forward_loss_grad(imagen_and_params):
    """Loss must be differentiable wrt the trained unet's params."""
    imagen, params = imagen_and_params
    key = jax.random.PRNGKey(3)
    images = jax.random.normal(key, (2, 8, 8, 8, 1))
    lowres = images * 0.5

    def loss_fn(unet_params):
        p = [params[0], unet_params]
        loss, *_ = imagen.forward(p, key, images, lowres, unet_number=2)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params[1])
    assert jnp.isfinite(loss)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    # at least some gradient is nonzero
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_sample_start_at_unet_2(imagen_and_params):
    """The IQT inference path: start at the SR stage conditioned on lowres
    (reference test.py:182)."""
    imagen, params = imagen_and_params
    lowres = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 8, 1))
    out = imagen.sample(
        params, jax.random.PRNGKey(5), batch_size=2,
        start_at_unet_number=2, start_image_or_video=lowres,
    )
    assert out.shape == (2, 8, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # z-score min_bound clamp respected
    assert float(out.min()) >= -0.72 - 1e-5


def test_sample_trajectory(imagen_and_params):
    imagen, params = imagen_and_params
    lowres = jnp.zeros((1, 8, 8, 8, 1))
    out, noisy_traj, x0_traj = imagen.sample(
        params, jax.random.PRNGKey(6), batch_size=1,
        start_at_unet_number=2, start_image_or_video=lowres,
        return_trajectory=True,
    )
    assert noisy_traj.shape == (8, 1, 8, 8, 8, 1)
    assert x0_traj.shape == (8, 1, 8, 8, 8, 1)


def test_sample_skip_steps(imagen_and_params):
    imagen, params = imagen_and_params
    lowres = jnp.zeros((1, 8, 8, 8, 1))
    out, noisy_traj, _ = imagen.sample(
        params, jax.random.PRNGKey(7), batch_size=1,
        start_at_unet_number=2, start_image_or_video=lowres,
        skip_steps=2, return_trajectory=True,
    )
    # 8 steps sampled every 2 plus forced last step = 5
    assert noisy_traj.shape[0] == 5


def test_noise_objective_path():
    imagen = Imagen(
        unets=[NullUnet(), tiny_unet()],
        image_sizes=(8, 8),
        channels=1, timesteps=4, pred_objectives="noise",
        dynamic_thresholding=True, auto_normalize_img=False,
        cond_drop_prob=0.0, norm="min-max",
    )
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=1)
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (1, 8, 8, 8, 1))
    loss, *_ = imagen.forward(params, key, images, images * 0.5, unet_number=2)
    assert jnp.isfinite(loss)


def test_sample_inpainting(imagen_and_params):
    """Inpaint/resample path (reference p_sample_loop :2093-2146): masked
    regions must stay (noised versions of) the inpaint image; output finite."""
    imagen, params = imagen_and_params
    key = jax.random.PRNGKey(11)
    inpaint = jnp.zeros((1, 8, 8, 8, 1))
    mask = jnp.zeros((1, 8, 8, 8, 1)).at[:, :4].set(1.0)
    lowres = jnp.zeros((1, 8, 8, 8, 1))
    out = imagen.sample(
        params, key, batch_size=1, start_at_unet_number=2,
        start_image_or_video=lowres, inpaint_images=inpaint,
        inpaint_masks=mask, inpaint_resample_times=2,
    )
    assert out.shape == (1, 8, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sample_init_images(imagen_and_params):
    """init_images offsets the initial noise (reference :2084-2085)."""
    imagen, params = imagen_and_params
    lowres = jnp.zeros((1, 8, 8, 8, 1))
    init = jnp.ones((1, 8, 8, 8, 1)) * 0.5
    out = imagen.sample(
        params, jax.random.PRNGKey(12), batch_size=1,
        start_at_unet_number=2, start_image_or_video=lowres,
        init_images=(None, init),
    )
    assert bool(jnp.all(jnp.isfinite(out)))


def test_legacy_datasets():
    from diffusioniqt_tpu.data.legacy import IQTDataset, TextCollator

    ds = IQTDataset(fake=True, size=8, length=4)
    hr, lr = ds[0]
    assert hr.shape == (8, 8, 8, 1)

    coll = TextCollator(image_size=8, embed_dim=16, max_length=4)
    batch = coll([(np.zeros((8, 8, 3)), "hello"), (np.ones((8, 8, 3)), "brain mri")])
    assert batch[0].shape == (2, 8, 8, 3)
    assert batch[1].shape == (2, 4, 16)
    assert batch[2].shape == (2, 4)


# ---------------------------------------------------------------------------
# EDM


@pytest.fixture(scope="module")
def edm_and_params():
    edm = ElucidatedImagen(
        unets=[tiny_unet()],
        image_sizes=(8,),
        channels=1,
        auto_normalize_img=False,
        cond_drop_prob=0.0,
        num_sample_steps=6,
        dynamic_thresholding=False,
        norm="min-max",
    )
    params = edm.init_params(jax.random.PRNGKey(0), batch_size=2)
    return edm, params


def test_edm_schedule_shape(edm_and_params):
    edm, _ = edm_and_params
    hp = edm.hparams[0]
    sigmas = hp.sample_schedule()
    assert sigmas.shape == (7,)
    assert float(sigmas[0]) == pytest.approx(80.0, rel=1e-4)
    assert float(sigmas[-2]) == pytest.approx(0.002, rel=1e-3)
    assert float(sigmas[-1]) == 0.0


def test_edm_loss_and_grad(edm_and_params):
    edm, params = edm_and_params
    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (2, 8, 8, 8, 1))

    def loss_fn(p0):
        return edm.forward([p0], key, images, unet_number=1)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params[0])
    assert jnp.isfinite(loss)
    assert all(
        jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
    )


def test_edm_sample(edm_and_params):
    edm, params = edm_and_params
    out = edm.sample(params, jax.random.PRNGKey(2), batch_size=2)
    assert out.shape == (2, 8, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_edm_segmented_launches_match_single(edm_and_params):
    """Launch-capped segmented Heun sampling is numerically identical to
    the single-scan path (same ops, same RNG stream — the scan carry is
    threaded across launches). The cap exists because the axon TPU runtime
    kills single device launches longer than a few seconds."""
    edm, params = edm_and_params
    key = jax.random.PRNGKey(5)
    assert edm.max_steps_per_launch is None
    single = np.asarray(edm.sample(params, key, batch_size=2))
    try:
        edm.max_steps_per_launch = 2  # 5 Heun steps -> segments 2+2+1
        seg = np.asarray(edm.sample(params, key, batch_size=2))
    finally:
        edm.max_steps_per_launch = None
        edm._segment_fn_cache.clear()
    np.testing.assert_allclose(single, seg, rtol=2e-5, atol=2e-6)
