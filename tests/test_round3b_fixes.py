"""Regression tests for the round-3 self-review fixes: multi-host batch
slicing (group-safe, divisible), sample jit-cache key with array kwargs,
chunk alignment to batch_sample groups, skip_steps under the non-uniform
schedule, T5 random-init cache isolation, and NIfTI unusable-slope
semantics."""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
# multi-host batch slicing


def test_local_batch_slice_indivisible_raises(monkeypatch):
    """An indivisible global batch must raise, not silently drop rows (the
    dropped rows would also desynchronize collective shapes across
    processes)."""
    import diffusioniqt_tpu.parallel.multihost as mh

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert mh.local_batch_slice(9) == slice(3, 6)
    with pytest.raises(ValueError, match="not divisible"):
        mh.local_batch_slice(8)


# ---------------------------------------------------------------------------
# jit-cache key must never contain an array


def test_sample_cache_key_tolerates_array_kwargs(trainer):
    """text_embeds/text_mask (or any array kwarg) must be traced, not
    hashed into the jit-cache key (previously: TypeError unhashable)."""
    arrays = {}

    def fake_sample(params, key, batch_size, **kw):
        arrays.update({k: v for k, v in kw.items()
                       if isinstance(v, jax.Array)})
        return jnp.zeros((batch_size, 8, 8, 8, 1))

    orig = trainer.imagen.sample
    trainer.imagen.sample = fake_sample
    try:
        out = trainer.sample(
            batch_size=2, key=jax.random.PRNGKey(0),
            start_at_unet_number=2, start_image_or_video=_start(2),
            text_embeds=jnp.ones((2, 4, 16)), text_mask=jnp.ones((2, 4)),
        )
    finally:
        trainer.imagen.sample = orig
        trainer._sample_fns.clear()  # drop jits built over fake_sample
    assert out.shape == (2, 8, 8, 8, 1)
    # the array kwargs reached the sampler as traced arrays
    assert set(arrays) >= {"text_embeds", "text_mask",
                           "start_image_or_video"}


# ---------------------------------------------------------------------------
# chunk boundaries must respect batch_sample groups


def _spy_chunks(trainer, monkeypatch, batch_size, max_batch_size):
    sizes = []

    def spy(params, key, bs, kwargs):
        sizes.append(bs)
        return jnp.zeros((bs, 8, 8, 8, 1))

    monkeypatch.setattr(trainer, "_call_imagen_sample", spy)
    monkeypatch.setattr(trainer.imagen, "batch_sample", True,
                        raising=False)  # group = 3^3 = 27
    out = trainer.sample(
        batch_size=batch_size, max_batch_size=max_batch_size,
        key=jax.random.PRNGKey(1), start_at_unet_number=2,
        start_image_or_video=_start(batch_size),
    )
    return sizes, out


def test_chunked_sample_aligns_to_group(trainer, monkeypatch):
    """max_batch_size=28 with batch_sample (group 27) must chunk as
    [27, 27], never [28, 26] — a chunk boundary inside a group merges
    sub-volumes of different volumes for attention/halo context."""
    sizes, out = _spy_chunks(trainer, monkeypatch, 54, 28)
    assert sizes == [27, 27]
    assert out.shape[0] == 54


def test_chunked_sample_small_max_batch_keeps_one_group(trainer, monkeypatch):
    """max_batch_size below one group rounds UP to a whole group (a group
    is indivisible)."""
    sizes, _ = _spy_chunks(trainer, monkeypatch, 54, 8)
    assert sizes == [27, 27]


def test_chunked_sample_slices_every_array_kwarg(trainer, monkeypatch):
    """Chunking must slice ALL batch-major array kwargs per chunk, not just
    start_image_or_video (reference split_args_and_kwargs splits every
    tensor kwarg, trainer.py:176-197) — text_embeds/cond_images previously
    reached each chunk whole, shape-mismatching the chunk batch."""
    seen = []

    def spy(params, key, bs, kwargs):
        seen.append({k: np.asarray(v).shape[0]
                     for k, v in kwargs.items()
                     if isinstance(v, (jax.Array, np.ndarray))})
        return jnp.zeros((bs, 8, 8, 8, 1))

    monkeypatch.setattr(trainer, "_call_imagen_sample", spy)
    out = trainer.sample(
        batch_size=6, max_batch_size=4, key=jax.random.PRNGKey(2),
        start_at_unet_number=2, start_image_or_video=_start(6),
        text_embeds=jnp.ones((6, 4, 16)), text_mask=jnp.ones((6, 4)),
    )
    assert out.shape[0] == 6
    assert [s["start_image_or_video"] for s in seen] == [4, 2]
    for s, n in zip(seen, (4, 2)):
        assert s["text_embeds"] == n and s["text_mask"] == n


def test_mesh_pad_covers_every_array_kwarg(trainer, monkeypatch):
    """_mesh_sample's group/device padding must extend ALL batch-major
    array kwargs to the padded batch, not just start_image_or_video."""
    from diffusioniqt_tpu.parallel.mesh import create_mesh

    seen = {}

    def spy(params, key, bs, kwargs):
        seen.update({k: np.asarray(v).shape[0]
                     for k, v in kwargs.items()
                     if isinstance(v, (jax.Array, np.ndarray))})
        return jnp.zeros((bs, 8, 8, 8, 1))

    monkeypatch.setattr(trainer, "_call_imagen_sample", spy)
    monkeypatch.setattr(trainer, "mesh", create_mesh(("data",), (8,)),
                        raising=False)
    out = trainer.sample(
        batch_size=6, key=jax.random.PRNGKey(3), start_at_unet_number=2,
        start_image_or_video=_start(6), text_embeds=jnp.ones((6, 4, 16)),
    )
    # 6 rows pad to 8 (divisible by the 8-device 'data' axis); outputs are
    # sliced back to the requested 6
    assert out.shape[0] == 6
    assert seen["start_image_or_video"] == 8
    assert seen["text_embeds"] == 8


# ---------------------------------------------------------------------------
# skip_steps composes with the non-uniform schedule


def test_skip_steps_with_non_uniform_schedule():
    """skip_steps was silently ignored when non_uniform_times was set —
    a 20x slowdown with no warning. It now subsamples the non-uniform
    (t, t_next) pairs exactly like the uniform grid."""
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
    out, noisy_traj, x0_traj = imagen.sample(
        params, jax.random.PRNGKey(1), batch_size=2,
        start_at_unet_number=2, start_image_or_video=_start(2),
        skip_steps=4, return_trajectory=True,
    )
    assert out.shape == (2, 8, 8, 8, 1)
    # 8 (or 9 with appended endpoints) pairs strided by 4 (+ forced last)
    assert noisy_traj.shape[0] <= 4
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# T5 random-init cache isolation


def test_t5_random_init_cache_not_reused_without_optin():
    """A cached random-init fallback must never satisfy a later call that
    did NOT opt into random weights — that call must raise (offline) or
    load real pretrained weights."""
    from diffusioniqt_tpu.utils import t5

    name = "google/t5-v1_1-small"
    emb = t5.t5_encode_text(["a scan"], name=name, allow_random_init=True)
    assert np.isfinite(np.asarray(emb)).all()
    assert (name, True) in t5._CACHE
    if (name, False) not in t5._CACHE:  # offline image: no real weights
        with pytest.raises(RuntimeError, match="could not load T5"):
            t5.t5_encode_text(["a scan"], name=name)


# ---------------------------------------------------------------------------
# NIfTI unusable slope disables the intercept too


def test_nifti_nan_slope_disables_intercept(tmp_path):
    """nibabel's get_slope_inter: an unusable (NaN/0/inf) slope disables
    scaling ENTIRELY — a finite intercept must not be applied on its own."""
    from diffusioniqt_tpu.data import nifti

    path = str(tmp_path / "x.nii")
    vol = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    nifti.write(path, vol)
    with open(path, "r+b") as fh:
        fh.seek(112)  # scl_slope, then scl_inter at 116
        fh.write(struct.pack("<ff", float("nan"), 100.0))
    data, _ = nifti.read(path)
    np.testing.assert_allclose(data, vol)
