"""Multi-chip sampling: patch batch sharded over the 'data' mesh axis.

Sampling is embarrassingly parallel over patches; with the same PRNG key a
mesh-sharded sample must be numerically identical to the single-device one
(VERDICT round-1 item 4 — the v5e-8 volumes/hour plumbing)."""

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


def _start(batch):
    return jax.random.normal(
        jax.random.PRNGKey(7), (batch, 8, 8, 8, 1), jnp.float32
    )


def test_mesh_sampling_matches_single_device(trainer):
    key = jax.random.PRNGKey(3)
    start = _start(8)
    ref = trainer.sample(
        batch_size=8, start_image_or_video=start,
        start_at_unet_number=2, key=key,
    )
    trainer.mesh = create_mesh(("data",), (8,))
    try:
        out = trainer.sample(
            batch_size=8, start_image_or_video=start,
            start_at_unet_number=2, key=key,
        )
    finally:
        trainer.mesh = None
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_mesh_sampling_pads_uneven_batches(trainer):
    """A batch that doesn't divide the mesh is padded by repetition and
    sliced back — output keeps the requested batch size."""
    trainer.mesh = create_mesh(("data",), (8,))
    try:
        out = trainer.sample(
            batch_size=5, start_image_or_video=_start(5),
            start_at_unet_number=2, key=jax.random.PRNGKey(0),
        )
    finally:
        trainer.mesh = None
    assert out.shape[0] == 5
    assert bool(jnp.all(jnp.isfinite(out)))
