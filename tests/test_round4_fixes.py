"""Round-4 regression tests.

Cross-topology checkpoint restore: a bundle saved under one device
topology (e.g. a TPU-trained run, or an 8-device mesh) must restore onto
a DIFFERENT topology (single-device CPU inference, a differently-factored
mesh). trainer.load builds explicit ``restore_args`` from the prepared
state so every leaf lands on the *current* backend's sharding instead of
whatever (possibly-None) sharding orbax recorded at save time — the
reference analog is torch.load(map_location=...) (reference
``trainer.py:813-820`` loads onto the accelerator in use).
"""

import os

import jax
import numpy as np
import pytest

from diffusioniqt_tpu.train.trainer import ImagenTrainer
from tests.test_trainer import tiny_cfg, tiny_imagen

_REPO = os.path.join(os.path.dirname(__file__), "..")


def _batch():
    rng = np.random.default_rng(0)
    hr = rng.standard_normal((8, 8, 8, 8, 1)).astype(np.float32)
    return hr, hr + 0.1 * rng.standard_normal(hr.shape).astype(np.float32)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_eval_edm_config_loads():
    """config/eval_edm.yaml is the committed north-star inference config
    (PERF.md round-4 EDM e2e run): eval_config.yaml semantics with the
    EDM sampler selected at the reference's 64-step Heun defaults."""
    from diffusioniqt_tpu.config import load_config

    cfg = load_config(os.path.join(_REPO, "config", "eval_edm.yaml"))
    assert cfg.train.elucidated is True
    assert cfg.train.edm_num_sample_steps == 64
    assert cfg.train.batch_sample and cfg.train.boundary
    assert cfg.eval.overlap == 32


@pytest.mark.slow
def test_cross_topology_restore(tmp_path):
    from diffusioniqt_tpu.parallel.mesh import create_mesh

    cfg = tiny_cfg()
    mesh = create_mesh(("data",), (len(jax.devices()),))
    src = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg), mesh=mesh,
                        gradient_accumulation_steps=1, lr=1e-3,
                        ema_update_after_step=1, ema_update_every=1)
    hr, lr_img = _batch()
    src.train_step(unet_number=2, batch=(hr, lr_img))
    path = str(tmp_path / "bundle")
    src.save(path)
    want = _leaves(src.params[1])

    # (a) mesh-saved bundle -> plain single-device trainer (the
    # TPU-train -> CPU-infer shape of the original failure)
    flat = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg),
                         gradient_accumulation_steps=1, lr=1e-3,
                         ema_update_after_step=1, ema_update_every=1)
    flat.load(path)
    for a, b in zip(want, _leaves(flat.params[1])):
        np.testing.assert_allclose(a, b)
    # restored leaves are committed jax.Arrays on the current backend and
    # the trainer keeps training without error
    for leaf in jax.tree_util.tree_leaves(flat.params):
        assert isinstance(leaf, jax.Array)
    assert np.isfinite(float(flat.train_step(unet_number=2,
                                             batch=(hr, lr_img))))

    # (b) mesh-saved bundle -> differently-factored mesh (data x model)
    mesh2 = create_mesh(("data", "model"), (len(jax.devices()) // 2, 2))
    remeshed = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg),
                             mesh=mesh2, gradient_accumulation_steps=1,
                             lr=1e-3, ema_update_after_step=1,
                             ema_update_every=1)
    remeshed.load(path)
    for a, b in zip(want, _leaves(remeshed.params[1])):
        np.testing.assert_allclose(a, b)
    # leaves must follow the NEW topology: every restored param lives on
    # mesh2 (not the save-time mesh, not an unsharded single device)
    for leaf in jax.tree_util.tree_leaves(remeshed.params):
        assert isinstance(leaf, jax.Array)
        assert getattr(leaf.sharding, "mesh", None) is not None
        assert leaf.sharding.mesh.shape == mesh2.shape
    assert np.isfinite(float(remeshed.train_step(unet_number=2,
                                                 batch=(hr, lr_img))))
