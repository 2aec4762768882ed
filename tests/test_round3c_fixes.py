"""Regression tests for the round-3 code-review findings (third batch):

* SupervisedIQT crop seeding must not touch the global np.random stream
  (a prefetch worker thread and the main thread would race it, and
  multi-host processes would desynchronize their "identical global batch")
* DataLoader advances the dataset epoch each pass so per-(epoch, idx)
  crops still vary over training
* abandoned prefetch iterators must not leave their worker thread blocked
  on the bounded queue forever
* valid_step must reuse its jitted loss fn across calls (no per-call
  retrace)
* checkpoint restore must re-place state with the prepared mesh shardings
"""

import os
import threading
import time

import numpy as np
import pytest

from diffusioniqt_tpu.config import Config


def _patch_dataset(tmp_path, seed=0):
    from diffusioniqt_tpu.data.datasets import SupervisedIQT

    s = 32
    rng = np.random.default_rng(3)
    lr = rng.standard_normal((s, s, s)).astype(np.float32) + 5.0
    hr = lr * 2.0
    lr_f, hr_f = str(tmp_path / "lr.npy"), str(tmp_path / "hr.npy")
    np.save(lr_f, lr)
    np.save(hr_f, hr)
    cfg = Config()
    cfg.train.patch_size_sub = 8
    cfg.train.batch_sample = False
    cfg.data.norm = "z-score"
    cfg.data.mean, cfg.data.std = 0.0, 1.0
    return SupervisedIQT(cfg, [lr_f], [hr_f], train=True, volume_size=s,
                         seed=seed)


def test_supervised_iqt_ignores_global_np_random(tmp_path):
    """Items depend only on (seed, epoch, idx) — the global np.random
    stream must neither influence them nor be consumed by them."""
    ds = _patch_dataset(tmp_path)

    np.random.seed(0)
    a = ds[0]
    state_after = np.random.get_state()[1].copy()

    np.random.seed(12345)  # totally different global state
    b = ds[0]

    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    # and the global stream was not consumed
    np.random.seed(0)
    _ = ds[0]
    np.testing.assert_array_equal(np.random.get_state()[1], state_after)


def test_supervised_iqt_varies_by_epoch_and_seed(tmp_path):
    ds = _patch_dataset(tmp_path, seed=0)
    a = ds[0]
    ds.set_epoch(1)
    b = ds[0]
    assert not np.array_equal(a[0], b[0]), "epoch must change the crop"

    ds2 = _patch_dataset(tmp_path, seed=99)
    c = ds2[0]
    assert not np.array_equal(a[0], c[0]), "seed must change the crop"

    # two processes with the same seed/epoch see identical batches
    ds3 = _patch_dataset(tmp_path, seed=0)
    d = ds3[0]
    np.testing.assert_array_equal(a[0], d[0])


def test_dataloader_advances_dataset_epoch():
    from diffusioniqt_tpu.data.loader import DataLoader

    class EpochDS:
        def __init__(self):
            self.epochs = []
            self._e = 0

        def set_epoch(self, e):
            self.epochs.append(e)
            self._e = e

        def __len__(self):
            return 2

        def __getitem__(self, i):
            return (np.full((2,), self._e * 10 + i, np.float32),)

    ds = EpochDS()
    dl = DataLoader(ds, batch_size=2)
    first = list(dl)
    second = list(dl)
    assert ds.epochs == [0, 1]
    assert not np.array_equal(first[0][0], second[0][0])


def test_abandoned_prefetch_worker_exits():
    """Dropping a prefetch iterator mid-epoch must unblock and end the
    worker thread (it used to block on q.put forever, pinning batches)."""
    from diffusioniqt_tpu.data.loader import _PrefetchIterator

    def gen():
        for i in range(1000):
            yield np.zeros((64,), np.float32) + i

    it = _PrefetchIterator(gen(), depth=1)
    next(it)  # worker is now blocked on the full queue
    thread = it._thread
    it.close()
    thread.join(timeout=5.0)
    assert not thread.is_alive(), "prefetch worker did not exit after close"


def test_valid_step_reuses_jitted_loss_fn():
    from diffusioniqt_tpu.data.datasets import FakeIQTDataset
    from diffusioniqt_tpu.train.trainer import ImagenTrainer
    from tests.test_trainer import tiny_cfg, tiny_imagen

    cfg = tiny_cfg()
    trainer = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg),
                            gradient_accumulation_steps=1, lr=1e-3)
    trainer.add_valid_dataset(FakeIQTDataset(size=8, length=2, seed=1),
                              batch_size=2)
    trainer.valid_step(unet_number=2)
    assert trainer._valid_loss_fns, "valid loss fn was not cached"
    fn_first = trainer._valid_loss_fns[1]
    trainer.valid_step(unet_number=2)
    assert trainer._valid_loss_fns[1] is fn_first, (
        "valid_step rebuilt its jitted loss fn (per-call retrace)"
    )


def test_restore_keeps_mesh_placement(tmp_path):
    """save -> load on a mesh trainer must re-place params/opt/EMA with the
    prepared shardings (orbax restores host arrays) so the next train_step
    runs the same SPMD program."""
    import jax

    from diffusioniqt_tpu.parallel.mesh import create_mesh
    from diffusioniqt_tpu.train.trainer import ImagenTrainer
    from tests.test_trainer import tiny_cfg, tiny_imagen

    cfg = tiny_cfg()
    mesh = create_mesh(("data",), (len(jax.devices()),))
    trainer = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg), mesh=mesh,
                            gradient_accumulation_steps=1, lr=1e-3,
                            ema_update_after_step=1, ema_update_every=1)
    rng = np.random.default_rng(0)
    hr = rng.standard_normal((8, 8, 8, 8, 1)).astype(np.float32)
    lr_img = hr + 0.1 * rng.standard_normal(hr.shape).astype(np.float32)
    l0 = trainer.train_step(unet_number=2, batch=(hr, lr_img))

    path = str(tmp_path / "bundle")
    trainer.save(path)

    trainer2 = ImagenTrainer(configs=cfg, imagen=tiny_imagen(cfg), mesh=mesh,
                             gradient_accumulation_steps=1, lr=1e-3,
                             ema_update_after_step=1, ema_update_every=1)
    trainer2.load(path)

    def shardings(tree):
        return [getattr(leaf, "sharding", None)
                for leaf in jax.tree_util.tree_leaves(tree)]

    for a, b in zip(shardings(trainer.params), shardings(trainer2.params)):
        assert a == b, f"param sharding lost through restore: {a} vs {b}"
    for leaf in jax.tree_util.tree_leaves(trainer2.params):
        assert isinstance(leaf, jax.Array)

    # the restored trainer continues training with identical results
    l1a = trainer.train_step(unet_number=2, batch=(hr, lr_img))
    l1b = trainer2.train_step(unet_number=2, batch=(hr, lr_img))
    np.testing.assert_allclose(l1a, l1b, rtol=1e-6)
    assert np.isfinite([l0, l1a]).all()
