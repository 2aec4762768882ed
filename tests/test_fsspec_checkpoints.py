"""fsspec-URL checkpointing: save/load roundtrip through memory:// —
the reference's cloud-checkpoint capability (trainer.py:99-110, 274-280),
VERDICT round-1 item 8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.train.trainer import ImagenTrainer
from tests.test_trainer import tiny_cfg, tiny_imagen


@pytest.fixture()
def trainer():
    cfg = tiny_cfg()
    tr = ImagenTrainer(
        configs=cfg, imagen=tiny_imagen(cfg), gradient_accumulation_steps=1,
        lr=2e-3,
    )
    tr.prepare()
    return tr


def _train_one(tr):
    hr = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 1))
    lr_img = hr * 0.5
    tr.train_step(unet_number=2, batch=(hr, lr_img))


def test_memory_url_roundtrip(trainer):
    _train_one(trainer)
    url = "memory://ckpts/bundle.msgpack"
    trainer.save(url)

    before = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(trainer.params[1])]
    _train_one(trainer)  # mutate state (donates the old param buffers)
    after = [np.asarray(x)
             for x in jax.tree_util.tree_leaves(trainer.params[1])]
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )

    trainer.load(url)
    restored = jax.tree_util.tree_leaves(trainer.params[1])
    for a, b in zip(before, restored):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert trainer.steps[1] == 1


def test_memory_url_noop_if_not_exist(trainer):
    trainer.load("memory://nope/missing.msgpack", noop_if_not_exist=True)
    with pytest.raises(FileNotFoundError):
        trainer.load("memory://nope/missing.msgpack")


def test_url_checkpoint_folder_rolling(trainer):
    trainer.checkpoint_path = "memory://roll"
    trainer.max_checkpoints_keep = 2
    for _ in range(3):
        _train_one(trainer)
        trainer.save_to_checkpoint_folder()
    ckpts = trainer.all_checkpoints_sorted
    assert len(ckpts) == 2
    assert ckpts[0].endswith("checkpoint.3")

    steps_before = list(trainer.steps)
    _train_one(trainer)
    trainer.load_from_checkpoint_folder()
    assert trainer.steps == steps_before
