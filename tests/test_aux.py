"""Aux subsystem tests: checkpoint utils, t5 bridge, perceptual loss,
profiling/debug helpers, config system."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusioniqt_tpu.config import Config, load_config


def test_config_yaml_roundtrip(tmp_path):
    import yaml

    cfg = Config()
    cfg.train.batch_sample = True
    cfg.train.boundary = True
    path = tmp_path / "c.yaml"
    with open(path, "w") as fh:
        yaml.dump(cfg.to_dict(), fh)
    cfg2 = load_config(str(path))
    assert cfg2.train.batch_sample is True
    assert cfg2.train.boundary is True
    assert cfg2.train.patch_size == 96
    assert cfg2.data.min_bound == pytest.approx((0 - cfg.data.mean) / cfg.data.std)


def test_config_use_se_trailing_comma_quirk():
    """'use_se: True,' parses as the string 'True,' in YAML — must coerce to
    bool (reference config.yaml:50 quirk, SURVEY.md §5)."""
    cfg = Config.from_dict({"Train": {"use_se": "True,", "boundary": "false"}})
    assert cfg.train.use_se is True
    assert cfg.train.boundary is False


def test_reference_config_files_load():
    for name in ("config/config.yaml", "config/eval_config.yaml"):
        cfg = load_config(os.path.join(os.path.dirname(__file__), "..", name))
        assert cfg.train.patch_size_sub == 32
    assert cfg.train.batch_sample and cfg.train.boundary  # eval config
    assert cfg.train.timesteps == 20
    assert cfg.eval.overlap == 32


def test_t5_hash_encoder():
    from diffusioniqt_tpu.utils.t5 import get_encoded_dim, hash_text_encode

    emb, mask = hash_text_encode(["hello world", "a"], dim=32,
                                 return_attn_mask=True)
    assert emb.shape == (2, 16, 32)
    assert mask[0, :2].all() and not mask[0, 2]
    # deterministic
    emb2 = hash_text_encode(["hello world", "a"], dim=32)
    np.testing.assert_array_equal(emb, emb2)
    assert get_encoded_dim("google/t5-v1_1-base") == 768


@pytest.mark.slow
def test_imagen_checkpoint_roundtrip(tmp_path):
    from diffusioniqt_tpu.utils.checkpoints import (
        load_imagen_checkpoint,
        save_imagen_checkpoint,
    )
    from tests.test_trainer import tiny_cfg, tiny_imagen

    imagen = tiny_imagen(tiny_cfg())
    params = imagen.init_params(jax.random.PRNGKey(0))
    ema = jax.tree_util.tree_map(lambda p: p * 0.5, params)
    path = str(tmp_path / "bundle")
    save_imagen_checkpoint(path, imagen, params, ema_params=ema)

    restored, ema_restored = load_imagen_checkpoint(path, imagen)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    swapped, _ = load_imagen_checkpoint(path, imagen,
                                        load_ema_if_available=True)
    for a, b in zip(jax.tree_util.tree_leaves(swapped),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_parts_partial():
    from diffusioniqt_tpu.utils.checkpoints import restore_parts

    target = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,))}
    source = {"a": jnp.ones((2, 2)), "b": jnp.ones((4,))}  # b mismatched
    out = restore_parts(target, source)
    np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["b"]), 0.0)


@pytest.mark.slow
def test_perceptual_loss_orders_similarity():
    from diffusioniqt_tpu.metrics.perceptual import MedPerceptualLoss

    loss = MedPerceptualLoss(input_size=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
    near = x + 0.01 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    far = x + 1.0 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
    assert float(loss(near, x)) < float(loss(far, x))
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-6)


def test_volume_to_slices_shape():
    from diffusioniqt_tpu.metrics.perceptual import volume_to_slices

    vol = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 32, 1))
    slices = volume_to_slices(vol, target_size=64)
    # d in range(0, 30, 9) -> 4 positions x 2 orientations
    assert slices.shape == (8, 64, 64, 3)


def test_phase_timer_and_debug():
    from diffusioniqt_tpu.utils.debug import assert_tree_finite
    from diffusioniqt_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("work"):
        _ = jnp.ones((4,)) * 2
    assert "work" in t.summary()

    assert_tree_finite({"x": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_tree_finite({"x": jnp.array([jnp.nan])})


@pytest.mark.slow
def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (27, 32, 32, 32, 1)


def test_multihost_helpers_single_host():
    """Multi-host helpers (parallel/multihost.py) in single-host mode: init
    no-ops, this process is main, and the local batch slice spans the whole
    batch (reference accelerator predicates, trainer.py:434-448)."""
    from diffusioniqt_tpu.parallel.multihost import (
        initialize_multihost,
        is_main_process,
        local_batch_slice,
    )

    initialize_multihost()  # must not raise or call jax.distributed
    assert is_main_process()
    assert local_batch_slice(8) == slice(0, 8)


def test_multihost_env_parsing(monkeypatch):
    """Env-driven config reaches jax.distributed.initialize with the right
    values (stubbed out — no real cluster in this image)."""
    import diffusioniqt_tpu.parallel.multihost as mh

    calls = {}

    class _FakeDistributed:
        @staticmethod
        def initialize(coordinator_address=None, num_processes=None,
                       process_id=None):
            calls.update(addr=coordinator_address, n=num_processes,
                         pid=process_id)

    import jax

    monkeypatch.setattr(jax, "distributed", _FakeDistributed)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    mh.initialize_multihost()
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}


def test_t5_real_encoder_path_random_init():
    """The genuine HF T5EncoderModel forward runs offline via
    allow_random_init (same code path as pretrained weights); embeddings
    are deterministic, masked positions zeroed, mask marks real tokens."""
    import numpy as np
    import pytest as _pytest

    _pytest.importorskip("transformers")
    _pytest.importorskip("torch")
    import os as _os

    _os.environ.setdefault("HF_HUB_OFFLINE", "1")  # fail fast to the fallback
    from diffusioniqt_tpu.utils.t5 import t5_encode_text

    emb, mask = t5_encode_text(
        ["hello volumetric world", "t5"], name="google/t5-v1_1-small",
        return_attn_mask=True, allow_random_init=True,
    )
    assert emb.shape[0] == 2 and emb.shape[2] == 512
    assert mask.shape == emb.shape[:2]
    assert mask[0].sum() == 4 and mask[1].sum() == 2  # words + </s>
    # padded positions zeroed (reference t5.py masking semantics)
    assert np.all(emb[1, 2:] == 0.0)
    emb2 = t5_encode_text(
        ["hello volumetric world", "t5"], name="google/t5-v1_1-small",
        allow_random_init=True,
    )
    np.testing.assert_array_equal(emb, emb2)  # cached singleton
