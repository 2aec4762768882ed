"""Multi-host integration: two real JAX processes train with losses
identical to a single-process run (VERDICT round-2 missing #4; the
reference's contract comes free from the Accelerate launcher,
/root/reference/trainer.py:296-301).

Each subprocess hosts 2 virtual CPU devices (4 global); the trainer slices
the deterministic global batch per process (split_batches semantics) and
assembles global arrays with jax.make_array_from_process_local_data.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_worker_pair(ckpt_dir=None):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    extra = [str(ckpt_dir)] if ckpt_dir else []
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_ROOT, "tests",
                                          "_multihost_worker.py"),
             str(rank), str(port)] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=_ROOT,
        )
        for rank in range(2)
    ]
    outs, codes = [], []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
        codes.append(p.returncode)
    return outs, codes


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    ckpt_dir = tmp_path / "mh_ckpt"
    outs, codes = _run_worker_pair(ckpt_dir)
    if any(c != 0 for c in codes) and any(
            "DEADLINE_EXCEEDED" in o for o in outs):
        # Gloo rendezvous has a hard ~30 s deadline; on a loaded 1-core box
        # cold compiles can skew the workers past it. Retry once — second
        # attempt runs from warm compile caches.
        outs, codes = _run_worker_pair(ckpt_dir)
    for out, code in zip(outs, codes):
        assert code == 0, f"worker failed:\n{out}"

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES")]
        assert line, f"no LOSSES line in worker output:\n{out}"
        losses.append(json.loads(line[-1][len("LOSSES"):]))
    # both processes observe the same global loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # valid_step ran after mesh training on both processes (replicated
    # batch over the global mesh) and agreed
    vlosses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("VALID")]
        assert line, f"no VALID line in worker output:\n{out}"
        vlosses.append(json.loads(line[-1][len("VALID"):]))
    np.testing.assert_allclose(vlosses[0], vlosses[1], rtol=1e-6)

    # mesh sampling on the multi-process mesh produced identical output
    # digests on both processes (start-image scatter + output allgather)
    samples = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("SAMPLE")]
        assert line, f"no SAMPLE line in worker output:\n{out}"
        samples.append(json.loads(line[-1][len("SAMPLE"):]))
    np.testing.assert_allclose(samples[0], samples[1], rtol=1e-6)
    assert np.isfinite(samples).all()

    # EDM segmented sampling on the multi-process mesh agreed across
    # processes (the north-star serving combination: eager launch-capped
    # Heun segments over mesh-assembled global arrays)
    esamples = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("EDMSAMPLE")]
        assert line, f"no EDMSAMPLE line in worker output:\n{out}"
        esamples.append(json.loads(line[-1][len("EDMSAMPLE"):]))
    np.testing.assert_allclose(esamples[0], esamples[1], rtol=1e-6)
    assert np.isfinite(esamples).all()

    # the collective save -> fresh-trainer load -> train_step round-trip
    # produced the same loss on both processes (checkpointing on a
    # multi-process mesh is a collective: state gather + main-only write)
    rlosses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESUMED")]
        assert line, f"no RESUMED line in worker output:\n{out}"
        rlosses.append(json.loads(line[-1][len("RESUMED"):]))
    np.testing.assert_allclose(rlosses[0], rlosses[1], rtol=1e-6)
    assert np.isfinite(rlosses).all()

    # single-process reference with the same batches/seed
    from diffusioniqt_tpu.train.trainer import ImagenTrainer
    from tests.test_trainer import tiny_cfg, tiny_imagen

    cfg = tiny_cfg()
    trainer = ImagenTrainer(
        configs=cfg, imagen=tiny_imagen(cfg),
        gradient_accumulation_steps=1, lr=2e-3,
    )
    rng = np.random.default_rng(0)
    ref = []
    for _ in range(3):
        hr = rng.standard_normal((4, 8, 8, 8, 1)).astype(np.float32)
        lr_img = hr + 0.1 * rng.standard_normal(hr.shape).astype(np.float32)
        ref.append(trainer.train_step(unet_number=2, batch=(hr, lr_img)))
    np.testing.assert_allclose(losses[0], ref, rtol=1e-4, atol=1e-5)
