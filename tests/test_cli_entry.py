"""CLI + train.py entry smoke tests (subprocess, tiny configs) — the
config/train/sample verb surface (reference cli.py:28-180) and the YAML
training entry (reference train.py), exercised as a user would run them."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, cwd):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable] + argv, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def _tiny_model_config(path):
    cfg = {
        "elucidated": False,
        "imagen": {
            "unets": [
                {"kind": "null"},
                {
                    "kind": "unet3d", "dim": 8, "dim_mults": [1, 2],
                    "channels": 1,
                    "kwargs": {
                        "num_resnet_blocks": 1, "init_dim": 8,
                        "resnet_groups": 4, "init_cross_embed": False,
                        "att_type": "linear", "attend_at_middle": False,
                        "attend_at_enc": [False, False],
                        "use_se_attn": True, "batch_sample": False,
                        "boundary": False, "deep_feature": False,
                        "img_size": 8,
                    },
                },
            ],
            "image_sizes": [8, 8],
            "channels": 1,
            "timesteps": 8,
            "pred_objectives": "x_start",
            "cond_drop_prob": 0.0,
            "dynamic_thresholding": False,
            "norm": "z-score",
        },
    }
    with open(path, "w") as fh:
        json.dump(cfg, fh)


def test_cli_config_train_sample_roundtrip(tmp_path):
    cfg_path = tmp_path / "model.json"
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "samples.npy"
    _tiny_model_config(cfg_path)

    _run(["cli.py", "train", "--config", str(cfg_path), "--checkpoint",
          str(ckpt), "--steps", "2", "--batch-size", "2"], cwd=ROOT)
    assert ckpt.exists()

    _run(["cli.py", "sample", "--config", str(cfg_path), "--checkpoint",
          str(ckpt), "--batch-size", "2", "--output", str(out)], cwd=ROOT)
    arr = np.load(out)
    assert arr.shape == (2, 8, 8, 8, 1)
    assert np.isfinite(arr).all()


def test_cli_config_verb_writes_loadable_json(tmp_path):
    path = tmp_path / "starter.json"
    _run(["cli.py", "config", "--path", str(path)], cwd=ROOT)
    with open(path) as fh:
        raw = json.load(fh)
    assert raw["imagen"]["unets"][1]["kind"] == "unet3d"


def test_train_entry_fake_data(tmp_path):
    # run from a fresh cwd: train.py (like the reference) refuses to reuse
    # an existing results/<project> directory
    stdout = _run(
        [os.path.join(ROOT, "train.py"),
         "--config", os.path.join(ROOT, "config", "smoke_config.yaml"),
         "--fake-data", "--steps", "3", "--eval-every", "2"],
        cwd=str(tmp_path),
    )
    assert "step" in stdout.lower() or "loss" in stdout.lower()
