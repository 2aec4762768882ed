"""End-to-end entry pipeline: config -> trainer -> sliding-window inference
-> stitching (the test.py/test_all.py path, reference test.py:141-256)."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_infer_volume_pipeline():
    from diffusioniqt_tpu.config import load_config
    from test import build_trainer, infer_volume

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "config",
                     "smoke_config.yaml")
    )
    trainer = build_trainer(cfg)
    trainer.prepare()

    rng = np.random.default_rng(0)
    std = cfg.data.std
    lowres = np.abs(rng.standard_normal((16, 16, 16))).astype(np.float32) * std

    pred = infer_volume(cfg, trainer, lowres, stitch_mode="trim",
                        verbose=False, patch_batch=2)
    assert pred.shape == lowres.shape
    assert np.isfinite(pred).all()
    # outputs live in z-score space and respect the min_bound clamp
    assert pred.min() >= cfg.data.min_bound - 1e-4

    pred_g = infer_volume(cfg, trainer, lowres, stitch_mode="gaussian",
                          verbose=False, patch_batch=2)
    assert np.isfinite(pred_g).all()


def test_evaluate_metrics_from_test_all():
    from test_all import evaluate

    rng = np.random.default_rng(1)
    gt = rng.standard_normal((32, 32, 32)).astype(np.float32)
    pred = gt + 0.05 * rng.standard_normal((32, 32, 32)).astype(np.float32)
    m = evaluate(pred, gt, border=4)
    assert np.isfinite(m["msssim"]) and np.isfinite(m["psnr"])
    worse = evaluate(
        gt + 0.5 * rng.standard_normal(gt.shape).astype(np.float32), gt,
        border=4,
    )
    assert m["psnr"] > worse["psnr"]


def test_infer_volume_pipeline_edm():
    """Same sliding-window entry path with the EDM sampler selected via
    Train.elucidated (the reference ships ElucidatedImagen but never wires
    it into its scripts; here one config switch drives it end-to-end)."""
    from diffusioniqt_tpu.config import load_config
    from test import build_trainer, infer_volume

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "config",
                     "smoke_config.yaml")
    )
    cfg.train.elucidated = True
    cfg.train.edm_num_sample_steps = 4
    trainer = build_trainer(cfg)
    assert trainer.is_elucidated
    trainer.prepare()

    rng = np.random.default_rng(0)
    lowres = np.abs(rng.standard_normal((16, 16, 16))).astype(np.float32) \
        * cfg.data.std
    pred = infer_volume(cfg, trainer, lowres, stitch_mode="trim",
                        verbose=False, patch_batch=2)
    assert pred.shape == lowres.shape
    assert np.isfinite(pred).all()
