"""Standalone quality evaluation from a saved quality-run checkpoint.

Loads the trainer bundle written by tools/quality_run.py, regenerates the
held-out phantoms (same seeds), runs full sliding-window inference +
stitching at 20 sampling steps, and scores MS-SSIM/PSNR against the LR
baseline. Lets training and evaluation be decoupled (e.g. evaluate the
step-2000 checkpoint while the 3000-step run continues, or compare trim
vs gaussian stitching after the fact).

    python tools/quality_eval.py --ckpt results/quality_r3/ckpt \
        --mean M --std S --out results/quality_r3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--mean", type=float, default=None)
    ap.add_argument("--std", type=float, default=None)
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--eval-volumes", type=int, default=2)
    ap.add_argument("--stitch", choices=["trim", "gaussian"], default="trim")
    ap.add_argument("--timesteps", type=int, default=20)
    ap.add_argument("--elucidated", action="store_true",
                    help="evaluate an EDM checkpoint (64-step Heun sampler)")
    ap.add_argument("--edm-steps", type=int, default=64)
    ap.add_argument("--edm-churn", type=float, default=None,
                    help="override S_churn for the Heun sampler (0 = "
                         "deterministic Heun; the reference default 80 "
                         "re-injects noise every step, which trades "
                         "fidelity for diversity)")
    ap.add_argument("--sigma-data", type=float, default=None,
                    help="EDM sigma_data override; defaults to the value "
                         "recorded in the checkpoint's stats.json (must "
                         "match training)")
    ap.add_argument("--patch-batch", type=int, default=8)
    ap.add_argument("--device-stitch", action="store_true",
                    help="device-resident window gather + stitching "
                         "(ops/stitch_device.py): one H2D and one D2H per "
                         "volume instead of per-batch host transfers")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "registers from sitecustomize and hangs when the "
                         "tunnel is down; both the env var and the config "
                         "update are required to override it)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from diffusioniqt_tpu.data.synthetic import (
        generate_pair, population_stats,
    )
    from quality_run import build_trainer, flagship_cfg
    from test import infer_volume
    from test_all import evaluate

    stats = {}
    if args.mean is not None and args.std is not None:
        mean, std = args.mean, args.std
    else:
        # prefer the stats.json quality_run wrote beside the checkpoint —
        # evaluation must z-score with the exact training-time stats
        stats_path = os.path.join(
            os.path.dirname(os.path.abspath(args.ckpt)), "stats.json")
        if os.path.exists(stats_path):
            with open(stats_path) as fh:
                stats = json.load(fh)
            mean, std = stats["mean"], stats["std"]
            print(f"stats from {stats_path}: mean={mean:.3f} std={std:.3f}")
        else:
            print(
                "WARNING: no --mean/--std and no stats.json beside the "
                "checkpoint; recomputing from 4 default training volumes "
                f"at size {args.size} — metrics are skewed if the run "
                "used different --volumes/--size", file=sys.stderr)
            pairs = [generate_pair(args.size, seed=i) for i in range(4)]
            mean, std = population_stats([lr for _, lr in pairs])

    cfg = flagship_cfg(elucidated=args.elucidated)
    cfg.data.mean, cfg.data.std = mean, std
    cfg.train.timesteps = args.timesteps
    if args.elucidated:
        cfg.train.edm_num_sample_steps = args.edm_steps
        if args.edm_churn is not None:
            cfg.train.edm_s_churn = args.edm_churn
        # preconditioning must match training: prefer the explicit flag,
        # then the value quality_run recorded beside the checkpoint
        if args.sigma_data is not None:
            cfg.train.edm_sigma_data = args.sigma_data
        elif "edm_sigma_data" in stats:
            cfg.train.edm_sigma_data = stats["edm_sigma_data"]
            print(f"edm_sigma_data from stats.json: "
                  f"{cfg.train.edm_sigma_data}")
    trainer = build_trainer(cfg)
    trainer.prepare()
    trainer.load(args.ckpt)
    print(f"loaded {args.ckpt} at steps {trainer.steps}", flush=True)

    results = []
    for i in range(args.eval_volumes):
        hr, lr = generate_pair(args.size, seed=10_000 + i)
        hr_n = (hr - mean) / std
        lr_n = (lr - mean) / std
        t1 = time.time()
        pred = infer_volume(cfg, trainer, lr, verbose=False,
                            stitch_mode=args.stitch,
                            patch_batch=args.patch_batch,
                            device_stitch=args.device_stitch)
        elapsed = time.time() - t1
        min_val = lr_n.min()
        pred[lr_n == min_val] = min_val
        border = min(32, (hr.shape[0] - 1) // 3)
        m_pred = evaluate(pred, hr_n, border=border)
        m_lr = evaluate(lr_n, hr_n, border=border)
        row = {
            "volume": i, "stitch": args.stitch,
            "pred_msssim": m_pred["msssim"], "pred_psnr": m_pred["psnr"],
            "lr_msssim": m_lr["msssim"], "lr_psnr": m_lr["psnr"],
            "seconds": round(elapsed, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "ckpt": args.ckpt, "steps": trainer.steps, "stitch": args.stitch,
        "sampler": (f"edm-heun-{args.edm_steps}" if args.elucidated
                    else f"gaussian-ancestral-{args.timesteps}"),
        "edm_s_churn": (
            (args.edm_churn if args.edm_churn is not None
             else cfg.train.edm_s_churn) if args.elucidated else None),
        "edm_sigma_data": (cfg.train.edm_sigma_data
                           if args.elucidated else None),
        "volumes": results,
        "pred_beats_lr_msssim": all(
            r["pred_msssim"] > r["lr_msssim"] for r in results),
        "pred_beats_lr_psnr": all(
            r["pred_psnr"] > r["lr_psnr"] for r in results),
    }
    print(json.dumps(summary))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        suffix = args.suffix.lstrip("_")
        name = f"quality_eval{('_' + suffix) if suffix else ''}.json"
        with open(os.path.join(args.out, name), "w") as fh:
            json.dump(summary, fh, indent=2)


if __name__ == "__main__":
    main()
