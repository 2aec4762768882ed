"""End-to-end trained-quality proof on synthetic phantoms (QUALITY.md).

Trains the flagship eval-config model (dim 64, batch_sample 27x32^3,
boundary halo convs, x_start objective — reference config/eval_config.yaml)
on procedurally generated LR/HR phantom volumes (data/synthetic.py), then
runs full sliding-window inference + stitching on held-out phantoms and
scores MS-SSIM/PSNR against the LR-input baseline — the reference's
acceptance criterion (``/root/reference/test_all.py:304-324``).

Usage (TPU):
    python tools/quality_run.py --steps 3000 --out results/quality
Quick CPU smoke:
    python tools/quality_run.py --quick --out /tmp/q

Writes: loss CSV, checkpoints, metrics JSON (pred vs LR baseline per
held-out volume) under --out.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def flagship_cfg(quick: bool = False, elucidated: bool = False):
    from diffusioniqt_tpu.config import Config

    import jax

    cfg = Config()
    if elucidated:
        # north-star workload (BASELINE.json): EDM training + 64-step
        # Heun sampling at the reference hyperparameter defaults
        # (/root/reference/elucidated_imagen.py:96-106)
        cfg.train.elucidated = True
        cfg.train.edm_num_sample_steps = 64
    cfg.train.batch_sample = True
    cfg.train.boundary = True
    cfg.train.patch_size_sub = 32
    cfg.train.pred_obj = "x_start"
    cfg.train.timesteps = 1000
    cfg.train.dynamic_threshold = False
    cfg.train.lr = 1e-4
    on_tpu = jax.default_backend() == "tpu"
    cfg.train.compute_dtype = "bfloat16" if on_tpu else "float32"
    cfg.eval.overlap = 32
    if quick:
        cfg.train.dim = 16
        cfg.train.init_dim = 16
        cfg.train.dim_mults = (1, 2)
        cfg.train.num_resnet_blocks = (1, 1)
        cfg.train.att_enc = (False, False)
        cfg.train.att_enc_depth = (1, 1)
        cfg.train.att_enc_heads = (8, 8)
        cfg.train.timesteps = 20
    return cfg


def build_trainer(cfg, accum=4, remat=False, remat_policy=None):
    if remat:
        cfg.train.remat = True
        cfg.train.remat_policy = remat_policy
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config
    from diffusioniqt_tpu.train.trainer import ImagenTrainer

    unet = iqt_unet_from_config(cfg)
    if cfg.train.elucidated:
        from diffusioniqt_tpu.diffusion.elucidated import (
            elucidated_imagen_from_config,
        )

        imagen = elucidated_imagen_from_config(cfg, [NullUnet(), unet])
    else:
        from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config

        imagen = imagen_from_config(cfg, [NullUnet(), unet])
    return ImagenTrainer(
        configs=cfg, imagen=imagen, gradient_accumulation_steps=accum,
        lr=cfg.train.lr, use_ema=True,
        ema_update_after_step=cfg.train.ema_update_after_step,
        ema_update_every=cfg.train.ema_update_every,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=None,
                    help="optimizer steps (default 3000; with --quick an "
                         "explicit value overrides the 6-step smoke cap, "
                         "making --quick usable for tiny ablation studies)")
    ap.add_argument("--out", default="results/quality")
    ap.add_argument("--volumes", type=int, default=4)
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--batch-patches", type=int, default=4,
                    help="96^3 patches per optimizer step (accum microbatches)")
    ap.add_argument("--accum", type=int, default=4,
                    help="grad-accum chunks; microbatch = batch-patches/accum "
                         "(PERF.md round 3: b108 microbatches = "
                         "--batch-patches 8 --accum 2 --remat, +50%)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize ResnetBlocks (needed for >27 "
                         "sub-volume microbatches)")
    ap.add_argument("--remat-policy", default=None,
                    help="'conv' saves conv inputs/outputs so backward "
                         "recomputes only the GN/Mish chain (no MXU "
                         "recompute); default full-block recompute")
    ap.add_argument("--resume", default=None,
                    help="checkpoint bundle to resume from (trainer.load)")
    ap.add_argument("--transfer-dtype", default=None,
                    help="host->device batch dtype, e.g. bfloat16 (halves "
                         "H2D bytes; decisive on slow tunnels, see PERF.md)")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--eval-volumes", type=int, default=2)
    ap.add_argument("--elucidated", action="store_true",
                    help="EDM (north-star workload): train the elucidated "
                         "loss, sample 64-step Heun+churn at eval")
    ap.add_argument("--sigma-data", type=float, default=None,
                    help="EDM sigma_data preconditioning scale. The "
                         "reference default 0.5 assumes [-1,1]-normalized "
                         "images; z-scored IQT data has unit variance, for "
                         "which the EDM paper prescribes sigma_data = "
                         "std(data) = 1.0 (Karras et al. 2022, Table 1)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny CPU smoke (dim 16, 96^3 phantoms, 20 steps)")
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

    if args.quick:
        if args.steps is None:
            args.steps = 6
        args.size = 96
        args.volumes = 1
        args.batch_patches = 1
        args.eval_volumes = 1
    elif args.steps is None:
        args.steps = 3000

    os.makedirs(args.out, exist_ok=True)

    from diffusioniqt_tpu.data.synthetic import (
        SyntheticIQTDataset, generate_pair, population_stats,
    )

    cfg = flagship_cfg(quick=args.quick, elucidated=args.elucidated)
    if args.sigma_data is not None:
        cfg.train.edm_sigma_data = args.sigma_data

    # population z-score stats from the training LR volumes (reference
    # precomputes Data.mean/std the same way, config/config.yaml:12-15)
    pairs = [generate_pair(args.size, seed=i) for i in range(args.volumes)]
    mean, std = population_stats([lr for _, lr in pairs])
    cfg.data.mean = mean
    cfg.data.std = std
    cfg.data.mean_hr, cfg.data.std_hr = population_stats(
        [hr for hr, _ in pairs])

    # persist the normalization stats beside the checkpoints so a later
    # quality_eval.py evaluates under the SAME z-scoring the model was
    # trained with (recomputing with different --volumes/--size would
    # silently skew every metric)
    with open(os.path.join(args.out, "stats.json"), "w") as fh:
        stats_row = {"mean": mean, "std": std, "size": args.size,
                     "volumes": args.volumes}
        if args.elucidated:
            # eval must precondition with the SAME sigma_data the model
            # was trained under (quality_eval reads this back)
            stats_row["edm_sigma_data"] = cfg.train.edm_sigma_data
        json.dump(stats_row, fh)

    ds = SyntheticIQTDataset(cfg, seed=0, samples_per_volume=8, pairs=pairs)

    if args.transfer_dtype:
        cfg.train.transfer_dtype = args.transfer_dtype
    trainer = build_trainer(cfg, accum=args.accum if not args.quick else 1,
                            remat=args.remat, remat_policy=args.remat_policy)
    trainer.add_train_dataset(ds, batch_size=args.batch_patches)
    if args.resume:
        trainer.load(args.resume)
        print(f"resumed from {args.resume} at step "
              f"{np.asarray(trainer.steps).tolist()}", flush=True)

    print(f"config: dim={cfg.train.dim} steps={args.steps} "
          f"mean={mean:.2f} std={std:.2f}", flush=True)

    losses = []
    csv_path = os.path.join(args.out, "train_loss.csv")
    t0 = time.time()
    # append so --resume extends the prior loss history instead of wiping it
    new_csv = not os.path.exists(csv_path)
    with open(csv_path, "a") as fh:
        if new_csv:
            fh.write("step,loss,seconds\n")
        pending = []  # (step, device-loss) — sync only at log boundaries
        for step in range(1, args.steps + 1):
            loss = trainer.train_step(unet_number=2, sync=False)
            pending.append((step, loss))
            if step % args.log_every == 0 or step == 1 or step == args.steps:
                for s, dl in pending:
                    v = float(dl)
                    losses.append(v)
                    fh.write(f"{s},{v:.6f},{time.time() - t0:.1f}\n")
                pending = []
                fh.flush()
                recent = np.mean(losses[-args.log_every:])
                print(f"step {step}/{args.steps} loss {recent:.5f} "
                      f"({(time.time() - t0):.0f}s)", flush=True)
            if step % args.ckpt_every == 0 or step == args.steps:
                # atomic: write beside the live dir, then swap — a kill
                # mid-save can't destroy the previous rolling checkpoint
                ckpt_dir = os.path.join(args.out, "ckpt")
                trainer.save(ckpt_dir + ".tmp")
                if os.path.exists(ckpt_dir):
                    shutil.rmtree(ckpt_dir)
                os.replace(ckpt_dir + ".tmp", ckpt_dir)

    # ---- final eval: full sampling on held-out phantoms -------------------
    # (20-step ancestral Gaussian, or 64-step EDM Heun with --elucidated)
    cfg_eval = flagship_cfg(quick=args.quick, elucidated=args.elucidated)
    if args.sigma_data is not None:
        cfg_eval.train.edm_sigma_data = args.sigma_data
    cfg_eval.data.mean, cfg_eval.data.std = mean, std
    cfg_eval.train.timesteps = 20
    if args.quick and args.elucidated:
        cfg_eval.train.edm_num_sample_steps = 8
    eval_trainer = build_trainer(cfg_eval)
    eval_trainer.prepare()
    eval_trainer.params = trainer.params
    eval_trainer.ema_states = trainer.ema_states

    from test import infer_volume
    from test_all import evaluate

    results = []
    for i in range(args.eval_volumes):
        hr, lr = generate_pair(args.size, seed=10_000 + i)
        hr_n = (hr - mean) / std
        lr_n = (lr - mean) / std
        t1 = time.time()
        pred = infer_volume(cfg_eval, eval_trainer, lr, verbose=False,
                            patch_batch=8 if not args.quick else 1)
        elapsed = time.time() - t1
        # background masking (reference test_all.py:300)
        min_val = lr_n.min()
        pred[lr_n == min_val] = min_val

        border = min(32, (hr.shape[0] - 1) // 3)
        m_pred = evaluate(pred, hr_n, border=border)
        m_lr = evaluate(lr_n, hr_n, border=border)
        row = {
            "volume": i,
            "pred_msssim": m_pred["msssim"], "pred_psnr": m_pred["psnr"],
            "lr_msssim": m_lr["msssim"], "lr_psnr": m_lr["psnr"],
            "seconds": round(elapsed, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "sampler": ("edm-heun-64" if args.elucidated
                    else "gaussian-ancestral-20"),
        "steps": args.steps,
        "final_loss_mean_100": float(np.mean(losses[-100:])),
        "first_loss_mean_100": float(np.mean(losses[:100])),
        "volumes": results,
        "pred_beats_lr_msssim": all(
            r["pred_msssim"] > r["lr_msssim"] for r in results),
        "pred_beats_lr_psnr": all(
            r["pred_psnr"] > r["lr_psnr"] for r in results),
        "config": {"dim": cfg.train.dim, "size": args.size,
                   "mean": mean, "std": std,
                   "edm_sigma_data": (cfg.train.edm_sigma_data
                                      if args.elucidated else None)},
    }
    with open(os.path.join(args.out, "quality.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
