"""2D-slice trained-quality proof — companion to quality_run.py.

The reference ships a 2D slice variant of the model (component #20,
``/root/reference/imagen_pytorch2D.py``, used for the 2D-slice config).
Here the same trainer + Imagen wrapper drive ``UNet2D`` with
``spatial_dims=2`` on axial slices of the procedural phantoms
(data/synthetic.py), then 20-step sampling on held-out slices is scored
against the LR-input baseline with the reference acceptance criterion
(``/root/reference/test_all.py:304-324``): sampled output must beat LR
on MS-SSIM and PSNR.

CPU-friendly (dim 24, 96^2 training crops, ~600 steps); also runs on the
TPU chip unchanged.

Usage:
    python tools/quality_run_2d.py --steps 600 --out results/quality_2d
    python tools/quality_run_2d.py --quick --out /tmp/q2d   # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


class SliceIQTDataset:
    """Random foreground axial slices (+ random square crop) from phantom
    pairs, z-scored with population stats — the 2D analog of
    ``SyntheticIQTDataset`` (reference 2D config trains on slices)."""

    def __init__(self, pairs, mean, std, crop: int = 96,
                 samples_per_volume: int = 32, seed: int = 0,
                 min_foreground: float = 0.2):
        self.mean, self.std = mean, std
        self.crop = crop
        self.samples_per_volume = samples_per_volume
        self._rng = np.random.default_rng(seed + 1234)
        self.slices = []  # (hr_slice, lr_slice) raw intensity
        for hr, lr in pairs:
            for z in range(hr.shape[0]):
                frac = np.count_nonzero(lr[z]) / lr[z].size
                if frac >= min_foreground:
                    self.slices.append((hr[z], lr[z]))
        assert self.slices, "no foreground slices found"

    def __len__(self):
        return len(self.slices)

    def __getitem__(self, idx: int):
        hr, lr = self.slices[self._rng.integers(0, len(self.slices))]
        c = self.crop
        ry, rx = self._rng.integers(0, hr.shape[0] - c + 1, size=2)
        hr_p = (hr[ry:ry + c, rx:rx + c] - self.mean) / self.std
        lr_p = (lr[ry:ry + c, rx:rx + c] - self.mean) / self.std
        return (hr_p[..., None].astype(np.float32),
                lr_p[..., None].astype(np.float32))


def build_trainer_2d(dim, crop, timesteps, mean, std, lr_rate, dtype):
    import jax.numpy as jnp

    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.diffusion.gaussian import Imagen
    from diffusioniqt_tpu.models.unet2d import UNet2D
    from diffusioniqt_tpu.models.unet3d import NullUnet
    from diffusioniqt_tpu.train.trainer import ImagenTrainer

    cfg = Config()
    cfg.train.batch_sample = False
    cfg.train.boundary = False
    cfg.train.patch_size_sub = crop
    cfg.train.timesteps = timesteps
    cfg.train.pred_obj = "x_start"
    cfg.train.compute_dtype = dtype
    cfg.data.mean, cfg.data.std = mean, std

    unet = UNet2D(
        dim=dim, dim_mults=(1, 2, 4), num_resnet_blocks=2, channels=1,
        init_dim=dim, resnet_groups=8, att_type="linear",
        use_se_attn=True, dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
    )
    imagen = Imagen(
        unets=[NullUnet(), unet],
        image_sizes=(crop, crop),
        channels=1,
        timesteps=timesteps,
        pred_objectives="x_start",
        dynamic_thresholding=False,
        p2_loss_weight_gamma=0.0,
        auto_normalize_img=False,
        cond_drop_prob=0.0,
        min_bound=(0.0 - mean) / std,
        norm="z-score",
        spatial_dims=2,
    )
    return cfg, ImagenTrainer(
        configs=cfg, imagen=imagen, gradient_accumulation_steps=1,
        lr=lr_rate, use_ema=True, ema_update_after_step=100,
        ema_update_every=10,
    )


def _atomic_save(trainer, ckpt_dir: str):
    """Write the bundle next to ckpt_dir, then swap it in — a kill mid-save
    can't destroy the previous rolling checkpoint."""
    import shutil

    tmp = ckpt_dir + ".tmp"
    trainer.save(tmp)
    if os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    os.replace(tmp, ckpt_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default="results/quality_2d")
    ap.add_argument("--volumes", type=int, default=3)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--dim", type=int, default=24)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--train-timesteps", type=int, default=1000)
    ap.add_argument("--sample-timesteps", type=int, default=20)
    ap.add_argument("--eval-slices", type=int, default=32)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--ckpt-every", type=int, default=500,
                    help="save a rolling checkpoint every N steps so long "
                         "runs survive interruption (0 disables)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to load before training")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate --resume checkpoint")
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke: dim 8, 32^2 crops, 6 steps")
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
        args.steps, args.dim, args.crop = 6, 8, 32
        args.size, args.volumes, args.batch = 96, 1, 2
        args.eval_slices = 8

    os.makedirs(args.out, exist_ok=True)

    import jax

    from diffusioniqt_tpu.data.synthetic import generate_pair, population_stats

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    pairs = [generate_pair(args.size, seed=i) for i in range(args.volumes)]
    mean, std = population_stats([lr for _, lr in pairs])

    ds = SliceIQTDataset(pairs, mean, std, crop=args.crop, seed=0)
    cfg, trainer = build_trainer_2d(
        args.dim, args.crop, args.train_timesteps, mean, std, args.lr, dtype)
    trainer.add_train_dataset(ds, batch_size=args.batch)

    print(f"config: dim={args.dim} crop={args.crop} slices={len(ds)} "
          f"mean={mean:.2f} std={std:.2f}", flush=True)

    if args.resume:
        trainer.load(args.resume)
        print(f"resumed from {args.resume} at step "
              f"{int(trainer.steps[1])}", flush=True)

    losses = []
    if not args.eval_only:
        ckpt_dir = os.path.join(args.out, "ckpt")
        t0 = time.time()
        csv_path = os.path.join(args.out, "train_loss.csv")
        new_csv = not os.path.exists(csv_path)
        with open(csv_path, "a") as fh:
            if new_csv:
                fh.write("step,loss,seconds\n")
            pending = []
            for step in range(1, args.steps + 1):
                pending.append((step, trainer.train_step(unet_number=2,
                                                         sync=False)))
                if step % args.log_every == 0 or step in (1, args.steps):
                    for s, dl in pending:
                        v = float(dl)
                        losses.append(v)
                        fh.write(f"{s},{v:.6f},{time.time() - t0:.1f}\n")
                    pending = []
                    fh.flush()
                    print(f"step {step}/{args.steps} "
                          f"loss {np.mean(losses[-args.log_every:]):.5f} "
                          f"({time.time() - t0:.0f}s)", flush=True)
                if args.ckpt_every and step % args.ckpt_every == 0:
                    _atomic_save(trainer, ckpt_dir)
        _atomic_save(trainer, ckpt_dir)

    # ---- eval: sample held-out central slices, score stacked stacks ------
    from test_all import evaluate

    hr, lr = generate_pair(args.size, seed=10_000)
    z0 = (hr.shape[0] - args.eval_slices) // 2
    zs = slice(z0, z0 + args.eval_slices)
    hr_n = ((hr[zs] - mean) / std).astype(np.float32)
    lr_n = ((lr[zs] - mean) / std).astype(np.float32)

    # 20-step EMA sampling over the slice batch (full slices; the model is
    # fully convolutional so the train-time crop size does not bind).
    # Sampling timesteps live in the noise schedulers, so build an eval
    # trainer at sample_timesteps and hand it the trained params/EMA
    # (same pattern as quality_run.py's eval phase).
    import jax.numpy as jnp

    # image_sizes must match the eval slice extent — the ancestral sampler
    # draws its initial noise at image_sizes, and the fully-convolutional
    # params transfer across sizes unchanged
    _, eval_trainer = build_trainer_2d(
        args.dim, args.size, args.sample_timesteps, mean, std, args.lr,
        dtype)
    eval_trainer.prepare()
    eval_trainer.params = trainer.params
    eval_trainer.ema_states = trainer.ema_states

    t1 = time.time()
    pred = np.array(eval_trainer.sample(
        start_at_unet_number=2,
        start_image_or_video=jnp.asarray(lr_n)[..., None],
        batch_size=args.eval_slices,
        max_batch_size=8,
    ))[..., 0]
    elapsed = time.time() - t1

    # background masking (reference test_all.py:300)
    min_val = lr_n.min()
    pred[lr_n == min_val] = min_val

    border = min(8, (args.eval_slices - 1) // 3)
    m_pred = evaluate(pred, hr_n, border=border)
    m_lr = evaluate(lr_n, hr_n, border=border)

    summary = {
        "steps": args.steps,
        "final_loss_mean_50": float(np.mean(losses[-50:])) if losses else None,
        "first_loss_mean_50": float(np.mean(losses[:50])) if losses else None,
        "eval_slices": args.eval_slices,
        "sample_seconds": round(elapsed, 1),
        "pred_msssim": m_pred["msssim"], "pred_psnr": m_pred["psnr"],
        "lr_msssim": m_lr["msssim"], "lr_psnr": m_lr["psnr"],
        "pred_beats_lr_msssim": m_pred["msssim"] > m_lr["msssim"],
        "pred_beats_lr_psnr": m_pred["psnr"] > m_lr["psnr"],
        "config": {"dim": args.dim, "crop": args.crop, "size": args.size,
                   "volumes": args.volumes, "batch": args.batch,
                   "backend": jax.default_backend()},
    }
    with open(os.path.join(args.out, "quality_eval_2d.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
