"""Denoiser-accuracy probe for a trained EDM checkpoint.

Separates a *training-side* failure (the preconditioned denoiser
``D(x; sigma)`` is inaccurate) from a *sampler-side* one (D is accurate but
the Heun/churn loop degrades it): feeds ``x = clean + sigma * n`` through
``ElucidatedImagen.preconditioned_network_forward`` (EDM eq. 7; reference
``/root/reference/elucidated_imagen.py:329-358``) at a ladder of sigmas and
reports RMSE(D(x), clean) against two baselines — the identity denoiser
(RMSE = sigma) and the LR conditioning input itself.

Reading the table:
  * rmse_out << min(sigma, rmse_lr)  at every sigma  -> training is fine;
    suspect the sampling loop / its hyperparameters.
  * rmse_out ~ rmse_lr at small sigma                -> the model ignores
    the noisy input and reproduces the conditioning (undertrained or
    preconditioning scale fights the data scale).
  * rmse_out > sigma at small sigma                  -> the denoiser ADDS
    noise below that scale; sampled output will carry that noise floor,
    depressing MS-SSIM while PSNR stays near the LR baseline.

Usage:
    python tools/edm_probe.py --ckpt results/quality_edm_r4/ckpt [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--sigmas", default="0.01,0.05,0.2,1.0,5.0,20.0")
    ap.add_argument("--sigma-data", type=float, default=None)
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--lowres-noise-level", type=float, default=None,
                    help="conditioning noise level at probe time. Default: "
                         "follow the model config (clean conditioning when "
                         "edm_lowres_noise_aug is off — the IQT default)")
    ap.add_argument("--out", default=None,
                    help="JSON artifact path (default: probe.json beside "
                         "the checkpoint)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from diffusioniqt_tpu.data.synthetic import generate_pair
    from diffusioniqt_tpu.ops.volume import volume_to_subvolumes
    from quality_run import build_trainer, flagship_cfg

    stats_path = os.path.join(
        os.path.dirname(os.path.abspath(args.ckpt)), "stats.json")
    with open(stats_path) as fh:
        stats = json.load(fh)
    mean, std = stats["mean"], stats["std"]

    cfg = flagship_cfg(elucidated=True)
    cfg.data.mean, cfg.data.std = mean, std
    if args.sigma_data is not None:
        cfg.train.edm_sigma_data = args.sigma_data
    elif "edm_sigma_data" in stats:
        cfg.train.edm_sigma_data = stats["edm_sigma_data"]
    print(f"sigma_data={cfg.train.edm_sigma_data}")

    trainer = build_trainer(cfg)
    trainer.prepare()
    trainer.load(args.ckpt)
    print(f"loaded {args.ckpt} at steps {np.asarray(trainer.steps).tolist()}")

    imagen = trainer.imagen
    unet = imagen.unets[1]
    hp = imagen.hparams[1]
    params = trainer._sampling_params(use_ema=not args.no_ema)[1]

    # held-out phantom, center 96^3 crop, z-scored like training
    hr, lr = generate_pair(args.size, seed=10_000)
    hr_n = (hr - mean) / std
    lr_n = (lr - mean) / std
    c0 = (args.size - 96) // 2
    sl = slice(c0, c0 + 96)
    hr_p = hr_n[sl, sl, sl].astype(np.float32)[None, ..., None]
    lr_p = lr_n[sl, sl, sl].astype(np.float32)[None, ..., None]

    f = cfg.train.batch_sample_factor
    clean = volume_to_subvolumes(jnp.asarray(hr_p), f)   # (27,32,32,32,1)
    lowres = volume_to_subvolumes(jnp.asarray(lr_p), f)

    # conditioning treated exactly like ElucidatedImagen.sample: noised at
    # the given level, or clean when lowres_noise_aug is off (IQT default)
    key = jax.random.PRNGKey(0)
    k_low, k_n = jax.random.split(key)
    level = args.lowres_noise_level
    if level is None:
        level = (imagen.lowres_sample_noise_level
                 if imagen.lowres_noise_aug else 0.0)
    if level > 0.0:
        t_low = imagen.lowres_noise_schedule.get_times(clean.shape[0], level)
        lowres_noisy, *_ = imagen.lowres_noise_schedule.q_sample(
            lowres, t_low, jax.random.normal(k_low, lowres.shape))
    else:
        lowres_noisy = lowres
    print(f"conditioning noise level = {level}")

    def rmse(a, b):
        return float(jnp.sqrt(jnp.mean((a - b) ** 2)))

    base_lr = rmse(lowres, clean)
    print(f"baseline RMSE(lowres, clean) = {base_lr:.4f}   "
          f"(data std ~= {float(jnp.std(clean)):.4f})")
    print(f"{'sigma':>8} {'rmse_in':>9} {'rmse_D':>9} {'rmse_D_clamped':>14}")

    # pass sigma as a strongly-typed f32 device scalar (jit treats a Python
    # float argument the same way — one compile — but the explicit dtype
    # keeps the traced signature stable across rungs)
    fwd = jax.jit(lambda p, x, s, lrz: imagen.preconditioned_network_forward(
        unet, p, x, s, hp, clamp=False, lowres_cond_img=lrz))
    fwd_c = jax.jit(lambda p, x, s, lrz: imagen.preconditioned_network_forward(
        unet, p, x, s, hp, clamp=True,
        dynamic_threshold=bool(imagen.dynamic_thresholding[1]),
        lowres_cond_img=lrz))

    rows = []
    for sig_f in [float(s) for s in args.sigmas.split(",")]:
        sig = jnp.float32(sig_f)
        k_n, k = jax.random.split(k_n)
        x = clean + sig * jax.random.normal(k, clean.shape)
        d = fwd(params, x, sig, lowres_noisy)
        dc = fwd_c(params, x, sig, lowres_noisy)
        row = {"sigma": sig_f, "rmse_in": rmse(x, clean),
               "rmse_D": rmse(d, clean), "rmse_D_clamped": rmse(dc, clean)}
        rows.append(row)
        print(f"{sig_f:8.3f} {row['rmse_in']:9.4f} {row['rmse_D']:9.4f} "
              f"{row['rmse_D_clamped']:14.4f}", flush=True)

    summary = {
        "ckpt": args.ckpt,
        "sigma_data": cfg.train.edm_sigma_data,
        "lowres_noise_level": level,
        "data_std": float(jnp.std(clean)),
        "baseline_rmse_lr": base_lr,
        "rows": rows,
    }
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.ckpt)), "probe.json")
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
