"""Test-set sweep entry — capability parity with the reference
``test_all.py``: full-volume inference over every test subject, background
masking, MS-SSIM / PSNR / (optional) LPIPS evaluation with center-crop, mean
± std summary and timing (reference test_all.py:43-326).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diffusioniqt_tpu.utils.platform import ensure_platform

ensure_platform()


def evaluate(pred: np.ndarray, gt: np.ndarray, border: int = 32,
             lpips_fn=None):
    """Center-cropped MS-SSIM / PSNR (+LPIPS when available) (reference
    ``eval()``, test_all.py:47-85)."""
    import jax.numpy as jnp

    from diffusioniqt_tpu.metrics.image import MSSIM, PSNR

    p = pred[border:-border, border:-border, border:-border]
    g = gt[border:-border, border:-border, border:-border]
    p5 = jnp.asarray(p)[None, ..., None]
    g5 = jnp.asarray(g)[None, ..., None]
    # min-max normalise jointly like the reference metric wrappers
    msssim = float(MSSIM(
        (p5 - p5.min()) / (p5.max() - p5.min()),
        (g5 - g5.min()) / (g5.max() - g5.min()),
    ))
    psnr_v = float(PSNR(p5, g5))
    out = {"msssim": msssim, "psnr": psnr_v}
    if lpips_fn is not None:
        out["lpips"] = float(lpips_fn(p, g))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="./config/eval_config.yaml")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output-dir", default="./inference_out")
    ap.add_argument("--stitch", choices=["trim", "gaussian"], default="trim")
    ap.add_argument("--patch-batch", type=int, default=8)
    ap.add_argument("--fake-data", action="store_true")
    ap.add_argument("--fake-volumes", type=int, default=1)
    ap.add_argument("--fake-edge", type=int, default=None)
    ap.add_argument("--lpips", action="store_true",
                    help="report slice-wise LPIPS (reference test_all.py:43)")
    ap.add_argument("--lpips-weights", default=None,
                    help="torch VGG16/LPIPS checkpoint for trained features")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the patch batch over an N-device data mesh")
    ap.add_argument("--transfer-dtype", default=None,
                    help="host->device start-image dtype, e.g. bfloat16 "
                         "(halves H2D bytes; decisive on slow tunnels)")
    ap.add_argument("--device-stitch", action="store_true",
                    help="keep the volume and stitching buffers device-"
                         "resident: one H2D upload + one D2H download per "
                         "volume instead of per-batch transfers")
    args = ap.parse_args()

    from diffusioniqt_tpu.config import load_config
    from diffusioniqt_tpu.data.datasets import load_volume, save_volume
    from test import build_trainer, infer_volume

    cfg = load_config(args.config)
    if args.transfer_dtype:
        cfg.train.transfer_dtype = args.transfer_dtype
    trainer = build_trainer(cfg, mesh_devices=args.mesh)
    if args.checkpoint:
        trainer.load(args.checkpoint)
    else:
        trainer.prepare()
        print("WARNING: no checkpoint given — sampling with random weights")

    mean, std = cfg.data.mean, cfg.data.std
    os.makedirs(args.output_dir, exist_ok=True)

    if args.fake_data:
        rng = np.random.default_rng(0)
        edge = args.fake_edge or cfg.train.patch_size + cfg.eval.overlap
        subjects = []
        for i in range(args.fake_volumes):
            hr = np.abs(rng.standard_normal((edge,) * 3)).astype(np.float32) * std
            lr = hr + rng.standard_normal(hr.shape).astype(np.float32) * 0.1 * std
            subjects.append((f"fake{i}", lr, hr))
    else:
        lr_files = sorted(glob.glob(cfg.data.lowres_path_test))
        subjects = []
        for lrf in lr_files:
            hrf = lrf.replace("lr_norm", cfg.data.groundtruth_fname)
            lr = load_volume(lrf)
            hr = load_volume(hrf)
            if lr.shape[-1] == 256:
                low, high = 8, 248
                lr = lr[low:high, low:high, low:high]
                hr = hr[low:high, low:high, low:high]
            subjects.append((os.path.basename(os.path.dirname(lrf)), lr, hr))

    lpips_model = None
    if args.lpips:
        from diffusioniqt_tpu.metrics.lpips import (
            LPIPS, lpips_from_torch_checkpoint,
        )

        if args.lpips_weights:
            lpips_model = lpips_from_torch_checkpoint(args.lpips_weights)
            lpips_label = "LPIPS"
        else:
            # no trained VGG in-image: fixed-seed random features are a
            # perceptual *proxy*, not comparable to published LPIPS numbers
            print("WARNING: no --lpips-weights given; reporting "
                  "LPIPS(random-features), a proxy not comparable to "
                  "trained-VGG LPIPS values")
            lpips_model = LPIPS()
            lpips_label = "LPIPS(random-features)"

    msssims, psnrs, lpipss, times = [], [], [], []
    border = min(32, (subjects[0][1].shape[0] - 1) // 3) if subjects else 32
    for name, lowres, highres in subjects:
        start = time.time()
        pred = infer_volume(cfg, trainer, lowres, stitch_mode=args.stitch,
                            verbose=False, patch_batch=args.patch_batch,
                            device_stitch=args.device_stitch)
        elapsed = time.time() - start
        times.append(elapsed)

        lowres_n = (lowres - mean) / std
        highres_n = (highres - mean) / std
        # background masking (reference test_all.py:300)
        min_val = lowres_n.min()
        pred[lowres_n == min_val] = min_val

        m = evaluate(pred, highres_n, border=border)
        msssims.append(m["msssim"])
        psnrs.append(m["psnr"])
        lpips_msg = ""
        if lpips_model is not None:
            from diffusioniqt_tpu.metrics.lpips import lpips_volume_metric

            p = pred[border:-border, border:-border, border:-border]
            g = highres_n[border:-border, border:-border, border:-border]
            lp = lpips_volume_metric(g, p, lpips_model)
            lpipss.append(lp)
            lpips_msg = f" lpips={lp:.4f}"
        print(f"{name}: msssim={m['msssim']:.4f} psnr={m['psnr']:.3f} "
              f"time={elapsed:.1f}s{lpips_msg}")

        np.save(os.path.join(args.output_dir, f"{name}_inf.npy"), pred)
        try:
            save_volume(os.path.join(args.output_dir, f"{name}_inf.nii.gz"), pred)
        except ImportError:
            pass

    print(f"MS-SSIM: {np.mean(msssims):.4f} +/- {np.std(msssims):.4f}")
    print(f"PSNR:    {np.mean(psnrs):.3f} +/- {np.std(psnrs):.3f}")
    if lpipss:
        print(f"{lpips_label}:   "
              f"{np.mean(lpipss):.4f} +/- {np.std(lpipss):.4f}")
    print(f"Avg sampling time: {np.mean(times):.2f}s")


if __name__ == "__main__":
    main()
