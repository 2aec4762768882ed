"""Measure the torch reference on this machine — an external baseline.

The reference repo records no benchmark numbers (SURVEY.md §6), and its full
GPU stack (kornia/torchmetrics/A100) is unavailable here, so round 1's
``vs_baseline`` was self-referential. This harness runs the REFERENCE's own
flagship U-Net (built from ``/root/reference/imagen_pytorch3D.py`` via
tools/ref_compat stubs, torch CPU) and this repo's flax U-Net on the SAME
device (CPU) at the SAME workload — one 96^3 patch as 27x32^3 sub-volumes,
boundary convs, dim-64 SR U-Net — and reports seconds per denoise-step
forward for both. Run:

    python tools/baseline_reference.py [--iters 3]

Writes results to stdout as one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-for-both comparison
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def bench_reference(iters: int) -> float:
    import torch

    from ref_compat import load_reference_module

    m = load_reference_module("imagen_pytorch3D")
    torch.manual_seed(0)
    unet = m.Unet(
        dim=64, img_size=96, dim_mults=(1, 2, 4), num_resnet_blocks=(2, 2, 2),
        channels=1, init_dim=64, resnet_groups=8, init_cross_embed=False,
        lowres_cond=True, attend_at_middle=False, attend_at_enc=(False,) * 3,
        use_se_attn=True, boundary=True, batch_sample=True, deep_feature=True,
        init_conv_kernel_size=3,
    ).eval()

    x = torch.randn(27, 1, 32, 32, 32)
    lr = torch.randn(27, 1, 32, 32, 32)
    t = torch.full((27,), 0.4)

    with torch.no_grad():
        unet(x, t, t, lowres_cond_img=lr)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            unet(x, t, t, lowres_cond_img=lr)
        return (time.perf_counter() - t0) / iters


def bench_ours(iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.models.unet3d import iqt_unet_from_config

    cfg = Config()
    cfg.train.batch_sample = True
    cfg.train.boundary = True
    cfg.train.patch_size_sub = 32
    cfg.train.compute_dtype = "float32"  # like torch CPU
    cfg.train.use_pallas = False
    model = iqt_unet_from_config(cfg)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (27, 32, 32, 32, 1), jnp.float32)
    lr = x * 0.5
    t = jnp.full((27,), 0.4)
    params = jax.jit(model.init)(key, x, t, t, lowres_cond_img=lr)
    fn = jax.jit(lambda p, x, t, lr: model.apply(p, x, t, t, lowres_cond_img=lr))
    out = fn(params, x, t, lr)
    float(jnp.sum(out))  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x, t, lr)
        float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    ref_s = bench_reference(args.iters)
    ours_s = None if args.skip_ours else bench_ours(args.iters)
    print(json.dumps({
        "workload": "dim-64 SR U-Net fwd, 27x32^3 sub-volumes (one 96^3 patch), boundary convs, fp32",
        "device": "cpu-1core",
        "reference_torch_s_per_fwd": round(ref_s, 3),
        "ours_jax_cpu_s_per_fwd": round(ours_s, 3) if ours_s else None,
        "speedup_vs_reference_same_device": (
            round(ref_s / ours_s, 3) if ours_s else None
        ),
    }))


if __name__ == "__main__":
    main()
