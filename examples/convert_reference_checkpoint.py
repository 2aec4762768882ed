"""Example: load a reference-trained torch checkpoint and run inference.

The reference publishes `.pt` bundles (trainer bundles or model-only saves,
``/root/reference/trainer.py:813-878`` / ``imagen_pytorch3D.py:1504-1536``).
This script converts one into the flax U-Net and samples a full volume:

    python examples/convert_reference_checkpoint.py \
        --checkpoint 3dimagen.pt --lowres lr_norm.nii.gz --out pred.nii.gz

Whole-model fp32 forward parity between the torch reference and the
converted flax model is enforced by tests/test_model_parity.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="reference .pt file")
    ap.add_argument("--config", default="./config/eval_config.yaml")
    ap.add_argument("--lowres", required=True, help="LR volume (.nii/.npy)")
    ap.add_argument("--out", default="pred.nii.gz")
    ap.add_argument("--unet-number", type=int, default=2)
    ap.add_argument("--use-ema", action="store_true",
                    help="take the EMA weights from a trainer bundle")
    args = ap.parse_args()

    from diffusioniqt_tpu.config import load_config
    from diffusioniqt_tpu.data.datasets import load_volume, save_volume
    from diffusioniqt_tpu.utils.torch_convert import load_torch_checkpoint
    from test import build_trainer, infer_volume

    cfg = load_config(args.config)
    trainer = build_trainer(cfg)
    trainer.prepare()

    variables = load_torch_checkpoint(
        args.checkpoint, unet_number=args.unet_number, use_ema=args.use_ema,
    )
    # install the converted SR-stage weights (raw and EMA slots)
    idx = args.unet_number - 1
    trainer.params[idx] = variables
    if trainer.use_ema and trainer.ema_states[idx] is not None:
        trainer.ema_states[idx] = trainer.ema_states[idx].replace(
            params=variables
        )

    lowres = load_volume(args.lowres)
    pred = infer_volume(cfg, trainer, lowres)
    save_volume(args.out, pred)
    print(f"wrote {args.out} shape={np.asarray(pred).shape}")


if __name__ == "__main__":
    main()
