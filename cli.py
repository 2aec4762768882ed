"""Command-line interface (reference ``cli.py`` capability: sample / config /
train subcommands over a checkpoint + JSON config, reference cli.py:28-180).

Uses argparse (no click dependency) with the same verb surface:

  python cli.py config --path imagen_config.json ...   # write a model config
  python cli.py train  --config imagen_config.json ... # train from config
  python cli.py sample --config ... --checkpoint ...   # sample volumes
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diffusioniqt_tpu.utils.platform import ensure_platform

ensure_platform()


def cmd_config(args):
    cfg = {
        "elucidated": args.elucidated,
        "imagen": {
            "unets": [
                {"kind": "null"},
                {
                    "kind": "unet3d", "dim": 64, "dim_mults": [1, 2, 4],
                    "channels": 1,
                    "kwargs": {
                        "num_resnet_blocks": [2, 2, 2], "init_dim": 64,
                        "init_cross_embed": False, "att_type": "linear",
                        "attend_at_middle": False,
                        "attend_at_enc": [False, False, False],
                        "use_se_attn": True, "batch_sample": False,
                        "boundary": False, "deep_feature": False,
                        "img_size": 32,
                    },
                },
            ],
            "image_sizes": [32, 32],
            "channels": 1,
            "timesteps": 1000,
            "pred_objectives": "x_start",
            "cond_drop_prob": 0.0,
            "dynamic_thresholding": False,
            "norm": "z-score",
        },
    }
    with open(args.path, "w") as fh:
        json.dump(cfg, fh, indent=2)
    print(f"wrote {args.path}")


def _build_trainer(config_path):
    from diffusioniqt_tpu.model_configs import ImagenTrainerConfig

    with open(config_path) as fh:
        raw = json.load(fh)
    return ImagenTrainerConfig.from_dict(raw).create()


def cmd_train(args):
    from diffusioniqt_tpu.data.datasets import FakeIQTDataset

    trainer = _build_trainer(args.config)
    if args.checkpoint and os.path.exists(args.checkpoint):
        trainer.load(args.checkpoint)
    size = trainer.imagen.image_sizes[-1]
    trainer.add_train_dataset(
        FakeIQTDataset(size=size, length=args.batch_size * 2),
        batch_size=args.batch_size,
    )
    for i in range(args.steps):
        loss = trainer.train_step(unet_number=args.unet)
        if i % 10 == 0:
            print(f"step {i}: loss {loss:.5f}")
    if args.checkpoint:
        trainer.save(args.checkpoint)
        print(f"saved {args.checkpoint}")


def cmd_sample(args):
    import jax
    import jax.numpy as jnp

    trainer = _build_trainer(args.config)
    if args.checkpoint and os.path.exists(args.checkpoint):
        trainer.load(args.checkpoint)
    else:
        trainer.prepare()
        print("WARNING: sampling with random weights")
    size = trainer.imagen.image_sizes[-1]
    kwargs = {}
    if args.lowres:
        lowres = jnp.asarray(np.load(args.lowres))
        if lowres.ndim == 3:
            lowres = lowres[None, ..., None]
        kwargs.update(start_image_or_video=lowres, start_at_unet_number=2)
        batch = lowres.shape[0]
    else:
        batch = args.batch_size
    out = trainer.sample(batch_size=batch, **kwargs)
    np.save(args.output, np.asarray(out))
    print(f"wrote {args.output} shape={np.asarray(out).shape}")


def main():
    ap = argparse.ArgumentParser(prog="imagen")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("config", help="write a starter model config JSON")
    p.add_argument("--path", default="./imagen_config.json")
    p.add_argument("--elucidated", action="store_true")
    p.set_defaults(fn=cmd_config)

    p = sub.add_parser("train", help="train from a model config JSON")
    p.add_argument("--config", default="./imagen_config.json")
    p.add_argument("--checkpoint", default="./imagen_ckpt")
    p.add_argument("--unet", type=int, default=2)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=4)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("sample", help="sample volumes from a checkpoint")
    p.add_argument("--config", default="./imagen_config.json")
    p.add_argument("--checkpoint", default="./imagen_ckpt")
    p.add_argument("--lowres", default=None, help=".npy lowres volume")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--output", default="./samples.npy")
    p.set_defaults(fn=cmd_sample)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
