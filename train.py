"""Training entry point — capability parity with the reference ``train.py``
(``/root/reference/train.py:27-195``): reads ``config/config.yaml``, builds
the (NullUnet, SR U-Net) cascade + trainer, runs the training loop with
periodic validation, CSV loss logging, best-model checkpointing, and
qualitative ``.npy`` dumps.

Additions over the reference: ``--fake-data`` (random volumes; the smoke mode
SURVEY.md §4 prescribes), ``--steps`` to bound the loop, and checkpoints are
orbax directories instead of torch ``.pt`` bundles.
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diffusioniqt_tpu.utils.platform import ensure_platform

ensure_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="./config/config.yaml")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--fake-data", action="store_true",
                    help="train on random volumes (smoke test, no NIfTI needed)")
    ap.add_argument("--fake-size", type=int, default=None,
                    help="edge of fake volumes (defaults to config patch size)")
    args = ap.parse_args()

    from diffusioniqt_tpu.config import load_config
    from diffusioniqt_tpu.data.datasets import FakeIQTDataset, SupervisedIQT
    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config
    from diffusioniqt_tpu.parallel.multihost import (
        initialize_multihost,
        is_main_process,
    )
    from diffusioniqt_tpu.train.trainer import ImagenTrainer
    from diffusioniqt_tpu.utils.seed import set_seed

    # multi-host: one jax.distributed.initialize per process before first
    # backend use (the Accelerate-launcher equivalent, reference
    # trainer.py:296-301); no-op on a single host
    initialize_multihost()
    import jax

    main_proc = is_main_process()

    cfg = load_config(args.config)
    set_seed(cfg.train.seed)

    project_path = os.path.join(cfg.results_dir, cfg.project_name)
    if main_proc:
        assert not os.path.isdir(project_path), f"project {project_path} exists!"
        os.makedirs(os.path.join(project_path, cfg.model_dir))
        os.makedirs(os.path.join(project_path, cfg.file_dir))
        os.makedirs(os.path.join(project_path, cfg.eval.save_imgs))

        import yaml

        with open(os.path.join(project_path, "config.yaml"), "w") as fh:
            yaml.dump(cfg.to_dict(), fh)

    batch_size = 1 if cfg.train.batch_sample else cfg.train.batch_size
    batch_size_test = 1 if cfg.train.batch_sample else cfg.eval.batch_size
    # multi-host split_batches semantics (reference trainer.py:256): the
    # loader produces the GLOBAL batch (identical on every process — the
    # dataset crops are (seed, epoch, idx)-deterministic) and the trainer
    # keeps each process's slice, so the per-host share stays at the
    # configured batch size — with batch_sample, one whole 27-sub-volume
    # group per host
    batch_size *= jax.process_count()

    if args.fake_data:
        size = args.fake_size or cfg.train.patch_size
        train_dataset = FakeIQTDataset(size=size, length=max(batch_size * 2, 8), seed=0)
        valid_dataset = FakeIQTDataset(size=size, length=max(batch_size_test, 4), seed=1)
    else:
        hr_files = sorted(glob.glob(cfg.data.groundtruth_path))
        lr_files = sorted(glob.glob(cfg.data.lowres_path))
        print(len(hr_files), len(lr_files))
        train_dataset = SupervisedIQT(cfg, lr_files, hr_files)
        hr_t = sorted(glob.glob(cfg.data.groundtruth_path_test))
        lr_t = sorted(glob.glob(cfg.data.lowres_path_test))
        print(len(hr_t), len(lr_t))
        valid_dataset = SupervisedIQT(cfg, lr_t, hr_t, train=False)

    print("Min bound ", cfg.data.min_bound)

    unet1 = NullUnet()
    print("Unet1 loaded")
    unet2 = iqt_unet_from_config(cfg)
    print("Unet2 loaded")
    if cfg.train.elucidated:
        from diffusioniqt_tpu.diffusion.elucidated import (
            elucidated_imagen_from_config,
        )

        imagen = elucidated_imagen_from_config(cfg, (unet1, unet2))
        print("ElucidatedImagen (EDM) loaded")
    else:
        imagen = imagen_from_config(cfg, (unet1, unet2))
        print("Imagen loaded")

    # multi-host: shard the batch over a data mesh spanning every device of
    # every process; each process feeds only its local_batch_slice
    mesh = None
    if jax.process_count() > 1:
        from diffusioniqt_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(("data",), (len(jax.devices()),))

    trainer = ImagenTrainer(
        configs=cfg,
        imagen=imagen,
        mesh=mesh,
        gradient_accumulation_steps=cfg.train.gradient_accumulation_steps,
        lr=cfg.train.lr,
        ema_decay=cfg.train.ema_decay,
        ema_update_after_step=cfg.train.ema_update_after_step,
        ema_update_every=cfg.train.ema_update_every,
        max_grad_norm=cfg.train.max_grad_norm,
        warmup_steps=cfg.train.warmup_steps,
        cosine_decay_max_steps=cfg.train.cosine_decay_max_steps,
        seed=cfg.train.seed,
    )
    if cfg.train.pretrain:
        trainer.load(cfg.train.pretrain_model, strict=False,
                     noop_if_not_exist=False)
        print("Pretrained model is loaded")

    print("Trainer loaded")
    trainer.add_train_dataset(train_dataset, batch_size=batch_size)
    trainer.add_valid_dataset(valid_dataset, batch_size=batch_size_test)
    print("Model and Data are loaded!")

    train_ls, valid_ls, ssim_val, psnr_val = [], [], [], []
    best = 1e4
    log_dir = os.path.join(project_path, cfg.file_dir)
    fig_dir = os.path.join(project_path, cfg.eval.save_imgs)

    def write_csv(path, rows: dict):
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(rows.keys())
            for vals in zip(*rows.values()):
                w.writerow(vals)

    def drain(ls):
        # sync=False keeps losses as device scalars so steps pipeline
        # (H2D transfer overlaps compute); convert once at log boundaries
        for j in range(len(ls)):
            if not isinstance(ls[j], float):
                ls[j] = float(ls[j])

    for i in range(args.steps):
        loss = trainer.train_step(unet_number=2,
                                  max_batch_size=cfg.train.batch_size,
                                  sync=False)
        train_ls.append(loss)
        trainer.update(unet_number=2)

        if i % args.eval_every == 0:
            drain(train_ls)
            if main_proc:
                write_csv(os.path.join(log_dir, cfg.train.save_file),
                          {"loss": train_ls})
                print(f"unet: 2, Step: {i}, loss: {train_ls[-1]}")
            valid_loss, preds, condi1, data, ssim, psnr = trainer.valid_step(
                unet_number=2, max_batch_size=cfg.eval.batch_size
            )
            valid_ls.append(float(np.mean(valid_loss)))
            ssim_val.append(ssim)
            psnr_val.append(psnr)

            if main_proc:
                if cfg.train.pred_obj == "x_start":
                    write_csv(os.path.join(log_dir, cfg.eval.save_file),
                              {"loss": valid_ls, "ssim": ssim_val, "psnr": psnr_val})
                else:
                    write_csv(os.path.join(log_dir, cfg.eval.save_file),
                              {"loss": valid_ls})

            if best > valid_ls[-1]:
                best = valid_ls[-1]
                # the valid loss is identical on every process (replicated
                # batches + replicated params), so all processes take this
                # branch together. Dump writes are main-process-gated (the
                # reference's accelerator.is_main_process gating,
                # trainer.py:439-444); trainer.save is COLLECTIVE on
                # multi-host — every process must call it (the write
                # itself is main-gated inside)
                if main_proc:
                    print("Best model!")
                    np.save(os.path.join(fig_dir, f"conditional_iqt_{i}_gt.npy"), data[0])
                    np.save(os.path.join(fig_dir, f"conditional_iqt_{i}_lr.npy"), data[1])
                    np.save(os.path.join(fig_dir, f"conditional_iqt_{i}_noisy.npy"), condi1)
                    np.save(os.path.join(fig_dir, f"conditional_iqt_{i}_pred.npy"), preds)
                trainer.save(os.path.join(project_path, cfg.model_dir,
                                          cfg.train.save_model))

    drain(train_ls)
    if main_proc:
        write_csv(os.path.join(log_dir, cfg.train.save_file),
                  {"loss": train_ls})
    trainer.save(os.path.join(project_path, cfg.model_dir,
                              cfg.train.save_last_model))
    print("Training done")


if __name__ == "__main__":
    main()
