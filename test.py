"""Single-volume inference entry — capability parity with the reference
``test.py``: sliding-window sampling over a full low-field volume with
overlap-trimmed stitching and NIfTI/npy output (reference test.py:141-256).

Additions: ``--fake-data`` synthesises a volume so the pipeline smoke-runs
without NIfTI data; ``--stitch gaussian`` enables Gaussian-weighted blending.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from diffusioniqt_tpu.utils.platform import ensure_platform

ensure_platform()


def build_trainer(cfg, mesh_devices: int = 0):
    """Build the inference trainer; ``mesh_devices > 0`` fans the patch
    batch over an N-device data mesh (multi-chip full-volume inference)."""
    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config
    from diffusioniqt_tpu.train.trainer import ImagenTrainer

    mesh = None
    if mesh_devices:
        import jax

        from diffusioniqt_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(("data",), (mesh_devices,),
                           devices=jax.devices()[:mesh_devices])

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
    trainer = ImagenTrainer(
        configs=cfg, imagen=imagen, mesh=mesh,
        gradient_accumulation_steps=cfg.train.gradient_accumulation_steps,
    )
    return trainer


def infer_volume_device(cfg, trainer, lowres_raw: np.ndarray,
                        stitch_mode: str = "trim", use_ema: bool = True,
                        verbose: bool = True, patch_batch: int = 8):
    """Device-resident variant of ``infer_volume``: the normalized volume is
    uploaded ONCE (~28 MB at bf16 for 240³ instead of ~226 MB of overlapping
    per-window transfers), windows are gathered on device, and stitching
    accumulates into device buffers — one D2H at the end. Removes the host
    link from the inner loop entirely; see PERF.md "measured end-to-end
    volumes/hour" for the gap this closes. Numerically equivalent to the
    host path (tests/test_stitch_device.py)."""
    import jax.numpy as jnp

    from diffusioniqt_tpu.data.datasets import SupervisedIQTInference
    from diffusioniqt_tpu.ops.stitch_device import (
        DeviceVolumeStitcher,
        gather_windows,
    )
    from diffusioniqt_tpu.ops.volume import (
        subvolumes_to_volume,
        volume_to_subvolumes,
    )

    dataset = SupervisedIQTInference(cfg, lr_file=None, volume=lowres_raw)
    idxs = dataset.valid_indices()

    patch = cfg.train.patch_size
    td = getattr(cfg.train, "transfer_dtype", None)
    vol_n = dataset.normalize(lowres_raw.astype(np.float32))
    if td:
        vol_n = vol_n.astype(jnp.dtype(td))
    vol_dev = jnp.asarray(vol_n)

    stitcher = DeviceVolumeStitcher(
        lowres_raw.shape, patch, cfg.eval.overlap, mode=stitch_mode,
        fill_value=cfg.data.min_bound,
    )

    n_done = 0
    for start in range(0, len(idxs), patch_batch):
        chunk = idxs[start:start + patch_batch]
        n_real = len(chunk)
        if n_real < patch_batch:  # pad starts; masked out by `valid`
            pad = np.zeros((patch_batch - n_real, 3), np.int32)
            chunk = np.concatenate([chunk, pad], axis=0)
        valid = np.arange(patch_batch) < n_real
        starts_dev = jnp.asarray(chunk)
        x = gather_windows(vol_dev, starts_dev, patch)
        if cfg.train.batch_sample and x.shape[1] != cfg.train.patch_size_sub:
            x = volume_to_subvolumes(x, cfg.train.batch_sample_factor)
        outputs = trainer.sample(
            batch_size=x.shape[0],
            start_image_or_video=x,
            start_at_unet_number=2,
            return_all_unet_outputs=True,
            use_non_ema=not use_ema,
        )
        out = outputs[0]
        if cfg.train.batch_sample:
            out = subvolumes_to_volume(out, cfg.train.batch_sample_factor)
        stitcher.add_batch(out[..., 0], starts_dev, jnp.asarray(valid))
        n_done += n_real
        if verbose:
            print(f"patches {n_done}/{len(idxs)} (device-stitched)")
    return stitcher.result()


def infer_volume(cfg, trainer, lowres_raw: np.ndarray, stitch_mode: str = "trim",
                 use_ema: bool = True, verbose: bool = True,
                 patch_batch: int = 8, device_stitch: bool = False):
    if device_stitch:
        return infer_volume_device(
            cfg, trainer, lowres_raw, stitch_mode=stitch_mode,
            use_ema=use_ema, verbose=verbose, patch_batch=patch_batch)
    return _infer_volume_host(
        cfg, trainer, lowres_raw, stitch_mode=stitch_mode,
        use_ema=use_ema, verbose=verbose, patch_batch=patch_batch)


def _infer_volume_host(cfg, trainer, lowres_raw: np.ndarray,
                       stitch_mode: str = "trim",
                       use_ema: bool = True, verbose: bool = True,
                       patch_batch: int = 8):
    """Sliding-window sampling + stitching over one raw LR volume.

    Returns the prediction in normalized (z-score) space, shaped like
    ``lowres_raw`` (reference stitching loop, test.py:174-243).

    ``patch_batch`` patches are denoised together per device step — TPU conv
    throughput roughly doubles from batch 1 to 8 (the last group is padded
    by repetition so only one program is compiled).

    The loop is software-pipelined one batch deep: batch k+1's host
    assembly + H2D transfer + sampler dispatch happen while batch k is
    still computing on the device, and batch k's D2H copy + stitching
    happen while k+1 computes. Sampling dispatch is fully async (no host
    sync until ``np.asarray``), so the serial host work — decisive on
    slow H2D links, see PERF.md "measured end-to-end volumes/hour" — is
    hidden behind device time. ``Train.transfer_dtype`` (e.g. bfloat16)
    additionally halves the H2D bytes of the start images, exactly like
    the training input path (trainer.py ``_transfer_map``).
    """
    import jax.numpy as jnp

    from diffusioniqt_tpu.data.datasets import SupervisedIQTInference
    from diffusioniqt_tpu.data.stitching import VolumeStitcher
    from diffusioniqt_tpu.ops.volume import (
        subvolumes_to_volume,
        volume_to_subvolumes,
    )

    dataset = SupervisedIQTInference(cfg, lr_file=None, volume=lowres_raw)
    items = [dataset[i] for i in range(len(dataset))]
    items = [it for it in items if it is not None]

    patch = cfg.train.patch_size  # 96 when batch_sample
    stitcher = VolumeStitcher(
        lowres_raw.shape, patch, cfg.eval.overlap, mode=stitch_mode,
        fill_value=cfg.data.min_bound,
    )

    td = getattr(cfg.train, "transfer_dtype", None)
    tdt = jnp.dtype(td) if td else None

    def submit(chunk):
        """Assemble, transfer, and dispatch one patch batch (async)."""
        n_real = len(chunk)
        if len(chunk) < patch_batch:
            # pad by repetition so every group compiles to the same program
            reps = -(-patch_batch // len(chunk))
            chunk = (chunk * reps)[:patch_batch]
        patches = np.stack([c[0] for c in chunk])  # (G, p, p, p, 1)
        idxs = [c[1] for c in chunk[:n_real]]
        if tdt is not None:
            # cast on host (numpy+ml_dtypes), transfer narrow: the sampler
            # computes in Train.compute_dtype anyway
            patches = patches.astype(tdt)
        x = jnp.asarray(patches)
        if cfg.train.batch_sample and x.shape[1] != cfg.train.patch_size_sub:
            x = volume_to_subvolumes(x, cfg.train.batch_sample_factor)
        outputs = trainer.sample(
            batch_size=x.shape[0],
            start_image_or_video=x,
            start_at_unet_number=2,
            return_all_unet_outputs=True,
            use_non_ema=not use_ema,
        )
        out = outputs[0]
        if cfg.train.batch_sample:
            out = subvolumes_to_volume(out, cfg.train.batch_sample_factor)
        return out, idxs

    n_done = 0

    def consume(pending):
        """Block on one batch's D2H copy and stitch it."""
        nonlocal n_done
        out, idxs = pending
        # D2H in the sampler's native dtype (half the bytes when bf16),
        # then widen on host for stitching math
        out_np = np.asarray(out).astype(np.float32, copy=False)
        for j, idx in enumerate(idxs):
            stitcher.add(out_np[j, ..., 0], idx)
            n_done += 1
        if verbose:
            print(f"patches {n_done}/{len(items)}")

    pending = None
    for start in range(0, len(items), patch_batch):
        current = submit(items[start:start + patch_batch])
        if pending is not None:
            consume(pending)
        pending = current
    if pending is not None:
        consume(pending)
    return stitcher.result()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="./config/eval_config.yaml")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--lowres", default=None, help="LR NIfTI/.npy path")
    ap.add_argument("--highres", default=None, help="HR NIfTI/.npy path")
    ap.add_argument("--output-dir", default=".")
    ap.add_argument("--stitch", choices=["trim", "gaussian"], default="trim")
    ap.add_argument("--patch-batch", type=int, default=8,
                    help="96^3 patches denoised together per device step")
    ap.add_argument("--fake-data", action="store_true")
    ap.add_argument("--fake-edge", type=int, default=None)
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
    from diffusioniqt_tpu.data.datasets import load_affine, load_volume, save_volume

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
    if args.fake_data:
        edge = args.fake_edge or cfg.train.patch_size + cfg.eval.overlap
        rng = np.random.default_rng(0)
        highres = np.abs(rng.standard_normal((edge,) * 3)).astype(np.float32) * std
        lowres = highres + rng.standard_normal(highres.shape).astype(np.float32) * 0.1 * std
        affine = np.eye(4)
    else:
        assert args.lowres and args.highres, "--lowres/--highres required"
        lowres = load_volume(args.lowres)
        highres = load_volume(args.highres)
        affine = load_affine(args.highres)
        if lowres.shape[-1] == 256:
            low, high = 8, 248  # reference test.py:151-153
            lowres = lowres[low:high, low:high, low:high]
            highres = highres[low:high, low:high, low:high]

    print(f"lowres: {lowres.shape} highres: {highres.shape}")

    start = time.time()
    pred = infer_volume(cfg, trainer, lowres, stitch_mode=args.stitch,
                        patch_batch=args.patch_batch,
                        device_stitch=args.device_stitch)
    print("TIME: {}".format(time.time() - start))

    highres_n = (highres - mean) / std
    lowres_n = (lowres - mean) / std

    os.makedirs(args.output_dir, exist_ok=True)
    np.save(os.path.join(args.output_dir, "volume_inf.npy"), pred)
    np.save(os.path.join(args.output_dir, "volume_gt.npy"), highres_n)
    np.save(os.path.join(args.output_dir, "volume_lr.npy"), lowres_n)
    for name, vol in (("volume_inf", pred), ("volume_gt", highres_n),
                      ("volume_lr", lowres_n)):
        try:
            save_volume(os.path.join(args.output_dir, f"{name}.nii.gz"),
                        vol, affine)
        except ImportError:
            break  # nibabel unavailable; .npy outputs already written


if __name__ == "__main__":
    main()
