"""Full-scale file-driven round trip through the REAL entry scripts.

The reference's actual workflow is 256^3 NIfTI volumes on disk -> train.py
-> test_all.py (``/root/reference/data.py:112-113`` asserts 256^3 volumes;
``/root/reference/train.py:27-195``). This tool proves that workflow end to
end in this framework with zero bespoke loops:

  1. ``--prepare``: writes synthetic phantoms as 256^3 ``.nii.gz`` in the
     reference's directory layout (``<root>/{train,valid,test}/sub*/T1w/``)
     and derives train + eval YAML configs (flagship batch_sample/boundary
     geometry) with the population z-score stats filled in.
  2. ``--run``: drives the real entries as subprocesses::

        python train.py   --config <root>/config_train.yaml --steps N
        python test_all.py --config <root>/config_eval.yaml \\
            --checkpoint <root>/results/<project>/model/checkpoint \\
            --stitch gaussian --output-dir <root>/inference_out

Usage (TPU):
    python tools/nifti_roundtrip.py --root /tmp/phantom_nifti \
        --prepare --run --steps 300
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np
import yaml


def prepare(root: str, n_train: int, n_valid: int, n_test: int) -> dict:
    from diffusioniqt_tpu.data.nifti import write
    from diffusioniqt_tpu.data.synthetic import generate_pair, population_stats

    splits = {"train": n_train, "valid": n_valid, "test": n_test}
    train_lr, train_hr = [], []
    seed = 0
    for split, n in splits.items():
        for i in range(n):
            hr, lr = generate_pair(256, seed=seed)
            seed += 1
            d = os.path.join(root, split, f"sub{i:02d}", "T1w")
            os.makedirs(d, exist_ok=True)
            write(os.path.join(d, "T1w_acpc_dc_restore_brain.nii.gz"),
                  hr.astype(np.float32))
            write(os.path.join(d, "lr_norm.nii.gz"), lr.astype(np.float32))
            if split == "train":
                train_lr.append(lr)
                train_hr.append(hr)
            print(f"wrote {split}/sub{i:02d} (256^3)", flush=True)

    mean, std = population_stats(train_lr)
    mean_hr, std_hr = population_stats(train_hr)

    # derive the two configs from the shipped YAMLs, patched to the phantom
    # globs + flagship geometry (batch_sample 27x32^3, boundary halo convs)
    paths = {}
    for name, base, patch in (
        ("config_train.yaml", "config/config.yaml", {
            "Train": {"batch_sample": True, "boundary": True,
                      "use_se": True},
            "Eval": {"repeat": 1},
        }),
        ("config_eval.yaml", "config/eval_config.yaml", {}),
    ):
        with open(os.path.join(_ROOT, base)) as fh:
            cfg = yaml.safe_load(fh)
        cfg["ProjectName"] = "nifti_roundtrip/"
        cfg["Results"] = os.path.join(root, "results") + "/"
        cfg["Data"].update({
            "groundtruth_path": os.path.join(
                root, "train/*/T1w/T1w_acpc_dc_restore_brain.nii.gz"),
            "lowres_path": os.path.join(root, "train/*/T1w/lr_norm*.gz"),
            "groundtruth_path_test": os.path.join(
                root, ("valid" if name == "config_train.yaml" else "test")
                + "/*/T1w/T1w_acpc_dc_restore_brain.nii.gz"),
            "lowres_path_test": os.path.join(
                root, ("valid" if name == "config_train.yaml" else "test")
                + "/*/T1w/lr_norm*.gz"),
            "mean": mean, "std": std,
            "mean_hr": mean_hr, "std_hr": std_hr,
        })
        for sect, kv in patch.items():
            cfg[sect].update(kv)
        out = os.path.join(root, name)
        with open(out, "w") as fh:
            yaml.dump(cfg, fh)
        paths[name] = out
        print(f"wrote {out}", flush=True)
    return paths


def run(root: str, steps: int, eval_every: int) -> dict:
    project = os.path.join(root, "results", "nifti_roundtrip")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    log = {"steps": steps}

    t0 = time.time()
    cmd = [sys.executable, os.path.join(_ROOT, "train.py"),
           "--config", os.path.join(root, "config_train.yaml"),
           "--steps", str(steps), "--eval-every", str(eval_every)]
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=_ROOT)
    log["train_seconds"] = round(time.time() - t0, 1)

    ckpt = os.path.join(project, "model", "checkpoint")
    if not os.path.isdir(ckpt):  # no eval boundary hit -> best never saved
        ckpt = os.path.join(project, "model", "last_checkpoint")
    t1 = time.time()
    cmd = [sys.executable, os.path.join(_ROOT, "test_all.py"),
           "--config", os.path.join(root, "config_eval.yaml"),
           "--checkpoint", ckpt, "--stitch", "gaussian",
           "--output-dir", os.path.join(root, "inference_out")]
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=_ROOT)
    log["test_all_seconds"] = round(time.time() - t1, 1)
    log["checkpoint"] = ckpt
    return log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/phantom_nifti")
    ap.add_argument("--train-volumes", type=int, default=3)
    ap.add_argument("--valid-volumes", type=int, default=1)
    ap.add_argument("--test-volumes", type=int, default=1)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--run", action="store_true")
    args = ap.parse_args()

    if args.prepare:
        prepare(args.root, args.train_volumes, args.valid_volumes,
                args.test_volumes)
    if args.run:
        log = run(args.root, args.steps, args.eval_every)
        print(json.dumps(log))


if __name__ == "__main__":
    main()
