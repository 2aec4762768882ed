"""Benchmark: denoise steps/sec/chip for the flagship IQT sampling path.

Runs the eval-config workload (reference ``config/eval_config.yaml``):
27x32^3 sub-volume batch (one 96^3 patch), boundary halo convs, lowres
conditioning, dim-64 SR U-Net, 20-step ancestral sampling — on whatever
backend JAX selects (the driver runs this on one real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

plus auxiliary fields (volumes/hour projection). The reference repo records
no baseline numbers (BASELINE.md), so ``vs_baseline`` is reported against
the first recorded value of this harness (1.0 on the first run).

Process isolation (round 5): each stage — 20-step Gaussian sampling,
training, 64-step EDM Heun — runs in its OWN child process with a fresh
TPU client. Round 4's driver-captured run degraded ONLY the EDM stage
2.65x below its reproducible-in-isolation number (BENCH_r04.json 14.8%
vs 39.3% roofline) while the stages before it were healthy; isolation
removes any possible cross-stage state (HBM carryover, donated-buffer
fragmentation, a worker crash earlier in the sequence) and per-iteration
median timing keeps one transiently slow launch (tunnel hiccup) from
poisoning the stage's number. ``--in-process`` restores the old
single-process path for debugging.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache — the flagship sampler takes minutes to
# compile cold; cached reruns start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _require_backend(timeout_s: float = 180.0) -> None:
    """Fail fast (exit 3) when the device backend is unreachable.

    A downed axon tunnel makes backend init BLOCK indefinitely rather than
    raise; without a watchdog the whole bench (and its caller's budget)
    hangs with no diagnostic."""
    import threading

    import jax

    probe: dict = {}

    def _probe():
        try:
            probe["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # raised init is as fatal as a hang
            probe["error"] = repr(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if "devices" not in probe:
        print(
            "bench.py: jax backend unreachable "
            f"({probe.get('error', f'device probe hung >{timeout_s:.0f}s — tunnel down?')})",
            file=sys.stderr,
        )
        raise SystemExit(3)


# v5e bf16 peak (MXU): 197 TFLOP/s/chip — roofline denominator
_V5E_PEAK_TFLOPS = 197.0


def _flops_of(fn, *args) -> float:
    """Analytic conv+dot FLOPs of one call (jaxpr walk).

    Not ``Compiled.cost_analysis()``: the TPU backend counts a scan body
    once, under-reporting the 20-step sampler 20x (see utils/flops.py)."""
    try:
        from diffusioniqt_tpu.utils.flops import matmul_flops

        return matmul_flops(fn, *args)
    except Exception:
        return 0.0


def _flagship_cfg():
    """Eval-config flagship (reference config/eval_config.yaml)."""
    import jax

    from diffusioniqt_tpu.config import Config

    cfg = Config()
    cfg.train.batch_sample = True
    cfg.train.boundary = True
    cfg.train.patch_size_sub = 32
    cfg.train.timesteps = 20
    cfg.train.pred_obj = "x_start"
    cfg.train.dynamic_threshold = False
    cfg.train.compute_dtype = (
        "bfloat16" if jax.default_backend() == "tpu" else "float32")
    return cfg


def _timed_iters(fn, n: int) -> list:
    """Per-iteration wall times of ``fn(i)`` (each call must sync)."""
    secs = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i)
        secs.append(time.perf_counter() - t0)
    return secs


def bench_sampling(cfg):
    """Headline benchmark: 20-step ancestral Gaussian sampling on the
    flagship geometry (one jitted launch per patch batch)."""
    import jax
    import jax.numpy as jnp

    from diffusioniqt_tpu.data.stitching import sliding_window_grid
    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config

    # optional: shard the patch batch over an N-device data mesh
    # (multi-chip serving projection; `python bench.py --mesh 8`)
    mesh = None
    if "--mesh" in sys.argv:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from diffusioniqt_tpu.parallel.mesh import create_mesh

        n_mesh = int(sys.argv[sys.argv.index("--mesh") + 1])
        mesh = create_mesh(("data",), (n_mesh,),
                           devices=jax.devices()[:n_mesh])

    unet = iqt_unet_from_config(cfg)
    imagen = imagen_from_config(cfg, [NullUnet(), unet])

    patches = int(os.environ.get("BENCH_PATCH_BATCH", "8"))
    batch = 27 * patches  # patches x 27 sub-volumes per 96^3 patch
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=27)

    key = jax.random.PRNGKey(1)
    lowres = jax.random.normal(key, (batch, 32, 32, 32, 1), jnp.float32)
    if mesh is not None:
        assert batch % mesh.shape["data"] == 0, (
            "BENCH_PATCH_BATCH*27 must divide the mesh"
        )
        lowres = jax.device_put(lowres, NamedSharding(mesh, P("data")))

    def sample_fn(params1, key, lowres):
        return imagen.p_sample_loop(
            imagen.unets[1], params1, key,
            (batch, 32, 32, 32, 1),
            noise_scheduler=imagen.noise_schedulers[1],
            lowres_cond_img=lowres,
            pred_objective="x_start",
            dynamic_threshold=False,
        )

    fn = jax.jit(sample_fn)

    def sync(x):
        # force a device->host transfer: on the axon platform
        # block_until_ready can return before execution completes
        return float(jnp.sum(x))

    # compile + warmup
    sync(fn(params[1], key, lowres))

    # optional: dump a jax.profiler trace of the steady-state iterations
    # (`python bench.py --profile [dir]`; view with xprof/tensorboard)
    profile_dir = None
    if "--profile" in sys.argv:
        idx = sys.argv.index("--profile")
        profile_dir = (sys.argv[idx + 1] if len(sys.argv) > idx + 1
                       and not sys.argv[idx + 1].startswith("-")
                       else "/tmp/diffusioniqt_trace")
        jax.profiler.start_trace(profile_dir)

    iter_s = _timed_iters(
        lambda i: sync(fn(params[1], jax.random.fold_in(key, i), lowres)), 5)

    if profile_dir is not None:
        jax.profiler.stop_trace()
        print(f"# trace written to {profile_dir}", file=sys.stderr)

    med = statistics.median(iter_s)
    steps = cfg.train.timesteps
    steps_per_sec = steps / med
    patches_per_sec = patches / med  # 96^3 patches (27x32^3 each)

    # achieved FLOP throughput of the sampling loop (roofline context)
    sample_flops = _flops_of(fn, params[1], key, lowres)
    sample_tflops = sample_flops / med / 1e12

    # full-volume projection: 240^3 brain volume, 96^3 windows, stride 32
    # (reference test.py:151-153 crops 256^3 -> 240^3; eval overlap=32)
    grid = sliding_window_grid((240, 240, 240), 96, 32)
    volumes_per_hour = patches_per_sec / len(grid) * 3600.0

    return {
        "value": round(steps * patches_per_sec, 3),
        "backend": jax.default_backend(),
        "patch_batch": patches,
        "patches_per_sec_96c": round(patches_per_sec, 4),
        "volumes_per_hour_240c_overlap32": round(volumes_per_hour, 2),
        "sampling_timesteps": steps,
        "compute_dtype": cfg.train.compute_dtype,
        "mesh_devices": mesh.shape["data"] if mesh is not None else 1,
        "sampling_achieved_tflops": round(sample_tflops, 2),
        "sampling_pct_of_roofline": round(
            100.0 * sample_tflops / _V5E_PEAK_TFLOPS, 1),
        "sampling_iter_sec_min_med_max": [
            round(min(iter_s), 2), round(med, 2), round(max(iter_s), 2)],
    }


def bench_train(cfg):
    """Training-side benchmark (VERDICT round-2 item 2): the full jitted
    train step — grad-accum over 108x32^3 microbatches, Adam, EMA — at the
    flagship batch_sample+boundary geometry (the reference hot loop,
    /root/reference/trainer.py:1099-1128).

    Round-3 probe result (PERF.md): conv throughput is batch-starved below
    ~b108, so 1-patch (b27) microbatches reach only 2.15 patches/s while
    remat + 4-patch (b108) microbatches reach 3.24 — remat's recompute is
    cheaper than the b27 conv inefficiency, and without remat anything
    above b27 fails to compile (HBM). b162+ fails even with remat, so
    8 patches x accum 2 is the known-best single-chip configuration."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config
    from diffusioniqt_tpu.train.trainer import ImagenTrainer

    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, remat=True,
        remat_policy=os.environ.get("BENCH_REMAT_POLICY") or None))
    unet = iqt_unet_from_config(cfg)
    imagen = imagen_from_config(cfg, [NullUnet(), unet])

    patches = int(os.environ.get("BENCH_TRAIN_PATCHES", "8"))
    accum = int(os.environ.get("BENCH_TRAIN_ACCUM", "2"))
    trainer = ImagenTrainer(
        configs=cfg, imagen=imagen, gradient_accumulation_steps=accum,
        use_ema=True, ema_update_every=10, lr=1e-4,
    )
    key = jax.random.PRNGKey(3)
    # 96^3 patches; the trainer splits each into 27x32^3 sub-volumes and
    # chunks `patches/accum` of them into each grad-accum microbatch
    hr = jax.random.normal(key, (patches, 96, 96, 96, 1), jnp.float32)
    lr_img = jax.random.normal(jax.random.fold_in(key, 1), hr.shape,
                               jnp.float32)
    batch = (hr, lr_img)

    trainer.train_step(unet_number=2, batch=batch)  # compile + warmup

    last = {}

    def one(i):
        # train_step returns float(loss): synced
        last["loss"] = trainer.train_step(unet_number=2, batch=batch)

    iter_s = _timed_iters(one, 8)
    med = statistics.median(iter_s)
    steps_per_sec = 1.0 / med
    mb = 27 * patches // accum
    flops = 0.0
    if trainer._train_step_fns:
        fn = next(iter(trainer._train_step_fns.values()))
        try:
            i = 1  # unet index
            flops = _flops_of(
                fn, trainer.params[i], trainer.opt_states[i],
                jax.random.PRNGKey(0),
                jnp.zeros((accum, mb, 32, 32, 32, 1), jnp.float32),
                jnp.zeros((accum, mb, 32, 32, 32, 1), jnp.float32),
            )
        except Exception:
            flops = 0.0
    tflops = flops * steps_per_sec / 1e12
    return {
        "train_steps_per_sec": round(steps_per_sec, 4),
        "train_patches_per_sec": round(steps_per_sec * patches, 4),
        "train_grad_accum": accum,
        "train_microbatch_subvols": mb,
        "train_remat": True,
        "train_remat_policy": os.environ.get("BENCH_REMAT_POLICY") or None,
        "train_achieved_tflops": round(tflops, 2),
        "train_pct_of_roofline": round(100.0 * tflops / _V5E_PEAK_TFLOPS, 1),
        "train_last_loss": round(float(last["loss"]), 5),
        "train_iter_sec_min_med_max": [
            round(min(iter_s), 2), round(med, 2), round(max(iter_s), 2)],
    }


def bench_edm(cfg, stitch_shape=(240, 240, 240)):
    """North-star sampling benchmark (BASELINE.json): 64-step EDM Heun
    sampling with churn at the reference hyperparameters
    (/root/reference/elucidated_imagen.py:96-106, sampler :381-532) on the
    flagship geometry — dim-64 SR U-Net, 27x32^3 boundary sub-volumes per
    96^3 patch — plus the measured host-side cost of Gaussian-weighted
    stitching a full volume, so volumes/hour includes stitching.

    Heun is 2 model evals per step except the final Euler step:
    NFE = 2*steps - 1."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diffusioniqt_tpu.data.stitching import (
        VolumeStitcher,
        sliding_window_grid,
    )
    from diffusioniqt_tpu.diffusion.elucidated import (
        elucidated_imagen_from_config,
    )
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config

    steps = int(os.environ.get("BENCH_EDM_STEPS", "64"))
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, elucidated=True, edm_num_sample_steps=steps))
    unet = iqt_unet_from_config(cfg)
    imagen = elucidated_imagen_from_config(cfg, [NullUnet(), unet])

    patches = int(os.environ.get("BENCH_PATCH_BATCH", "8"))
    batch = 27 * patches
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=27)
    key = jax.random.PRNGKey(2)
    lowres = jax.random.normal(key, (batch, 32, 32, 32, 1), jnp.float32)
    hp = imagen.hparams[1]
    sched = imagen.lowres_noise_schedule

    def sample_fn(params1, key, lowres):
        # full inference conditioning path (ElucidatedImagen.sample); with
        # lowres_noise_aug (IQT default: off) the conditioning is noised at
        # lowres_sample_noise_level, otherwise passed clean
        k_lo, k_s = jax.random.split(key)
        level = (imagen.lowres_sample_noise_level
                 if imagen.lowres_noise_aug else 0.0)
        t = sched.get_times(batch, level)
        lo = imagen.normalize_img(lowres)
        if imagen.lowres_noise_aug:
            lo, *_ = sched.q_sample(
                lo, t, jax.random.normal(k_lo, lowres.shape))
        return imagen.one_unet_sample(
            imagen.unets[1], params1, k_s, (batch, 32, 32, 32, 1), hp=hp,
            clamp=True, dynamic_threshold=cfg.train.dynamic_threshold,
            lowres_cond_img=lo,
            lowres_noise_times=sched.get_condition(t),
        )

    # NO outer jit: one_unet_sample segments the Heun loop into capped
    # device launches (the axon runtime kills single launches longer than
    # a few seconds — a 64-step b216 launch reliably crashes the worker);
    # the segment programs are jit-cached inside the sampler
    fn = sample_fn

    out = fn(params[1], key, lowres)
    float(jnp.sum(out))  # compile + warmup (forced D2H sync)

    outs = {}

    def one(i):
        outs["out"] = fn(params[1], jax.random.fold_in(key, i), lowres)
        float(jnp.sum(outs["out"]))

    iter_s = _timed_iters(one, 3)
    med = statistics.median(iter_s)
    out = outs["out"]

    patch_rate = patches / med  # 96^3 patches/s
    nfe = 2 * steps - 1
    flops = _flops_of(fn, params[1], key, lowres)
    tflops = flops / med / 1e12

    # measured Gaussian-weighted stitching cost for one full volume
    grid = sliding_window_grid(stitch_shape, 96, 32)
    stitcher = VolumeStitcher(stitch_shape, 96, 32, mode="gaussian",
                              fill_value=cfg.data.min_bound)
    import numpy as np

    from diffusioniqt_tpu.ops.volume import subvolumes_to_volume

    win = np.asarray(subvolumes_to_volume(out[:27], 3))[0, ..., 0]
    t1 = time.perf_counter()
    for start in grid:
        stitcher.add(win, start)
    stitcher.result()
    stitch_s = time.perf_counter() - t1

    sample_s = len(grid) / patch_rate  # device time for one volume's windows
    return {
        "edm_sample_steps": steps,
        "edm_nfe_per_sample": nfe,
        "edm_steps_per_sec": round(steps * patch_rate, 3),
        "edm_nfe_per_sec": round(nfe * patch_rate, 3),
        "edm_patches_per_sec_96c": round(patch_rate, 4),
        "edm_achieved_tflops": round(tflops, 2),
        "edm_pct_of_roofline": round(100.0 * tflops / _V5E_PEAK_TFLOPS, 1),
        "edm_gaussian_stitch_sec_per_volume": round(stitch_s, 2),
        "edm_volumes_per_hour_240c_incl_stitch": round(
            3600.0 / (sample_s + stitch_s), 2),
        "edm_s_churn": hp.S_churn,
        "edm_steps_per_launch": imagen.max_steps_per_launch,
        "edm_iter_sec_min_med_max": [
            round(min(iter_s), 2), round(med, 2), round(max(iter_s), 2)],
    }


# ---------------------------------------------------------------------------
# stage orchestration


_STAGES = ("sampling", "train", "edm")


def _run_stage(stage: str) -> None:
    """Child-process entry: run ONE stage, print its dict as the last
    stdout line."""
    _require_backend()
    cfg = _flagship_cfg()
    if stage == "sampling":
        payload = bench_sampling(cfg)
    elif stage == "train":
        payload = bench_train(cfg)
    elif stage == "edm":
        payload = bench_edm(cfg)
    else:  # pragma: no cover - guarded by argparse-ish dispatch
        raise SystemExit(f"unknown stage {stage!r}")
    print(json.dumps(payload))


def _spawn_stage(stage: str, timeout_s: float = 3000.0) -> dict:
    """Run one stage in a fresh child process (own TPU client, own HBM)
    and parse its final stdout line as JSON. Errors are reported as a
    ``{stage}_error`` field instead of killing the whole bench — a device
    fault in one stage must not take the other stages' numbers down."""
    argv = [a for a in sys.argv[1:] if a != "--in-process"]
    cmd = [sys.executable, os.path.abspath(__file__),
           "--stage", stage, *argv]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {f"{stage}_error": f"stage timed out after {timeout_s:.0f}s"}
    sys.stderr.write(proc.stderr[-4000:])
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode != 0 or not lines:
        tail = (proc.stderr or proc.stdout or "")[-300:]
        return {f"{stage}_error":
                f"exit {proc.returncode}: {tail}".replace("\n", " ")}
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError:
        return {f"{stage}_error": f"unparseable output: {lines[-1][:200]}"}


def main():
    if "--stage" in sys.argv:
        _run_stage(sys.argv[sys.argv.index("--stage") + 1])
        return

    if "--train-only" in sys.argv:
        # remat-policy / microbatch sweep mode (PERF.md round-4 table):
        #   BENCH_REMAT_POLICY={,conv} BENCH_TRAIN_PATCHES=N \
        #   BENCH_TRAIN_ACCUM=M python bench.py --train-only
        _require_backend()
        print(json.dumps(bench_train(_flagship_cfg())))
        return

    in_process = "--in-process" in sys.argv
    if in_process:
        _require_backend()
        cfg = _flagship_cfg()
        samp = bench_sampling(cfg)
    else:
        samp = _spawn_stage("sampling")
        if "sampling_error" in samp:
            # headline stage failed — nothing meaningful to report
            print(json.dumps({"metric": "error", "value": 0,
                              "unit": "patch-denoise-steps/sec",
                              "vs_baseline": 0.0, "aux": samp}))
            raise SystemExit(3)

    on_tpu = samp.get("backend") == "tpu"

    # training-side benchmark (VERDICT round-2 item 2). Heavy on CPU — run
    # on TPU by default, or when forced with --train; skip with --no-train.
    train_aux = {}
    if "--no-train" not in sys.argv and (on_tpu or "--train" in sys.argv):
        if in_process:
            train_aux = bench_train(_flagship_cfg())
        else:
            train_aux = _spawn_stage("train")

    # north-star workload (BASELINE.json): 64-step EDM + Gaussian stitching.
    edm_aux = {}
    if "--no-edm" not in sys.argv and (on_tpu or "--edm" in sys.argv):
        if in_process:
            try:
                edm_aux = bench_edm(_flagship_cfg())
            except Exception as e:  # noqa: BLE001 — report, don't die
                edm_aux = {"edm_error": repr(e)[:300]}
        else:
            edm_aux = _spawn_stage("edm")

    this_value = samp.pop("value")
    baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_file):
        with open(baseline_file) as fh:
            base = json.load(fh)
        if base.get("value"):
            vs_baseline = this_value / base["value"]
    else:
        with open(baseline_file, "w") as fh:
            json.dump({"metric": "patch-denoise-steps/sec",
                       "value": this_value}, fh)

    print(json.dumps({
        "metric": "96^3-patch denoise steps/sec/chip (27x32^3 sub-volumes each, dim-64 SR U-Net)",
        "value": this_value,
        "unit": "patch-denoise-steps/sec",
        "vs_baseline": round(vs_baseline, 3),
        "aux": {
            **samp,
            **train_aux,
            **edm_aux,
        },
    }))


if __name__ == "__main__":
    main()
