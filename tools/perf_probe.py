"""TPU perf probes for the round-3 close-out (VERDICT round-2 item 5).

Measures, at the flagship shape (216x32^3 c64 bf16, the 8-patch sampler
batch), with the chained-iterations-in-one-jit methodology PERF.md
prescribes (single calls carry ~30 ms dispatch+sync on the axon tunnel):

  1. the full XLA block-unit chain [GN -> scale-shift -> mish -> halo ->
     VALID conv] and its pieces (GN+mish pass, halo concat sweep, conv);
  2. whether XLA fuses an elementwise producer into the conv input read
     (decides if a halo-first + affine-into-conv reorder can win);
  3. the SE3D gating unit;
  4. HBM-floor estimates for each, from measured marginal bandwidth.

Run AFTER any other TPU user finishes: `python tools/perf_probe.py`.
Prints a JSON summary; paste into PERF.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from diffusioniqt_tpu.models.blocks import subvol_group_norm
from diffusioniqt_tpu.ops.volume import halo_exchange
from diffusioniqt_tpu.utils.misc import mish

B, S, C = 216, 32, 64
DT = jnp.bfloat16
BW_GBPS = 745.0  # measured marginal HBM bandwidth (PERF.md)


def timed(fn, *args, iters=8, inner=4):
    """Chained timing: jit(fn applied `inner` times), best of `iters`."""

    def chain(x, *rest):
        for _ in range(inner):
            x = fn(x, *rest)
        return x

    jfn = jax.jit(chain)
    out = jfn(*args)
    float(jnp.sum(out))  # warmup + sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / inner * 1000.0  # ms per application


def floor_ms(bytes_moved: float) -> float:
    return bytes_moved / (BW_GBPS * 1e9) * 1000.0


def loader_overlap_probe():
    """VERDICT round-2 item 10 evidence: with prefetch=2 the train loop's
    batch-wait must be ~0 while device steps run (IO/compute overlap).

    Times `next(loader)` waits across a short flagship-geometry training
    loop with prefetch 0 vs 2 on synthetic phantoms."""
    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.data.loader import DataLoader
    from diffusioniqt_tpu.data.synthetic import (
        SyntheticIQTDataset, generate_pair, population_stats,
    )
    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config

    cfg = Config()
    cfg.train.batch_sample = True
    cfg.train.boundary = True
    cfg.train.patch_size_sub = 32
    cfg.train.pred_obj = "x_start"
    cfg.train.dynamic_threshold = False
    cfg.train.compute_dtype = (
        "bfloat16" if jax.default_backend() == "tpu" else "float32")
    pairs = [generate_pair(192, seed=i) for i in range(2)]
    cfg.data.mean, cfg.data.std = population_stats([lr for _, lr in pairs])

    from diffusioniqt_tpu.train.trainer import ImagenTrainer

    ds = SyntheticIQTDataset(cfg, pairs=pairs, samples_per_volume=16)
    imagen = imagen_from_config(
        cfg, [NullUnet(), iqt_unet_from_config(cfg)])

    out = {}
    for prefetch in (0, 2):
        trainer = ImagenTrainer(configs=cfg, imagen=imagen,
                                gradient_accumulation_steps=4)
        loader = DataLoader(ds, batch_size=4, shuffle=True,
                            prefetch=prefetch)
        it = iter(loader)
        batch = next(it)
        trainer.train_step(unet_number=2, batch=batch)  # compile
        waits, steps = [], []
        t_loop = time.perf_counter()
        for _ in range(8):
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            waits.append(time.perf_counter() - t0)
            t1 = time.perf_counter()
            trainer.train_step(unet_number=2, batch=batch)
            steps.append(time.perf_counter() - t1)
        total = time.perf_counter() - t_loop
        out[f"prefetch{prefetch}"] = {
            "mean_batch_wait_ms": round(1000 * sum(waits) / len(waits), 1),
            "mean_step_ms": round(1000 * sum(steps) / len(steps), 1),
            "loop_s": round(total, 2),
        }
    print(json.dumps(out, indent=2))


def main():
    if "--loader" in sys.argv:
        loader_overlap_probe()
        return
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, S, C), jnp.float32).astype(DT)
    w = jax.random.normal(key, (3, 3, 3, C, C), jnp.float32).astype(DT) * 0.05
    g = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    a_coef = jnp.full((B, 1, 1, 1, C), 1.01, DT)
    b_coef = jnp.full((B, 1, 1, 1, C), 0.01, DT)

    vol_bytes = B * S ** 3 * C * 2  # bf16
    ext_bytes = B * (S + 2) ** 3 * C * 2
    res = {"shape": f"{B}x{S}^3 c{C} bf16",
           "volume_GB": round(vol_bytes / 1e9, 3)}

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1, 1),
        padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )

    # -- components ------------------------------------------------------
    def gn_mish(v):
        y = subvol_group_norm(v, g, 1, 1) + bias.astype(v.dtype)
        return mish(y)

    res["gn_mish_ms"] = round(timed(gn_mish, x), 2)
    res["gn_mish_floor_ms"] = round(floor_ms(3 * vol_bytes), 2)  # stats+rw

    res["halo_ms"] = round(timed(
        lambda v: halo_exchange(v, factor=3)[:, 1:-1, 1:-1, 1:-1, :], x), 2)
    res["halo_floor_ms"] = round(floor_ms(vol_bytes + ext_bytes), 2)

    def block_unit(v):
        y = gn_mish(v)
        yh = halo_exchange(y, factor=3)
        return conv(yh, w)

    res["block_unit_ms"] = round(timed(block_unit, x), 2)

    def conv_only(v):
        vh = halo_exchange(v, factor=3)
        return conv(vh, w)

    res["halo_conv_ms"] = round(timed(conv_only, x), 2)

    # -- does XLA fuse elementwise into the conv input? ------------------
    xh = halo_exchange(x, factor=3)

    res["conv_raw_ms"] = round(timed(lambda v: conv(v, w), xh), 2)
    res["conv_fused_affine_ms"] = round(
        timed(lambda v: conv(mish(v * 1.01 + 0.01), w), xh), 2)
    res["conv_input_fusion"] = bool(
        res["conv_fused_affine_ms"] - res["conv_raw_ms"]
        < 0.4 * floor_ms(2 * ext_bytes)
    )

    # -- SE gating unit --------------------------------------------------
    w1 = jax.random.normal(key, (C, C // 16), jnp.float32).astype(DT)
    w2 = jax.random.normal(key, (C // 16, C), jnp.float32).astype(DT)

    def se(v):
        pooled = jnp.mean(v, axis=(1, 2, 3))
        h = jax.nn.relu(pooled @ w1)
        gate = jax.nn.sigmoid(h @ w2)
        return v * gate[:, None, None, None, :]

    res["se_ms"] = round(timed(se, x), 2)
    res["se_floor_ms"] = round(floor_ms(3 * vol_bytes), 2)

    # -- scale-shift broadcast cost (time conditioning) ------------------
    res["affine_pass_ms"] = round(
        timed(lambda v: mish(v * a_coef + b_coef), x), 2)
    res["affine_floor_ms"] = round(floor_ms(2 * vol_bytes), 2)

    res["backend"] = jax.default_backend()
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
