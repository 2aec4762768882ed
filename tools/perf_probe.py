"""TPU perf probes for the round-3 close-out (VERDICT round-2 item 5).

Modes (run AFTER any other TPU user finishes; each prints JSON):

  python tools/perf_probe.py             # chained component probe (below)
  python tools/perf_probe.py --barrier   # TRUE per-op costs (see warning)
  python tools/perf_probe.py --flops     # conv inventory + analytic FLOPs
  python tools/perf_probe.py --loader    # host-loader overlap measurement

METHODOLOGY WARNING (PERF.md round 3): plain chained iterations of an
*elementwise* op fold into one XLA pass — an x+1 chain costs the same
whether it has 1 or 64 links — so the default chained mode is only valid
for ops XLA cannot fold (convs, distinct-producer chains). The
``--barrier`` mode is the corrected probe: it places
``jax.lax.optimization_barrier`` between links and fits a line through
two chain lengths, so the slope is the true per-op cost and the ~33-42 ms
tunnel dispatch overhead lands in the intercept.

The default mode measures, at the flagship shape (216x32^3 c64 bf16):

  1. the full XLA block-unit chain [GN -> scale-shift -> mish -> halo ->
     VALID conv] and its pieces (GN+mish pass, halo concat sweep, conv);
  2. whether XLA fuses an elementwise producer into the conv input read
     (decides if a halo-first + affine-into-conv reorder can win);
  3. the SE3D gating unit;
  4. HBM-floor estimates for each, from measured marginal bandwidth.
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


def _flagship():
    """Flagship model + inputs at bench geometry (8 patches = b216)."""
    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config
    from diffusioniqt_tpu.models.unet3d import NullUnet, iqt_unet_from_config

    cfg = Config()
    cfg.train.batch_sample = True
    cfg.train.boundary = True
    cfg.train.patch_size_sub = 32
    cfg.train.timesteps = 20
    cfg.train.pred_obj = "x_start"
    cfg.train.dynamic_threshold = False
    cfg.train.compute_dtype = (
        "bfloat16" if jax.default_backend() == "tpu" else "float32")
    unet = iqt_unet_from_config(cfg)
    imagen = imagen_from_config(cfg, [NullUnet(), unet])
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=27)
    batch = 27 * 8
    lowres = jnp.zeros((batch, 32, 32, 32, 1), jnp.float32)
    return cfg, unet, imagen, params, lowres, batch


def flops_probe():
    """Conv inventory of the flagship forward + analytic FLOP totals for
    the forward and the 20-step sampler (the numbers behind PERF.md's
    round-3 roofline; validates utils/flops.py against the model)."""
    import numpy as np

    from diffusioniqt_tpu.utils.flops import matmul_flops

    cfg, unet, imagen, params, lowres, batch = _flagship()
    xt = jnp.zeros((batch, 32, 32, 32, 1), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)

    fwd = lambda p, x_, t_, lr_: unet.apply(p, x_, t_, t_,  # noqa: E731
                                            lowres_cond_img=lr_)
    jx = jax.make_jaxpr(fwd)(params[1], xt, t, lowres)

    convs = {}

    def visit(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs = eqn.invars[0].aval.shape
                rhs = eqn.invars[1].aval.shape
                out = eqn.outvars[0].aval.shape
                cout = rhs[eqn.params["dimension_numbers"].rhs_spec[0]]
                f = 2.0 * float(np.prod(out)) * float(np.prod(rhs)) / cout
                k = f"in{lhs} k{rhs} out{out}"
                convs.setdefault(k, {"n": 0, "tf_each": round(f / 1e12, 4)})
                convs[k]["n"] += 1
            for p in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(p)
                if sub is not None:
                    visit(getattr(sub, "jaxpr", sub))

    visit(jx.jaxpr)
    fwd_tf = matmul_flops(fwd, params[1], xt, t, lowres) / 1e12

    def sample_fn(p1, key, lr_):
        return imagen.p_sample_loop(
            imagen.unets[1], p1, key, (batch, 32, 32, 32, 1),
            noise_scheduler=imagen.noise_schedulers[1],
            lowres_cond_img=lr_, pred_objective="x_start",
            dynamic_threshold=False)

    sampler_tf = matmul_flops(
        sample_fn, params[1], jax.random.PRNGKey(1), lowres) / 1e12
    print(json.dumps({
        "conv_inventory": dict(sorted(
            convs.items(), key=lambda kv: -kv[1]["n"] * kv[1]["tf_each"])),
        "forward_tf_b216": round(fwd_tf, 2),
        "forward_tf_per_patch": round(fwd_tf / 8, 3),
        "sampler_20step_tf": round(sampler_tf, 1),
    }, indent=1))


def barrier_probe():
    """Corrected per-op costs: optimization_barrier between chain links,
    two-length linear fit (slope = per-op ms, intercept = dispatch
    overhead). Source of PERF.md's round-3 per-op table."""
    x = jax.random.normal(
        jax.random.PRNGKey(0), (B, S, S, S, C), jnp.float32).astype(DT)
    scale = jnp.ones((C,), jnp.float32)
    a = jnp.full((B, 1, 1, 1, C), 1.01, DT)
    bsh = jnp.full((B, 1, 1, 1, C), .01, DT)
    k3 = jax.random.normal(
        jax.random.PRNGKey(1), (3, 3, 3, C, C), jnp.float32).astype(DT) * .05
    n_elems = B * S ** 3 * C
    gb = n_elems * 2 / 1e9

    def timed_total(fn, *args, iters=6):
        j = jax.jit(fn)
        float(jnp.sum(j(*args)))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.sum(j(*args)))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    def chain(fn, inner):
        def c(v):
            for _ in range(inner):
                v = jax.lax.optimization_barrier(fn(v))
            return v
        return c

    def per_op(fn, i1=4, i2=16):
        t1 = timed_total(chain(fn, i1), x)
        t2 = timed_total(chain(fn, i2), x)
        slope = (t2 - t1) / (i2 - i1)
        return slope, t1 - i1 * slope

    conv_same = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1, 1),
        padding="SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT)
    conv_valid = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1, 1),
        padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=DT)

    ops = {
        "add1": lambda v: v + DT(1.0),
        "affine_mish": lambda v: mish(v * a + bsh),
        "gn": lambda v: subvol_group_norm(v, scale, 1, 1),
        "gn_affine_mish": lambda v: mish(
            subvol_group_norm(v, scale, 1, 1) * a + bsh),
        "same_conv": lambda v: conv_same(v, k3),
        "halo_validconv": lambda v: conv_valid(halo_exchange(v), k3),
        "block_unit": lambda v: conv_valid(halo_exchange(
            mish(subvol_group_norm(v, scale, 1, 1) * a + bsh)), k3),
    }
    res = {"overhead_tiny_identity_ms": round(
        timed_total(lambda v: v, jnp.ones((8, 128), DT)), 2)}
    conv_flops = 2.0 * n_elems * C * 27
    for name, f in ops.items():
        ms, ovh = per_op(f)
        entry = {"ms": round(ms, 2), "fit_overhead_ms": round(ovh, 1)}
        if "conv" in name or "unit" in name:
            entry["tflops"] = round(conv_flops / (ms / 1e3) / 1e12, 1)
        else:
            entry["gbps_rw"] = round(2 * gb / (ms / 1e3), 1)
        res[name] = entry
    res["backend"] = jax.default_backend()
    print(json.dumps(res, indent=1))


def main():
    if "--loader" in sys.argv:
        loader_overlap_probe()
        return
    if "--flops" in sys.argv:
        flops_probe()
        return
    if "--barrier" in sys.argv:
        barrier_probe()
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
