"""Device-resident sliding-window stitching for full-volume inference.

The host stitcher (`data/stitching.py`, re-design of the reference loop at
`/root/reference/test.py:174-243`) is correct but forces per-batch traffic
over the host link: every overlapping 96^3 window is sent H2D (the stride-32
grid re-transfers each voxel up to 8x, ~226 MB per 240^3 volume) and every
prediction comes back D2H before being stitched in numpy. On the slow axon
tunnel that traffic is most of the measured 13-15% gap between end-to-end
volumes/hour and the pure device-throughput projection (PERF.md, round 4).

This module keeps the whole volume resident on the device instead:

  * `gather_windows` — slice a batch of windows out of the device-resident
    volume with `vmap(dynamic_slice)`; the only H2D transfer is the volume
    itself, once (~28 MB at bf16).
  * `DeviceVolumeStitcher` — accumulates predicted windows into donated
    device buffers with read-modify-write `dynamic_update_slice` loops,
    replicating BOTH host modes exactly:
      - `trim`: masked overwrite; the keep-mask bounds are computed from the
        window start index inside the jit (border faces stay untrimmed),
        and windows are applied in submission order so later writes win,
        bit-identical to the host loop.
      - `gaussian`: weighted accumulate into (pred, weight) buffers with the
        same separable Gaussian window; `result()` normalises exactly like
        the host `VolumeStitcher.result`.
    Padded batch entries are masked out via a `valid` flag, so the last
    ragged batch needs no repetition padding on the host side.

Everything is static-shaped: one compiled program per (volume shape, patch,
overlap, mode) regardless of window position, so the 16-batch inference loop
dispatches fully async with a single D2H at `result()`.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffusioniqt_tpu.data.stitching import _gaussian_weight


@functools.partial(jax.jit, static_argnames=("patch",))
def gather_windows(volume: jax.Array, starts: jax.Array, patch: int):
    """Slice (G, patch, patch, patch, 1) windows out of a device volume.

    ``volume`` is the full (X, Y, Z) normalized volume (any float dtype —
    bf16 halves the one-time H2D cost); ``starts`` is (G, 3) int32. Padded
    rows may simply repeat a valid start (out-of-range starts are clamped
    by ``dynamic_slice`` semantics anyway).
    """

    def one(s):
        return jax.lax.dynamic_slice(
            volume, (s[0], s[1], s[2]), (patch, patch, patch))

    return jax.vmap(one)(starts)[..., None]


def _axis_keep_mask(start, edge: int, patch: int, trim: int):
    """Per-axis keep mask for trim mode — interior faces lose ``trim``
    voxels, faces flush with the volume border keep everything (host
    stitcher lines 76-85)."""
    c = jnp.arange(patch)
    lo = jnp.where(start == 0, 0, trim)
    hi = jnp.where(start + patch == edge, 0, trim)
    return (c >= lo) & (c < patch - hi)


@functools.partial(
    jax.jit,
    static_argnames=("patch", "overlap", "vol_shape"),
    donate_argnums=(0,),
)
def _trim_accumulate(pred, outs, starts, valid, *, patch: int, overlap: int,
                     vol_shape):
    """Apply one batch of windows in order (later windows overwrite)."""
    trim = overlap // 2
    full = overlap >= patch  # host stitcher's degenerate branch: no trim

    def body(i, pred):
        s = starts[i]
        if full:
            mask = jnp.ones((patch, patch, patch), bool)
        else:
            mask = (
                _axis_keep_mask(s[0], vol_shape[0], patch, trim)[:, None, None]
                & _axis_keep_mask(s[1], vol_shape[1], patch, trim)[None, :, None]
                & _axis_keep_mask(s[2], vol_shape[2], patch, trim)[None, None, :]
            )
        mask = mask & valid[i]
        cur = jax.lax.dynamic_slice(pred, (s[0], s[1], s[2]),
                                    (patch, patch, patch))
        new = jnp.where(mask, outs[i], cur)
        return jax.lax.dynamic_update_slice(pred, new, (s[0], s[1], s[2]))

    return jax.lax.fori_loop(0, outs.shape[0], body, pred)


@functools.partial(
    jax.jit,
    static_argnames=("patch",),
    donate_argnums=(0, 1),
)
def _gaussian_accumulate(pred, weight, outs, starts, valid, w, *, patch: int):
    def body(i, carry):
        pred, weight = carry
        s = starts[i]
        wv = w * valid[i].astype(w.dtype)
        cur = jax.lax.dynamic_slice(pred, (s[0], s[1], s[2]),
                                    (patch, patch, patch))
        curw = jax.lax.dynamic_slice(weight, (s[0], s[1], s[2]),
                                     (patch, patch, patch))
        pred = jax.lax.dynamic_update_slice(
            pred, cur + outs[i] * wv, (s[0], s[1], s[2]))
        weight = jax.lax.dynamic_update_slice(
            weight, curw + wv, (s[0], s[1], s[2]))
        return pred, weight

    return jax.lax.fori_loop(0, outs.shape[0], body, (pred, weight))


class DeviceVolumeStitcher:
    """Drop-in device-resident analog of ``data.stitching.VolumeStitcher``.

    ``add_batch`` consumes device arrays and dispatches asynchronously;
    ``result`` is the single host sync + D2H of the run.
    """

    def __init__(self, vol_shape: Sequence[int], patch_size: int,
                 overlap: int, mode: str = "trim",
                 fill_value: float = 0.0):
        assert mode in ("trim", "gaussian")
        self.vol_shape = tuple(int(v) for v in vol_shape)
        self.patch_size = int(patch_size)
        self.overlap = int(overlap)
        self.mode = mode
        if mode == "gaussian":
            self.pred = jnp.zeros(self.vol_shape, jnp.float32)
            self.weight = jnp.zeros(self.vol_shape, jnp.float32)
            self._w = jnp.asarray(_gaussian_weight(self.patch_size))
        else:
            self.pred = jnp.full(self.vol_shape, fill_value, jnp.float32)

    def add_batch(self, outs: jax.Array, starts: jax.Array,
                  valid: jax.Array):
        """outs: (G, p, p, p) predictions (any float dtype — accumulated in
        f32); starts: (G, 3) int32; valid: (G,) bool (False = padded row)."""
        outs = outs.astype(jnp.float32)
        starts = starts.astype(jnp.int32)
        valid = valid.astype(bool)
        if self.mode == "gaussian":
            self.pred, self.weight = _gaussian_accumulate(
                self.pred, self.weight, outs, starts, valid, self._w,
                patch=self.patch_size)
        else:
            self.pred = _trim_accumulate(
                self.pred, outs, starts, valid,
                patch=self.patch_size, overlap=self.overlap,
                vol_shape=self.vol_shape)

    def result(self, background_mask: Optional[np.ndarray] = None,
               background_value: float = 0.0) -> np.ndarray:
        """Final volume on host (the run's one D2H); same semantics as the
        host ``VolumeStitcher.result``."""
        if self.mode == "gaussian":
            out_dev = jnp.where(
                self.weight > 0,
                self.pred / jnp.maximum(self.weight, 1e-8),
                background_value)
        else:
            out_dev = self.pred
        # np.asarray of a jax.Array is a read-only view; copy so callers
        # (and the mask write below) can mutate, and so the trim buffer
        # stays reusable
        out = np.array(out_dev)
        if background_mask is not None:
            out[background_mask] = background_value
        return out
