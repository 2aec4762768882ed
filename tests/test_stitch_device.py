"""Device-resident stitching (ops/stitch_device.py): numerical equivalence
with the host VolumeStitcher (data/stitching.py — the reference inference
loop, /root/reference/test.py:174-243) and with the host infer_volume path.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _grid(shape, patch, stride):
    from diffusioniqt_tpu.data.stitching import sliding_window_grid

    return sliding_window_grid(shape, patch, stride)


def _run_pair(shape, patch, overlap, stride, mode, fill=0.0,
              batch=3, seed=0):
    """Feed identical random windows to the host and device stitchers."""
    import jax.numpy as jnp

    from diffusioniqt_tpu.data.stitching import VolumeStitcher
    from diffusioniqt_tpu.ops.stitch_device import DeviceVolumeStitcher

    rng = np.random.default_rng(seed)
    idxs = _grid(shape, patch, stride)
    outs = rng.standard_normal((len(idxs), patch, patch, patch)).astype(
        np.float32)

    host = VolumeStitcher(shape, patch, overlap, mode=mode, fill_value=fill)
    for w, idx in zip(outs, idxs):
        host.add(w, idx)

    dev = DeviceVolumeStitcher(shape, patch, overlap, mode=mode,
                               fill_value=fill)
    for s in range(0, len(idxs), batch):
        chunk_idx = idxs[s:s + batch]
        chunk_out = outs[s:s + batch]
        n_real = len(chunk_idx)
        if n_real < batch:  # ragged tail: pad + mask, like infer_volume
            chunk_idx = np.concatenate(
                [chunk_idx, np.zeros((batch - n_real, 3), np.int32)])
            chunk_out = np.concatenate(
                [chunk_out,
                 np.full((batch - n_real, patch, patch, patch), 1e9,
                         np.float32)])  # poison: must be masked out
        valid = np.arange(batch) < n_real
        dev.add_batch(jnp.asarray(chunk_out), jnp.asarray(chunk_idx),
                      jnp.asarray(valid))
    return host.result(), dev.result()


def test_trim_exact_equivalence():
    # stride < patch: interior faces trimmed, border faces kept, later
    # windows overwrite earlier ones in the kept-region overlap
    h, d = _run_pair((26, 24, 24), patch=8, overlap=4, stride=4,
                     mode="trim", fill=-1.5)
    assert np.array_equal(h, d)
    assert (h[24:, :, :] == -1.5).all()  # uncovered tail keeps fill_value


def test_trim_overlap_ge_patch_branch():
    # the host stitcher's degenerate branch writes whole patches
    h, d = _run_pair((24, 24, 24), patch=8, overlap=8, stride=4,
                     mode="trim", fill=0.0)
    assert np.array_equal(h, d)


def test_gaussian_equivalence():
    h, d = _run_pair((26, 24, 24), patch=8, overlap=4, stride=4,
                     mode="gaussian")
    np.testing.assert_allclose(h, d, rtol=1e-5, atol=1e-5)
    # uncovered voxels take the background value (0.0) in both
    assert (d[24:, :, :] == 0.0).all()


def test_gaussian_background_mask():
    from diffusioniqt_tpu.ops.stitch_device import DeviceVolumeStitcher
    import jax.numpy as jnp

    dev = DeviceVolumeStitcher((8, 8, 8), 8, 4, mode="gaussian")
    dev.add_batch(jnp.ones((1, 8, 8, 8)), jnp.zeros((1, 3), np.int32),
                  jnp.ones((1,), bool))
    mask = np.zeros((8, 8, 8), bool)
    mask[0] = True
    out = dev.result(background_mask=mask, background_value=-3.0)
    assert (out[0] == -3.0).all()
    np.testing.assert_allclose(out[1:], 1.0, rtol=1e-6)


def test_gather_windows_matches_numpy():
    import jax.numpy as jnp

    from diffusioniqt_tpu.ops.stitch_device import gather_windows

    rng = np.random.default_rng(3)
    vol = rng.standard_normal((12, 10, 9)).astype(np.float32)
    starts = np.asarray([[0, 0, 0], [4, 2, 1], [8, 6, 5]], np.int32)
    got = np.asarray(gather_windows(jnp.asarray(vol), jnp.asarray(starts), 4))
    assert got.shape == (3, 4, 4, 4, 1)
    for g, (i, j, k) in zip(got, starts):
        np.testing.assert_array_equal(
            g[..., 0], vol[i:i + 4, j:j + 4, k:k + 4])


def test_valid_indices_matches_getitem_filter():
    from diffusioniqt_tpu.config import load_config
    from diffusioniqt_tpu.data.datasets import SupervisedIQTInference

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "config",
                     "smoke_config.yaml"))
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    vol[:10] = 0.0  # force some windows under the 5% content filter
    ds = SupervisedIQTInference(cfg, None, volume=vol)
    expect = [tuple(ds[i][1]) for i in range(len(ds)) if ds[i] is not None]
    got = [tuple(r) for r in ds.valid_indices()]
    assert got == expect and len(got) > 0


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["trim", "gaussian"])
def test_infer_volume_device_matches_host(mode):
    """Full pipeline: device-resident inference == host inference, same
    trainer weights and RNG stream (the sampler draws identical noise for
    identical call sequences)."""
    from diffusioniqt_tpu.config import load_config
    from test import build_trainer, infer_volume

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "config",
                     "smoke_config.yaml"))
    cfg.eval.overlap = 4  # exercise the interior-trim branch (patch 8)
    trainer = build_trainer(cfg)
    trainer.prepare()

    rng = np.random.default_rng(0)
    lowres = np.abs(rng.standard_normal((16, 16, 16))).astype(np.float32) \
        * cfg.data.std

    key0 = trainer._key
    host = infer_volume(cfg, trainer, lowres, stitch_mode=mode,
                        verbose=False, patch_batch=3)
    trainer._key = key0  # replay the identical sampling-noise stream
    dev = infer_volume(cfg, trainer, lowres, stitch_mode=mode,
                       verbose=False, patch_batch=3, device_stitch=True)
    assert dev.shape == host.shape
    np.testing.assert_allclose(host, dev, rtol=2e-4, atol=2e-4)
