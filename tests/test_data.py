"""Data pipeline tests: loader collate, sliding-window grid, stitching."""

import numpy as np
import pytest

from diffusioniqt_tpu.config import Config
from diffusioniqt_tpu.data.datasets import FakeIQTDataset, SupervisedIQTInference
from diffusioniqt_tpu.data.loader import DataLoader, collate_drop_none
from diffusioniqt_tpu.data.stitching import VolumeStitcher, sliding_window_grid


def test_collate_drops_none():
    items = [(np.ones((2, 2)), np.zeros(3)), None, (np.ones((2, 2)) * 2, np.ones(3))]
    batch = collate_drop_none(items)
    assert batch[0].shape == (2, 2, 2)
    assert batch[1].shape == (2, 3)
    assert collate_drop_none([None, None]) is None


def test_dataloader_batching():
    ds = FakeIQTDataset(size=4, length=10)
    dl = DataLoader(ds, batch_size=4)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 4, 4, 4, 1)
    assert batches[-1][0].shape == (2, 4, 4, 4, 1)
    dl = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(list(dl)) == 2


def test_sliding_window_grid():
    grid = sliding_window_grid((240, 240, 240), 96, 32)
    # range(0, 240-96+1, 32) = 0,32,64,96,128 -> 5 per axis
    assert len(grid) == 5 ** 3
    assert grid.min() == 0
    assert grid.max() == 128


def test_inference_dataset_brain_filter():
    cfg = Config()
    cfg.train.patch_size_sub = 8
    cfg.train.batch_sample = False
    cfg.eval.overlap = 8
    vol = np.zeros((16, 16, 16), np.float32)
    vol[:8, :8, :8] = 100.0  # brain only in one corner
    ds = SupervisedIQTInference(cfg, lr_file=None, volume=vol)
    items = [ds[i] for i in range(len(ds))]
    kept = [it for it in items if it is not None]
    assert len(items) == 8
    assert len(kept) == 1
    patch, idx = kept[0]
    assert patch.shape == (8, 8, 8, 1)
    np.testing.assert_array_equal(idx, [0, 0, 0])


def test_stitcher_trim_roundtrip():
    """Stitching constant patches with trim mode reproduces a constant
    volume; borders stay untrimmed (reference test.py:184-243 semantics)."""
    vol_shape = (16, 16, 16)
    patch, overlap = 8, 4
    st = VolumeStitcher(vol_shape, patch, overlap, mode="trim", fill_value=-1.0)
    grid = sliding_window_grid(vol_shape, patch, overlap)
    for idx in grid:
        st.add(np.full((patch,) * 3, 7.0, np.float32), idx)
    out = st.result()
    np.testing.assert_array_equal(out, 7.0)


def test_stitcher_trim_interior_writes_center():
    st = VolumeStitcher((16, 16, 16), 8, 4, mode="trim", fill_value=0.0)
    st.add(np.full((8, 8, 8), 5.0, np.float32), (4, 4, 4))
    out = st.result()
    # interior patch: overlap//2=2 trimmed from each face
    assert out[6, 6, 6] == 5.0
    assert out[4, 4, 4] == 0.0  # trimmed region untouched
    assert out[12, 12, 12] == 0.0


def test_stitcher_gaussian_identity_on_constant():
    vol_shape = (16, 16, 16)
    patch, overlap = 8, 4
    st = VolumeStitcher(vol_shape, patch, overlap, mode="gaussian")
    for idx in sliding_window_grid(vol_shape, patch, overlap):
        st.add(np.full((patch,) * 3, 3.0, np.float32), idx)
    out = st.result()
    np.testing.assert_allclose(out, 3.0, rtol=1e-5)


def test_stitcher_background_mask():
    st = VolumeStitcher((8, 8, 8), 8, 8, mode="trim")
    st.add(np.ones((8, 8, 8), np.float32), (0, 0, 0))
    mask = np.zeros((8, 8, 8), bool)
    mask[0, 0, 0] = True
    out = st.result(background_mask=mask, background_value=-0.7)
    assert out[0, 0, 0] == np.float32(-0.7)
    assert out[1, 1, 1] == 1.0


def test_rejection_sampling_best_candidate_fallback(tmp_path):
    """On a sparse volume where no candidate reaches the non-zero threshold,
    the fallback must be the highest-occupancy candidate seen — not the
    volume center (reference retry-forever semantics, data.py:125-126)."""
    from diffusioniqt_tpu.data.datasets import SupervisedIQT

    s, p = 64, 16
    lr = np.zeros((s, s, s), np.float32)
    # one small bright blob far from the center; center region stays empty
    lr[4:12, 4:12, 4:12] = 1.0
    hr = lr * 2.0
    lr_f, hr_f = str(tmp_path / "lr.npy"), str(tmp_path / "hr.npy")
    np.save(lr_f, lr)
    np.save(hr_f, hr)

    cfg = Config()
    cfg.train.patch_size_sub = p
    cfg.train.batch_sample = False
    cfg.data.norm = "z-score"
    cfg.data.mean, cfg.data.std = 0.0, 1.0
    ds = SupervisedIQT(cfg, [lr_f], [hr_f], train=True, max_retries=400,
                       volume_size=s)

    hits = 0
    for _ in range(8):
        hr_patch, lr_patch = ds[0]
        # a center crop would be all-zero; the best-candidate fallback
        # lands on (part of) the blob with overwhelming probability
        if np.count_nonzero(lr_patch) > 0:
            hits += 1
    assert hits >= 6, "fallback never found the non-empty candidate"


def test_prefetch_loader_matches_sync_and_propagates_errors():
    """prefetch>0 must yield the same batches in the same order as the
    synchronous path (VERDICT round-2 item 10), and worker exceptions must
    reach the consumer."""
    from diffusioniqt_tpu.data.loader import DataLoader

    class TinyDS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return (np.full((2, 2), i, np.float32),)

    a = list(DataLoader(TinyDS(), batch_size=2, shuffle=True, seed=5))
    b = list(DataLoader(TinyDS(), batch_size=2, shuffle=True, seed=5,
                        prefetch=2))
    assert len(a) == len(b) == 4
    for (x,), (y,) in zip(a, b):
        np.testing.assert_array_equal(x, y)

    class BadDS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            if i == 2:
                raise RuntimeError("boom")
            return (np.zeros(1, np.float32),)

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(BadDS(), batch_size=1, prefetch=2))


def test_loader_worker_map_applied_on_worker_thread():
    """worker_map transforms each batch before the consumer sees it, and
    with prefetch>0 it runs on the prefetch worker thread (device-prefetch
    hook used by ImagenTrainer when Train.transfer_dtype is set)."""
    import threading

    from diffusioniqt_tpu.data.loader import DataLoader

    class TinyDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return (np.full((2,), i, np.float32),)

    main_thread = threading.current_thread()
    seen_threads = []

    def wmap(batch):
        seen_threads.append(threading.current_thread())
        return tuple(a * 10.0 for a in batch)

    out = list(DataLoader(TinyDS(), batch_size=2, prefetch=2,
                          worker_map=wmap))
    assert len(out) == 2
    np.testing.assert_array_equal(out[0][0], [[0., 0.], [10., 10.]])
    assert all(t is not main_thread for t in seen_threads)

    # prefetch=0: map still applied, inline
    out_sync = list(DataLoader(TinyDS(), batch_size=2, worker_map=wmap))
    np.testing.assert_array_equal(out_sync[0][0], out[0][0])


def test_synthetic_phantom_pair_properties():
    """Synthetic LR/HR phantoms (data/synthetic.py): zero background,
    positive brain intensities, LR correlated-but-degraded, crops normalize
    to ~unit scale."""
    from diffusioniqt_tpu.data.synthetic import (
        SyntheticIQTDataset, generate_pair, population_stats,
    )

    hr, lr = generate_pair(64, seed=0)
    assert hr.shape == lr.shape == (64, 64, 64)
    assert hr.min() == 0.0 and (hr > 0).mean() > 0.15
    mask = hr == 0
    assert np.all(lr[mask] == 0.0), "LR must keep the zero background"
    corr = np.corrcoef(hr.ravel(), lr.ravel())[0, 1]
    assert corr > 0.9, "LR should stay strongly correlated with HR"
    assert float(np.abs(hr - lr).mean()) > 1.0, "LR must actually be degraded"

    mean, std = population_stats([lr])
    cfg = Config()
    cfg.train.batch_sample = True
    cfg.train.patch_size_sub = 16
    cfg.train.batch_sample_factor = 3
    cfg.data.mean, cfg.data.std = mean, std
    ds = SyntheticIQTDataset(cfg, pairs=[(hr, lr)], samples_per_volume=2)
    hp, lp = ds[0]
    assert hp.shape == lp.shape == (48, 48, 48, 1)
    assert np.isfinite(hp).all() and np.isfinite(lp).all()
