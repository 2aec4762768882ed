"""Self-contained NIfTI-1 IO (data/nifti.py): roundtrips, dtypes, scaling,
affines, gzip, and integration with the dataset loaders (replaces the
reference's hard nibabel dependency, data.py:96-99)."""

import gzip
import struct

import numpy as np
import pytest

from diffusioniqt_tpu.data import nifti
from diffusioniqt_tpu.data.datasets import load_affine, load_volume, save_volume


def test_roundtrip_nii_and_gz(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((7, 9, 11)).astype(np.float32)
    affine = np.diag([2.0, 2.0, 2.5, 1.0])
    affine[:3, 3] = [-10, 5, 3]
    for name in ("v.nii", "v.nii.gz"):
        p = str(tmp_path / name)
        nifti.write(p, vol, affine)
        data, aff = nifti.read(p)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(aff, affine, rtol=1e-5, atol=1e-5)


def test_integer_dtype_and_scaling(tmp_path):
    vol = (np.arange(24).reshape(2, 3, 4) % 7).astype(np.int16)
    p = str(tmp_path / "i.nii")
    nifti.write(p, vol, dtype=np.int16)
    data, _ = nifti.read(p)
    np.testing.assert_array_equal(data, vol.astype(np.float32))

    # manual scl_slope/inter patch: data' = 2x + 1
    with open(p, "rb") as fh:
        raw = bytearray(fh.read())
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, 1.0)
    with open(p, "wb") as fh:
        fh.write(bytes(raw))
    data, _ = nifti.read(p)
    np.testing.assert_allclose(data, vol * 2.0 + 1.0)


def test_big_endian_and_qform(tmp_path):
    """A minimal big-endian qform-only file is decoded correctly."""
    vol = np.arange(8, dtype=">i2").reshape(2, 2, 2)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)   # int16
    struct.pack_into(">h", hdr, 72, 16)
    struct.pack_into(">8f", hdr, 76, 1.0, 1.5, 1.5, 3.0, 1, 1, 1, 1)
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">h", hdr, 252, 1)  # qform only, identity quaternion
    struct.pack_into(">6f", hdr, 256, 0, 0, 0, 7.0, 8.0, 9.0)
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "be.nii")
    with open(p, "wb") as fh:
        fh.write(bytes(hdr) + b"\x00" * 4 +
                 np.asfortranarray(vol).tobytes(order="F"))
    data, aff = nifti.read(p)
    np.testing.assert_array_equal(
        data, vol.astype(np.float32)
    )
    np.testing.assert_allclose(np.diag(aff), [1.5, 1.5, 3.0, 1.0])
    np.testing.assert_allclose(aff[:3, 3], [7.0, 8.0, 9.0])


def test_dataset_loaders_use_fallback(tmp_path):
    vol = np.random.default_rng(1).standard_normal((6, 6, 6)).astype(np.float32)
    p = str(tmp_path / "x.nii.gz")
    save_volume(p, vol)
    np.testing.assert_allclose(load_volume(p), vol, rtol=1e-6)
    assert load_affine(p).shape == (4, 4)


def test_reject_non_nifti(tmp_path):
    p = str(tmp_path / "bad.nii")
    with open(p, "wb") as fh:
        fh.write(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.read(p)


def test_gzip_actually_compressed(tmp_path):
    p = str(tmp_path / "c.nii.gz")
    nifti.write(p, np.zeros((16, 16, 16), np.float32))
    with open(p, "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"  # gzip magic
    with gzip.open(p, "rb") as fh:
        assert struct.unpack("<i", fh.read(4))[0] == 348
