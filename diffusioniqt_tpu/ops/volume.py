"""Volume / patch geometry ops (pure jnp, static shapes, XLA-friendly).

TPU-native re-design of the reference's patch mechanism:
  * ``convertVolume2subVolume`` / ``merge_sub_volumes``
    (``/root/reference/utils_mine.py:25-67``) — implemented as plain
    reshape+transpose (no unfold), so XLA lowers them to cheap layout ops.
  * ``boundary_pad`` (``/root/reference/imagen_pytorch3D.py:37-46``) — the
    halo exchange that lets *unpadded* convs see true neighbour voxels across
    sub-volume seams. Implemented as a single static gather after a pad,
    instead of merge→pad→unfold→permute.
  * 3D pixel shuffle / unshuffle (reference ``PixelShuffle3D``/``Downsample``,
    imagen_pytorch3D.py:416-439 / :489-496).

Layout: channels-last ``(B, X, Y, Z, C)`` everywhere. The sub-volume batch
ordering is canonical row-major over the (gx, gy, gz) grid: sub-volume
``b = (gx * f + gy) * f + gz`` covers
``volume[gx*s:(gx+1)*s, gy*s:(gy+1)*s, gz*s:(gz+1)*s]``. Split and merge are
exact inverses (round-trip tested), which is the property the reference's
unfold/permute pair provides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# layout converters (for parity testing against the torch reference)
# ---------------------------------------------------------------------------

def from_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, X, Y, Z) -> (B, X, Y, Z, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def to_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, X, Y, Z, C) -> (B, C, X, Y, Z)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))


# ---------------------------------------------------------------------------
# sub-volume split / merge
# ---------------------------------------------------------------------------

def volume_to_subvolumes(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """(B, f*s, f*s, f*s, C) -> (B*f^3, s, s, s, C).

    Capability of reference ``convertVolume2subVolume`` (utils_mine.py:25-42),
    as a reshape/transpose pair.
    """
    b, X, Y, Z, c = x.shape
    f = factor
    if X % f or Y % f or Z % f:
        raise ValueError(f"volume edges {(X, Y, Z)} not divisible by factor {f}")
    sx, sy, sz = X // f, Y // f, Z // f
    x = x.reshape(b, f, sx, f, sy, f, sz, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))  # (b, gx, gy, gz, sx, sy, sz, c)
    return x.reshape(b * f * f * f, sx, sy, sz, c)


def subvolumes_to_volume(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """(B*f^3, s, s, s, C) -> (B, f*s, f*s, f*s, C). Inverse of
    :func:`volume_to_subvolumes` (reference ``merge_sub_volumes``,
    utils_mine.py:44-67)."""
    n, sx, sy, sz, c = x.shape
    f = factor
    if n % (f ** 3):
        raise ValueError(f"batch {n} not divisible by factor^3 {f ** 3}")
    b = n // (f ** 3)
    x = x.reshape(b, f, f, f, sx, sy, sz, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(b, f * sx, f * sy, f * sz, c)


# aliases matching the reference's public names
convert_volume_to_subvolume = volume_to_subvolumes
merge_sub_volumes = subvolumes_to_volume


# ---------------------------------------------------------------------------
# boundary halo (the 'boundary' conv mode)
# ---------------------------------------------------------------------------

def _halo_index(f: int, s: int, halo: int) -> np.ndarray:
    """Static gather index along one axis of the padded merged volume.

    For each grid cell g in [0, f), take ``s + 2*halo`` samples starting at
    ``g * s`` of the zero-padded axis (padded by ``halo`` on both sides).
    """
    base = np.arange(s + 2 * halo, dtype=np.int32)
    return (np.arange(f, dtype=np.int32)[:, None] * s + base[None, :]).reshape(-1)


def boundary_halo(x: jnp.ndarray, factor: int = 3, halo: int = 1) -> jnp.ndarray:
    """(B*f^3, s, s, s, C) -> (B*f^3, s+2h, s+2h, s+2h, C).

    Merges sub-volumes into the full volume, zero-pads by ``halo``, and
    re-splits into *overlapping* blocks so that a following VALID conv sees
    real neighbour voxels across sub-volume seams (reference ``boundary_pad``,
    imagen_pytorch3D.py:37-46, used by ``Block`` at :551,:564).

    One static gather per axis — XLA fuses this into the conv's input.
    """
    n, s = x.shape[0], x.shape[1]
    f = factor
    b = n // (f ** 3)
    full = subvolumes_to_volume(x, factor=f)  # (b, f*s, f*s, f*s, c)
    pad = [(0, 0), (halo, halo), (halo, halo), (halo, halo), (0, 0)]
    full = jnp.pad(full, pad)
    idx = _halo_index(f, s, halo)
    full = full[:, idx][:, :, idx][:, :, :, idx]
    e = s + 2 * halo
    full = full.reshape(b, f, e, f, e, f, e, full.shape[-1])
    full = jnp.transpose(full, (0, 1, 3, 5, 2, 4, 6, 7))
    return full.reshape(n, e, e, e, full.shape[-1])


def _spatial_region(s: int, d: int):
    """((src_start, len) in x, dst_start in padded) along one axis for grid
    offset d."""
    if d == -1:
        return (s - 1, 1), 0
    if d == 1:
        return (0, 1), s + 1
    return (0, s), 1


def _halo_exchange_roll(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """Flat-5D halo: per-offset face slice + batch roll + masked update.
    Batch-flat cost on TPU (the 8D grid-view variant scales linearly with
    batch); preferred for large batches."""
    n, s = x.shape[0], x.shape[1]
    f = factor
    c = x.shape[-1]
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    b_idx = jnp.arange(n)
    rem = b_idx % (f ** 3)
    grid_pos = (rem // (f * f), (rem // f) % f, rem % f)

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                shift_b = dx * f * f + dy * f + dz
                valid = jnp.ones((n,), bool)
                for gc, d in zip(grid_pos, (dx, dy, dz)):
                    valid &= (gc + d >= 0) & (gc + d < f)
                (sx, lx), tx = _spatial_region(s, dx)
                (sy, ly), ty = _spatial_region(s, dy)
                (sz, lz), tz = _spatial_region(s, dz)
                face = jax.lax.dynamic_slice(
                    x, (0, sx, sy, sz, 0), (n, lx, ly, lz, c)
                )
                face = jnp.roll(face, -shift_b, axis=0)
                face = jnp.where(valid[:, None, None, None, None], face, 0)
                xp = jax.lax.dynamic_update_slice(xp, face, (0, tx, ty, tz, 0))
    return xp


def _halo_exchange_sweep(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """Axis-sweep halo via concatenation: extend one spatial axis at a time
    with the two neighbour face planes (6 face moves total). Edges and
    corners need no dedicated transfers — sweep k's source planes span the
    already-extended axes, so previously received halo voxels (holding the
    diagonal neighbours' values, or zero exactly where the merged volume's
    zero padding applies) propagate automatically.

    Concat (3 whole-tensor materialisations, one per axis) measures ~5.1 ms
    at the flagship shape vs ~11.9 ms for pad+dynamic-update-slice (XLA
    copies the full buffer per DUS) and ~12.5 ms for the 26-offset roll —
    within ~10% of the pure HBM-bandwidth floor."""
    n = x.shape[0]
    f = factor
    b_idx = jnp.arange(n)
    rem = b_idx % (f ** 3)
    grid_pos = (rem // (f * f), (rem // f) % f, rem % f)
    strides = (f * f, f, 1)

    for axis in range(3):
        ax = axis + 1
        m = x.shape[ax]
        faces = []
        for d in (-1, 1):
            idx = [slice(None)] * 5
            idx[ax] = slice(m - 1, m) if d == -1 else slice(0, 1)
            face = x[tuple(idx)]
            face = jnp.roll(face, -d * strides[axis], axis=0)
            valid = (grid_pos[axis] + d >= 0) & (grid_pos[axis] + d < f)
            face = jnp.where(valid.reshape((n,) + (1,) * 4), face, 0)
            faces.append(face)
        x = jnp.concatenate([faces[0], x, faces[1]], axis=ax)
    return x


def halo_exchange(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """Fast halo construction: zero-pad each sub-volume by 1 and fill the 26
    neighbour regions (6 faces, 12 edges, 8 corners) from adjacent
    sub-volumes.

    Equivalent to :func:`boundary_halo` (the reference's merge→pad→unfold,
    imagen_pytorch3D.py:37-46) but far faster on TPU: the exchange only
    moves the thin halo shells instead of re-gathering the whole volume,
    and the axis-sweep formulation needs only 6 face moves (edges/corners
    ride along with the sweeps).
    """
    return _halo_exchange_sweep(x, factor)


def _halo_exchange_dus(x: jnp.ndarray, factor: int = 3) -> jnp.ndarray:
    """Grid-view variant: 26 static dynamic-update-slices on the 8D view."""
    n, s = x.shape[0], x.shape[1]
    f = factor
    b = n // (f ** 3)
    c = x.shape[-1]
    g = x.reshape(b, f, f, f, s, s, s, c)
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    xp = xp.reshape(b, f, f, f, s + 2, s + 2, s + 2, c)

    def grid_slices(d):
        # (target grid slice, source grid slice) along one grid axis
        if d == -1:
            return slice(1, None), slice(None, -1)
        if d == 1:
            return slice(None, -1), slice(1, None)
        return slice(None), slice(None)

    def halo_slices(d):
        # (target halo-region slice, source interior slice) along one axis
        if d == -1:
            return slice(0, 1), slice(s - 1, s)
        if d == 1:
            return slice(s + 1, s + 2), slice(0, 1)
        return slice(1, s + 1), slice(None)

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                tgx, sgx = grid_slices(dx)
                tgy, sgy = grid_slices(dy)
                tgz, sgz = grid_slices(dz)
                thx, shx = halo_slices(dx)
                thy, shy = halo_slices(dy)
                thz, shz = halo_slices(dz)
                xp = xp.at[:, tgx, tgy, tgz, thx, thy, thz].set(
                    g[:, sgx, sgy, sgz, shx, shy, shz]
                )
    return xp.reshape(n, s + 2, s + 2, s + 2, c)


# ---------------------------------------------------------------------------
# 3D pixel shuffle / unshuffle
# ---------------------------------------------------------------------------

def pixel_shuffle_3d(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """(B, X, Y, Z, C*r^3) -> (B, X*r, Y*r, Z*r, C).

    Channel index layout is ``c_out * r^3 + (rx * r + ry) * r + rz``, matching
    the reference ``PixelShuffle3D`` view/permute (imagen_pytorch3D.py:427-439)
    transposed to channels-last.
    """
    b, X, Y, Z, c = x.shape
    r = scale
    c_out = c // (r ** 3)
    x = x.reshape(b, X, Y, Z, c_out, r, r, r)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))  # (b, X, rx, Y, ry, Z, rz, c)
    return x.reshape(b, X * r, Y * r, Z * r, c_out)


def pixel_unshuffle_3d(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """(B, X*r, Y*r, Z*r, C) -> (B, X, Y, Z, C*r^3). SP-conv downsample input
    (reference ``Downsample`` rearrange, imagen_pytorch3D.py:489-496).

    Output channel layout is ``c * r^3 + (rx * r + ry) * r + rz`` — the exact
    inverse of :func:`pixel_shuffle_3d`.
    """
    b, X, Y, Z, c = x.shape
    r = scale
    x = x.reshape(b, X // r, r, Y // r, r, Z // r, r, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))  # (b, x, y, z, c, rx, ry, rz)
    return x.reshape(b, X // r, Y // r, Z // r, c * r ** 3)


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def resize_volume(
    x: jnp.ndarray,
    target_size: int,
    method: str = "nearest",
    clamp_range=None,
) -> jnp.ndarray:
    """Spatially resize a channels-last volume (B, ..., C) to edge
    ``target_size`` on every spatial axis (reference ``resize_image_to``,
    imagen_pytorch3D.py:165-181). Works for 2D slices and 3D volumes."""
    spatial = x.shape[1:-1]
    if all(s == target_size for s in spatial):
        return x
    out_shape = (x.shape[0],) + (target_size,) * len(spatial) + (x.shape[-1],)
    jax_method = {
        "nearest": "nearest", "trilinear": "trilinear", "linear": "trilinear",
    }[method]
    if jax_method == "trilinear" and len(spatial) == 2:
        jax_method = "bilinear"
    out = jax.image.resize(x, out_shape, method=jax_method)
    if clamp_range is not None:
        out = jnp.clip(out, clamp_range[0], clamp_range[1])
    return out


def upsample_trilinear(x: jnp.ndarray, scale: int = 2, align_corners: bool = True) -> jnp.ndarray:
    """Trilinear upsample by an integer scale (used by ViT3D / Patchify
    reconstruction, reference imagen_pytorch3D.py:900, :954).

    ``align_corners=True`` mimics torch's nn.Upsample(align_corners=True) via
    explicit corner-aligned sample coordinates.
    """
    b, X, Y, Z, c = x.shape
    oX, oY, oZ = X * scale, Y * scale, Z * scale
    if not align_corners:
        return jax.image.resize(x, (b, oX, oY, oZ, c), method="trilinear")

    def axis_coords(in_size, out_size):
        if out_size == 1 or in_size == 1:
            return jnp.zeros((out_size,), jnp.float32)
        return jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)

    cx = axis_coords(X, oX)
    cy = axis_coords(Y, oY)
    cz = axis_coords(Z, oZ)

    def interp_axis(arr, coords, axis):
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, arr.shape[axis] - 1)
        w = (coords - lo.astype(jnp.float32)).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        bb = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        w = w.reshape(shape)
        return a * (1 - w) + bb * w

    out = interp_axis(x, cx, 1)
    out = interp_axis(out, cy, 2)
    out = interp_axis(out, cz, 3)
    return out
