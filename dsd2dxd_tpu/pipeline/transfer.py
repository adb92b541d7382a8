"""Host<->device transfer strategy.

Measured on this environment's TPU tunnel (see bench.py docstring):
single `device_put` calls fall off a cliff above ~1 MiB (800+ -> ~30
MiB/s), while a stream of sub-MiB puts sustains ~800 MiB/s. Uploads are
therefore chunked and reassembled on device with one cached concatenate.
On a directly-attached TPU host (PCIe), chunking is harmless: the cached
single-chunk path is a plain device_put.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# 512 KiB suits the erratic tunnel (CLAUDE.md). On a directly-attached
# PCIe host one big device_put beats 32 chunks + a device concat — set
# DSD2DXD_H2D_CHUNK_BYTES there (0 disables chunking entirely).
_CHUNK_BYTES = int(os.environ.get("DSD2DXD_H2D_CHUNK_BYTES",
                                  512 * 1024)) or (1 << 62)


@lru_cache(maxsize=64)
def _concat_fn(n_chunks: int, shape, dtype):
    def f(*chunks):
        return jnp.concatenate(chunks).reshape(shape)

    return jax.jit(f)


def chunked_device_put(arr: np.ndarray, device=None,
                       chunk_bytes: int = _CHUNK_BYTES):
    """device_put that stays on the tunnel's fast path for large arrays."""
    if arr.nbytes <= chunk_bytes:
        return jax.device_put(arr, device)
    flat = np.ascontiguousarray(arr).reshape(-1)
    n = flat.shape[0]
    per = max(1, chunk_bytes // arr.dtype.itemsize)
    bounds = list(range(0, n, per))
    chunks = [flat[b:b + per] for b in bounds]
    dev_chunks = [jax.device_put(c, device) for c in chunks]
    # equal-size chunks except possibly the last -> stable cache key
    key_shape = tuple(arr.shape)
    f = _concat_fn(len(dev_chunks), key_shape, str(arr.dtype))
    return f(*dev_chunks)


def pack24_device(samples: jax.Array, shift: int = 0) -> jax.Array:
    """(frames, C) int32 -> (3, frames*C) uint8 byte planes (low/mid/high).

    Planar byte rows keep the lane dimension large (TPU-friendly) and cut
    D2H volume 25% vs int32. ``shift`` pre-shifts values left (20-bit
    rides in a 24-bit container as value << 4). The engine's 20/24-bit
    drain packs on device and interleaves on host (`unpack24_host`)."""
    v = samples.reshape(-1).astype(jnp.uint32)
    if shift:
        v = v << shift
    return jnp.stack([
        (v & 0xFF).astype(jnp.uint8),
        ((v >> 8) & 0xFF).astype(jnp.uint8),
        ((v >> 16) & 0xFF).astype(jnp.uint8),
    ])


@lru_cache(maxsize=8)
def pack24_jitted(shift: int):
    return jax.jit(lambda s: pack24_device(s, shift))


@lru_cache(maxsize=2)
def pack16_jitted():
    """(frames, C) int32 -> flat int16 on device: halves 16-bit D2H.
    Values are already clipped to the int16 range by quantize_int."""
    return jax.jit(lambda s: s.reshape(-1).astype(jnp.int16))


def _check_plane_capacity(planes: np.ndarray, layout, n_frames: int) -> None:
    """The native interleaver/deplaner (pack.cc) trusts n_frames; a count
    past the blocked layout's capacity would walk run_base out of bounds.
    Capacity: batch sub-blocks x cols lanes (batch=1: cols) frames."""
    cols = planes.shape[-1]
    cap = layout.batch * cols if layout.batch > 1 else cols
    if not (0 <= n_frames <= cap):
        raise ValueError(
            f"n_frames {n_frames} exceeds plane capacity {cap} "
            f"(layout {layout})")


def interleave_planes(planes: np.ndarray, layout, n_frames: int,
                      big_endian: bool = False) -> bytes:
    """Blocked kernel byte planes (ops/fused.PlaneLayout) -> wire bytes.

    Dispatches to the native interleaver (native/src/pack.cc) and falls
    back to a vectorized numpy path (also the test oracle). planes:
    (3, rows, cols) u8 for 20/24-bit, (rows, cols) int16 for 16-bit.
    """
    from dsd2dxd_tpu.native import lib as native

    planes = np.ascontiguousarray(planes)
    _check_plane_capacity(planes, layout, n_frames)
    if native is not None:
        return native.interleave_planes(planes, layout, n_frames,
                                        big_endian)
    return interleave_planes_numpy(planes, layout, n_frames, big_endian)


def _deblock(a: np.ndarray, layout, n_frames: int) -> np.ndarray:
    """Undo the kernel's blocked (rows, cols) layout -> (frames, C, ...)
    frame order (see ops/fused.PlaneLayout). The ONE copy of the layout
    addressing both numpy fallbacks share — they are the test oracles
    for the native interleaver/deplaner, so a layout change must not be
    able to update one while missing the other. Trailing axes of `a`
    (e.g. the byte-plane axis) ride along untouched."""
    c, b, sub = layout.channels, layout.batch, layout.sub_cols
    if b > 1:
        perm = (2, 0, 3, 1) + tuple(range(4, a.ndim + 2))
        a = (a.reshape((b, c, -1, sub) + a.shape[2:]).transpose(perm)
             .reshape((-1, c) + a.shape[2:]))
    else:
        perm = (1, 0) + tuple(range(2, a.ndim))
        a = a[:c].transpose(perm)
    return a[:n_frames]


def interleave_planes_numpy(planes: np.ndarray, layout, n_frames: int,
                            big_endian: bool = False) -> bytes:
    if planes.ndim == 2:  # int16
        a = _deblock(planes, layout, n_frames)
        return (a.byteswap() if big_endian else a).tobytes()
    # (3, rows, cols) -> (rows, cols, 3) so the plane axis rides along
    a = _deblock(planes.transpose(1, 2, 0), layout, n_frames)
    if big_endian:
        a = a[:, :, ::-1]
    return np.ascontiguousarray(a).tobytes()


def deplane_frames(planes: np.ndarray, layout, n_frames: int) -> np.ndarray:
    """Blocked kernel planes -> (frames, channels) int32 samples (sign-
    extended 24-bit), for consumers that want frame-major ints (FLAC).
    Native fast path; numpy fallback doubles as the test oracle."""
    from dsd2dxd_tpu.native import lib as native

    planes = np.ascontiguousarray(planes)
    _check_plane_capacity(planes, layout, n_frames)
    if native is not None:
        return native.deplane_frames(planes, layout, n_frames)
    return deplane_frames_numpy(planes, layout, n_frames)


def deplane_frames_numpy(planes: np.ndarray, layout,
                         n_frames: int) -> np.ndarray:
    if planes.ndim == 2:  # int16
        return _deblock(planes, layout, n_frames).astype(np.int32)
    a = planes.astype(np.int64)
    v = a[0] | (a[1] << 8) | (a[2] << 16)
    v = np.where(v >= 1 << 23, v - (1 << 24), v)
    return _deblock(v, layout, n_frames).astype(np.int32)


def unpack16_host(v: np.ndarray, big_endian: bool = False) -> bytes:
    """Flat int16 device result -> 16-bit wire bytes (LE or BE)."""
    v = np.asarray(v)
    return (v.byteswap() if big_endian else v).tobytes()


def unpack24_host(rows: np.ndarray, big_endian: bool = False) -> bytes:
    """(3, N) uint8 byte planes -> 24-bit wire bytes (LE or BE)."""
    rows = np.asarray(rows)
    if big_endian:
        rows = rows[::-1]
    return np.ascontiguousarray(rows.T).tobytes()
