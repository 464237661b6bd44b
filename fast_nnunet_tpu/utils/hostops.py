"""ctypes bindings for the native host ops (engine/src/host_ops.cpp).

The turbo serving pipeline can run its CT preprocess (clip + z-score +
trilinear resample to target spacing, bf16 out) and the nearest mask revert
in native code on the host, shipping the ~3x-smaller target-spacing grid to
the device instead of the raw volume — the reference engine's own
CPU-resample-then-infer pipeline shape (ref docs/Engine.md; its INI
target_spacing is applied before TensorRT sees the tensor). Loading is
best-effort: without a built library every caller falls back to the
device-side (or numpy) path, so this module is never load-bearing.

Build: cd engine && cmake -B build -G Ninja && cmake --build build
(produces engine/build/libfnn_hostops.so).
"""
import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False

_CANDIDATES = (
    os.environ.get("FNN_HOSTOPS_LIB", ""),
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                 "engine", "build", "libfnn_hostops.so"),
)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for cand in _CANDIDATES:
        if not cand or not os.path.exists(cand):
            continue
        try:
            lib = ctypes.CDLL(cand)
            i64p = ctypes.POINTER(ctypes.c_int64)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.fnn_preprocess_ct_i16.restype = ctypes.c_int
            lib.fnn_preprocess_ct_i16.argtypes = [
                ctypes.POINTER(ctypes.c_int16), i64p, ctypes.c_int64,
                f32p, f32p, f32p, f32p, i64p,
                ctypes.POINTER(ctypes.c_uint16)]
            lib.fnn_nearest_revert_u8.restype = ctypes.c_int
            lib.fnn_nearest_revert_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), i64p, i64p,
                ctypes.POINTER(ctypes.c_uint8)]
            # round-5 additions: box-range preprocess + raw bbox scan
            # (older prebuilt libraries may lack them; probe and gate)
            try:
                lib.fnn_preprocess_ct_i16_box.restype = ctypes.c_int
                lib.fnn_preprocess_ct_i16_box.argtypes = [
                    ctypes.POINTER(ctypes.c_int16), i64p, ctypes.c_int64,
                    f32p, f32p, f32p, f32p, i64p, i64p,
                    ctypes.POINTER(ctypes.c_uint16)]
                lib.fnn_nonair_bbox_i16.restype = ctypes.c_int
                lib.fnn_nonair_bbox_i16.argtypes = [
                    ctypes.POINTER(ctypes.c_int16), i64p, ctypes.c_int64,
                    f32p, i64p, i64p]
                lib._has_box = True
            except AttributeError:
                lib._has_box = False
            _LIB = lib
            break
        except OSError:
            continue
    return _LIB


def available() -> bool:
    return _load() is not None


def has_box() -> bool:
    """True when the loaded library carries the round-5 box-range preprocess
    + raw bbox scan (older prebuilt .so files may not)."""
    lib = _load()
    return lib is not None and getattr(lib, "_has_box", False)


def _shape_arr(shape) -> "ctypes.Array":
    return (ctypes.c_int64 * 3)(*[int(s) for s in shape])


def preprocess_ct_i16(volume: np.ndarray, out_shape: Sequence[int],
                      lb, ub, mean, std) -> Optional[np.ndarray]:
    """(C, D, H, W) int16 -> (C, *out_shape) bfloat16 (clip + z-score +
    trilinear, per-channel scalars). Returns None when the native library
    is unavailable or inputs don't qualify (caller falls back)."""
    lib = _load()
    if lib is None or volume.dtype != np.int16 or volume.ndim != 4:
        return None
    import ml_dtypes
    vol = np.ascontiguousarray(volume)
    n_ch = vol.shape[0]
    f32 = (ctypes.c_float * n_ch)
    out = np.empty((n_ch, *[int(s) for s in out_shape]), dtype=np.uint16)
    rc = lib.fnn_preprocess_ct_i16(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _shape_arr(vol.shape[1:]), n_ch,
        f32(*[float(x) for x in np.broadcast_to(lb, (n_ch,))]),
        f32(*[float(x) for x in np.broadcast_to(ub, (n_ch,))]),
        f32(*[float(x) for x in np.broadcast_to(mean, (n_ch,))]),
        f32(*[float(x) for x in np.broadcast_to(std, (n_ch,))]),
        _shape_arr(out_shape),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        return None
    return out.view(ml_dtypes.bfloat16)


def preprocess_ct_i16_box(volume: np.ndarray, out_shape: Sequence[int],
                          box: Sequence[int], lb, ub, mean,
                          std) -> Optional[np.ndarray]:
    """Box-range variant: compute only the output voxels in the half-open
    box [k0,k1)x[j0,j1)x[i0,i1) of the FULL out_shape grid, returned
    compactly as (C, k1-k0, j1-j0, i1-i0) bfloat16. Bit-identical to the
    same region of a whole-grid `preprocess_ct_i16` call — the streamed
    turbo pipeline uses this to preprocess x-strips lazily, overlapping
    the previous strip's H2D transfer."""
    lib = _load()
    if (lib is None or not getattr(lib, "_has_box", False)
            or volume.dtype != np.int16 or volume.ndim != 4):
        return None
    import ml_dtypes
    vol = np.ascontiguousarray(volume)
    n_ch = vol.shape[0]
    f32 = (ctypes.c_float * n_ch)
    k0, k1, j0, j1, i0, i1 = [int(b) for b in box]
    out = np.empty((n_ch, k1 - k0, j1 - j0, i1 - i0), dtype=np.uint16)
    rc = lib.fnn_preprocess_ct_i16_box(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _shape_arr(vol.shape[1:]), n_ch,
        f32(*[float(x) for x in np.broadcast_to(lb, (n_ch,))]),
        f32(*[float(x) for x in np.broadcast_to(ub, (n_ch,))]),
        f32(*[float(x) for x in np.broadcast_to(mean, (n_ch,))]),
        f32(*[float(x) for x in np.broadcast_to(std, (n_ch,))]),
        _shape_arr(out_shape),
        (ctypes.c_int64 * 6)(k0, k1, j0, j1, i0, i1),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        return None
    return out.view(ml_dtypes.bfloat16)


def nonair_bbox_i16(volume: np.ndarray, lb) -> Optional[tuple]:
    """Per-axis ([lo]*3, [hi]*3) SOURCE-grid extents of the voxels where any
    channel's raw HU exceeds its clip floor. ([0,0,0], [0,0,0]) when the
    whole volume is air; None when the native library is unavailable."""
    lib = _load()
    if (lib is None or not getattr(lib, "_has_box", False)
            or volume.dtype != np.int16 or volume.ndim != 4):
        return None
    vol = np.ascontiguousarray(volume)
    n_ch = vol.shape[0]
    lo = (ctypes.c_int64 * 3)()
    hi = (ctypes.c_int64 * 3)()
    rc = lib.fnn_nonair_bbox_i16(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _shape_arr(vol.shape[1:]), n_ch,
        (ctypes.c_float * n_ch)(
            *[float(x) for x in np.broadcast_to(lb, (n_ch,))]),
        lo, hi)
    if rc != 0:
        return None
    return [int(x) for x in lo], [int(x) for x in hi]


def nearest_revert_u8(seg: np.ndarray, out_shape) -> Optional[np.ndarray]:
    """uint8 (d, h, w) -> (out_shape) via jax's exact nearest index map;
    None when the native library is unavailable (caller falls back to the
    numpy replay in inference/turbo.py)."""
    lib = _load()
    if lib is None or seg.dtype != np.uint8 or seg.ndim != 3:
        return None
    seg = np.ascontiguousarray(seg)
    out = np.empty([int(s) for s in out_shape], dtype=np.uint8)
    rc = lib.fnn_nearest_revert_u8(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _shape_arr(seg.shape), _shape_arr(out_shape),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out
