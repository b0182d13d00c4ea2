"""Native host kernels (C++ via ctypes), built on first use.

See host_ops.cpp for what lives here and why (order-dependent raster-scan
fills that XLA's synchronous passes can only approximate).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libhost_ops.so")
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True, capture_output=True,
    )


_LOAD_ERROR: Optional[str] = None
_WARNED = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    Unavailability is NOT silent: the first fallback logs a loud warning
    with the build error, and ``TEXT2NERF_REQUIRE_NATIVE=1`` turns it
    into a hard failure (the XLA hole-fill approximates the sequential
    raster-order semantics — fine for previews, not for parity runs).
    """
    global _LIB, _LOAD_ERROR
    if _LIB is not None:
        return _LIB
    if _LOAD_ERROR is not None:
        # previous attempt failed; don't rebuild every call
        if os.environ.get("TEXT2NERF_REQUIRE_NATIVE") == "1":
            raise RuntimeError(
                f"native host_ops unavailable "
                f"(TEXT2NERF_REQUIRE_NATIVE=1): {_LOAD_ERROR}"
            )
        return None
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.dibr_hole_fill2.argtypes = [
            f32p, f32p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.dibr_hole_fill1.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.zbuffer_point_splat.argtypes = [
            i16p, i16p, f32p, f32p, f32p, ctypes.c_void_p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.sparse_bilateral.argtypes = [
            f32p, f32p, f32p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, ctypes.c_int, ctypes.c_float,
        ]
        _LIB = lib
    except subprocess.CalledProcessError as e:
        _LOAD_ERROR = (e.stderr or b"").decode(errors="replace")[:500]
    except Exception as e:  # dlopen/symbol errors
        _LOAD_ERROR = repr(e)[:500]
    if _LIB is None and os.environ.get("TEXT2NERF_REQUIRE_NATIVE") == "1":
        raise RuntimeError(
            f"native host_ops unavailable (TEXT2NERF_REQUIRE_NATIVE=1): "
            f"{_LOAD_ERROR}"
        )
    return _LIB


def available() -> bool:
    """True when the native library loads; warns loudly (once) when not."""
    global _WARNED
    lib = load()
    if lib is None and not _WARNED:
        _WARNED = True
        import warnings

        warnings.warn(
            "text2nerf_tpu.native failed to build/load — hole fills fall "
            "back to the XLA approximation (superset fill, not the exact "
            "raster-order semantics). Set TEXT2NERF_REQUIRE_NATIVE=1 to "
            f"fail instead. Build error: {_LOAD_ERROR}",
            RuntimeWarning,
            stacklevel=2,
        )
    return lib is not None


def hole_fill2(image, mask, depth=None, threshold: float = 0.65):
    """Exact sequential dibr_filter_mask2 (utils.py:394-409).

    Returns (image, mask[, depth]) — copies; inputs untouched.
    """
    lib = load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(np.asarray(image, np.float32)).copy()
    m = np.ascontiguousarray(np.asarray(mask, np.float32)).copy()
    h, w, c = img.shape
    if depth is not None:
        d = np.ascontiguousarray(np.asarray(depth, np.float32)).copy()
        lib.dibr_hole_fill2(
            img, m, d.ctypes.data_as(ctypes.c_void_p), h, w, c,
            ctypes.c_float(threshold),
        )
        return img, m, d
    lib.dibr_hole_fill2(img, m, None, h, w, c, ctypes.c_float(threshold))
    return img, m


def hole_fill1(image, mask, fill_value: float = 255.0):
    """Exact sequential dibr_filter_mask (utils.py:345-391)."""
    lib = load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(np.asarray(image, np.float32)).copy()
    m = np.ascontiguousarray(np.asarray(mask, np.float32)).copy()
    h, w, c = img.shape
    lib.dibr_hole_fill1(img, m, h, w, c, ctypes.c_float(fill_value))
    return img, m


def sparse_bilateral(depth, image, filter_size, depth_threshold: float,
                     mask=None):
    """Iterative sparse bilateral filter (bilateral_filtering.py:5-35),
    bit-exact to ops.filters._sparse_bilateral_program (golden-tested).

    ``filter_size`` is the per-pass window list (already truncated to
    num_iter - 1 entries).  Returns (image', depth') as float32 numpy.
    """
    lib = load()
    assert lib is not None, "native library unavailable"
    d = np.ascontiguousarray(np.asarray(depth, np.float32)).copy()
    img = np.ascontiguousarray(np.asarray(image, np.float32)).copy()
    d0 = np.ascontiguousarray(np.asarray(depth, np.float32))
    # rank guards: a 2D image would make c == W below and the C++ kernel
    # would read/write H*W*W floats — heap corruption, not a Python error
    assert img.ndim == 3, f"image must be (H, W, C), got {img.shape}"
    h, w = d.shape
    assert img.shape[:2] == (h, w), (img.shape, d.shape)
    c = img.shape[-1]
    fs = np.ascontiguousarray(np.asarray(filter_size, np.int32))
    if mask is not None:
        m = np.ascontiguousarray(np.asarray(mask, np.float32))
        assert m.shape == (h, w), (m.shape, d.shape)
        mp = m.ctypes.data_as(ctypes.c_void_p)
    else:
        mp = None
    lib.sparse_bilateral(
        d, img, d0, mp, h, w, c, fs, len(fs), ctypes.c_float(depth_threshold)
    )
    return img, d


def zbuffer_splat(xs, ys, zs, src):
    """First-writer-wins point splat (the legacy warp path of
    utils.py:199-213).  Returns (out (H,W,C), points_z (H,W), mask (H,W))."""
    lib = load()
    assert lib is not None, "native library unavailable"
    xs = np.ascontiguousarray(np.asarray(xs, np.int16))
    ys = np.ascontiguousarray(np.asarray(ys, np.int16))
    zs = np.ascontiguousarray(np.asarray(zs, np.float32))
    src = np.ascontiguousarray(np.asarray(src, np.float32))
    h, w = zs.shape
    c = src.shape[-1]
    out = np.ones((h, w, c), np.float32)
    points = np.zeros((h, w), np.float32)
    mask = np.zeros((h, w), np.uint8)
    lib.zbuffer_point_splat(
        xs, ys, zs, src, out,
        points.ctypes.data_as(ctypes.c_void_p), mask, h, w, c,
    )
    return out, points, mask
