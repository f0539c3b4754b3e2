"""ctypes bindings for the native host runtime (native/pathtracer_native.cpp).

The asset/IO data path of the framework - PNG codec + glTF accessor
unpacking - implemented in C++ (the role stb_image/tinygltf play in the
reference, texture.cpp:5-13 / model_loader.cpp:86-138). The library is
built on demand with `make -C native` and every entry point has a pure
Python fallback, so the framework works without a toolchain.

API:
  png_decode(data: bytes) -> np.uint8 [H, W, C] or None (unsupported PNG)
  png_encode(img: np.uint8 [H, W, C]) -> bytes or None
  accessor_to_f32(buf, offset, count, n_comp, ctype, stride, normalized)
  accessor_to_i32(buf, offset, count, ctype, stride)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_DIR, "libpathtracer_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    """Build (if needed) + dlopen the native library; None on any failure."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO) < os.path.getmtime(
                        os.path.join(_DIR, "pathtracer_native.cpp"))):
                subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            _bind(lib)
        except Exception:
            # includes AttributeError from a stale prebuilt .so missing a
            # newer export - the Python fallbacks must keep working
            return None
        _lib = lib
        return _lib


def _bind(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pt_png_probe.argtypes = [u8p, ctypes.c_int64, i32p, i32p, i32p]
    lib.pt_png_probe.restype = ctypes.c_int
    lib.pt_png_decode.argtypes = [u8p, ctypes.c_int64, u8p]
    lib.pt_png_decode.restype = ctypes.c_int
    lib.pt_png_encode_bound.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                        ctypes.c_int32]
    lib.pt_png_encode_bound.restype = ctypes.c_int64
    lib.pt_png_encode.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32, u8p, i64p]
    lib.pt_png_encode.restype = ctypes.c_int
    lib.pt_accessor_to_f32.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        f32p]
    lib.pt_accessor_to_f32.restype = ctypes.c_int
    lib.pt_accessor_to_i32.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, i32p]
    lib.pt_accessor_to_i32.restype = ctypes.c_int
    lib.pt_hdr_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_int32, f32p]
    lib.pt_hdr_decode.restype = ctypes.c_int
    lib.pt_sah_split_build.argtypes = [
        f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, i32p, i32p, i32p, f32p, f32p,
        ctypes.c_int32, ctypes.c_int64]
    lib.pt_sah_split_build.restype = ctypes.c_int


def available() -> bool:
    return _load() is not None


def _u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def png_decode(data: bytes):
    """Decode an 8-bit PNG -> u8 [H, W, C]; None if unsupported here."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ch = ctypes.c_int32()
    if lib.pt_png_probe(_u8p(buf), buf.size, ctypes.byref(w),
                        ctypes.byref(h), ctypes.byref(ch)) != 0:
        return None
    out = np.empty((h.value, w.value, ch.value), np.uint8)
    if lib.pt_png_decode(_u8p(buf), buf.size, _u8p(out)) != 0:
        return None
    return out


def hdr_decode(data: bytes, w: int, h: int):
    """Decode Radiance RGBE scanlines -> linear f32 [H, W, 3]; None if n/a.

    `data` starts at the first scanline (the caller parses the header);
    handles new-RLE and flat/old-style scanlines (stb_image's .hdr role).
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((h, w, 3), np.float32)
    if lib.pt_hdr_decode(_u8p(buf), buf.size, w, h,
                         out.ctypes.data_as(
                             ctypes.POINTER(ctypes.c_float))) != 0:
        return None
    return out


def png_encode(img: np.ndarray):
    """Encode u8 [H, W] / [H, W, C] (C in 1,3,4) -> PNG bytes; None if n/a."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3, 4):
        return None
    n = ctypes.c_int64(lib.pt_png_encode_bound(w, h, ch))
    out = np.empty(n.value, np.uint8)
    if lib.pt_png_encode(_u8p(img), w, h, ch, _u8p(out),
                         ctypes.byref(n)) != 0:
        return None
    return out[:n.value].tobytes()


def sah_split_build(v0, v1, v2, k: int, n_bins: int = 16,
                    dup_budget: float = 1.5):
    """SBVH-style spatial-split SAH leaf build (native counterpart of
    accel/cluster.py:_sah_split_leaves - the role the driver's native AS
    build plays in the reference, core/accel.h:21-45).

    v0/v1/v2: f32 [T, 3] triangle vertices.
    Returns (leaves, leaf_lo, leaf_hi) exactly like _sah_split_leaves:
    a list of unique-id int32 arrays (each <= k) plus the clipped-union
    cluster AABBs, or None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    t = int(v0.shape[0])
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    cap = int(dup_budget * t) + 8
    n_leaves = ctypes.c_int32()
    leaf_off = np.empty(cap + 1, np.int32)
    leaf_ids = np.empty(cap, np.int32)
    leaf_lo = np.empty((cap, 3), np.float32)
    leaf_hi = np.empty((cap, 3), np.float32)

    def f32p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def i32p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    rc = lib.pt_sah_split_build(
        f32p(v0), f32p(v1), f32p(v2), t, k, n_bins,
        ctypes.c_float(dup_budget), ctypes.byref(n_leaves),
        i32p(leaf_off), i32p(leaf_ids), f32p(leaf_lo), f32p(leaf_hi),
        cap, cap)
    if rc != 0:
        return None
    nl = n_leaves.value
    leaves = [leaf_ids[leaf_off[i]:leaf_off[i + 1]].copy()
              for i in range(nl)]
    return leaves, leaf_lo[:nl].copy(), leaf_hi[:nl].copy()


def accessor_to_f32(buf: bytes, offset: int, count: int, n_comp: int,
                    component_type: int, stride: int, normalized: bool):
    """Strided glTF accessor -> f32 [count, n_comp]; None if n/a."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(buf, np.uint8)
    out = np.empty((count, n_comp), np.float32)
    rc = lib.pt_accessor_to_f32(
        _u8p(src), src.size, offset, count, n_comp, component_type,
        stride, int(normalized),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def accessor_to_i32(buf: bytes, offset: int, count: int,
                    component_type: int, stride: int):
    """Strided glTF index accessor -> i32 [count]; None if n/a."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(buf, np.uint8)
    out = np.empty((count,), np.int32)
    rc = lib.pt_accessor_to_i32(
        _u8p(src), src.size, offset, count, component_type, stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None
