"""Native (C) codecs for the L0 WSI pipeline.

The reference's tile decode runs in C through OpenSlide/libtiff
(CLAM/wsi_core/WholeSlideImage.py:22-90); our framework's equivalent is a
small C library built on demand with the in-image g++ and loaded via
ctypes. Pure-Python fallbacks keep every call site working when no
compiler is available — the native path is an accelerator, not a
dependency.

Covered codecs (the two the Python reader otherwise executes bytewise):
  * TIFF LZW  (compression 5) — the CAMELYON16 .tif codec
  * PackBits  (compression 32773)
JPEG and deflate already decode in C via PIL / zlib.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lzw.c")
_SO = os.path.join(_HERE, "_tiffcodec.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    """Build (once, quietly) and dlopen the codec library. Returns None when
    unavailable so callers fall back to the Python implementations."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["gcc", "-O3", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
                    check=True, capture_output=True, timeout=60,
                )
                os.replace(_SO + ".tmp", _SO)
            lib = ctypes.CDLL(_SO)
            for fn in ("tiff_lzw_decode", "tiff_packbits_decode"):
                f = getattr(lib, fn)
                f.restype = ctypes.c_long
                f.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
                ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


def lzw_decode(data: bytes, cap: int) -> bytes:
    """TIFF LZW decode, at most ``cap`` output bytes (tile geometry bound).
    Native when available, else the pure-Python decoder."""
    lib = _load()
    if lib is None:
        from ..preprocess.tiff import _lzw_decode_py

        return _lzw_decode_py(data)[:cap]
    out = (ctypes.c_ubyte * cap)()
    n = lib.tiff_lzw_decode(data, len(data), out, cap)
    if n < 0:
        raise ValueError("malformed LZW stream")
    return bytes(bytearray(out)[:n])


def packbits_decode(data: bytes, cap: int) -> bytes:
    """TIFF PackBits decode, at most ``cap`` output bytes."""
    lib = _load()
    if lib is None:
        return _packbits_decode_py(data, cap)
    out = (ctypes.c_ubyte * cap)()
    n = lib.tiff_packbits_decode(data, len(data), out, cap)
    if n < 0:
        raise ValueError("malformed PackBits stream")
    return bytes(bytearray(out)[:n])


def _packbits_decode_py(data: bytes, cap: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < cap:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i < len(data):
                out += bytes([data[i]]) * (257 - n)
                i += 1
    return bytes(out[:cap])
