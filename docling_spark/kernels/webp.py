"""WebP decode via the system libwebp through ctypes.

The reference decodes WebP through PIL (which bundles libwebp). This
container has no PIL, but ships ``libwebp.so.7`` as a system library —
so the binding is ctypes against the stable public C API
(``WebPGetInfo`` / ``WebPDecodeRGBA`` / ``WebPEncodeLosslessRGBA``),
loaded lazily and fully dep-guarded: on a host without libwebp every
entry point raises :class:`WebpError` and callers fall back to the
metadata-only stub exactly as before.

Total over arbitrary bytes: malformed streams raise WebpError (libwebp
returns NULL, never crashes, on bad input)."""

from __future__ import annotations

import ctypes
import ctypes.util


class WebpError(Exception):
    pass


_lib = None
_lib_err: str | None = None


def _load():
    global _lib, _lib_err
    if _lib is not None:
        return _lib
    if _lib_err is not None:
        raise WebpError(_lib_err)
    try:
        name = ctypes.util.find_library("webp") or "libwebp.so.7"
        lib = ctypes.CDLL(name)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = u8p
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        try:
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            free = lib.WebPFree
        except AttributeError:  # very old libwebp: plain free()
            libc = ctypes.CDLL(None)
            libc.free.argtypes = [ctypes.c_void_p]
            free = libc.free
        lib._free_fn = free
        _lib = lib
        return lib
    except OSError as e:
        _lib_err = f"libwebp unavailable: {e}"
        raise WebpError(_lib_err) from e


def webp_available() -> bool:
    try:
        _load()
        return True
    except WebpError:
        return False


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """WebP (VP8 lossy / VP8L lossless / VP8X container) ->
    (w, h, 4, RGBA samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a webp")
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        raise WebpError("webp: bad header")
    if w.value * h.value > 500_000_000:
        raise WebpError("webp: dimensions too large")
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise WebpError("webp: decode failed")
    try:
        n = w.value * h.value * 4
        samples = ctypes.string_at(buf, n)
    finally:
        lib._free_fn(ctypes.cast(buf, ctypes.c_void_p))
    return w.value, h.value, 4, samples


def encode_webp_lossless(w: int, h: int, rgba: bytes) -> bytes:
    """RGBA -> lossless WebP (exact roundtrip; used by the synthetic
    media corpus and the decoder's roundtrip tests)."""
    if len(rgba) != w * h * 4:
        raise WebpError("bad buffer size")
    lib = _load()
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    if not n or not out:
        raise WebpError("webp: encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib._free_fn(out)
