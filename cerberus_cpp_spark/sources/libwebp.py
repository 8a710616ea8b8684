"""Optional ctypes binding to the SYSTEM libwebp shared library.

Round 4 discovery: this container DOES ship ``libwebp.so.7`` (the
Debian runtime package — earlier rounds only checked for Python
bindings, and the "no libwebp interop possible" caveat recorded in
``webpcodec.py``/BENCH was wrong). That turns the reference C
implementation into an in-container conformance oracle:

- every in-repo VP8L ENCODER mode's output is decoded by libwebp and
  pixel-compared (proving our streams are real WebP, not a private
  format);
- libwebp's own lossless encoder output is decoded by OUR decoder
  (proving the decoder handles streams we did not author — libwebp
  picks its own transforms, meta prefix codes, LZ77 parameters);
- lossy ``VP8 `` payloads, previously a documented
  ``decode_unsupported`` gap, can now be decoded for real.

This module is a FEATURE-DETECTED side door, not a dependency: every
entry point degrades to ``available() == False`` when the library is
absent, and the pure-Python codecs in ``webpcodec.py`` remain the
default encode path everywhere (they need no native library and their
behavior is pinned by hand-built bitstreams). Only the lossy-decode
route in :func:`webpcodec.decode_webp` and the interop test suite
consume this binding.

Scale note (100 TB path): the binding is loaded lazily per PROCESS
(one ``ctypes.CDLL`` per Python worker, cached at module level), so
Arrow-batched decode UDFs pay the dlopen once per executor worker,
not per batch. No per-row Python beyond the existing codec contract.

The simple libwebp API used here (``WebPDecodeRGBA`` /
``WebPDecodeYUV`` / ``WebPEncodeLosslessRGBA`` / ``WebPEncodeRGBA``
/ ``WebPFree``) has been ABI-stable since libwebp 0.5 and is
documented in the public header ``webp/decode.h`` / ``webp/encode.h``.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional, Tuple

import numpy as np

_LIB_NAMES = (
    "libwebp.so.7",
    "libwebp.so",
    "libwebp.7.dylib",
    "libwebp.dylib",
)

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """dlopen the system libwebp once per process; None if absent."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    candidates = list(_LIB_NAMES)
    found = ctypes.util.find_library("webp")
    if found:
        candidates.insert(0, found)
    for name in candidates:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            _bind(lib)
        except AttributeError:
            continue  # too old / stripped — treat as absent
        _lib = lib
        return _lib
    _load_failed = True
    return None


def _bind(lib: ctypes.CDLL) -> None:
    """Declare argtypes/restypes for the simple API. restype is
    c_void_p (NOT a typed pointer) so the raw address survives for
    the mandatory ``WebPFree``."""
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    intp = ctypes.POINTER(ctypes.c_int)

    lib.WebPGetInfo.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, intp, intp]
    lib.WebPGetInfo.restype = ctypes.c_int

    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, intp, intp]
    lib.WebPDecodeRGBA.restype = ctypes.c_void_p

    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, intp, intp,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
        intp, intp]
    lib.WebPDecodeYUV.restype = ctypes.c_void_p

    lib.WebPEncodeLosslessRGBA.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p)]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t

    lib.WebPEncodeRGBA.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t

    lib.WebPFree.argtypes = [ctypes.c_void_p]
    lib.WebPFree.restype = None


def available() -> bool:
    """True iff the system libwebp loaded (cached per process)."""
    return _load() is not None


def version() -> Optional[str]:
    lib = _load()
    if lib is None:
        return None
    try:
        lib.WebPGetDecoderVersion.restype = ctypes.c_int
        v = int(lib.WebPGetDecoderVersion())
    except AttributeError:  # pragma: no cover
        return None
    return f"{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"


def features(data: bytes) -> dict:
    """Container-level bitstream features via ``WebPGetFeatures``:
    ``{"width", "height", "has_alpha", "has_animation", "format"}``
    (format: 0 undefined/mixed, 1 lossy, 2 lossless). Used as the
    conformance oracle for the in-repo VP8X/ANIM container parser
    (``sources/webpx.py``) — libwebp validates the extended header
    even though its simple decode API cannot render animations.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    lib.WebPGetFeaturesInternal.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(_BitstreamFeatures), ctypes.c_int]
    lib.WebPGetFeaturesInternal.restype = ctypes.c_int
    f = _BitstreamFeatures()
    status = lib.WebPGetFeaturesInternal(
        data, len(data), ctypes.byref(f), _DECODER_ABI_VERSION)
    if status != 0:  # VP8_STATUS_OK
        raise ValueError(f"libwebp rejected payload (status {status})")
    return {"width": f.width, "height": f.height,
            "has_alpha": bool(f.has_alpha),
            "has_animation": bool(f.has_animation),
            "format": f.format}


def decode_rgba(data: bytes) -> np.ndarray:
    """Decode any WebP payload (lossless VP8L or lossy VP8/VP8X) to
    an (h, w, 4) uint8 RGBA array via libwebp.

    Raises ``ValueError`` on undecodable input (the uniform codec
    error contract) and ``RuntimeError`` when libwebp is absent —
    callers must check :func:`available` first.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = lib.WebPDecodeRGBA(
        data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp could not decode payload")
    try:
        buf = ctypes.string_at(ptr, w.value * h.value * 4)
    finally:
        lib.WebPFree(ptr)
    return (np.frombuffer(buf, dtype=np.uint8)
            .reshape(h.value, w.value, 4).copy())


def decode_yuv(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode to raw Y / U / V planes (4:2:0) — the pre-upsampling
    representation, used to conformance-pin the in-repo VP8 decoder
    bit-exactly without entangling YUV→RGB conversion conventions.

    Returns (y[h,w], u[ch,cw], v[ch,cw]) uint8 arrays with
    cw = (w+1)//2, ch = (h+1)//2.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    up = ctypes.c_void_p(0)
    vp = ctypes.c_void_p(0)
    stride = ctypes.c_int(0)
    uv_stride = ctypes.c_int(0)
    ptr = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride))
    if not ptr:
        raise ValueError("libwebp could not decode payload (YUV)")
    try:
        cw, ch = (w.value + 1) // 2, (h.value + 1) // 2
        y = (np.frombuffer(ctypes.string_at(ptr, stride.value * h.value),
                           dtype=np.uint8)
             .reshape(h.value, stride.value)[:, : w.value].copy())
        u = (np.frombuffer(ctypes.string_at(up.value,
                                            uv_stride.value * ch),
                           dtype=np.uint8)
             .reshape(ch, uv_stride.value)[:, :cw].copy())
        v = (np.frombuffer(ctypes.string_at(vp.value,
                                            uv_stride.value * ch),
                           dtype=np.uint8)
             .reshape(ch, uv_stride.value)[:, :cw].copy())
    finally:
        lib.WebPFree(ptr)  # frees the whole luma+chroma allocation
    return y, u, v


def _as_rgba(pixels: np.ndarray) -> np.ndarray:
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 pixels")
    if pixels.shape[2] == 3:
        pixels = np.dstack(
            [pixels, np.full(pixels.shape[:2], 255, np.uint8)])
    return np.ascontiguousarray(pixels)


def encode_lossless_rgba(pixels: np.ndarray) -> bytes:
    """Lossless-encode (h, w, 3|4) uint8 pixels via libwebp — used
    ONLY as interop-test food for the in-repo VP8L decoder (libwebp
    chooses its own transforms/meta codes/LZ77, exercising decoder
    paths our own encoders never emit).

    Note libwebp's default lossless config is NOT ``exact``: RGB
    values under alpha==0 may be rewritten for compression. Tests
    use alpha=255 images (as do the synthetic thumbs)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    rgba = _as_rgba(pixels)
    h, w = rgba.shape[:2]
    out = ctypes.c_void_p(0)
    size = lib.WebPEncodeLosslessRGBA(
        rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        w, h, w * 4, ctypes.byref(out))
    if not size or not out.value:
        raise ValueError("libwebp lossless encode failed")
    try:
        data = ctypes.string_at(out.value, size)
    finally:
        lib.WebPFree(out.value)
    return data


def encode_rgba(pixels: np.ndarray, quality: float = 90.0) -> bytes:
    """Lossy VP8 encode via libwebp (quality 0-100) — conformance
    food for the in-repo VP8 decoder and for the PSNR≥40 fidelity
    contract on lossy payloads (input_hint)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    rgba = _as_rgba(pixels)
    h, w = rgba.shape[:2]
    out = ctypes.c_void_p(0)
    size = lib.WebPEncodeRGBA(
        rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        w, h, w * 4, ctypes.c_float(float(quality)), ctypes.byref(out))
    if not size or not out.value:
        raise ValueError("libwebp lossy encode failed")
    try:
        data = ctypes.string_at(out.value, size)
    finally:
        lib.WebPFree(out.value)
    return data


# --- advanced decode API (WebPDecode + WebPDecoderConfig) ------------
# Used by the VP8 conformance suite to obtain the PRE-loop-filter
# reconstruction (bypass_filtering) and to toggle fancy upsampling —
# isolating which decoder stage a mismatch lives in. ABI structs from
# the public webp/decode.h.

class _RGBABuffer(ctypes.Structure):
    _fields_ = [("rgba", ctypes.c_void_p), ("stride", ctypes.c_int),
                ("size", ctypes.c_size_t)]


class _YUVABuffer(ctypes.Structure):
    _fields_ = [("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
                ("v", ctypes.c_void_p), ("a", ctypes.c_void_p),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class _BufferUnion(ctypes.Union):
    _fields_ = [("RGBA", _RGBABuffer), ("YUVA", _YUVABuffer)]


class _DecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int),
                ("is_external_memory", ctypes.c_int),
                ("u", _BufferUnion), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.c_void_p)]


class _BitstreamFeatures(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int),
                ("has_animation", ctypes.c_int), ("format", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _DecoderOptions(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int),
                ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int),
                ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _DecoderConfig(ctypes.Structure):
    _fields_ = [("input", _BitstreamFeatures), ("output", _DecBuffer),
                ("options", _DecoderOptions)]


_MODE_YUV = 11
_DECODER_ABI_VERSION = 0x0209


def decode_yuv_ex(data: bytes, bypass_filtering: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Y/U/V planes via the advanced API; ``bypass_filtering=True``
    returns the reconstruction BEFORE the in-loop deblocking filter."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    lib.WebPInitDecoderConfigInternal.argtypes = [
        ctypes.POINTER(_DecoderConfig), ctypes.c_int]
    lib.WebPInitDecoderConfigInternal.restype = ctypes.c_int
    lib.WebPDecode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_DecoderConfig)]
    lib.WebPDecode.restype = ctypes.c_int
    lib.WebPFreeDecBuffer.argtypes = [ctypes.POINTER(_DecBuffer)]
    lib.WebPFreeDecBuffer.restype = None

    cfg = _DecoderConfig()
    if not lib.WebPInitDecoderConfigInternal(
            ctypes.byref(cfg), _DECODER_ABI_VERSION):
        raise RuntimeError("WebPInitDecoderConfig ABI mismatch")
    cfg.output.colorspace = _MODE_YUV
    cfg.options.bypass_filtering = 1 if bypass_filtering else 0
    status = lib.WebPDecode(data, len(data), ctypes.byref(cfg))
    if status != 0:
        raise ValueError(f"libwebp WebPDecode failed (status {status})")
    try:
        yb = cfg.output.u.YUVA
        w, h = cfg.output.width, cfg.output.height
        cw, ch = (w + 1) // 2, (h + 1) // 2
        y = (np.frombuffer(ctypes.string_at(yb.y, yb.y_stride * h),
                           dtype=np.uint8)
             .reshape(h, yb.y_stride)[:, :w].copy())
        u = (np.frombuffer(ctypes.string_at(yb.u, yb.u_stride * ch),
                           dtype=np.uint8)
             .reshape(ch, yb.u_stride)[:, :cw].copy())
        v = (np.frombuffer(ctypes.string_at(yb.v, yb.v_stride * ch),
                           dtype=np.uint8)
             .reshape(ch, yb.v_stride)[:, :cw].copy())
    finally:
        lib.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return y, u, v
