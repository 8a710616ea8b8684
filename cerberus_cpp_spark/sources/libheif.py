"""Feature-detected ctypes binding to the system libheif — real
HEIC (HEVC/x265) and AVIF (AV1) decode AND encode, the two formats
that dominate modern crawls next to WebP.

Same contract as the libwebp binding (``sources/libwebp.py``): pure
public-API ctypes over ``libheif.so.1`` (verified against 1.15.1 in
this container), feature-detected at import — when the library is
absent every decode routes to ``UnsupportedCodecError`` so dataset
checks emit ``decode_unsupported`` verdicts instead of killing jobs.
Container-level parsing (sniff, header dims, structural audit) does
NOT need the library: see ``sources/isobmff.py``.

Encoding notes (pinned in tests):

* default YUV 4:2:0 conversion caps PSNR ~21 dB on harsh chroma —
  far below the 40 dB fidelity gate; ``chroma444=True`` (the default
  here) measured 47-53 dB on the synthetic gradient family.
* TRUE lossless requires chroma 4:4:4 AND the identity (GBR) matrix
  via an nclx profile; ``lossless=True`` sets both and roundtrips
  bit-exact for HEIC and AVIF (even though the emitted BITSTREAM may
  vary across encoder builds, lossless-decoded pixels cannot).
* ctypes cannot return structs from callbacks, so the writer goes
  through ``heif_context_write_to_file`` on a temp file instead of
  the in-memory ``heif_writer`` vtable.
"""

from __future__ import annotations

import ctypes as C
import os
import tempfile

import numpy as np

from .webpcodec import UnsupportedCodecError

_RGB = 1                 # heif_colorspace_RGB
_ILV = 10                # heif_chroma_interleaved_RGB
_CHAN = 10               # heif_channel_interleaved
_COMP = {"heic": 1, "avif": 4}   # heif_compression_{HEVC,AV1}


class _HeifError(C.Structure):
    _fields_ = [("code", C.c_int), ("subcode", C.c_int),
                ("message", C.c_char_p)]


class _Nclx(C.Structure):
    _fields_ = [("version", C.c_uint8), ("color_primaries", C.c_int),
                ("transfer_characteristics", C.c_int),
                ("matrix_coefficients", C.c_int),
                ("full_range_flag", C.c_uint8)]


_SIGS = [
    ("heif_get_version", C.c_char_p, []),
    ("heif_context_alloc", C.c_void_p, []),
    ("heif_context_free", None, [C.c_void_p]),
    ("heif_image_create", _HeifError,
     [C.c_int, C.c_int, C.c_int, C.c_int, C.POINTER(C.c_void_p)]),
    ("heif_image_add_plane", _HeifError,
     [C.c_void_p, C.c_int, C.c_int, C.c_int, C.c_int]),
    ("heif_image_get_plane", C.POINTER(C.c_uint8),
     [C.c_void_p, C.c_int, C.POINTER(C.c_int)]),
    ("heif_image_set_nclx_color_profile", _HeifError,
     [C.c_void_p, C.POINTER(_Nclx)]),
    ("heif_context_get_encoder_for_format", _HeifError,
     [C.c_void_p, C.c_int, C.POINTER(C.c_void_p)]),
    ("heif_encoder_set_lossy_quality", _HeifError,
     [C.c_void_p, C.c_int]),
    ("heif_encoder_set_lossless", _HeifError, [C.c_void_p, C.c_int]),
    ("heif_encoder_set_parameter_string", _HeifError,
     [C.c_void_p, C.c_char_p, C.c_char_p]),
    ("heif_context_encode_image", _HeifError,
     [C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
      C.POINTER(C.c_void_p)]),
    ("heif_encoder_release", None, [C.c_void_p]),
    ("heif_image_release", None, [C.c_void_p]),
    ("heif_image_handle_release", None, [C.c_void_p]),
    ("heif_context_write_to_file", _HeifError,
     [C.c_void_p, C.c_char_p]),
    ("heif_context_read_from_memory_without_copy", _HeifError,
     [C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p]),
    ("heif_context_get_primary_image_handle", _HeifError,
     [C.c_void_p, C.POINTER(C.c_void_p)]),
    ("heif_decode_image", _HeifError,
     [C.c_void_p, C.POINTER(C.c_void_p), C.c_int, C.c_int,
      C.c_void_p]),
    ("heif_image_handle_get_width", C.c_int, [C.c_void_p]),
    ("heif_image_handle_get_height", C.c_int, [C.c_void_p]),
    ("heif_image_get_plane_readonly", C.POINTER(C.c_uint8),
     [C.c_void_p, C.c_int, C.POINTER(C.c_int)]),
    ("heif_context_get_number_of_top_level_images", C.c_int,
     [C.c_void_p]),
    ("heif_context_get_list_of_top_level_image_IDs", C.c_int,
     [C.c_void_p, C.POINTER(C.c_uint32), C.c_int]),
    ("heif_context_get_image_handle", _HeifError,
     [C.c_void_p, C.c_uint32, C.POINTER(C.c_void_p)]),
    ("heif_context_add_exif_metadata", _HeifError,
     [C.c_void_p, C.c_void_p, C.c_void_p, C.c_int]),
    ("heif_image_handle_get_number_of_metadata_blocks", C.c_int,
     [C.c_void_p, C.c_char_p]),
    ("heif_image_handle_get_list_of_metadata_block_IDs", C.c_int,
     [C.c_void_p, C.c_char_p, C.POINTER(C.c_uint32), C.c_int]),
    ("heif_image_handle_get_metadata_size", C.c_size_t,
     [C.c_void_p, C.c_uint32]),
    ("heif_image_handle_get_metadata", _HeifError,
     [C.c_void_p, C.c_uint32, C.c_void_p]),
]


def _load():
    try:
        lib = C.CDLL("libheif.so.1")
        for name, res, args in _SIGS:
            f = getattr(lib, name)
            f.restype = res
            f.argtypes = args
        return lib
    except (OSError, AttributeError):
        return None


_LIB = _load()


def heif_available() -> bool:
    return _LIB is not None


def heif_version() -> str | None:
    return _LIB.heif_get_version().decode() if _LIB else None


def _ck(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"").decode(errors="replace")
        raise ValueError(f"libheif {what}: {msg} (code {err.code})")


def decode_heif(data: bytes) -> np.ndarray:
    """Primary image of an HEIC/AVIF payload as (h, w, 3) uint8 RGB.

    ValueError on container/bitstream damage;
    UnsupportedCodecError when the system library is absent."""
    if _LIB is None:
        raise UnsupportedCodecError(
            "heif/avif decode needs the system libheif (absent)")
    lib = _LIB
    ctx = lib.heif_context_alloc()
    try:
        buf = C.create_string_buffer(data, len(data))
        _ck(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(data), None), "read")
        handle = C.c_void_p()
        _ck(lib.heif_context_get_primary_image_handle(
            ctx, C.byref(handle)), "primary handle")
        try:
            return _decode_handle(lib, handle)
        finally:
            lib.heif_image_handle_release(handle)
    finally:
        lib.heif_context_free(ctx)


def heif_metadata(data: bytes) -> dict:
    """Metadata blocks of the primary item: ``{"exif": bytes|None}``
    — the stored block carries a 4-byte offset to the TIFF header
    (HEIF spec) which is stripped here, so the result feeds
    ``imagemeta.parse_exif`` directly. Container parse only, no pixel
    decode (but the box walk itself is libheif's, so the library is
    required; header dims do NOT need it — ``isobmff.py``)."""
    if _LIB is None:
        raise UnsupportedCodecError(
            "heif metadata extraction needs the system libheif (absent)")
    lib = _LIB
    ctx = lib.heif_context_alloc()
    try:
        buf = C.create_string_buffer(data, len(data))
        _ck(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(data), None), "read")
        handle = C.c_void_p()
        _ck(lib.heif_context_get_primary_image_handle(
            ctx, C.byref(handle)), "primary handle")
        try:
            n = lib.heif_image_handle_get_number_of_metadata_blocks(
                handle, b"Exif")
            exif = None
            if n > 0:
                ids = (C.c_uint32 * n)()
                lib.heif_image_handle_get_list_of_metadata_block_IDs(
                    handle, b"Exif", ids, n)
                size = lib.heif_image_handle_get_metadata_size(
                    handle, ids[0])
                out = C.create_string_buffer(int(size))
                _ck(lib.heif_image_handle_get_metadata(
                    handle, ids[0], out), "get_metadata")
                raw = out.raw
                if len(raw) >= 4:
                    off = int.from_bytes(raw[:4], "big")
                    if 4 + off <= len(raw):
                        exif = raw[4 + off:]
            return {"exif": exif}
        finally:
            lib.heif_image_handle_release(handle)
    finally:
        lib.heif_context_free(ctx)


def _make_image(lib, px: np.ndarray, lossless: bool):
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    img = C.c_void_p()
    _ck(lib.heif_image_create(w, h, _RGB, _ILV, C.byref(img)),
        "image_create")
    _ck(lib.heif_image_add_plane(img, _CHAN, w, h, 8), "add_plane")
    stride = C.c_int()
    p = lib.heif_image_get_plane(img, _CHAN, C.byref(stride))
    np.ctypeslib.as_array(
        p, shape=(h, stride.value))[:, :w * 3] = px.reshape(h, w * 3)
    if lossless:
        # identity (GBR) matrix, full range: without it the RGB→YUV
        # matrix quantizes even at lossless settings
        nclx = _Nclx(1, 2, 2, 0, 1)
        _ck(lib.heif_image_set_nclx_color_profile(
            img, C.byref(nclx)), "nclx")
    return img


def _make_encoder(lib, ctx, codec: str, quality: int, lossless: bool,
                  chroma444: bool):
    if codec not in _COMP:
        raise ValueError(f"codec must be heic or avif, got {codec!r}")
    enc = C.c_void_p()
    _ck(lib.heif_context_get_encoder_for_format(
        ctx, _COMP[codec], C.byref(enc)), "get_encoder")
    # NOTE (round 4 close): x265's default per-encoder thread pool
    # was suspected in a long-bench-session slowdown of the heif
    # census (18-20 s vs 2 s isolated); pinning it single-threaded
    # (x265:pools=none + frame-threads=1) was MEASURED 2.2× slower
    # in isolation and did not cure the full-bench anomaly, so the
    # default threading stands — the anomaly is recorded in BENCH
    # §43 as host/session-state variance, not a code property.
    if chroma444 or lossless:
        _ck(lib.heif_encoder_set_parameter_string(
            enc, b"chroma", b"444"), "chroma=444")
    if lossless:
        _ck(lib.heif_encoder_set_lossless(enc, 1), "lossless")
        _ck(lib.heif_encoder_set_lossy_quality(enc, 100), "quality")
    else:
        _ck(lib.heif_encoder_set_lossy_quality(
            enc, int(quality)), "quality")
    return enc


def _write_ctx(lib, ctx) -> bytes:
    fd, path = tempfile.mkstemp(suffix=".heif")
    os.close(fd)
    try:
        _ck(lib.heif_context_write_to_file(ctx, path.encode()), "write")
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def encode_heif(px: np.ndarray, codec: str = "heic", *,
                quality: int = 90, lossless: bool = False,
                chroma444: bool = True,
                exif: bytes | None = None) -> bytes:
    """Encode (h, w, 3) uint8 RGB as HEIC or AVIF. ``lossless=True``
    forces chroma 4:4:4 + the identity matrix (bit-exact roundtrip,
    pinned); lossy keeps 4:4:4 by default so the 40 dB fidelity gate
    is reachable (4:2:0 caps ~21 dB on harsh chroma)."""
    if _LIB is None:
        raise UnsupportedCodecError(
            "heif/avif encode needs the system libheif (absent)")
    lib = _LIB
    ctx = lib.heif_context_alloc()
    img = enc = None
    try:
        img = _make_image(lib, px, lossless)
        enc = _make_encoder(lib, ctx, codec, quality, lossless,
                            chroma444)
        handle = C.c_void_p()
        _ck(lib.heif_context_encode_image(
            ctx, img, enc, None, C.byref(handle)), "encode")
        if exif is not None:
            ebuf = C.create_string_buffer(exif, len(exif))
            _ck(lib.heif_context_add_exif_metadata(
                ctx, handle, ebuf, len(exif)), "add_exif")
        lib.heif_image_handle_release(handle)
        return _write_ctx(lib, ctx)
    finally:
        if enc:
            lib.heif_encoder_release(enc)
        if img:
            lib.heif_image_release(img)
        lib.heif_context_free(ctx)


def encode_heif_burst(frames: list, codec: str = "avif", *,
                      quality: int = 90, lossless: bool = False,
                      chroma444: bool = True) -> bytes:
    """Multi-image HEIF (a burst / photo stack): every frame becomes
    a top-level item in ONE container; the first is the primary."""
    if _LIB is None:
        raise UnsupportedCodecError(
            "heif/avif encode needs the system libheif (absent)")
    if not frames:
        raise ValueError("frames must be non-empty")
    lib = _LIB
    ctx = lib.heif_context_alloc()
    try:
        for px in frames:
            img = _make_image(lib, px, lossless)
            enc = _make_encoder(lib, ctx, codec, quality, lossless,
                                chroma444)
            try:
                handle = C.c_void_p()
                _ck(lib.heif_context_encode_image(
                    ctx, img, enc, None, C.byref(handle)), "encode")
                lib.heif_image_handle_release(handle)
            finally:
                lib.heif_encoder_release(enc)
                lib.heif_image_release(img)
        return _write_ctx(lib, ctx)
    finally:
        lib.heif_context_free(ctx)


def _decode_handle(lib, handle) -> np.ndarray:
    w = lib.heif_image_handle_get_width(handle)
    h = lib.heif_image_handle_get_height(handle)
    img = C.c_void_p()
    _ck(lib.heif_decode_image(handle, C.byref(img), _RGB, _ILV, None),
        "decode")
    try:
        stride = C.c_int()
        p = lib.heif_image_get_plane_readonly(img, _CHAN,
                                              C.byref(stride))
        if not p:
            raise ValueError("libheif: no interleaved plane")
        arr = np.ctypeslib.as_array(p, shape=(h, stride.value))[:, :w * 3]
        return arr.reshape(h, w, 3).copy()
    finally:
        lib.heif_image_release(img)


def decode_heif_all(data: bytes) -> list:
    """Every top-level image of the container (burst/stack semantics:
    GIF frames and ANIM-WebP get per-frame validation, HEIF stacks
    get the same treatment here), in item-id order; index 0..n-1."""
    if _LIB is None:
        raise UnsupportedCodecError(
            "heif/avif decode needs the system libheif (absent)")
    lib = _LIB
    ctx = lib.heif_context_alloc()
    try:
        buf = C.create_string_buffer(data, len(data))
        _ck(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(data), None), "read")
        n = lib.heif_context_get_number_of_top_level_images(ctx)
        ids = (C.c_uint32 * max(n, 1))()
        lib.heif_context_get_list_of_top_level_image_IDs(ctx, ids, n)
        out = []
        for i in range(n):
            handle = C.c_void_p()
            _ck(lib.heif_context_get_image_handle(
                ctx, ids[i], C.byref(handle)), "item handle")
            try:
                out.append(_decode_handle(lib, handle))
            finally:
                lib.heif_image_handle_release(handle)
        return out
    finally:
        lib.heif_context_free(ctx)


def heif_image_count(data: bytes) -> int:
    """Number of top-level images (1 for ordinary photos, >1 for
    bursts/stacks). Container parse only."""
    if _LIB is None:
        raise UnsupportedCodecError(
            "heif/avif parse needs the system libheif (absent)")
    lib = _LIB
    ctx = lib.heif_context_alloc()
    try:
        buf = C.create_string_buffer(data, len(data))
        _ck(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(data), None), "read")
        return int(lib.heif_context_get_number_of_top_level_images(ctx))
    finally:
        lib.heif_context_free(ctx)
