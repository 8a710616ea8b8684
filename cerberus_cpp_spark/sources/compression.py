"""Compressed-payload layer for crawled corpora: magic sniffing and
REAL bounded decompression via the Python standard library (zlib /
gzip member framing, bzip2, xz — actual decode, not a structural
stub, because the decoders ship in-container), with the zip-bomb
guard a 100 TB ingest needs: decompression is streamed through
``decompressobj(max_length=...)`` chunks and aborts with a named
error the moment output would exceed the caller's bound — a hostile
45-byte payload can claim terabytes, so an UNbounded
``gzip.decompress`` in an executor is a denial-of-service primitive,
not an operator.

zstd is sniffed (magic ``28 b5 2f fd``) but decode is gated on an
optional ``zstandard`` import — absent in this container, so those
payloads route to an honest 'no decoder available' verdict rather
than a fake decode (same policy as the mp3/aac/h264 sample stubs).

Reference parity: per-payload verdict model (validator.hh:239-258) —
damage is reported per row with a CONSTANT message class, never by
killing the job and never by trusting exception text from the
underlying C libraries (which varies across versions).
"""

from __future__ import annotations

import bz2
import lzma
import zlib

try:  # pragma: no cover - absent in this container
    import zstandard as _zstd
except Exception:  # noqa: BLE001 - any import failure = no decoder
    _zstd = None

#: constant verdict messages (the contract queries replay these)
MSG_UNKNOWN = "unknown compression format"
MSG_CORRUPT = "truncated or corrupt stream"
MSG_TRAILING = "trailing garbage after stream end"
MSG_BOMB = "decompressed size exceeds limit"
MSG_NO_ZSTD = "zstd: no decoder available"


def sniff_compression(data: bytes) -> str | None:
    """Format token from the leading magic: 'gzip', 'bzip2', 'xz',
    'zstd', or 'zlib' (the 2-byte header checksum rule — CMF 0x78
    and (CMF·256+FLG) % 31 == 0), else None."""
    if data is None or len(data) < 4:
        return None
    if data[:2] == b"\x1f\x8b":
        return "gzip"
    if data[:3] == b"BZh" and 0x31 <= data[3] <= 0x39:
        return "bzip2"
    if data[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if data[:4] == b"\x28\xb5\x2f\xfd":
        return "zstd"
    if data[0] == 0x78 and (data[0] * 256 + data[1]) % 31 == 0:
        return "zlib"
    return None


def _drain(decomp, data: bytes, max_out: int) -> bytes:
    """Feed ``data`` through a decompressor object in bounded
    chunks (``max_length`` per call — output never materializes
    past the budget even transiently). Raises ValueError(MSG_BOMB)
    past ``max_out``, ValueError(MSG_CORRUPT) on any codec error or
    a stream that never reaches its end-of-stream marker, and
    ValueError(MSG_TRAILING) for bytes after it (multi-member gzip
    deliberately counts as trailing here: one payload, one stream —
    the hygiene contract for crawled blobs).

    API split handled: zlib keeps pending INPUT in
    ``unconsumed_tail``; bz2/lzma buffer internally and signal via
    ``needs_input`` — both paths re-enter with the right argument."""
    out = []
    produced = 0
    arg = data
    while True:
        try:
            chunk = decomp.decompress(arg, max_out + 1 - produced)
        except Exception:  # noqa: BLE001 - codec msgs vary by lib
            raise ValueError(MSG_CORRUPT) from None
        produced += len(chunk)
        out.append(chunk)
        if produced > max_out:
            raise ValueError(MSG_BOMB)
        if decomp.eof:
            if getattr(decomp, "unused_data", b""):
                raise ValueError(MSG_TRAILING)
            return b"".join(out)
        tail = getattr(decomp, "unconsumed_tail", b"")
        if tail:                       # zlib: re-feed pending input
            arg = tail
            continue
        if getattr(decomp, "needs_input", True) is False:
            if not chunk and not arg:  # no-progress backstop
                raise ValueError(MSG_CORRUPT)
            arg = b""                  # bz2/lzma: flush buffered out
            continue
        # wants more input but the payload is exhausted → truncated
        raise ValueError(MSG_CORRUPT)


def decompress_bounded(data: bytes, *,
                       max_out: int = 64 * 1024 * 1024) -> dict:
    """``{"fmt", "n_comp", "n_raw", "raw"}`` for a recognized,
    intact stream; raises ValueError with one of the module's
    CONSTANT messages otherwise (unknown magic, corruption/
    truncation, trailing garbage, over-limit output, absent zstd
    decoder)."""
    fmt = sniff_compression(data)
    if fmt is None:
        raise ValueError(MSG_UNKNOWN)
    if fmt == "zstd":
        if _zstd is None:
            raise ValueError(MSG_NO_ZSTD)
        raw = _zstd.ZstdDecompressor().decompress(
            data, max_output_size=max_out)  # pragma: no cover
    elif fmt == "gzip":
        raw = _drain(zlib.decompressobj(wbits=31), data, max_out)
    elif fmt == "zlib":
        raw = _drain(zlib.decompressobj(wbits=15), data, max_out)
    elif fmt == "bzip2":
        raw = _drain(bz2.BZ2Decompressor(), data, max_out)
    else:  # xz
        raw = _drain(lzma.LZMADecompressor(), data, max_out)
    return {"fmt": fmt, "n_comp": len(data), "n_raw": len(raw),
            "raw": raw}
