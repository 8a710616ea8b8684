"""Format-generic container-integrity audits — structural walks over
the BYTES of every image format the engine decodes, with zero pixel
decode (µs/row tier, like ``image_header_info``).

Why a separate check family: decoders are deliberately tolerant
(ours skips a missing JPEG EOI after a valid scan, zlib inflates
streams whose PNG chunk CRC proves a flipped byte), so "decode
succeeded" is NOT "payload intact". A validation engine owes the
table an explicit container verdict. Reference parity anchor: this
is the byte-level face of the brief's image-constraint leg (the
cerberus-cpp custom-type check promoted to payload structure).

Per-format walks, each built from the public spec:

- PNG: chunk walk with per-chunk CRC-32 (``pngcodec.audit_chunks``)
  — the only format here with container checksums.
- JPEG (ISO/IEC 10918 / JFIF): marker-segment walk — SOI, segment
  length bounds, entropy-data scan honoring 0xFF00 stuffing and
  RST markers, EOI presence. A missing EOI is reported even though
  the decoder tolerates it.
- WebP (RIFF): declared RIFF size vs actual, chunk-size bounds with
  even padding, trailing-garbage detection.
- GIF (87a/89a): logical-screen + color tables, image descriptors
  with LZW sub-block chains, extension blocks, 0x3B trailer.
- BMP (BITMAPFILEHEADER): declared file size / pixel-array offset
  bounds.
- TIFF: IFD chain walk with offset bounds and cycle protection.

``audit_container`` sniffs the format and returns a uniform
``(fmt, verdict, detail)`` with verdict in {'ok', 'crc_mismatch',
'malformed', 'unknown_format', 'no_payload'}.
"""

from __future__ import annotations

import struct

_RST = set(range(0xD0, 0xD8))


def audit_jpeg(data: bytes) -> tuple[int, bool]:
    """Marker-structure walk. Returns (n_segments, has_eoi); raises
    ValueError on structural damage (bad SOI, marker expected,
    segment overruns its bounds)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (no SOI)")
    pos, n, in_entropy = 2, 1, False
    while True:
        if in_entropy:
            # scan for the next real marker (0xFF + not-stuffing,
            # not-RST); EOF here means the EOI never arrived
            while True:
                idx = data.find(b"\xFF", pos)
                if idx < 0 or idx + 1 >= len(data):
                    return n, False
                m = data[idx + 1]
                if m == 0x00 or m in _RST or m == 0xFF:
                    pos = idx + (1 if m == 0xFF else 2)
                    continue
                pos = idx
                in_entropy = False
                break
            continue
        if pos + 2 > len(data):
            return n, False
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            return n + 1, True
        n += 1
        if marker in (0x01, 0xD8) or marker in _RST:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2:
            raise ValueError("invalid zero-length JPEG segment")
        if pos + seglen > len(data):
            raise ValueError("JPEG segment overruns stream")
        if marker == 0xDA:  # SOS
            in_entropy = True
        pos += seglen


def audit_riff(data: bytes) -> list[str]:
    """RIFF/WebP structure: declared size vs actual, chunk bounds
    (with even padding). Returns the chunk fourcc list."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    (declared,) = struct.unpack_from("<I", data, 4)
    if declared + 8 > len(data):
        raise ValueError("truncated RIFF")
    if declared + 8 < len(data):
        raise ValueError("trailing bytes after RIFF payload")
    out, pos = [], 12
    while pos < 8 + declared:
        if pos + 8 > 8 + declared:
            raise ValueError("truncated RIFF chunk header")
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        end = pos + 8 + size + (size & 1)
        if end > 8 + declared:
            raise ValueError(
                f"RIFF chunk {fourcc!r} overruns container")
        out.append(fourcc.decode("latin-1"))
        pos = end
    return out


def _gif_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        sz = data[pos]
        pos += 1
        if sz == 0:
            return pos
        if pos + sz > len(data):
            raise ValueError("truncated GIF sub-block")
        pos += sz


def audit_gif(data: bytes) -> int:
    """Block-structure walk; returns block count. Raises on
    truncation, unknown introducers, or a missing 0x3B trailer."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 7))
    blocks = 0
    while True:
        if pos >= len(data):
            raise ValueError("GIF missing trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return blocks
        blocks += 1
        if b == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated GIF image descriptor")
            lflags = data[pos + 8]
            pos += 9
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 7))
            if pos >= len(data):
                raise ValueError("truncated GIF image data")
            pos += 1  # LZW min code size
            pos = _gif_subblocks(data, pos)
        elif b == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            pos += 1  # label
            pos = _gif_subblocks(data, pos)
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")


def audit_bmp(data: bytes) -> None:
    if len(data) < 26 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    declared, _, off = struct.unpack_from("<III", data, 2)
    (dib,) = struct.unpack_from("<I", data, 14)
    if declared != len(data):
        raise ValueError("BMP declared size != stream size")
    if off > len(data) or off < 14 + dib:
        raise ValueError("BMP pixel-array offset out of bounds")


_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
                   9: 4, 10: 8, 11: 4, 12: 8}


def audit_tiff(data: bytes) -> int:
    """IFD-chain walk; returns total entry count. Bounds every IFD,
    every out-of-line value, and every strip/tile extent (tags
    273/279, 324/325 — the actual pixel payload, which an IFD-only
    walk would never notice missing); guards offset cycles."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (off,) = struct.unpack_from(bo + "I", data, 4)
    seen: set[int] = set()
    entries = 0

    def _values(etype, count, vpos):
        sz = _TIFF_TYPE_SIZE.get(etype, 1)
        total = sz * count
        if total > 4:
            (vo,) = struct.unpack_from(bo + "I", data, vpos)
            if vo + total > len(data):
                raise ValueError("TIFF value offset out of bounds")
            base = vo
        else:
            base = vpos
        fmtc = {3: "H", 4: "I"}.get(etype)
        if fmtc is None:
            return None
        return list(struct.unpack_from(bo + fmtc * count, data, base))

    while off:
        if off in seen or len(seen) > 64:
            raise ValueError("TIFF IFD chain cycle")
        seen.add(off)
        if off + 2 > len(data):
            raise ValueError("TIFF IFD offset out of bounds")
        (n,) = struct.unpack_from(bo + "H", data, off)
        end = off + 2 + 12 * n + 4
        if end > len(data):
            raise ValueError("TIFF IFD overruns stream")
        extents: dict[int, list[int]] = {}
        for i in range(n):
            epos = off + 2 + 12 * i
            tag, etype, count = struct.unpack_from(bo + "HHI", data, epos)
            vals = _values(etype, count, epos + 8)
            if tag in (273, 279, 324, 325) and vals is not None:
                extents[tag] = vals
        for offs_tag, cnts_tag in ((273, 279), (324, 325)):
            offs = extents.get(offs_tag)
            cnts = extents.get(cnts_tag)
            if offs and cnts and len(offs) == len(cnts):
                for o, c in zip(offs, cnts):
                    if o + c > len(data):
                        raise ValueError(
                            "TIFF strip/tile overruns stream")
        entries += n
        (off,) = struct.unpack_from(bo + "I", data, end - 4)
    return entries


def audit_container(
    data: bytes | None,
) -> tuple[str | None, str, str | None]:
    """(fmt, verdict, detail) — uniform audit over any payload."""
    if data is None:
        return None, "no_payload", "no payload"
    from .imagegen import sniff_format

    data = bytes(data)
    fmt = sniff_format(data)
    if fmt is None:
        return None, "unknown_format", "unrecognized magic"
    try:
        if fmt == "png":
            from .pngcodec import audit_chunks

            bad = [t for t, _, _, ok in audit_chunks(data) if not ok]
            if bad:
                return fmt, "crc_mismatch", \
                    "CRC mismatch: " + ",".join(bad)
            return fmt, "ok", None
        if fmt == "jpeg":
            _, eoi = audit_jpeg(data)
            return (fmt, "ok", None) if eoi \
                else (fmt, "malformed", "missing EOI")
        if fmt == "webp":
            audit_riff(data)
        elif fmt == "gif":
            audit_gif(data)
        elif fmt == "bmp":
            audit_bmp(data)
        elif fmt == "tiff":
            audit_tiff(data)
        elif fmt in ("heic", "avif"):
            # ISO-BMFF box-bounds walk (pure python, no codec). Like
            # JPEG/WebP — and unlike PNG — the container carries no
            # payload checksums: a flipped mdat byte is provably
            # invisible at this layer.
            from .isobmff import audit_isobmff

            ok, msg, _ = audit_isobmff(data)
            if not ok:
                return fmt, "malformed", msg
        return fmt, "ok", None
    except ValueError as e:
        return fmt, "malformed", str(e)[:120]
