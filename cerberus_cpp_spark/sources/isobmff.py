"""Pure-python ISO-BMFF (ISO/IEC 14496-12) container parsing for
HEIF/HEIC and AVIF payloads: brand sniffing, header-only dimension
extraction (the 10^12-row first pass — no codec, no system library),
and a structural box-bounds audit for the container-integrity family.

Pixel DECODE of these formats needs an HEVC/AV1 codec and lives in
``sources/libheif.py`` (feature-detected system libheif, the same
pattern as the libwebp conformance binding); everything in THIS
module is self-contained byte parsing and works in any environment.

Box grammar: ``[size:u32][type:4cc]`` with payload following; size
includes the header; size==1 → a u64 ``largesize`` follows the type;
size==0 → the box extends to the end of the enclosing scope
(top-level only). "Full" boxes (``meta``, ``pitm``, ``ipma``,
``ispe``…) carry 4 extra version/flags bytes. The primary image's
dimensions resolve through ``meta → pitm`` (primary item id) →
``iprp/ipma`` (item→property associations) → ``iprp/ipco`` (ordered
property list) → the associated ``ispe`` property — NOT just "the
first ispe", which may belong to a thumbnail or alpha plane.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

#: ftyp major/compatible brands → our format token. 'heif' stays an
#: INVALID metadata token in the synthetic fixtures (the seeded
#: allowed-rule violation); real payloads are branded by codec family.
_HEIC_BRANDS = {b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx",
                b"mif1", b"msf1"}
_AVIF_BRANDS = {b"avif", b"avis"}

_FULL_CONTAINERS = {b"meta"}
_PLAIN_CONTAINERS = {b"iprp", b"ipco", b"moov", b"trak", b"mdia",
                     b"minf", b"stbl", b"dinf", b"edts"}


def iter_boxes(data: bytes, start: int, end: int,
               top_level: bool = False) -> Iterator[tuple]:
    """Yield ``(type, payload_start, payload_end)`` for each box in
    ``data[start:end]``; raises ValueError on structural damage."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError(
                f"truncated box header at offset {off} ({end - off}"
                " bytes left)")
        size = struct.unpack_from(">I", data, off)[0]
        btype = data[off + 4:off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError(f"truncated largesize at offset {off}")
            size = struct.unpack_from(">Q", data, off + 8)[0]
            hdr = 16
        elif size == 0:
            if not top_level:
                raise ValueError(
                    f"size-0 box {btype!r} inside a container")
            size = end - off
        if size < hdr:
            raise ValueError(
                f"box {btype!r} size {size} smaller than its header")
        if off + size > end:
            raise ValueError(
                f"box {btype!r} at {off} overruns its scope by"
                f" {off + size - end} bytes")
        yield btype, off + hdr, off + size
        off += size
    if off != end:
        raise ValueError(f"box scan ended at {off}, scope ends at {end}")


def sniff_isobmff(data: bytes) -> str | None:
    """'heic' / 'avif' from the ftyp brands, else None. AVIF files
    commonly use major brand ``mif1`` with ``avif`` in the compatible
    list, so compatibles are consulted before the heic fallback."""
    if data is None or len(data) < 16 or data[4:8] != b"ftyp":
        return None
    size = struct.unpack_from(">I", data, 0)[0]
    if size < 16 or size > len(data):
        return None
    major = data[8:12]
    compat = [data[i:i + 4] for i in range(16, size - 3, 4)]
    if major in _AVIF_BRANDS or any(b in _AVIF_BRANDS for b in compat):
        return "avif"
    if major in _HEIC_BRANDS or any(b in _HEIC_BRANDS for b in compat):
        return "heic"
    return None


def _find(data: bytes, start: int, end: int, btype: bytes,
          top_level: bool = False) -> tuple[int, int] | None:
    for t, ps, pe in iter_boxes(data, start, end, top_level):
        if t == btype:
            return ps, pe
    return None


def heif_header_info(data: bytes) -> tuple[str, int, int]:
    """(fmt, width, height) of the PRIMARY image from container
    metadata only — no pixel decode, no codec, microseconds/row.

    Resolves pitm → ipma → ipco[ispe]; falls back to the largest
    ispe when the association tables are absent (legacy writers).
    Raises ValueError when the container is damaged or carries no
    usable size property."""
    fmt = sniff_isobmff(data)
    if fmt is None:
        raise ValueError("not an ISO-BMFF image (no heif/avif ftyp)")
    meta = _find(data, 0, len(data), b"meta", top_level=True)
    if meta is None:
        raise ValueError("no meta box")
    ms, me = meta[0] + 4, meta[1]          # meta is a full box

    primary = None
    pitm = _find(data, ms, me, b"pitm")
    if pitm is not None:
        ps, pe = pitm
        ver = data[ps]
        if ver == 0:
            primary = struct.unpack_from(">H", data, ps + 4)[0]
        else:
            primary = struct.unpack_from(">I", data, ps + 4)[0]

    iprp = _find(data, ms, me, b"iprp")
    if iprp is None:
        raise ValueError("no iprp box")
    ipco = _find(data, iprp[0], iprp[1], b"ipco")
    if ipco is None:
        raise ValueError("no ipco box")
    props = list(iter_boxes(data, ipco[0], ipco[1]))

    def ispe_dims(ps: int, pe: int) -> tuple[int, int]:
        if pe - ps < 12:
            raise ValueError("truncated ispe box")
        w, h = struct.unpack_from(">II", data, ps + 4)
        return w, h

    ipma = _find(data, iprp[0], iprp[1], b"ipma")
    if primary is not None and ipma is not None:
        ps, pe = ipma
        ver, flags = data[ps], struct.unpack_from(">I", data, ps)[0] & 0xFFFFFF
        off = ps + 4
        (count,) = struct.unpack_from(">I", data, off)
        off += 4
        for _ in range(count):
            if ver < 1:
                (item_id,) = struct.unpack_from(">H", data, off)
                off += 2
            else:
                (item_id,) = struct.unpack_from(">I", data, off)
                off += 4
            n_assoc = data[off]
            off += 1
            idxs = []
            for _ in range(n_assoc):
                if flags & 1:
                    v = struct.unpack_from(">H", data, off)[0]
                    off += 2
                    idxs.append(v & 0x7FFF)
                else:
                    idxs.append(data[off] & 0x7F)
                    off += 1
            if item_id == primary:
                for i in idxs:
                    if 1 <= i <= len(props) and props[i - 1][0] == b"ispe":
                        w, h = ispe_dims(props[i - 1][1], props[i - 1][2])
                        return fmt, w, h
                break
    # fallback: largest ispe (primary image dwarfs thumbs/alpha)
    best = None
    for t, ps, pe in props:
        if t == b"ispe":
            w, h = ispe_dims(ps, pe)
            if best is None or w * h > best[0] * best[1]:
                best = (w, h)
    if best is None:
        raise ValueError("no ispe property for the primary item")
    return fmt, best[0], best[1]


def audit_isobmff(data: bytes) -> tuple[bool, str | None, int]:
    """Structural box-bounds walk — the ISO-BMFF leg of the
    container-integrity family (``containeraudit.py``): every box
    header parses, sizes stay inside their scope, known containers
    recurse, the file starts with ftyp, and the top level covers the
    payload exactly. Returns (ok, message, boxes_walked). Like the
    other audits this proves CONTAINER health only: HEVC/AV1 bitstream
    damage inside mdat is invisible here (and, unlike PNG, ISO-BMFF
    carries no payload checksums at all — a flipped mdat byte is
    provably undetectable at this layer)."""
    n = 0

    def walk(start: int, end: int, top: bool) -> None:
        nonlocal n
        for t, ps, pe in iter_boxes(data, start, end, top):
            n += 1
            if t in _FULL_CONTAINERS:
                if pe - ps < 4:
                    raise ValueError(f"full box {t!r} shorter than"
                                     " its version field")
                walk(ps + 4, pe, False)
            elif t in _PLAIN_CONTAINERS:
                walk(ps, pe, False)

    try:
        if len(data) < 16 or data[4:8] != b"ftyp":
            raise ValueError("first box is not ftyp")
        walk(0, len(data), True)
        return True, None, n
    except ValueError as e:
        return False, str(e)[:160], n
