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


# ---------------------------------------------------------------------------
# MP4 movie branch (the moov/trak walk — ISO/IEC 14496-12 §8; same
# box grammar as the image branch above, different metadata tree).
# Sample DECODE of the contained codecs is out of scope here exactly
# like the HEIF branch: this layer answers what a transcode/census
# pipeline needs before spending a decoder.
# ---------------------------------------------------------------------------

#: movie-file brands (disjoint from the image brands above — a HEIF
#: still picture is NOT an mp4 movie even though both are ISO-BMFF)
_MP4_BRANDS = {b"isom", b"iso2", b"iso4", b"iso5", b"iso6", b"mp41",
               b"mp42", b"avc1", b"dash", b"M4V ", b"M4A "}


def sniff_mp4(data: bytes) -> str | None:
    """The ftyp major (or first compatible) movie brand as a string,
    else None. Checked AFTER the image brands by callers — brand sets
    are disjoint so order only matters for malformed dual-branded
    files."""
    if data is None or len(data) < 16 or data[4:8] != b"ftyp":
        return None
    size = struct.unpack_from(">I", data, 0)[0]
    if size < 16 or size > len(data):
        return None
    major = data[8:12]
    if major in _MP4_BRANDS:
        return major.decode("ascii").strip()
    for i in range(16, size - 3, 4):
        if data[i:i + 4] in _MP4_BRANDS:
            return data[i:i + 4].decode("ascii").strip()
    return None


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int,
          payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version)
                + flags.to_bytes(3, "big") + payload)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                            0, 0, 0x40000000)


def _pack_lang(lang: str) -> int:
    """ISO-639-2/T 3-letter code packed as three 5-bit fields
    (each letter − 0x60), per 14496-12 §8.4.2."""
    if len(lang) != 3:
        raise ValueError("language must be a 3-letter code")
    a, b, c = (ord(ch) - 0x60 for ch in lang)
    if not all(1 <= v <= 26 for v in (a, b, c)):
        raise ValueError(f"language {lang!r} not lowercase a-z")
    return (a << 10) | (b << 5) | c


def _unpack_lang(v: int) -> str:
    return "".join(chr(0x60 + ((v >> s) & 0x1F)) for s in (10, 5, 0))


def build_mp4(tracks: list[dict], *, brand: bytes = b"isom",
              movie_timescale: int = 1000) -> bytes:
    """Spec-valid minimal MP4 fixture: ftyp + moov(mvhd + one trak
    per spec) + an empty mdat. Each track dict:
    ``{"track_id", "handler" ('vide'|'soun'), "codec" (4cc str),
    "timescale", "samples": [(count, delta), ...],
    "width"/"height" (video only), "lang" (default 'und')}``.
    Track duration = Σ count·delta in the track timescale; the movie
    duration = the max track duration rescaled to movie_timescale
    (integer floor — replayed by the census oracle). Boxes are
    written version 0 unless a time field exceeds 32 bits, in which
    case that box upgrades to version 1 (64-bit times) per
    14496-12 §8.2.2 — so the builder organically exercises the
    parser's v1 path."""
    traks = []
    movie_dur = 0
    for t in tracks:
        tid = int(t["track_id"])
        handler = t["handler"].encode("ascii")
        if handler not in (b"vide", b"soun"):
            raise ValueError(f"unsupported handler {t['handler']!r}")
        codec = t["codec"].encode("ascii")
        if len(codec) != 4:
            raise ValueError("codec must be a 4cc")
        tsc = int(t["timescale"])
        samples = list(t["samples"])
        dur = sum(int(c) * int(d) for c, d in samples)
        movie_dur = max(movie_dur,
                        dur * movie_timescale // tsc)
        w = int(t.get("width", 0))
        h = int(t.get("height", 0))
        tk_dur = dur * movie_timescale // tsc
        tk_tail = (struct.pack(">Qhhhh", 0, 0, 0,
                               0x0100 if handler == b"soun" else 0, 0)
                   + _UNITY_MATRIX
                   + struct.pack(">II", w << 16, h << 16))
        if tk_dur > 0xFFFFFFFF:
            tkhd = _full(b"tkhd", 1, 7, struct.pack(
                ">QQIIQ", 0, 0, tid, 0, tk_dur) + tk_tail)
        else:
            tkhd = _full(b"tkhd", 0, 7, struct.pack(
                ">IIIII", 0, 0, tid, 0, tk_dur) + tk_tail)
        md_tail = struct.pack(">HH", _pack_lang(t.get("lang", "und")),
                              0)
        if dur > 0xFFFFFFFF:
            mdhd = _full(b"mdhd", 1, 0, struct.pack(
                ">QQIQ", 0, 0, tsc, dur) + md_tail)
        else:
            mdhd = _full(b"mdhd", 0, 0, struct.pack(
                ">IIII", 0, 0, tsc, dur) + md_tail)
        hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + handler
                     + b"\x00" * 12 + b"cerberus\x00")
        entry = (struct.pack(">I", 16) + codec
                 + b"\x00" * 6 + struct.pack(">H", 1))
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stts = _full(b"stts", 0, 0, struct.pack(">I", len(samples))
                     + b"".join(struct.pack(">II", int(c), int(d))
                                for c, d in samples))
        stbl = _box(b"stbl", stsd + stts)
        mhd = (_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
               if handler == b"vide"
               else _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0)))
        dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full(b"url ", 0, 1, b""))
        minf = _box(b"minf", mhd + _box(b"dinf", dref) + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks.append(_box(b"trak", tkhd + mdia))
    mv_tail = (struct.pack(">IHH", 0x00010000, 0x0100, 0)
               + b"\x00" * 8 + _UNITY_MATRIX + b"\x00" * 24
               + struct.pack(">I", max((int(t["track_id"])
                                        for t in tracks),
                                       default=0) + 1))
    if movie_dur > 0xFFFFFFFF:
        mvhd = _full(b"mvhd", 1, 0, struct.pack(
            ">QQIQ", 0, 0, int(movie_timescale), movie_dur)
            + mv_tail)
    else:
        mvhd = _full(b"mvhd", 0, 0, struct.pack(
            ">IIII", 0, 0, int(movie_timescale), movie_dur)
            + mv_tail)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0)
                + brand + b"iso2")
    return ftyp + _box(b"moov", mvhd + b"".join(traks)) \
        + _box(b"mdat", b"")


def _read_full(data: bytes, ps: int, pe: int,
               btype: bytes) -> tuple[int, int]:
    """(version, payload_start_after_verflags) for a full box."""
    if pe - ps < 4:
        raise ValueError(f"{btype.decode()} box truncated")
    return data[ps], ps + 4


def mp4_movie_info(data: bytes) -> dict:
    """Movie + per-track structural metadata from the moov tree —
    no sample decode: ``{"brand", "timescale", "duration",
    "tracks": [{"track_id", "handler", "codec", "width", "height",
    "timescale", "duration", "n_samples", "lang"}, ...]}``.
    mvhd/tkhd/mdhd version 1 (64-bit times) is handled; structural
    damage (truncation, overruns, missing mandatory boxes) raises
    ValueError with the offending box named."""
    brand = sniff_mp4(data)
    if brand is None:
        raise ValueError("not an mp4 movie (ftyp brand)")
    moov = _find(data, 0, len(data), b"moov", top_level=True)
    if moov is None:
        raise ValueError("no moov box")
    ms, me = moov
    mvhd = _find(data, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box")
    ver, p = _read_full(data, *mvhd, b"mvhd")
    if ver == 1:
        p += 16  # 64-bit ctime + mtime
        tsc = struct.unpack_from(">I", data, p)[0]
        dur = struct.unpack_from(">Q", data, p + 4)[0]
    else:
        p += 8
        tsc, dur = struct.unpack_from(">II", data, p)
    out = {"brand": brand, "timescale": tsc, "duration": dur,
           "tracks": []}
    for t, ps, pe in iter_boxes(data, ms, me):
        if t != b"trak":
            continue
        tr: dict = {}
        tk = _find(data, ps, pe, b"tkhd")
        if tk is None:
            raise ValueError("trak without tkhd")
        ver, p = _read_full(data, *tk, b"tkhd")
        p += 16 if ver == 1 else 8  # ctime + mtime
        tr["track_id"] = struct.unpack_from(">I", data, p)[0]
        # width/height are the LAST 8 bytes of tkhd, 16.16 fixed
        if tk[1] - tk[0] < 8:
            raise ValueError("tkhd truncated")
        wq, hq = struct.unpack_from(">II", data, tk[1] - 8)
        tr["width"], tr["height"] = wq >> 16, hq >> 16
        mdia = _find(data, ps, pe, b"mdia")
        if mdia is None:
            raise ValueError("trak without mdia")
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        if mdhd is None:
            raise ValueError("mdia without mdhd")
        ver, p = _read_full(data, *mdhd, b"mdhd")
        if ver == 1:
            p += 16
            tr["timescale"] = struct.unpack_from(">I", data, p)[0]
            tr["duration"] = struct.unpack_from(">Q", data, p + 4)[0]
            p += 12
        else:
            p += 8
            tr["timescale"], tr["duration"] = \
                struct.unpack_from(">II", data, p)
            p += 8
        tr["lang"] = _unpack_lang(
            struct.unpack_from(">H", data, p)[0])
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            raise ValueError("mdia without hdlr")
        _, p = _read_full(data, *hdlr, b"hdlr")
        tr["handler"] = data[p + 4:p + 8].decode("ascii",
                                                 "replace")
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            raise ValueError("mdia without minf")
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise ValueError("minf without stbl")
        stsd = _find(data, stbl[0], stbl[1], b"stsd")
        if stsd is None:
            raise ValueError("stbl without stsd")
        _, p = _read_full(data, *stsd, b"stsd")
        n_entries = struct.unpack_from(">I", data, p)[0]
        if n_entries < 1 or p + 12 > stsd[1]:
            raise ValueError("stsd without sample entries")
        tr["codec"] = data[p + 8:p + 12].decode("ascii", "replace")
        stts = _find(data, stbl[0], stbl[1], b"stts")
        if stts is None:
            raise ValueError("stbl without stts")
        _, p = _read_full(data, *stts, b"stts")
        n = struct.unpack_from(">I", data, p)[0]
        if p + 4 + 8 * n > stts[1]:
            raise ValueError("stts entry table truncated")
        tr["n_samples"] = sum(
            struct.unpack_from(">I", data, p + 4 + 8 * k)[0]
            for k in range(n))
        out["tracks"].append(tr)
    if not out["tracks"]:
        raise ValueError("moov without any trak")
    return out
