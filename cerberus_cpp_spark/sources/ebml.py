"""Pure-python EBML / Matroska / WebM structural layer (RFC 8794
EBML grammar + the public Matroska element registry): doctype
sniffing, a build→parse fixture pair for the spec-valid parameter
space, and the Segment→Info/Tracks walk a census pipeline needs
BEFORE spending a VP9/Opus decoder — the exact sibling of the MP4
moov walk in ``sources/isobmff.py`` for the other big web video
container. Sample DECODE of the contained codecs is out of scope
here like every other container layer in this repo.

EBML grammar: every element is ``[id:vint-with-marker][size:vint]
[payload]``. A VINT's byte length is the position of the first set
bit of its first byte (1-8); the element ID keeps that marker bit
(so IDs compare as the raw bytes, e.g. Segment = 0x18538067), the
size VINT drops it. An all-ones size VINT means "unknown size"
(streaming); this layer REJECTS unknown sizes with a named error —
a crawled file without real bounds can't be structurally audited.

Reference parity: like the reference's per-document verdict model
(validator.hh:239-258), structural damage is reported per payload
with the offending element named, never by killing the job.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

# Matroska element IDs (public registry, raw marker-kept form)
_EBML = b"\x1aE\xdf\xa3"
_DOCTYPE = b"\x42\x82"
_SEGMENT = b"\x18\x53\x80\x67"
_INFO = b"\x15\x49\xa9\x66"
_TIMESTAMP_SCALE = b"\x2a\xd7\xb1"
_DURATION = b"\x44\x89"
_MUXING_APP = b"\x4d\x80"
_WRITING_APP = b"\x57\x41"
_TRACKS = b"\x16\x54\xae\x6b"
_TRACK_ENTRY = b"\xae"
_TRACK_NUMBER = b"\xd7"
_TRACK_UID = b"\x73\xc5"
_TRACK_TYPE = b"\x83"
_FLAG_LACING = b"\x9c"
_LANGUAGE = b"\x22\xb5\x9c"
_CODEC_ID = b"\x86"
_VIDEO = b"\xe0"
_PIXEL_WIDTH = b"\xb0"
_PIXEL_HEIGHT = b"\xba"
_AUDIO = b"\xe1"
_SAMPLING_FREQ = b"\xb5"
_CHANNELS = b"\x9f"
_CLUSTER = b"\x1f\x43\xb6\x75"
_CLUSTER_TS = b"\xe7"

#: doctypes this layer accepts (webm is the constrained profile)
_DOCTYPES = {"matroska", "webm"}

#: track-type code → handler token (Matroska §track-type)
_TRACK_TYPES = {1: "video", 2: "audio", 3: "complex", 16: "logo",
                17: "subtitle", 18: "buttons", 32: "control",
                33: "metadata"}


# ---------------------------------------------------------------------------
# VINT + element primitives
# ---------------------------------------------------------------------------

def _vint_size(first: int) -> int:
    """Byte length of a VINT from its first byte (RFC 8794 §4)."""
    for n in range(1, 9):
        if first & (0x100 >> n):
            return n
    raise ValueError("invalid VINT (first byte 0x00)")


def read_element(data: bytes, off: int,
                 end: int) -> tuple[bytes, int, int]:
    """``(id_bytes, payload_start, payload_end)`` for the element at
    ``off``; raises ValueError naming the damage."""
    if off >= end:
        raise ValueError("element expected past end of scope")
    n = _vint_size(data[off])
    if n > 4:
        raise ValueError(f"element ID longer than 4 bytes at {off}")
    if off + n > end:
        raise ValueError(f"truncated element ID at offset {off}")
    eid = data[off:off + n]
    p = off + n
    if p >= end:
        raise ValueError(f"element {eid.hex()} missing size VINT")
    m = _vint_size(data[p])
    if p + m > end:
        raise ValueError(f"truncated size VINT at offset {p}")
    size = data[p] & (0xFF >> m)
    for k in range(1, m):
        size = (size << 8) | data[p + k]
    if size == (1 << (7 * m)) - 1:
        raise ValueError(
            f"unknown-size element {eid.hex()} (unbounded scope)")
    ps = p + m
    if ps + size > end:
        raise ValueError(
            f"element {eid.hex()} payload overruns scope "
            f"({ps + size} > {end})")
    return eid, ps, ps + size


def iter_elements(data: bytes, start: int,
                  end: int) -> Iterator[tuple[bytes, int, int]]:
    off = start
    while off < end:
        eid, ps, pe = read_element(data, off, end)
        yield eid, ps, pe
        off = pe


def _find(data: bytes, start: int, end: int,
          eid: bytes) -> tuple[int, int] | None:
    for got, ps, pe in iter_elements(data, start, end):
        if got == eid:
            return ps, pe
    return None


def _uint(data: bytes, ps: int, pe: int) -> int:
    v = 0
    for b in data[ps:pe]:
        v = (v << 8) | b
    return v


def _float(data: bytes, ps: int, pe: int) -> float:
    if pe - ps == 4:
        return struct.unpack(">f", data[ps:pe])[0]
    if pe - ps == 8:
        return struct.unpack(">d", data[ps:pe])[0]
    raise ValueError(f"float element of width {pe - ps}")


# ---------------------------------------------------------------------------
# Builder (spec-valid fixtures — deterministic, census-oracle-able)
# ---------------------------------------------------------------------------

def _enc_vint(v: int) -> bytes:
    """Size VINT: shortest marker-bit encoding of v."""
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | v).to_bytes(n, "big")
    raise ValueError(f"value {v} too large for a VINT")


def _el(eid: bytes, payload: bytes) -> bytes:
    return eid + _enc_vint(len(payload)) + payload


def _el_uint(eid: bytes, v: int) -> bytes:
    n = max(1, (int(v).bit_length() + 7) // 8)
    return _el(eid, int(v).to_bytes(n, "big"))


def build_webm(tracks: list[dict], *, doctype: str = "webm",
               duration_ms: int | None = None,
               timestamp_scale: int = 1_000_000,
               n_clusters: int = 0) -> bytes:
    """Spec-valid minimal Matroska/WebM fixture: EBML header +
    Segment(Info + Tracks + ``n_clusters`` empty clusters). Each
    track dict: ``{"number", "type" ('video'|'audio'), "codec"
    (CodecID string), "width"/"height" (video), "hz"/"channels"
    (audio), "lang" (default 'und')}``. With the default 1 ms
    TimestampScale the Duration float is written as the exact
    integer ``duration_ms`` — replayed by the census oracle."""
    if doctype not in _DOCTYPES:
        raise ValueError(f"doctype {doctype!r} not matroska/webm")
    header = _el(_EBML, b"".join((
        _el_uint(b"\x42\x86", 1),          # EBMLVersion
        _el_uint(b"\x42\xf7", 1),          # EBMLReadVersion
        _el_uint(b"\x42\xf2", 4),          # EBMLMaxIDLength
        _el_uint(b"\x42\xf3", 8),          # EBMLMaxSizeLength
        _el(_DOCTYPE, doctype.encode("ascii")),
        _el_uint(b"\x42\x87", 4),          # DocTypeVersion
        _el_uint(b"\x42\x85", 2),          # DocTypeReadVersion
    )))
    info = _el_uint(_TIMESTAMP_SCALE, timestamp_scale)
    if duration_ms is not None:
        scale_ms = timestamp_scale / 1_000_000
        info += _el(_DURATION, struct.pack(
            ">d", duration_ms / scale_ms))
    info += _el(_MUXING_APP, b"cerberus") \
        + _el(_WRITING_APP, b"cerberus")
    entries = []
    for t in tracks:
        kind = t["type"]
        code = {v: k for k, v in _TRACK_TYPES.items()}[kind]
        body = (_el_uint(_TRACK_NUMBER, int(t["number"]))
                + _el_uint(_TRACK_UID, int(t["number"]) + 100)
                + _el_uint(_TRACK_TYPE, code)
                + _el_uint(_FLAG_LACING, 0)
                + _el(_LANGUAGE,
                      t.get("lang", "und").encode("ascii"))
                + _el(_CODEC_ID, t["codec"].encode("ascii")))
        if kind == "video":
            body += _el(_VIDEO,
                        _el_uint(_PIXEL_WIDTH, int(t["width"]))
                        + _el_uint(_PIXEL_HEIGHT, int(t["height"])))
        elif kind == "audio":
            body += _el(_AUDIO, _el(_SAMPLING_FREQ, struct.pack(
                ">d", float(t["hz"])))
                + _el_uint(_CHANNELS, int(t.get("channels", 2))))
        entries.append(_el(_TRACK_ENTRY, body))
    seg = (_el(_INFO, info) + _el(_TRACKS, b"".join(entries))
           + b"".join(_el(_CLUSTER, _el_uint(_CLUSTER_TS, 33 * k))
                      for k in range(n_clusters)))
    return header + _el(_SEGMENT, seg)


# ---------------------------------------------------------------------------
# Sniffer + parser
# ---------------------------------------------------------------------------

def sniff_webm(data: bytes) -> str | None:
    """The EBML DocType ('webm'/'matroska') if ``data`` starts with
    a well-formed EBML header carrying one, else None."""
    if data is None or len(data) < 8 or data[:4] != _EBML:
        return None
    try:
        _, hs, he = read_element(data, 0, len(data))
        dt = _find(data, hs, he, _DOCTYPE)
        if dt is None:
            return None
        s = data[dt[0]:dt[1]].split(b"\x00")[0].decode(
            "ascii", "replace")
        return s if s in _DOCTYPES else None
    except ValueError:
        return None


def webm_movie_info(data: bytes) -> dict:
    """Movie + per-track structural metadata from the Segment walk —
    no sample decode: ``{"doctype", "timestamp_scale",
    "duration_ms", "n_clusters", "tracks": [{"number", "type",
    "codec", "width", "height", "hz", "channels", "lang"}, ...]}``.
    ``duration_ms`` is the Info Duration rescaled to integer
    milliseconds (None when absent). Structural damage (truncation,
    VINT overruns, unknown sizes, missing mandatory elements) raises
    ValueError naming the offending element."""
    doctype = sniff_webm(data)
    if doctype is None:
        raise ValueError("not a matroska/webm stream (EBML doctype)")
    _, hs, he = read_element(data, 0, len(data))
    eid, ss, se = read_element(data, he, len(data))
    if eid != _SEGMENT:
        raise ValueError("no Segment element after EBML header")
    info = _find(data, ss, se, _INFO)
    if info is None:
        raise ValueError("Segment without Info")
    scale = 1_000_000
    dur: float | None = None
    for got, ps, pe in iter_elements(data, *info):
        if got == _TIMESTAMP_SCALE:
            scale = _uint(data, ps, pe)
        elif got == _DURATION:
            dur = _float(data, ps, pe)
    out: dict = {
        "doctype": doctype, "timestamp_scale": scale,
        "duration_ms": (int(dur * scale / 1_000_000)
                        if dur is not None else None),
        "n_clusters": sum(1 for g, _, _ in
                          iter_elements(data, ss, se)
                          if g == _CLUSTER),
        "tracks": [],
    }
    tracks = _find(data, ss, se, _TRACKS)
    if tracks is None:
        raise ValueError("Segment without Tracks")
    for got, ps, pe in iter_elements(data, *tracks):
        if got != _TRACK_ENTRY:
            continue
        tr: dict = {"number": None, "type": None, "codec": None,
                    "width": None, "height": None, "hz": None,
                    "channels": None, "lang": "eng"}
        for g2, p2, e2 in iter_elements(data, ps, pe):
            if g2 == _TRACK_NUMBER:
                tr["number"] = _uint(data, p2, e2)
            elif g2 == _TRACK_TYPE:
                code = _uint(data, p2, e2)
                tr["type"] = _TRACK_TYPES.get(code, f"type{code}")
            elif g2 == _CODEC_ID:
                tr["codec"] = data[p2:e2].decode("ascii", "replace")
            elif g2 == _LANGUAGE:
                tr["lang"] = data[p2:e2].split(b"\x00")[0].decode(
                    "ascii", "replace")
            elif g2 == _VIDEO:
                for g3, p3, e3 in iter_elements(data, p2, e2):
                    if g3 == _PIXEL_WIDTH:
                        tr["width"] = _uint(data, p3, e3)
                    elif g3 == _PIXEL_HEIGHT:
                        tr["height"] = _uint(data, p3, e3)
            elif g2 == _AUDIO:
                for g3, p3, e3 in iter_elements(data, p2, e2):
                    if g3 == _SAMPLING_FREQ:
                        tr["hz"] = _float(data, p3, e3)
                    elif g3 == _CHANNELS:
                        tr["channels"] = _uint(data, p3, e3)
        if tr["number"] is None or tr["type"] is None \
                or tr["codec"] is None:
            raise ValueError(
                "TrackEntry missing TrackNumber/TrackType/CodecID")
        out["tracks"].append(tr)
    if not out["tracks"]:
        raise ValueError("Tracks without any TrackEntry")
    return out
