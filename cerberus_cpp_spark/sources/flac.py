"""Pure-python FLAC structural layer (RFC 9639 / the public
flac-format spec): magic + metadata-block walk and the bit-packed
STREAMINFO decode a census pipeline needs BEFORE spending a frame
decoder — the lossless-audio sibling of the MPEG/ADTS/WAV layers in
``sources/mpegaudio.py`` and the container walks in
``sources/isobmff.py`` / ``sources/ebml.py`` / ``sources/ogg.py``.
Frame (sample) DECODE is out of scope here like every other
container layer in this repo.

Stream grammar: ``fLaC`` magic, then metadata blocks — each a
1-bit last-block flag, 7-bit type (0 = STREAMINFO, mandatory first),
and a 24-bit big-endian length. STREAMINFO is 34 bytes: u16 min/max
block size, u24 min/max frame size, then a bit-packed run of
20 bits sample rate, 3 bits channels−1, 5 bits bits-per-sample−1,
36 bits total samples, and a 16-byte MD5 of the unencoded audio.

Reference parity: like the reference's per-document verdict model
(validator.hh:239-258), structural damage is reported per payload
with the offending block named, never by killing the job.
"""

from __future__ import annotations

import struct

_MAGIC = b"fLaC"

#: metadata block type → name (spec §8.1)
_BLOCK_TYPES = {0: "streaminfo", 1: "padding", 2: "application",
                3: "seektable", 4: "vorbis_comment", 5: "cuesheet",
                6: "picture"}


def _streaminfo(min_block: int, max_block: int, rate: int,
                channels: int, bps: int, total_samples: int,
                md5: bytes) -> bytes:
    if not (1 <= channels <= 8):
        raise ValueError("channels must be 1-8")
    if not (4 <= bps <= 32):
        raise ValueError("bits-per-sample must be 4-32")
    if rate >= 1 << 20 or total_samples >= 1 << 36:
        raise ValueError("rate/total_samples out of field range")
    packed = (rate << 44) | ((channels - 1) << 41) \
        | ((bps - 1) << 36) | total_samples
    return (struct.pack(">HH", min_block, max_block)
            + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
            + packed.to_bytes(8, "big") + md5)


def _block(btype: int, last: bool, payload: bytes) -> bytes:
    return bytes([(0x80 if last else 0) | btype]) \
        + len(payload).to_bytes(3, "big") + payload


def build_flac(*, rate: int, channels: int, bps: int,
               total_samples: int, n_padding: int = 0,
               vendor: str | None = "cerberus") -> bytes:
    """Spec-valid minimal FLAC fixture: magic + STREAMINFO
    (+ optional VORBIS_COMMENT and ``n_padding`` PADDING blocks),
    last-block flags set correctly. No audio frames follow — this is
    the metadata prefix a census reads; ``total_samples`` drives the
    recoverable integer-ms duration."""
    blocks = []
    md5 = bytes(range(16))
    blocks.append((0, _streaminfo(4096, 4096, rate, channels, bps,
                                  total_samples, md5)))
    if vendor is not None:
        v = vendor.encode("utf-8")
        blocks.append((4, struct.pack("<I", len(v)) + v
                       + struct.pack("<I", 0)))
    for _ in range(n_padding):
        blocks.append((1, b"\x00" * 16))
    out = [_MAGIC]
    for k, (btype, payload) in enumerate(blocks):
        out.append(_block(btype, k == len(blocks) - 1, payload))
    return b"".join(out)


def sniff_flac(data: bytes) -> bool:
    """True when ``data`` starts with the fLaC magic (block-level
    diagnosis is the parser's job — a fLaC-magic stream whose first
    block is wrong should be named as such, not mis-sniffed)."""
    return data is not None and len(data) >= 8 \
        and data[:4] == _MAGIC


def flac_stream_info(data: bytes) -> dict:
    """Stream-level structural metadata from the block walk — no
    frame decode: ``{"rate", "channels", "bits_per_sample",
    "total_samples", "duration_ms", "n_blocks", "block_types",
    "md5_set"}``. ``duration_ms`` is integer-floor milliseconds
    (None when total_samples is 0 — a streamed encode). Structural
    damage (bad magic, first block not STREAMINFO, truncated
    blocks, zero sample rate, no last-block flag) raises ValueError
    naming it."""
    if not sniff_flac(data):
        raise ValueError("not a flac stream (fLaC magic)")
    off = 4
    n_blocks = 0
    types: list[str] = []
    out: dict = {}
    saw_last = False
    while off < len(data):
        if off + 4 > len(data):
            raise ValueError(f"truncated block header at {off}")
        last = data[off] & 0x80 != 0
        btype = data[off] & 0x7F
        size = int.from_bytes(data[off + 1:off + 4], "big")
        ps, pe = off + 4, off + 4 + size
        if pe > len(data):
            raise ValueError(
                f"block {_BLOCK_TYPES.get(btype, btype)} overruns "
                f"stream ({pe} > {len(data)})")
        if btype == 127:
            raise ValueError("forbidden block type 127")
        types.append(_BLOCK_TYPES.get(btype, f"type{btype}"))
        n_blocks += 1
        if n_blocks == 1:
            if btype != 0:
                raise ValueError("first block is not STREAMINFO")
            if size != 34:
                raise ValueError(
                    f"STREAMINFO length {size}, expected 34")
            packed = int.from_bytes(data[ps + 10:ps + 18], "big")
            rate = packed >> 44
            if rate == 0:
                raise ValueError("sample rate 0")
            out["rate"] = rate
            out["channels"] = ((packed >> 41) & 0x7) + 1
            out["bits_per_sample"] = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            out["total_samples"] = total
            out["duration_ms"] = (total * 1000 // rate
                                  if total else None)
            out["md5_set"] = data[ps + 18:ps + 34] != b"\x00" * 16
        if last:
            saw_last = True
            off = pe
            break
        off = pe
    if not saw_last:
        raise ValueError("no last-metadata-block flag before EOF")
    out["n_blocks"] = n_blocks
    out["block_types"] = types
    return out
