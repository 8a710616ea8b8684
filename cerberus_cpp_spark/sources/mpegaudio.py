"""MPEG audio (MP3-family) STRUCTURAL parsing — headers, frame-chain
walk, duration/bitrate accounting — with zero sample decode.

This is the container-audit pattern (JPEG marker walk, ISO-BMFF box
walk) applied to the one stubbed audio family: full Layer III sample
decode genuinely needs a codec this container does not ship (no
ffmpeg/mad/lame — re-verified round 4), but the FRAME LAYER is pure
ISO/IEC 11172-3 arithmetic: 32-bit headers carry version / layer /
bitrate / sample-rate / padding, and every frame's byte length and
sample count follow from them. That is enough to validate structure,
measure duration, detect truncation and mid-stream parameter changes,
and classify CBR vs VBR — the checks a 10^12-row crawl actually runs
on audio it will transcode anyway. Sample decode stays an HONEST stub
(``multimodal.audio_stream_stats`` raises by default).

Everything here is deterministic integer arithmetic, so contract
oracles replay frame counts, byte layouts, and durations exactly;
``build_frame`` emits spec-valid frames (zeroed payloads) for
deterministic fixtures.
"""

from __future__ import annotations

import struct

#: bitrate tables, kbps; index 0 = "free" (unsupported here), 15 = bad
_BITRATES = {
    # (mpeg1?, layer) -> 14 entries for index 1..14
    (True, 1): [32, 64, 96, 128, 160, 192, 224, 256,
                288, 320, 352, 384, 416, 448],
    (True, 2): [32, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320, 384],
    (True, 3): [32, 40, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320],
    (False, 1): [32, 48, 56, 64, 80, 96, 112, 128,
                 144, 160, 176, 192, 224, 256],
    (False, 2): [8, 16, 24, 32, 40, 48, 56, 64,
                 80, 96, 112, 128, 144, 160],
    (False, 3): [8, 16, 24, 32, 40, 48, 56, 64,
                 80, 96, 112, 128, 144, 160],
}

_RATES = {3: [44100, 48000, 32000],      # MPEG1
          2: [22050, 24000, 16000],      # MPEG2
          0: [11025, 12000, 8000]}       # MPEG2.5

_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def parse_frame_header(hdr: bytes) -> dict:
    """Decode one 32-bit MPEG audio frame header. ValueError on a
    bad sync word or reserved/free field values."""
    if len(hdr) < 4:
        raise ValueError("truncated frame header")
    (word,) = struct.unpack(">I", hdr[:4])
    if (word >> 21) & 0x7FF != 0x7FF:
        raise ValueError(f"bad sync word 0x{word >> 21 & 0x7FF:03x}")
    ver_bits = (word >> 19) & 3
    if ver_bits == 1:
        raise ValueError("reserved MPEG version")
    layer_bits = (word >> 17) & 3
    if layer_bits == 0:
        raise ValueError("reserved layer")
    layer = 4 - layer_bits                  # 1/2/3
    mpeg1 = ver_bits == 3
    crc = not (word >> 16) & 1
    bidx = (word >> 12) & 0xF
    if bidx == 0 or bidx == 15:
        raise ValueError("free/bad bitrate index")
    ridx = (word >> 10) & 3
    if ridx == 3:
        raise ValueError("reserved sample-rate index")
    padding = (word >> 9) & 1
    mode = _MODES[(word >> 6) & 3]
    bitrate = _BITRATES[(mpeg1, layer)][bidx - 1]
    rate = _RATES[ver_bits][ridx]
    if layer == 1:
        frame_bytes = (12000 * bitrate // rate + padding) * 4
        samples = 384
    else:
        if layer == 3 and not mpeg1:
            frame_bytes = 72000 * bitrate // rate + padding
            samples = 576
        else:
            frame_bytes = 144000 * bitrate // rate + padding
            samples = 1152
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[ver_bits],
        "layer": layer, "crc": crc, "bitrate_kbps": bitrate,
        "sample_rate": rate, "padding": bool(padding),
        "channel_mode": mode,
        "channels": 1 if mode == "mono" else 2,
        "frame_bytes": frame_bytes, "samples": samples,
    }


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 when absent)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("corrupt ID3v2 syncsafe size")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size


def sniff_mpeg_audio(data: bytes) -> bool:
    """True when the payload starts with an ID3v2 tag or a valid
    MPEG audio frame header (after the tag, when present)."""
    if data is None or len(data) < 4:
        return False
    try:
        off = _id3v2_size(data)
        parse_frame_header(data[off:off + 4])
        return True
    except ValueError:
        return False


def audit_mpeg_audio(data: bytes) -> dict:
    """Walk the full frame chain; returns a structural report:

    ``{"ok", "message", "n_frames", "duration_ms", "sample_rate",
    "layer", "version", "channels", "cbr", "bitrate_kbps_min",
    "bitrate_kbps_max", "id3v2", "id3v1"}``

    ok=False (with a message) on truncation, bad sync mid-stream,
    trailing garbage, or mid-stream version/layer/sample-rate changes
    (those require a decoder reset and usually indicate a corrupt
    concatenation). A trailing 128-byte ID3v1 'TAG' block is legal.
    Duration uses exact integer math: sum(samples)·1000 // rate.
    """
    out = {
        "ok": False, "message": None, "n_frames": 0,
        "duration_ms": None, "sample_rate": None, "layer": None,
        "version": None, "channels": None, "cbr": None,
        "bitrate_kbps_min": None, "bitrate_kbps_max": None,
        "id3v2": False, "id3v1": False,
    }
    try:
        off = _id3v2_size(data)
        out["id3v2"] = off > 0
        if off > len(data):
            raise ValueError("ID3v2 tag longer than the payload")
        end = len(data)
        if end - off >= 128 and data[end - 128:end - 125] == b"TAG":
            out["id3v1"] = True
            end -= 128
        first = None
        samples = 0
        brs = []
        while off < end:
            h = parse_frame_header(data[off:off + 4])
            if first is None:
                first = h
                out.update(
                    sample_rate=h["sample_rate"], layer=h["layer"],
                    version=h["version"], channels=h["channels"],
                )
            elif (h["sample_rate"], h["layer"], h["version"]) != (
                    first["sample_rate"], first["layer"],
                    first["version"]):
                raise ValueError(
                    f"stream parameters change at frame"
                    f" {out['n_frames']}")
            if off + h["frame_bytes"] > end:
                raise ValueError(
                    f"frame {out['n_frames']} truncated"
                    f" ({end - off} of {h['frame_bytes']} bytes)")
            brs.append(h["bitrate_kbps"])
            samples += h["samples"]
            out["n_frames"] += 1
            off += h["frame_bytes"]
        if out["n_frames"] == 0:
            raise ValueError("no MPEG audio frames")
        out["duration_ms"] = samples * 1000 // first["sample_rate"]
        out["bitrate_kbps_min"] = min(brs)
        out["bitrate_kbps_max"] = max(brs)
        out["cbr"] = len(set(brs)) == 1
        out["ok"] = True
    except ValueError as e:
        out["message"] = str(e)[:160]
    return out


_BIDX = {v: i + 1 for k, tbl in _BITRATES.items()
         for i, v in enumerate(tbl) if k == (True, 3)}


def build_frame(*, bitrate_kbps: int, sample_rate: int,
                padding: bool = False, mono: bool = False) -> bytes:
    """Spec-valid MPEG1 Layer III frame with a zeroed payload —
    deterministic fixture material for the structural layer (the
    payload is NOT decodable audio, and does not claim to be)."""
    try:
        bidx = _BITRATES[(True, 3)].index(bitrate_kbps) + 1
    except ValueError:
        raise ValueError(f"not an MPEG1-L3 bitrate: {bitrate_kbps}")
    try:
        ridx = _RATES[3].index(sample_rate)
    except ValueError:
        raise ValueError(f"not an MPEG1 sample rate: {sample_rate}")
    word = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (bidx << 12) | (ridx << 10) | (int(padding) << 9) \
        | ((3 if mono else 0) << 6)
    frame_bytes = 144000 * bitrate_kbps // sample_rate + int(padding)
    return struct.pack(">I", word) + b"\x00" * (frame_bytes - 4)


def build_id3v2(size: int = 32) -> bytes:
    """Minimal ID3v2 tag of the given payload size (zeroed)."""
    if not 0 <= size < (1 << 28):
        raise ValueError("ID3v2 size out of range")
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x04\x00\x00" + ss + b"\x00" * size
