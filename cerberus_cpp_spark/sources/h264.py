"""H.264/AVC (ISO/IEC 14496-10) STRUCTURAL parsing — Annex-B NAL
walk, Exp-Golomb SPS decode for real frame dimensions, slice/IDR
accounting — with zero macroblock decode.

The video twin of ``sources/mpegaudio.py``: full H.264 sample decode
genuinely needs a codec this container does not ship, but the NAL
and parameter-set layers are pure spec arithmetic. An SPS carries the
coded picture size in macroblocks plus the conformance cropping
window, so REAL display dimensions (including non-multiple-of-16
sizes like 1920×1080) come out of a few dozen Exp-Golomb reads —
the header-only first pass for video payloads, exactly like
``image_header_info`` for images. Slice-NAL accounting (IDR
presence, slice count, forbidden-bit checks) gives the structural
audit. ``build_sps``/``build_stream`` emit spec-valid fixtures with
zeroed slice payloads (NOT decodable video, and not claiming to be).
"""

from __future__ import annotations

NAL_NAMES = {1: "slice", 5: "idr", 6: "sei", 7: "sps", 8: "pps",
             9: "aud"}


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("SPS truncated mid-field")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("oversized Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes_rbsp(self) -> bytes:
        # rbsp_stop_one_bit + alignment
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _strip_emulation(data: bytes) -> bytes:
    """Remove 0x000003 emulation-prevention bytes from a NAL body."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _add_emulation(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def iter_nals(data: bytes):
    """Yield (nal_type, rbsp_payload) for every Annex-B NAL unit.
    ValueError on a missing leading start code, a forbidden_zero_bit
    violation, or an empty NAL."""
    n = len(data)
    i = 0
    # leading start code (3- or 4-byte)
    if data[:3] == b"\x00\x00\x01":
        i = 3
    elif data[:4] == b"\x00\x00\x00\x01":
        i = 4
    else:
        raise ValueError("no Annex-B start code at offset 0")
    while i < n:
        # find next start code
        j = data.find(b"\x00\x00\x01", i)
        end = n if j < 0 else (j - 1 if j > i and data[j - 1] == 0
                               else j)
        nal = data[i:end]
        if not nal:
            raise ValueError("empty NAL unit")
        hdr = nal[0]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        yield hdr & 0x1F, _strip_emulation(nal[1:])
        if j < 0:
            return
        i = j + 3
        if i >= n:
            raise ValueError("empty NAL unit")   # dangling start code


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                  139, 134, 135}
#: SubWidthC/SubHeightC per chroma_format_idc (1=4:2:0, 2=4:2:2, 3=4:4:4)
_SUBWH = {1: (2, 2), 2: (2, 1), 3: (1, 1)}


def parse_sps(rbsp: bytes) -> dict:
    """Decode an SPS RBSP: profile/level, chroma format, and the REAL
    display dimensions (macroblock size minus the conformance
    cropping window, spec 7.4.2.1.1)."""
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)                      # constraint flags + reserved
    level = r.u(8)
    r.ue()                      # seq_parameter_set_id
    chroma = 1
    separate = 0
    if profile in _HIGH_PROFILES:
        chroma = r.ue()
        if chroma == 3:
            separate = r.u(1)
        r.ue()                  # bit_depth_luma_minus8
        r.ue()                  # bit_depth_chroma_minus8
        r.u(1)                  # qpprime_y_zero_transform_bypass
        if r.u(1):              # seq_scaling_matrix_present
            for idx in range(8 if chroma != 3 else 12):
                if r.u(1):      # seq_scaling_list_present[idx]
                    size = 16 if idx < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()                      # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()                      # max_num_ref_frames
    r.u(1)                      # gaps_in_frame_num_value_allowed
    pw = r.ue() + 1             # pic_width_in_mbs
    ph = r.ue() + 1             # pic_height_in_map_units
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                  # mb_adaptive_frame_field
    r.u(1)                      # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):                  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = (r.ue(), r.ue(), r.ue(),
                                          r.ue())
    if chroma == 0 or separate:
        cw, chh = 1, 1
    else:
        cw, chh = _SUBWH.get(chroma, (1, 1))
    cu_y = chh * (2 - frame_mbs_only)
    width = pw * 16 - (crop_l + crop_r) * cw
    height = ph * 16 * (2 - frame_mbs_only) - (crop_t + crop_b) * cu_y
    if width < 1 or height < 1:
        raise ValueError("cropping window exceeds the coded size")
    return {
        "profile_idc": profile, "level_idc": level,
        "chroma_format_idc": chroma, "width": width, "height": height,
        "frame_mbs_only": bool(frame_mbs_only),
    }


def sniff_h264_annexb(data: bytes) -> bool:
    if data is None or len(data) < 5:
        return False
    if data[:3] != b"\x00\x00\x01" and data[:4] != b"\x00\x00\x00\x01":
        return False
    off = 3 if data[:3] == b"\x00\x00\x01" else 4
    return (data[off] & 0x80) == 0 and (data[off] & 0x1F) in NAL_NAMES


def h264_stream_info(data: bytes) -> dict:
    """Walk the NAL stream: SPS dims/profile, NAL counts, IDR
    presence. ``ok`` False (with a message) on structural damage or
    a stream with no SPS."""
    out = {"ok": False, "message": None, "width": None, "height": None,
           "profile_idc": None, "level_idc": None, "n_nals": 0,
           "n_slices": 0, "n_idr": 0, "has_sps": False,
           "has_pps": False}
    try:
        for typ, rbsp in iter_nals(data):
            out["n_nals"] += 1
            if typ == 7 and not out["has_sps"]:
                sps = parse_sps(rbsp)
                out.update(width=sps["width"], height=sps["height"],
                           profile_idc=sps["profile_idc"],
                           level_idc=sps["level_idc"], has_sps=True)
            elif typ == 8:
                out["has_pps"] = True
            elif typ in (1, 5):
                out["n_slices"] += 1
                if typ == 5:
                    out["n_idr"] += 1
        if not out["has_sps"]:
            raise ValueError("no SPS in stream")
        out["ok"] = True
    except ValueError as e:
        out["message"] = str(e)[:160]
    return out


def build_sps(*, mb_w: int, mb_h: int, crop_r: int = 0,
              crop_b: int = 0, profile: int = 66,
              level: int = 30) -> bytes:
    """Spec-valid baseline/high-profile SPS RBSP for the given coded
    size (in 16px macroblocks) and right/bottom cropping (in chroma
    units — 4:2:0, so 2px each). Deterministic fixture material."""
    w = _BitWriter()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(level, 8)
    w.ue(0)                     # sps id
    if profile in _HIGH_PROFILES:
        w.ue(1)                 # chroma 4:2:0
        w.ue(0)
        w.ue(0)
        w.u(0, 1)
        w.u(0, 1)               # no scaling matrix
    w.ue(0)                     # log2_max_frame_num_minus4
    w.ue(0)                     # poc type 0
    w.ue(0)                     # log2_max_poc_lsb_minus4
    w.ue(1)                     # max_num_ref_frames
    w.u(0, 1)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)                   # frame_mbs_only
    w.u(1, 1)                   # direct_8x8
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)                   # no VUI
    return w.bytes_rbsp()


def build_stream(*, mb_w: int, mb_h: int, crop_r: int = 0,
                 crop_b: int = 0, n_slices: int = 1,
                 profile: int = 66, slice_bytes: int = 16) -> bytes:
    """Annex-B stream: SPS + PPS + one IDR + (n_slices-1) non-IDR
    slices with zeroed payloads — structurally valid, not decodable
    video."""
    sc = b"\x00\x00\x00\x01"
    sps = sc + bytes([0x67]) + _add_emulation(
        build_sps(mb_w=mb_w, mb_h=mb_h, crop_r=crop_r, crop_b=crop_b,
                  profile=profile))
    pps = sc + bytes([0x68]) + b"\xce\x38\x80"
    out = sps + pps
    for k in range(max(1, n_slices)):
        typ = 5 if k == 0 else 1
        out += sc + bytes([(3 << 5) | typ]) \
            + bytes([0x88 + (k % 16)]) * slice_bytes
    return out
