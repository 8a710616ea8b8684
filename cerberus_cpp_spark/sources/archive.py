"""Archive layer for code/training corpora: ustar TAR and ZIP
member walks — the container formats The-Stack-style source
datasets arrive in. TAR is pure header arithmetic (512-byte blocks,
octal fields, the spaces-as-checksum rule); ZIP walks the
end-of-central-directory → central directory → local headers chain
and REALLY inflates each member (raw deflate via
``zlib.decompressobj(-15)`` through a bomb budget) to verify the
stored CRC-32 against ``zlib.crc32`` of the actual bytes — decode,
not just framing, exactly like ``sources/compression.py``.

Reference parity: per-payload verdict model (validator.hh:239-258) —
damage is reported per row with a CONSTANT message class, never by
killing the job.
"""

from __future__ import annotations

import struct
import zlib

#: constant verdict messages (contract queries replay these)
MSG_NOT_ARCHIVE = "unknown archive format"
MSG_TAR_TRUNC = "tar archive truncated"
MSG_TAR_CHKSUM = "tar header checksum mismatch"
MSG_TAR_FIELD = "tar header field malformed"
MSG_ZIP_EOCD = "zip end-of-central-directory not found"
MSG_ZIP_CDIR = "zip central directory malformed"
MSG_ZIP_LOCAL = "zip local header mismatch"
MSG_ZIP_METHOD = "zip unsupported compression method"
MSG_ZIP_DATA = "zip member data corrupt"
MSG_ZIP_CRC = "zip member crc mismatch"
MSG_BOMB = "decompressed size exceeds limit"


# ---------------------------------------------------------------------------
# TAR (POSIX ustar)
# ---------------------------------------------------------------------------

def _octal(field: bytes) -> int:
    s = field.rstrip(b"\x00 ").lstrip(b" ")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(MSG_TAR_FIELD) from None


def _tar_checksum(header: bytes) -> int:
    """Header bytes summed with the checksum field read as spaces."""
    return sum(header[:148]) + 8 * 0x20 + sum(header[156:512])


def build_tar(members: list[dict]) -> bytes:
    """Spec-valid ustar fixture. Each member dict: ``{"name",
    "data" (bytes), "mtime" (int, default 0), "typeflag"
    (default '0'; use '5' + empty data for a directory)}``."""
    out = []
    for m in members:
        name = m["name"].encode()
        if len(name) > 100:
            raise ValueError("name longer than 100 bytes")
        data = m.get("data", b"")
        h = bytearray(512)
        h[0:len(name)] = name
        h[100:108] = b"0000644\x00"
        h[108:116] = b"0000000\x00"
        h[116:124] = b"0000000\x00"
        h[124:136] = ("%011o" % len(data)).encode() + b"\x00"
        h[136:148] = ("%011o" % int(m.get("mtime", 0))).encode() \
            + b"\x00"
        h[148:156] = b" " * 8
        h[156] = ord(m.get("typeflag", "0"))
        h[257:263] = b"ustar\x00"
        h[263:265] = b"00"
        chk = sum(h)
        h[148:156] = ("%06o" % chk).encode() + b"\x00 "
        out.append(bytes(h))
        out.append(data)
        pad = (-len(data)) % 512
        out.append(b"\x00" * pad)
    out.append(b"\x00" * 1024)
    return b"".join(out)


def sniff_tar(data: bytes) -> bool:
    return (data is not None and len(data) >= 512
            and data[257:262] == b"ustar")


def tar_members(data: bytes) -> list[dict]:
    """Member walk: ``[{"name", "size", "typeflag", "mtime"}, ...]``
    with checksum verification per header; raises ValueError with a
    constant message on damage."""
    if not sniff_tar(data):
        raise ValueError(MSG_NOT_ARCHIVE)
    out = []
    off = 0
    while True:
        if off + 512 > len(data):
            raise ValueError(MSG_TAR_TRUNC)
        header = data[off:off + 512]
        if header == b"\x00" * 512:
            return out  # terminator (second zero block optional)
        if _octal(header[148:156]) != _tar_checksum(header):
            raise ValueError(MSG_TAR_CHKSUM)
        size = _octal(header[124:136])
        name = header[0:100].split(b"\x00")[0].decode(
            "utf-8", "replace")
        out.append({
            "name": name,
            "size": size,
            "typeflag": chr(header[156]) if header[156] else "0",
            "mtime": _octal(header[136:148]),
        })
        off += 512 + size + ((-size) % 512)
        if off > len(data):
            raise ValueError(MSG_TAR_TRUNC)


# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------

_EOCD = b"PK\x05\x06"
_CDIR = b"PK\x01\x02"
_LOCAL = b"PK\x03\x04"


def sniff_zip(data: bytes) -> bool:
    return (data is not None and len(data) >= 22
            and data[:4] in (_LOCAL, _EOCD))


def build_zip(members: list[dict], *, level: int = 6) -> bytes:
    """Spec-valid minimal ZIP fixture (deflate or stored). Each
    member dict: ``{"name", "data" (bytes), "store" (bool,
    default False)}``."""
    locals_, cdir = [], []
    off = 0
    for m in members:
        name = m["name"].encode()
        data = m.get("data", b"")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if m.get("store"):
            method, payload = 0, data
        else:
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
            method = 8
        lh = (_LOCAL + struct.pack(
            "<HHHHHIIIHH", 20, 0, method, 0, 0, crc,
            len(payload), len(data), len(name), 0) + name)
        locals_.append(lh + payload)
        cdir.append(_CDIR + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, method, 0, 0, crc,
            len(payload), len(data), len(name), 0, 0, 0, 0, 0, off)
            + name)
        off += len(lh) + len(payload)
    cd = b"".join(cdir)
    eocd = _EOCD + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(cd),
        off, 0)
    return b"".join(locals_) + cd + eocd


def zip_members(data: bytes, *,
                max_out: int = 64 * 1024 * 1024) -> list[dict]:
    """Member walk with REAL decode: EOCD → central directory →
    local headers, each member inflated (bounded) and its CRC-32
    verified against the stored value. Returns ``[{"name", "size",
    "n_comp", "method", "crc_ok"}, ...]``; raises ValueError with a
    constant message on structural damage (per-member data damage
    is reported IN the row via crc_ok=False when the stream still
    inflates, or raises MSG_ZIP_DATA when it does not)."""
    if not sniff_zip(data):
        raise ValueError(MSG_NOT_ARCHIVE)
    # EOCD: fixed 22 bytes + comment; scan the last 64KiB+22
    tail_start = max(0, len(data) - 22 - 0xFFFF)
    pos = data.rfind(_EOCD, tail_start)
    if pos < 0:
        raise ValueError(MSG_ZIP_EOCD)
    if pos + 22 > len(data):
        raise ValueError(MSG_ZIP_EOCD)
    (_, _, n_here, n_total, cd_size,
     cd_off, _) = struct.unpack_from("<HHHHIIH", data, pos + 4)
    if n_here != n_total or cd_off + cd_size > pos:
        raise ValueError(MSG_ZIP_CDIR)
    out = []
    off = cd_off
    for _ in range(n_total):
        if data[off:off + 4] != _CDIR or off + 46 > len(data):
            raise ValueError(MSG_ZIP_CDIR)
        (_, _, _, method, _, _, crc, n_comp, n_raw, n_name,
         n_extra, n_cmt, _, _, _, lh_off) = struct.unpack_from(
            "<HHHHHHIIIHHHHHII", data, off + 4)
        name = data[off + 46:off + 46 + n_name].decode(
            "utf-8", "replace")
        off += 46 + n_name + n_extra + n_cmt
        if data[lh_off:lh_off + 4] != _LOCAL \
                or lh_off + 30 > len(data):
            raise ValueError(MSG_ZIP_LOCAL)
        ln_name, ln_extra = struct.unpack_from("<HH", data,
                                               lh_off + 26)
        ds = lh_off + 30 + ln_name + ln_extra
        de = ds + n_comp
        if de > len(data):
            raise ValueError(MSG_ZIP_LOCAL)
        payload = data[ds:de]
        if n_raw > max_out:
            raise ValueError(MSG_BOMB)
        if method == 0:
            raw = payload
        elif method == 8:
            d = zlib.decompressobj(-15)
            try:
                raw = d.decompress(payload, max_out + 1)
            except Exception:  # noqa: BLE001
                raise ValueError(MSG_ZIP_DATA) from None
            if len(raw) > max_out:
                raise ValueError(MSG_BOMB)
            if not d.eof:
                raise ValueError(MSG_ZIP_DATA)
        else:
            raise ValueError(MSG_ZIP_METHOD)
        out.append({
            "name": name,
            "size": len(raw),
            "n_comp": n_comp,
            "method": "store" if method == 0 else "deflate",
            "crc_ok": (zlib.crc32(raw) & 0xFFFFFFFF) == crc
            and len(raw) == n_raw,
        })
    return out
