"""TFRecord structural layer (the public TFRecord/riegeli-lite
framing used for ML example shards): each record is a 12-byte
header — uint64-LE payload length + uint32-LE MASKED CRC-32C of
those 8 length bytes — then the payload and its own masked
CRC-32C footer. The mask is the published rotate-and-add:
``((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)``.

CRC-32C (Castagnoli, poly 0x1EDC6F41, reflected, init/xor-out
0xFFFFFFFF) is implemented from scratch table-driven here and pinned
in tests against an independent bitwise implementation plus the
published check value CRC32C(b"123456789") = 0xE3069283 — the same
dual-implementation conformance strategy as the Ogg page CRC.

This completes the training-data container family: WARC (crawl),
tar/zip (code), MP4/Matroska/Ogg/FLAC (media), TFRecord (packed ML
examples). Payload decode (the tf.Example protobuf) is downstream's
job — this layer answers whether a shard is structurally sound and
how its records are sized, which is what a resharding/packing pass
needs before parsing a single proto.

Reference parity: per-payload verdict model (validator.hh:239-258).
"""

from __future__ import annotations

import struct

#: constant verdict messages (contract queries replay these)
MSG_TRUNC = "tfrecord truncated mid-record"
MSG_LEN_CRC = "tfrecord length crc mismatch"
MSG_DATA_CRC = "tfrecord data crc mismatch"
MSG_EMPTY = "tfrecord stream empty"


def _crc32c_table() -> list[int]:
    tbl = []
    for i in range(256):
        r = i
        for _ in range(8):
            r = (r >> 1) ^ 0x82F63B78 if r & 1 else r >> 1
        tbl.append(r)
    return tbl


_TBL = _crc32c_table()


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), reflected, init/xor-out 0xFFFFFFFF."""
    r = 0xFFFFFFFF
    for b in data:
        r = (r >> 8) ^ _TBL[(r ^ b) & 0xFF]
    return r ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def build_tfrecord(payloads: list[bytes]) -> bytes:
    """Spec-valid TFRecord shard from raw payload bytes."""
    out = []
    for p in payloads:
        ln = struct.pack("<Q", len(p))
        out.append(ln + struct.pack("<I", masked_crc(ln)) + p
                   + struct.pack("<I", masked_crc(p)))
    return b"".join(out)


def sniff_tfrecord(data: bytes) -> bool:
    """True when the first 12 bytes are a self-consistent record
    header (a masked-CRC check on 8 bytes — false-positive
    probability ~2^-32, which is what makes sniffing possible for a
    format with no magic number)."""
    if data is None or len(data) < 16:
        return False
    ln = struct.unpack_from("<Q", data, 0)[0]
    crc = struct.unpack_from("<I", data, 8)[0]
    return crc == masked_crc(data[:8]) and 16 + ln <= len(data)


def tfrecord_records(data: bytes) -> list[dict]:
    """Record walk with BOTH CRCs verified per record:
    ``[{"length", "crc_ok"}, ...]``. A data-CRC mismatch is
    reported IN the row (the framing survives — exactly the Ogg
    crc_ok contract); structural damage (truncation, length-CRC
    mismatch, empty input) raises ValueError with a constant
    message — a corrupt length header means every later offset is
    garbage, so the walk cannot honestly continue."""
    if data is None or len(data) == 0:
        raise ValueError(MSG_EMPTY)
    out = []
    off = 0
    n = len(data)
    while off < n:
        if off + 12 > n:
            raise ValueError(MSG_TRUNC)
        ln_bytes = data[off:off + 8]
        ln = struct.unpack("<Q", ln_bytes)[0]
        ln_crc = struct.unpack_from("<I", data, off + 8)[0]
        if ln_crc != masked_crc(ln_bytes):
            raise ValueError(MSG_LEN_CRC)
        ps = off + 12
        pe = ps + ln
        if pe + 4 > n:
            raise ValueError(MSG_TRUNC)
        data_crc = struct.unpack_from("<I", data, pe)[0]
        out.append({
            "length": ln,
            "crc_ok": data_crc == masked_crc(data[ps:pe]),
        })
        off = pe + 4
    return out
