"""WARC record layer (ISO 28500 — the native container of web-crawl
corpora: Common-Crawl-style training data arrives as WARC before any
text ever reaches a documents table): record walk, mandatory-header
enforcement, Content-Length framing, and the HTTP status of response
records — the census a crawl-ingest pipeline needs before spending
HTML extraction. Per-record payload DECODE (HTML parsing, charset
sniffing) is downstream's job (``operators/text.strip_html``);
record-level gzip members compose with
``sources/compression.decompress_bounded`` upstream.

Record grammar: ``WARC/1.0\\r\\n`` (or 1.1), named-field headers,
an empty line, exactly Content-Length payload bytes, then the
``\\r\\n\\r\\n`` separator. Mandatory headers per the standard:
WARC-Record-ID, Content-Length, WARC-Date, WARC-Type.

Reference parity: per-payload verdict model (validator.hh:239-258) —
damage is reported per row with a CONSTANT message class, never by
killing the job.
"""

from __future__ import annotations

#: constant verdict messages (contract queries replay these)
MSG_NOT_WARC = "not a warc stream (version line)"
MSG_HEADER = "warc record header malformed"
MSG_MANDATORY = "warc record missing mandatory header"
MSG_LENGTH = "warc content block overruns stream"
MSG_SEPARATOR = "warc record separator missing"

_MANDATORY = ("WARC-Record-ID", "Content-Length", "WARC-Date",
              "WARC-Type")


def build_warc(records: list[dict], *, version: str = "1.0") -> bytes:
    """Spec-valid WARC fixture. Each record dict: ``{"type",
    "record_id", "date", "block" (bytes), "uri" (optional),
    "content_type" (optional)}``."""
    out = []
    for r in records:
        block = r.get("block", b"")
        hdrs = [
            ("WARC-Type", r["type"]),
            ("WARC-Record-ID", r["record_id"]),
            ("WARC-Date", r.get("date", "2026-01-01T00:00:00Z")),
            ("Content-Length", str(len(block))),
        ]
        if r.get("uri"):
            hdrs.append(("WARC-Target-URI", r["uri"]))
        if r.get("content_type"):
            hdrs.append(("Content-Type", r["content_type"]))
        head = f"WARC/{version}\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in hdrs) + "\r\n"
        out.append(head.encode() + block + b"\r\n\r\n")
    return b"".join(out)


def sniff_warc(data: bytes) -> bool:
    return (data is not None and len(data) >= 10
            and (data[:9] == b"WARC/1.0\r"
                 or data[:9] == b"WARC/1.1\r"))


def warc_records(data: bytes) -> list[dict]:
    """Record walk: ``[{"type", "record_id", "uri",
    "content_length", "content_type", "http_status"}, ...]``.
    ``http_status`` is parsed from the block's HTTP status line for
    application/http response records (None elsewhere). Raises
    ValueError with a constant message on structural damage."""
    if not sniff_warc(data):
        raise ValueError(MSG_NOT_WARC)
    out = []
    off = 0
    n = len(data)
    while off < n:
        if data[off:off + 5] != b"WARC/":
            raise ValueError(MSG_HEADER)
        hdr_end = data.find(b"\r\n\r\n", off)
        if hdr_end < 0:
            raise ValueError(MSG_HEADER)
        try:
            lines = data[off:hdr_end].decode("utf-8").split("\r\n")
        except UnicodeDecodeError:
            raise ValueError(MSG_HEADER) from None
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if not sep:
                raise ValueError(MSG_HEADER)
            fields[k.strip()] = v.strip()
        if any(m not in fields for m in _MANDATORY):
            raise ValueError(MSG_MANDATORY)
        try:
            clen = int(fields["Content-Length"])
        except ValueError:
            raise ValueError(MSG_HEADER) from None
        bs = hdr_end + 4
        be = bs + clen
        if be > n:
            raise ValueError(MSG_LENGTH)
        if data[be:be + 4] != b"\r\n\r\n":
            raise ValueError(MSG_SEPARATOR)
        status = None
        ctype = fields.get("Content-Type", "")
        if (fields["WARC-Type"] == "response"
                and ctype.startswith("application/http")):
            line = data[bs:bs + 64].split(b"\r\n", 1)[0]
            parts = line.split(b" ")
            if len(parts) >= 2 and parts[0].startswith(b"HTTP/") \
                    and parts[1].isdigit():
                status = int(parts[1])
        out.append({
            "type": fields["WARC-Type"],
            "record_id": fields["WARC-Record-ID"],
            "uri": fields.get("WARC-Target-URI"),
            "content_length": clen,
            "content_type": fields.get("Content-Type"),
            "http_status": status,
        })
        off = be + 4
    if not out:
        raise ValueError(MSG_NOT_WARC)
    return out


def warc_response_bodies(data: bytes) -> list[dict]:
    """Response payloads for the ingest path: one entry per
    ``application/http`` response record — ``{"uri", "http_status",
    "body"}`` with ``body`` = the bytes after the HTTP header
    section (first CRLFCRLF inside the block; empty when the block
    carries no header separator). Non-response records and
    non-http content types are skipped; structural damage raises
    exactly like :func:`warc_records` (same walk)."""
    if not sniff_warc(data):
        raise ValueError(MSG_NOT_WARC)
    out = []
    off = 0
    n = len(data)
    while off < n:
        if data[off:off + 5] != b"WARC/":
            raise ValueError(MSG_HEADER)
        hdr_end = data.find(b"\r\n\r\n", off)
        if hdr_end < 0:
            raise ValueError(MSG_HEADER)
        try:
            lines = data[off:hdr_end].decode("utf-8").split("\r\n")
        except UnicodeDecodeError:
            raise ValueError(MSG_HEADER) from None
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if not sep:
                raise ValueError(MSG_HEADER)
            fields[k.strip()] = v.strip()
        if any(m not in fields for m in _MANDATORY):
            raise ValueError(MSG_MANDATORY)
        try:
            clen = int(fields["Content-Length"])
        except ValueError:
            raise ValueError(MSG_HEADER) from None
        bs = hdr_end + 4
        be = bs + clen
        if be > n:
            raise ValueError(MSG_LENGTH)
        if data[be:be + 4] != b"\r\n\r\n":
            raise ValueError(MSG_SEPARATOR)
        ctype = fields.get("Content-Type", "")
        if (fields["WARC-Type"] == "response"
                and ctype.startswith("application/http")):
            block = data[bs:be]
            line = block.split(b"\r\n", 1)[0]
            parts = line.split(b" ")
            status = None
            if len(parts) >= 2 and parts[0].startswith(b"HTTP/") \
                    and parts[1].isdigit():
                status = int(parts[1])
            sep_at = block.find(b"\r\n\r\n")
            body = block[sep_at + 4:] if sep_at >= 0 else b""
            out.append({
                "uri": fields.get("WARC-Target-URI"),
                "http_status": status,
                "body": body,
            })
        off = be + 4
    return out
