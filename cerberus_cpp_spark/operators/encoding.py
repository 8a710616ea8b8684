"""Encoding census for raw text payloads: the charset gate a crawl
pipeline runs BEFORE any text operator — strict UTF-8 validation,
BOM detection/stripping, non-ASCII byte ratio, and the
replacement-character count that flags text already mangled by an
earlier bad decode (mojibake that strict validation alone cannot
see, because U+FFFD is perfectly valid UTF-8). Invalid streams
report the first offending byte offset so triage can distinguish a
truncated multibyte tail (offset near the end) from a binary blob
mislabeled as text (offset near 0).

One narrow Arrow stage over the byte column; verdicts are pure
functions of the bytes (Python's strict UTF-8 decoder is the
conformance reference here — RFC 3629's table is what it
implements), so the contract query's oracle replays every field by
plant arithmetic.

Reference parity: per-payload verdict model (validator.hh:239-258).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENCODING_SCHEMA = (
    "clip_id string, ok boolean, message string, utf8_valid "
    "boolean, has_bom boolean, n_bytes bigint, n_nonascii_bytes "
    "bigint, n_chars bigint, n_replacement_chars bigint, "
    "invalid_at bigint"
)


def encoding_census(
    df: DataFrame,
    *,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """ONE ROW PER PAYLOAD: strict-UTF-8 verdict, BOM presence
    (EF BB BF prefix; ``n_chars`` counts WITHOUT it — the value a
    downstream tokenizer sees after sane stripping), byte and
    non-ASCII byte counts, decoded char count, U+FFFD count (prior
    mojibake), and the first invalid byte offset for invalid
    streams. NULL payloads route to ok=false; an EMPTY payload is
    valid UTF-8 of zero chars."""
    src = df.select(F.col(id_col).alias("clip_id"), F.col(bytes_col))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("ok", "message", "utf8_valid", "has_bom",
                "n_bytes", "n_nonascii_bytes", "n_chars",
                "n_replacement_chars", "invalid_at")
        int_cols = {"n_bytes": "Int64", "n_nonascii_bytes": "Int64",
                    "n_chars": "Int64",
                    "n_replacement_chars": "Int64",
                    "invalid_at": "Int64"}

        for pdf in batches:
            out: dict = {"clip_id": [], **{c: [] for c in cols}}

            def put(cid, **kw):
                out["clip_id"].append(cid)
                for c in cols:
                    out[c].append(kw.get(c))

            for cid, blob in zip(pdf["clip_id"], pdf[bytes_col]):
                if blob is None:
                    put(cid, ok=False, message="no payload")
                    continue
                b = bytes(blob)
                bom = b.startswith(b"\xef\xbb\xbf")
                body = b[3:] if bom else b
                nonascii = sum(1 for x in b if x >= 0x80)
                try:
                    text = body.decode("utf-8", "strict")
                except UnicodeDecodeError as e:
                    put(cid, ok=True, utf8_valid=False,
                        has_bom=bom, n_bytes=len(b),
                        n_nonascii_bytes=nonascii,
                        invalid_at=e.start + (3 if bom else 0))
                    continue
                put(cid, ok=True, utf8_valid=True, has_bom=bom,
                    n_bytes=len(b), n_nonascii_bytes=nonascii,
                    n_chars=len(text),
                    n_replacement_chars=text.count("�"))
            res = pd.DataFrame(out)
            for c, t in int_cols.items():
                res[c] = pd.array(res[c], dtype=t)
            for c in ("ok", "utf8_valid", "has_bom"):
                res[c] = pd.array(res[c], dtype="boolean")
            yield res

    return src.mapInPandas(work, schema=ENCODING_SCHEMA)
