"""Streaming deduplication — the streaming face of the dedup family.

Two modes over a streaming frame of documents/images:

- :func:`dedup_exact_stream`: drop duplicate fingerprints within an
  event-time watermark (bounded state — Spark evicts fingerprint
  state older than the watermark; without the watermark bound state
  grows without limit at 10^12 scale).
- :func:`flag_duplicates_stateful`: keep every row but mark repeats,
  via ``applyInPandasWithState`` (custom stateful operator — the
  pattern for operators Structured Streaming lacks natively).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.text import fingerprint_md5


def dedup_exact_stream(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each normalized-text fingerprint within
    the watermark horizon; later duplicates are dropped. State is
    bounded by the watermark."""
    return (
        stream_df.withColumn("fingerprint", fingerprint_md5(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


FLAG_SCHEMA = (
    "doc_id long, fingerprint string, seen_before boolean, "
    "occurrence int"
)
STATE_SCHEMA = "count int"


def flag_duplicates_stateful(
    stream_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mark every row with whether its fingerprint was seen in any
    earlier micro-batch (and its occurrence number) — the
    keep-and-annotate variant of streaming dedup, implemented as a
    custom stateful operator (``applyInPandasWithState``): state =
    one int per fingerprint group."""
    keyed = stream_df.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_md5(text_col),
    )

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (fingerprint,) = key
        count = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            for doc_id in pdf["doc_id"]:
                count += 1
                out.append((int(doc_id), fingerprint, count > 1, count))
        state.update((count,))
        yield pd.DataFrame(
            out,
            columns=["doc_id", "fingerprint", "seen_before",
                     "occurrence"],
        )

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=FLAG_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
