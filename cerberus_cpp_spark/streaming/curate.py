"""Streaming curation — the streaming twin of
``operators.text.curate_documents`` WITH dedup (round-4 verdict task
#7; the batch twin was previously pinned stream==batch only at
``dedup=False``).

Every verdict except ``duplicate`` is a stateless projection that
streams unchanged (the existing pin). The duplicate verdict needs
memory of fingerprints across rows, which a streaming window cannot
express — so it runs as a custom stateful operator
(``applyInPandasWithState``, the ``streaming/dedup.py`` /
``streaming/hotkeys.py`` pattern): state = one occurrence counter per
md5 fingerprint.

Survivor semantics: the batch pass keeps the LOWEST id of each
duplicate group; the stream keeps the lowest id of the FIRST
micro-batch that carries the fingerprint and marks every later
arrival ``duplicate`` (within one micro-batch the group is sorted by
id, so a single-batch replay of a static corpus equals the batch
verdict exactly — the stream==batch pin in tests). With ``ts_col``
set, fingerprint state expires on an event-time timeout
``state_ttl_ms`` past the group's newest event (bounded state at
10^12 scale — the same watermark trade the reference-free streaming
dedup makes: a duplicate arriving after the horizon counts as fresh).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.text import curate_documents


def curate_documents_stream(
    stream_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    state_ttl_ms: int = 3_600_000,
    **curate_kwargs,
) -> DataFrame:
    """The full curation verdict — including the ``duplicate`` reason
    — over a streaming frame. Output: every source column plus the
    batch twin's verdict columns (``full_rows=True`` shape) and the
    ``fingerprint`` the state is keyed on.

    ``curate_kwargs`` pass through to :func:`curate_documents`
    (thresholds, langs, pii_kinds). ``ts_col`` (an event-time
    timestamp column) enables watermarking + state expiry; without it
    state is unbounded (NoTimeout — fine for bounded replays, not for
    10^12-row live ingest)."""
    for k in ("dedup", "full_rows", "keep_fingerprint"):
        if k in curate_kwargs:
            raise ValueError(f"{k} is fixed by the streaming twin")
    base = curate_documents(
        stream_df, id_col=id_col, text_col=text_col,
        dedup=False, full_rows=True, keep_fingerprint=True,
        **curate_kwargs)
    if ts_col is not None:
        if ts_col not in stream_df.columns:
            raise ValueError(f"ts_col {ts_col!r} not in frame")
        base = base.withWatermark(ts_col, watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    out_schema = T.StructType(list(base.schema.fields))
    out_cols = [f.name for f in out_schema.fields]
    ttl = int(state_ttl_ms)
    use_ts = ts_col

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        count = state.get[0] if state.exists else 0
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((count,))
            return
        pdf = (pd.concat(chunks, ignore_index=True)
               if len(chunks) > 1 else chunks[0])
        # lowest id first within the micro-batch: a single-batch
        # replay of a static corpus reproduces the batch survivor
        pdf = pdf.sort_values(id_col, kind="stable") \
            .reset_index(drop=True)
        occurrence = count + np.arange(1, len(pdf) + 1)
        dup = occurrence > 1
        r = pdf["reasons"].fillna("").to_numpy(dtype=object)
        pdf["reasons"] = np.where(
            dup,
            np.where(r == "", "duplicate", r + ",duplicate"),
            r)
        pdf["keep"] = pdf["reasons"] == ""
        state.update((count + len(pdf),))
        if use_ts is not None:
            newest = pdf[use_ts].max()
            state.setTimeoutTimestamp(
                int(pd.Timestamp(newest).value // 10**6) + ttl)
        yield pdf[out_cols]

    return base.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="count long",
        outputMode="append",
        timeoutConf=timeout,
    )
