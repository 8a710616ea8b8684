"""Driver-contract simulation: every queries() entry vs its DuckDB
oracle (multiset compare of rows, column names, and values) — the
same check the round driver performs at sf=0.01 (tests use sf0.001
for speed; CI-of-record is the driver run).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            c.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return c


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _sort_key(row: tuple):
    # NULLs first, then by type name, then value — total order even
    # for mixed None/str/number cells
    return tuple(
        (v is not None, type(v).__name__, v if v is not None else 0)
        for v in row
    )


def _rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for r in df.collect() if hasattr(df, "collect") else df.itertuples():
        d = r.asDict() if hasattr(r, "asDict") else r._asdict()
        out.append(tuple(_norm(d[c]) for c in cols))
    return sorted(out, key=_sort_key)


def _duck_rows(con, sql: str) -> list[tuple]:
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(_norm(row[i]) for i in order) for row in rel.fetchall()]
    return sorted(data, key=_sort_key), sorted(cols)


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_matches_oracle(name, spark, con) -> None:
    q = E.queries()[name]
    sdf = q(spark, SF_DIR)
    oracle = E.oracle_sql().get(name)
    if oracle is None:
        assert sdf.count() >= 0  # weaker rows-only check
        return
    got = _rows(sdf)
    want, want_cols = _duck_rows(con, oracle)
    assert sorted(sdf.columns) == want_cols, (
        f"{name}: columns {sorted(sdf.columns)} != {want_cols}"
    )
    assert got == want, (
        f"{name}: {len(got)} spark rows vs {len(want)} oracle rows;"
        f" first diff: {next((a, b) for a, b in zip(got, want) if a != b) if got and want else (got[:3], want[:3])}"
    )


def test_entry_smoke(spark) -> None:
    df = E.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"o_orderkey", "path", "message"}


def test_every_query_has_oracle_or_reason() -> None:
    """Every contract query is oracle-checked — including the two
    LSH queries (deterministic-arithmetic / planted-truth oracles)."""
    missing = set(E.queries()) - set(E.oracle_sql())
    assert missing == set(), f"queries without oracle: {missing}"
