"""URL featurization (operators/url.py): regexp extraction edge
cases, DuckDB twin parity on the shared patterns, the naive-domain
contract, domain_mix arithmetic and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.url import (
    HOST_RE,
    PATH_RE,
    QUERY_RE,
    SCHEME_RE,
    domain_mix,
    url_features,
)

_URLS = [
    (1, "https://www.example.com/a/b/c?x=1&y=2"),
    (2, "http://sub.deep.example.co.uk/p"),
    (3, "https://user:pw@host.org:8443/x/?q=1#frag"),
    (4, "ftp://files.example.net"),
    (5, "https://example.com"),
    (6, "not a url at all"),
    (7, None),
    (8, "https://EXAMPLE.COM/UPPER/path//double?a&b&c"),
]


def _frame(spark):
    return spark.createDataFrame(_URLS, "doc_id long, url string")


def test_features(spark) -> None:
    got = {r["doc_id"]: r for r in
           _frame(spark).select("doc_id",
                                *url_features("url")).collect()}
    assert got[1]["scheme"] == "https"
    assert got[1]["host"] == "www.example.com"
    assert got[1]["domain"] == "example.com"
    assert got[1]["path_depth"] == 3
    assert got[1]["n_params"] == 2
    # naive last-two-labels: co.uk is the documented limitation
    assert got[2]["domain"] == "example.co.uk"[-5:] \
        or got[2]["domain"] == "co.uk"
    assert got[2]["domain"] == "co.uk"
    assert got[3]["host"] == "host.org"       # userinfo + port cut
    assert got[3]["n_params"] == 1            # fragment excluded
    assert got[4]["host"] == "files.example.net"
    assert got[4]["path_depth"] == 0
    assert got[5]["path_depth"] == 0 and got[5]["n_params"] == 0
    assert got[6]["scheme"] == "" and got[6]["host"] == ""
    assert got[6]["domain"] == ""
    assert got[7]["scheme"] is None
    assert got[8]["host"] == "example.com"    # lowercased
    assert got[8]["path_depth"] == 3          # '//' collapses
    assert got[8]["n_params"] == 3            # bare params count


def test_duckdb_twin(spark) -> None:
    got = sorted(
        tuple(r) for r in _frame(spark)
        .where(F.col("url").isNotNull())
        .select("doc_id", *url_features("url")).collect()
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE t (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [u for u in _URLS if u[1] is not None])
    want = sorted(tuple(r) for r in con.sql(f"""
        WITH f AS (
          SELECT doc_id,
                 regexp_extract(url, '{SCHEME_RE}', 1) AS scheme,
                 lower(regexp_extract(url, '{HOST_RE}', 1)) AS host,
                 regexp_extract(url, '{PATH_RE}', 1) AS path,
                 regexp_extract(url, '{QUERY_RE}', 1) AS q
          FROM t
        )
        SELECT doc_id, scheme, host,
               CASE WHEN len(string_split(host, '.')) >= 2
                    THEN concat(string_split(host, '.')[-2], '.',
                                string_split(host, '.')[-1])
                    ELSE host END AS domain,
               CAST(len(list_filter(string_split(path, '/'),
                                    x -> x != '')) AS INTEGER)
                 AS path_depth,
               CAST(CASE WHEN q = '' THEN 0
                    ELSE len(string_split(q, '&')) END AS INTEGER)
                 AS n_params
        FROM f
    """).fetchall())
    assert got == want


def test_domain_mix(spark) -> None:
    rows = [(i, f"https://site{i % 3}.example{i % 2}.com/p{i}")
            for i in range(60)] + [(100, None), (101, "junk")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["domain"]: r for r in domain_mix(df).collect()}
    # 60 parseable over 2 registered domains + 2 unparseable → ''
    assert got["example0.com"]["n_pages"] == 30
    assert got["example1.com"]["n_pages"] == 30
    assert got[""]["n_pages"] == 2
    assert got["example0.com"]["share"] == pytest.approx(30 / 62)
    assert sum(r["n_pages"] for r in got.values()) == 62
    with pytest.raises(ValueError, match="min_pages"):
        domain_mix(df, min_pages=0)
    assert set(domain_mix(df, min_pages=3).toPandas()["domain"]) \
        == {"example0.com", "example1.com"}


def test_plans(spark, tmp_path) -> None:
    p = str(tmp_path / "urls.parquet")
    _frame(spark).write.mode("overwrite").parquet(p)
    src = spark.read.parquet(p)
    feat = src.select("doc_id", *url_features("url"))
    plan = feat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    mix = domain_mix(src)
    plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
