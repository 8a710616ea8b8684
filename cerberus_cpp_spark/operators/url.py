"""URL featurization for crawl curation: scheme/host/domain/path
features as pure JVM regexp columns (one codegen projection, zero
Python, zero shuffle) and the domain-mix aggregate a data-mixing
plan consumes (``split.mixture_sample`` takes target shares; THIS
is where a crawl's achievable per-domain shares come from — C4,
RefinedWeb and Dolma all curate by registered domain before any
content filter runs).

Portability rules (module contract, same as ``operators/text``):
every expression is RE2-safe (no backrefs/lookaround) and replayed
verbatim by the DuckDB oracle. ``registered_domain`` is the NAIVE
last-two-labels rule, deliberately: the real Public Suffix List is
a mutable external artifact (co.uk vs com), so this module trades
eTLD+1 exactness for a deterministic, dependency-free, oracle-exact
rule and says so — swap in a PSL lookup via a broadcast map column
when the deployment ships one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: RE2-portable pieces shared verbatim with the oracle
SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
HOST_RE = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"
PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = "\\?([^#]*)"


def url_scheme(col: str = "url") -> Column:
    return F.regexp_extract(F.col(col), SCHEME_RE, 1) \
        .alias("scheme")


def url_host(col: str = "url") -> Column:
    """Hostname with userinfo and port stripped, lowercased."""
    return F.lower(F.regexp_extract(F.col(col), HOST_RE, 1)) \
        .alias("host")


def registered_domain(col: str = "url") -> Column:
    """Naive registered domain: the last two dot-labels of the host
    (see module docstring for the deliberate no-PSL contract)."""
    host = F.lower(F.regexp_extract(F.col(col), HOST_RE, 1))
    parts = F.split(host, "\\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2),
                    F.element_at(parts, -1)),
    ).otherwise(host).alias("domain")


def url_path_depth(col: str = "url") -> Column:
    """Number of non-empty path segments."""
    path = F.regexp_extract(F.col(col), PATH_RE, 1)
    return F.size(F.filter(F.split(path, "/"),
                           lambda x: x != "")).alias("path_depth")


def url_n_params(col: str = "url") -> Column:
    """Number of &-separated query parameters (0 when no query)."""
    q = F.regexp_extract(F.col(col), QUERY_RE, 1)
    return F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(q, "&"))).alias("n_params")


def url_features(col: str = "url") -> list[Column]:
    """The full feature family, one codegen projection."""
    return [url_scheme(col), url_host(col), registered_domain(col),
            url_path_depth(col), url_n_params(col)]


def domain_mix(
    df: DataFrame,
    *,
    url_col: str = "url",
    min_pages: int = 1,
) -> DataFrame:
    """Per-registered-domain page counts and corpus share —
    the achievable-share report a domain-curation plan feeds into
    :func:`~cerberus_cpp_spark.operators.split.mixture_sample`
    (group col = ``domain``). NULL/unparseable URLs aggregate under
    domain '' so the report always accounts for every row.

    Scale shape: one scan, one hash aggregate with map-side partial
    aggregation (the Exchange ships O(domains), not O(pages)); the
    share denominator reuses the same aggregate via a window over
    the REDUCED frame (O(domains) rows — no second scan)."""
    if min_pages < 1:
        raise ValueError("min_pages must be >= 1")
    from pyspark.sql import Window

    counts = (
        df.select(F.coalesce(registered_domain(url_col),
                             F.lit("")).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    total = F.sum("n_pages").over(Window.partitionBy())
    return (
        counts.withColumn("share", F.col("n_pages") / total)
        .where(F.col("n_pages") >= min_pages)
    )
