"""Embedding similarity search: exact baseline + LSH scale path.

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query
  set (queries ≪ corpus), one narrow pass computing dot products
  JVM-side (``zip_with``/``aggregate`` in double), per-query top-k via
  window. Cost O(|corpus|·|queries|·dim) but embarrassingly parallel
  and shuffle-light (only the tiny per-query top-k moves).
- :func:`rh_signatures` — random-hyperplane (SimHash-for-cosine)
  bit signatures via a vectorized pandas UDF (one numpy matmul per
  Arrow batch; the hyperplane matrix is regenerated per-executor from
  the seed, never shipped).
- :func:`ann_topk_lsh` — candidates = corpus rows sharing the
  query's bucket in ≥ 1 band, exact cosine re-rank on candidates
  only. Approximate (recall measured in tests vs the exact baseline).
- :func:`embedding_near_duplicates` — near-dup pairs by cosine ≥
  threshold among bucket-colliding pairs.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.shipping import PKG_PARENT


def _cosine_expr(a: str, b: str) -> str:
    """Spark-SQL cosine similarity between two float-array columns,
    computed entirely in double (sequential left-fold — matches the
    DuckDB oracle's evaluation order)."""
    dot = (f"aggregate(zip_with({a}, {b},"
           " (x, y) -> cast(x as double) * cast(y as double)),"
           " 0D, (acc, v) -> acc + v)")
    na = (f"sqrt(aggregate({a}, 0D,"
          " (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    nb = (f"sqrt(aggregate({b}, 0D,"
          " (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    return f"({dot}) / (({na}) * ({nb}))"


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for every query row:
    (query_id, neighbor_id, rank, cosine). Self-matches excluded.
    Deterministic tie-break: higher cosine first, then lower id."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.expr(_cosine_expr("cvec", "qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round(F.col("cosine"), 6).alias("cosine"))
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_bits)).astype(np.float64)


def rh_signatures(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    seed: int = 7,
) -> DataFrame:
    """(``id_col``, sig): random-hyperplane signature, one numpy
    matmul per Arrow batch. Narrow stage, no shuffle. The id column
    keeps its caller-facing name AND dtype (the mapInPandas output
    schema is derived from ``df.schema[id_col]``, so string/int/long
    ids all work)."""
    src = df.select(F.col(id_col), F.col(vec_col))
    id_dtype = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_dtype, True),
        T.StructField("sig", T.LongType(), True),
    ])
    pkg_parent = PKG_PARENT

    def compute(batches):
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        import numpy as np
        import pandas as pd

        planes = None
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if planes is None:
                from cerberus_cpp_spark.operators.similarity import (
                    _hyperplanes,
                )

                planes = _hyperplanes(mat.shape[1], n_bits, seed)
            bits = (mat @ planes) > 0
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "sig": (bits @ weights).astype("int64"),
            })

    return src.mapInPandas(compute, schema=out_schema)


def _band_key(sig_col: str, band: int, band_bits: int):
    mask = ((1 << band_bits) - 1) << (band * band_bits)
    return (F.col(sig_col).bitwiseAND(F.lit(mask)))


def _banded(df: DataFrame, sig_col: str, n_bits: int, band_bits: int):
    """Explode a signature into (band, bkey) rows — all bands in one
    relation so downstream candidate generation is ONE join (the
    per-band loop version compiled to n_bands separate shuffles)."""
    n_bands = n_bits // band_bits
    keys = [_band_key(sig_col, b, band_bits) for b in range(n_bands)]
    return df.select(
        "*", F.posexplode(F.array(*keys)).alias("band", "bkey")
    ).drop(sig_col)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 32,
    band_bits: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: LSH band collision → exact cosine re-rank
    of candidates only. Output schema matches :func:`cosine_topk`.
    Recall < 1 by construction; measured presets on sf0.1 random
    embeddings (worst case — near-orthogonal neighbors; clustered
    real embeddings recall higher), recall@5 vs the exact baseline:
    (16,4)=0.45 (32,4)=0.73 (60,4)=0.92; 8-bit bands collapse recall
    (0.05-0.11) — see BENCH.md §5."""
    n_bands = n_bits // band_bits
    csig = rh_signatures(corpus, id_col=id_col, vec_col=vec_col,
                         n_bits=n_bits, seed=seed)
    qsig = rh_signatures(queries, id_col=id_col, vec_col=vec_col,
                         n_bits=n_bits, seed=seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec")) \
        .join(csig.select(F.col(id_col).alias("neighbor_id"), "sig"),
              on="neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")) \
        .join(qsig.select(F.col(id_col).alias("query_id"),
                          F.col("sig").alias("qsig")),
              on="query_id")
    cb = _banded(c, "sig", n_bits, band_bits)
    qb = _banded(q.withColumnRenamed("qsig", "sig"), "sig",
                 n_bits, band_bits)
    cand = cb.join(F.broadcast(qb), on=["band", "bkey"])
    cand = (
        cand.where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cvec", "qvec")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.expr(_cosine_expr("cvec", "qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round(F.col("cosine"), 6).alias("cosine"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 32,
    band_bits: int = 4,
    seed: int = 7,
    exact: bool = False,
    exact_max_rows: int = 200_000,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold.

    ``exact=True``: all-pairs (only for tests / small slices).
    Default: LSH-bucketed candidates (complete only for pairs whose
    signatures collide in ≥ 1 band — at cosine ≥ 0.95 collision
    probability per 4-bit band is ≈ (1 - 0.102)^4 ≈ 0.65, over 4
    bands ≈ 0.985)."""
    base = df.select(F.col(id_col).alias("vid"),
                     F.col(vec_col).alias("vec"))
    if exact:
        return _exact_near_duplicates_blas(
            base, threshold, max_rows=exact_max_rows
        )
    else:
        sig = rh_signatures(df, id_col=id_col, vec_col=vec_col,
                            n_bits=n_bits, seed=seed)
        wsig = base.join(
            sig.select(F.col(id_col).alias("vid"), "sig"), on="vid"
        )
        banded = _banded(wsig, "sig", n_bits, band_bits)
        a = banded.alias("a")
        b = banded.alias("b")
        pairs = (
            a.join(b, on=["band", "bkey"])
            .where(F.col("a.vid") < F.col("b.vid"))
            .select(F.col("a.vid").alias("id_a"),
                    F.col("b.vid").alias("id_b"),
                    F.col("a.vec").alias("vec_a"),
                    F.col("b.vec").alias("vec_b"))
        )
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return (
        pairs.withColumn("cosine",
                         F.expr(_cosine_expr("vec_a", "vec_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b",
                F.round(F.col("cosine"), 6).alias("cosine"))
    )


def _exact_near_duplicates_blas(base: DataFrame,
                                threshold: float,
                                max_rows: int = 200_000) -> DataFrame:
    """Exact all-pairs cosine via broadcast matrix + one BLAS matmul
    per Arrow batch. The interpreted-HOF crossJoin version took 59s
    for 5000 vectors (12.5M pairs through CodegenFallback folds);
    this runs the identical math in C (~0.1s). Only for corpora whose
    (id, vector) set fits in a broadcast (the LSH path is the scale
    route; at 1e9 vectors all-pairs is off the table regardless).

    The driver ``collect()`` is size-GUARDED: a corpus above
    ``max_rows`` raises before any collect instead of OOMing the
    driver — callers at scale must use the LSH route
    (``exact=False``)."""
    spark = base.sparkSession
    # limit(max_rows+1) enforces the guard in the SAME job as the
    # collect — a separate count() ran the full upstream plan twice
    # and an unguarded collect could OOM the driver first
    rows = base.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"exact near-duplicate mode collects the corpus to the "
            f"driver and is bounded at {max_rows} rows; got more. Use "
            f"exact=False (the LSH-bucketed scale path) or raise "
            f"exact_max_rows explicitly."
        )
    import numpy as np

    if not rows:
        return spark.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    ids = np.array([r["vid"] for r in rows], dtype=np.int64)
    mat = np.array([list(r["vec"]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, unit))

    src = base.select("vid")

    def work(batches):
        import numpy as np
        import pandas as pd

        all_ids, all_unit = bc.value
        pos = {int(v): i for i, v in enumerate(all_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx = np.array([pos[int(v)] for v in pdf["vid"]])
            sims = all_unit[idx] @ all_unit.T   # batch × N
            out_a, out_b, out_s = [], [], []
            for row_i, vid in zip(range(len(idx)), pdf["vid"]):
                mask = (sims[row_i] >= threshold) & (all_ids > int(vid))
                hit = np.nonzero(mask)[0]
                out_a.extend([int(vid)] * len(hit))
                out_b.extend(all_ids[hit].tolist())
                out_s.extend(np.round(sims[row_i][hit], 6).tolist())
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cosine": out_s}
            )

    return src.mapInPandas(
        work, schema="id_a long, id_b long, cosine double"
    )
