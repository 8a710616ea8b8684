"""Product-quantization ANN (operators/similarity.py pq_*).

The compressed-domain third ANN path (next to LSH and IVF): codebook
training is deterministic and guarded, identical vectors encode to
identical codes (the planted-oracle invariant), ADC + exact rescore
recovers planted twins at rank 1 with cosine exactly 1.0, recall on
NON-planted random embeddings is measured against the exact baseline,
and the scan stage is one narrow Arrow pass whose plan never reads
the float vectors.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


@pytest.fixture(scope="module")
def books(emb):
    return SIM.pq_train(emb, m=8, n_codes=64, seed=11)


def test_pq_train_shape_and_determinism(emb, books) -> None:
    assert books.shape == (8, 64, 8)
    again = SIM.pq_train(emb, m=8, n_codes=64, seed=11)
    assert np.array_equal(books, again)
    other = SIM.pq_train(emb, m=8, n_codes=64, seed=12)
    assert not np.array_equal(books, other)


def test_pq_train_guards(emb) -> None:
    with pytest.raises(ValueError, match="divisible"):
        SIM.pq_train(emb, m=7, n_codes=16)
    with pytest.raises(ValueError, match="smaller than n_codes"):
        SIM.pq_train(emb.limit(10), n_codes=64)
    with pytest.raises(ValueError, match="n_codes"):
        SIM.pq_train(emb, n_codes=257)


def test_pq_encode_codes_and_twins(spark, emb, books) -> None:
    codes = SIM.pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r["code"]) == 8 for r in rows)
    # identical vector under a new id → identical code bytes
    twin = emb.where("vec_id = 3").select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding")
    both = {r["vec_id"]: bytes(r["code"])
            for r in SIM.pq_encode(
                emb.select("vec_id", "embedding").unionByName(twin),
                books).collect()}
    assert both[3] == both[9003]


def test_pq_encode_narrow_plan(spark, emb, books, tmp_path) -> None:
    """The encode stage is ONE MapInPandas with no Exchange, and the
    ADC scan stage reads ONLY the (id, code) columns — the parquet
    scan of the code frame must not touch the embedding column."""
    path = str(tmp_path / "emb")
    emb.write.mode("overwrite").parquet(path)
    src = spark.read.parquet(path)
    codes = SIM.pq_encode(src, books)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan
    # persist codes, then score: the scan must prune to id+code
    cpath = str(tmp_path / "codes")
    codes.write.mode("overwrite").parquet(cpath)
    stored = spark.read.parquet(cpath)
    qs = emb.where("vec_id < 3")
    adc = SIM.pq_topk(stored, books, qs, k=3, rescore_n=8)
    aplan = adc._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in aplan.split("FileScan")[1][:400]


def test_pq_topk_planted_twin_rank1(spark, emb, books) -> None:
    planted = emb.where("vec_id < 5").selectExpr(
        "vec_id + 5000 AS vec_id", "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    pbooks = SIM.pq_train(corpus, m=8, n_codes=64, seed=11)
    codes = SIM.pq_encode(corpus, pbooks)
    qs = emb.where("vec_id < 5").select("vec_id", "embedding")
    top1 = SIM.pq_topk(codes, pbooks, qs, k=1,
                       corpus=corpus, rescore_n=16).collect()
    assert len(top1) == 5
    for r in top1:
        assert r["neighbor_id"] == r["query_id"] + 5000
        assert r["cosine"] == 1.0


def test_pq_adc_only_mode(spark, emb, books) -> None:
    codes = SIM.pq_encode(emb, books)
    qs = emb.where("vec_id < 3")
    adc = SIM.pq_topk(codes, books, qs, k=3, rescore_n=8)
    rows = adc.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        adcs = [r["adc"] for r in rs]
        assert adcs == sorted(adcs, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_pq_recall_vs_exact(spark, emb, books) -> None:
    """Measured recall on random 64-dim embeddings (worst case —
    near-orthogonal neighbors). With rescore_n ≫ k the ADC top set
    need only CONTAIN the true neighbors; rescoring fixes the order.
    Floor pinned so codebook/scoring regressions surface."""
    codes = SIM.pq_encode(emb, books)
    qs = emb.where("vec_id < 20")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in SIM.cosine_topk(emb, qs, k=5).collect()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in SIM.pq_topk(codes, books, qs, k=5,
                                corpus=emb, rescore_n=64).collect()}
    assert len(got & exact) / len(exact) >= 0.6


def test_pq_topk_guards_and_edges(spark, emb, books) -> None:
    codes = SIM.pq_encode(emb, books)
    with pytest.raises(ValueError, match="rescore_n"):
        SIM.pq_topk(codes, books, emb.limit(1), k=5, rescore_n=2)
    with pytest.raises(ValueError, match="max_queries"):
        SIM.pq_topk(codes, books, emb, k=1, max_queries=10)
    none = SIM.pq_topk(codes, books, emb.where("vec_id < 0"), k=3)
    assert none.count() == 0
    assert none.columns == ["query_id", "neighbor_id", "rank", "adc"]


def test_pq_encode_keep_cols(spark, emb, books) -> None:
    """keep_cols passes the IVF list_id through so the code table
    can be written partitioned by list at rest."""
    assigned, cents = SIM.ivf_index(emb, n_lists=8, seed=11)
    codes = SIM.pq_encode(assigned, books, keep_cols=("list_id",))
    assert codes.columns == ["vec_id", "list_id", "code"]
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r["list_id"] < 8 and len(r["code"]) == 8
               for r in rows)


def test_ivf_pq_planted_twin_rank1(spark, emb) -> None:
    """The full IVFADC composition inherits BOTH planted invariants:
    the twin's list is the query's first probe (shared assignment
    math) and identical vectors share codes, so even nprobe=1 with a
    small rescore recovers the twin at rank 1, cosine exactly 1.0."""
    planted = emb.where("vec_id < 5").selectExpr(
        "vec_id + 5000 AS vec_id", "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    assigned, cents = SIM.ivf_index(corpus, n_lists=8, seed=11)
    books = SIM.pq_train(corpus, m=8, n_codes=64, seed=11)
    codes = SIM.pq_encode(assigned, books, keep_cols=("list_id",))
    qs = emb.where("vec_id < 5").select("vec_id", "embedding")
    top1 = SIM.ivf_pq_topk(codes, cents, books, qs, k=1, nprobe=1,
                           corpus=corpus, rescore_n=16).collect()
    assert len(top1) == 5
    for r in top1:
        assert r["neighbor_id"] == r["query_id"] + 5000
        assert r["cosine"] == 1.0


def test_ivf_pq_all_lists_equals_pq(spark, emb, books) -> None:
    """nprobe = n_lists scans every list: IVFADC must return exactly
    the plain-PQ result (the pruning is lossless when nothing is
    pruned)."""
    assigned, cents = SIM.ivf_index(emb, n_lists=8, seed=11)
    codes = SIM.pq_encode(assigned, books, keep_cols=("list_id",))
    qs = emb.where("vec_id < 10")
    full = SIM.ivf_pq_topk(codes, cents, books, qs, k=3, nprobe=8,
                           corpus=emb, rescore_n=32)
    plain = SIM.pq_topk(codes.drop("list_id"), books, qs, k=3,
                        corpus=emb, rescore_n=32)
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_ivf_pq_probe_prunes_scan(spark, emb, books) -> None:
    """With nprobe=1 each query scores only its probed list — the
    candidate pool per query is bounded by that list's size."""
    assigned, cents = SIM.ivf_index(emb, n_lists=8, seed=11)
    codes = SIM.pq_encode(assigned, books, keep_cols=("list_id",))
    sizes = {r["list_id"]: r["n"] for r in
             assigned.groupBy("list_id").count()
             .withColumnRenamed("count", "n").collect()}
    qs = emb.where("vec_id < 5")
    adc = SIM.ivf_pq_topk(codes, cents, books, qs, k=500, nprobe=1,
                          rescore_n=500)
    per_q = {r["query_id"]: 0 for r in adc.collect()}
    for r in adc.collect():
        per_q[r["query_id"]] += 1
    assert all(n <= max(sizes.values()) for n in per_q.values())


def test_tune_rescore_n(spark, emb, books) -> None:
    codes = SIM.pq_encode(emb, books)
    qs = emb.where("vec_id < 10")
    n, recall = SIM.tune_rescore_n(
        codes, books, qs, emb, target_recall=0.5, k=5, start=8)
    assert recall >= 0.5 and n >= 8
    # unreachable target: terminates at the cap with honest recall
    n2, r2 = SIM.tune_rescore_n(
        codes, books, qs, emb, target_recall=1.0, k=5,
        start=8, max_rescore=16)
    assert n2 == 16 and 0.0 <= r2 <= 1.0
    with pytest.raises(ValueError, match="target_recall"):
        SIM.tune_rescore_n(codes, books, qs, emb, target_recall=1.5)


def test_pq_string_ids(spark, emb, books) -> None:
    """Code frames keep the caller's id dtype end-to-end."""
    semb = emb.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        "embedding")
    codes = SIM.pq_encode(semb, books)
    assert dict(codes.dtypes)["vec_id"] == "string"
    qs = semb.where("vec_id in ('doc-0', 'doc-1')")
    rows = SIM.pq_topk(codes, books, qs, k=3,
                       corpus=semb, rescore_n=8).collect()
    assert rows and all(r["query_id"].startswith("doc-") for r in rows)


def test_pq_adc_error_bound_property(books) -> None:
    """ADC is exact up to quantization: for ANY query q and vector x,
    |<q_norm, reconstruct(code(x))> - <q_norm, x_norm>| is bounded
    per-subspace by Cauchy-Schwarz: Σ_sub ‖q_sub‖·‖x_sub - c_sub‖.
    Pure numpy — pins the scoring algebra independent of Spark."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    m, n_codes, dsub = books.shape

    @settings(max_examples=50, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def check(seed: int) -> None:
        rng = np.random.RandomState(seed)
        q = rng.standard_normal(m * dsub)
        x = rng.standard_normal(m * dsub)
        q /= np.linalg.norm(q)
        x /= np.linalg.norm(x)
        code = np.empty(m, dtype=np.uint8)
        recon = np.empty_like(x)
        bound = 0.0
        for sub in range(m):
            xs = x[sub * dsub:(sub + 1) * dsub]
            qs = q[sub * dsub:(sub + 1) * dsub]
            d2 = ((books[sub] - xs) ** 2).sum(axis=1)
            code[sub] = d2.argmin()
            recon[sub * dsub:(sub + 1) * dsub] = books[sub][code[sub]]
            bound += np.linalg.norm(qs) * np.sqrt(d2.min())
        # the LUT-sum IS <q, recon> (same decomposition)
        lut_sum = sum(
            q[s * dsub:(s + 1) * dsub] @ books[s][code[s]]
            for s in range(m))
        assert abs(lut_sum - q @ recon) < 1e-9
        assert abs(lut_sum - q @ x) <= bound + 1e-9

    check()


def test_pq_encode_with_error_staleness_signal(spark, emb, books) -> None:
    """pq_err is the codebook-staleness monitor: (a) it matches a
    numpy recomputation exactly in shape and closely in value, (b)
    codebook-representable vectors have ~zero error, (c) a drifted
    batch (vectors scaled per-dim — a distribution the sample never
    saw) has strictly higher median error than the training data."""
    rows = SIM.pq_encode(emb, books, with_error=True).collect()
    assert all(r["pq_err"] >= 0.0 for r in rows)
    # (a) spot-recompute one row
    r0 = [r for r in rows if r["vec_id"] == 0][0]
    base = {r["vec_id"]: list(r["embedding"])
            for r in emb.select("vec_id", "embedding").collect()}
    x = np.asarray(base[0], dtype=np.float64)
    x /= np.linalg.norm(x)
    want = 0.0
    for sub in range(8):
        xs = x[sub * 8:(sub + 1) * 8]
        want += ((books[sub] - xs) ** 2).sum(axis=1).min()
    assert abs(r0["pq_err"] - want) < 1e-9
    # (b) vectors BUILT from codebook entries reconstruct ~exactly
    synth = np.concatenate([books[s][s % books.shape[1]]
                            for s in range(8)])
    synth_df = spark.createDataFrame(
        [(1, [float(v) for v in synth])],
        "vec_id long, embedding array<double>")
    e = SIM.pq_encode(synth_df, books, with_error=True).collect()[0]
    # the synth vector is unit-normalized before encoding, which
    # moves every subvector off its entry (the concat's norm is not
    # 1) — but it stays several times closer than real vectors get
    assert e["pq_err"] < np.median([r["pq_err"] for r in rows]) / 5
    # (c) drifted batch: median error strictly above training data
    drifted = emb.select("vec_id", F.expr(
        "transform(embedding, (x, i) -> cast(x as double) *"
        " CASE WHEN i % 2 = 0 THEN 3.0D ELSE 0.25D END)"
    ).alias("embedding"))
    derr = [r["pq_err"] for r in
            SIM.pq_encode(drifted, books, with_error=True).collect()]
    terr = [r["pq_err"] for r in rows]
    assert np.median(derr) > np.median(terr)
