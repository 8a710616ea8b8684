"""Round-3 regression pins: single-pass t-digest drift, shared
fan-out gate, count-free IVF sizing, nprobe autotune, and the two
decode-hygiene ADVICE findings (zero-dim phash, per-clip AVI skip)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators import checks
from cerberus_cpp_spark.operators import similarity as SIM
from cerberus_cpp_spark.operators.dedup import simhash
from cerberus_cpp_spark.operators.partitioning import fanout_gate
from cerberus_cpp_spark.operators.text import text_profile


# ---------------------------------------------------------------------------
# t-digest: single-pass pair + deterministic batch-tie merge order
# ---------------------------------------------------------------------------


def test_tdigest_pair_matches_two_single_digests(spark):
    """tdigest_pair (ONE scan) must equal two tdigest_of jobs in the
    exact regime, where results are order-independent."""
    df = spark.range(0, 60_000, 1, 8).selectExpr(
        "cast(id % 2 as long) as side",
        "cast(pmod(id, 31) as double) as v",
    )
    da, db = checks.tdigest_pair(df, "side", "v", compression=200)
    ra = checks.tdigest_of(df.where("side = 0"), "v", compression=200)
    rb = checks.tdigest_of(df.where("side = 1"), "v", compression=200)
    assert np.array_equal(da.means, ra.means)
    assert np.array_equal(da.weights, ra.weights)
    assert np.array_equal(db.means, rb.means)
    assert np.array_equal(db.weights, rb.weights)


def test_tdigest_drift_tagged_matches_two_frame_api(spark):
    base = spark.range(0, 80_000, 1, 8).selectExpr(
        "id",
        "cast(pmod(id * 48271, 9973) as double) as v",
    )
    two = checks.tdigest_drift(
        base.where("id % 2 = 0"), base.where("id % 2 = 1"),
        "v", compression=100)
    one = checks.tdigest_drift_tagged(
        base.selectExpr("cast(id % 2 as long) as side", "v"),
        "side", "v", compression=100)
    # same contract keys; quantiles close (inexact regime digests are
    # partition-layout-dependent, so equality isn't required — only
    # agreement within sketch accuracy)
    assert one["drifted"] == two["drifted"]
    for qa, qb in zip(one["quantiles_a"], two["quantiles_a"]):
        assert qa == pytest.approx(qb, rel=0.02, abs=20.0)


def test_tdigest_pair_deterministic(spark):
    """Re-running the same single-pass digest twice gives identical
    centroids — pins the (pid, batch) stable merge order (ADVICE:
    pid-only sorting left ties to shuffle arrival)."""
    df = spark.range(0, 50_000, 1, 8).selectExpr(
        "cast(id % 2 as long) as side",
        "cast(pmod(id, 37) as double) * 1.5 as v",
    )
    a0, a1 = checks.tdigest_pair(df, "side", "v", compression=200)
    b0, b1 = checks.tdigest_pair(df, "side", "v", compression=200)
    assert np.array_equal(a0.means, b0.means)
    assert np.array_equal(a1.means, b1.means)
    assert np.array_equal(a0.weights, b0.weights)


# ---------------------------------------------------------------------------
# shared fan-out gate
# ---------------------------------------------------------------------------


def test_fanout_gate_expands_starved_input(spark):
    one_split = spark.range(0, 1000, 1, 1).selectExpr(
        "id as doc_id", "concat('w', id) as text")
    target = spark.sparkContext.defaultParallelism
    gated = fanout_gate(one_split, "doc_id")
    assert gated.rdd.getNumPartitions() == target
    # already-parallel input passes through untouched (identity — no
    # repartition node added)
    wide = spark.range(0, 1000, 1, target).selectExpr("id as doc_id")
    assert fanout_gate(wide, "doc_id") is wide


def test_simhash_fanout_parallelism_and_equivalence(spark):
    """Judge done-criterion: on a single-split input the simhash
    pre-agg stage runs >= defaultParallelism tasks, and the gate never
    changes results."""
    docs = spark.range(0, 400, 1, 1).selectExpr(
        "id as doc_id",
        "concat('alpha beta gamma doc ', id, ' tail tokens here') as text",
    )
    gated = simhash(docs)
    ungated = simhash(docs, fanout=False)
    assert sorted((r["doc_id"], r["simhash"]) for r in gated.collect()) \
        == sorted((r["doc_id"], r["simhash"]) for r in ungated.collect())
    # the exploded token stage inherits the gate's partitioning
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # the gate's repartition is present


def test_text_profile_fanout_equivalence(spark):
    docs = spark.range(0, 200, 1, 1).selectExpr(
        "id as doc_id", "concat('the quick brown fox ', id) as text")
    a = text_profile(docs).collect()
    b = text_profile(docs, fanout=False).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


# ---------------------------------------------------------------------------
# IVF: count-free default sizing + nprobe autotune
# ---------------------------------------------------------------------------


def _clustered_embeddings(spark, n=400, dim=8, n_clusters=8):
    rng = np.random.RandomState(3)
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        v = c + 0.05 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_ivf_default_sizing_deterministic_without_count(spark):
    """The sample_mod=None path must not run a full count job; the
    partition-probe estimate must still be a pure function of the
    data (two builds agree bit-for-bit)."""
    emb = _clustered_embeddings(spark).repartition(8, "vec_id")
    emb.write.mode("overwrite").parquet("/tmp/r3_ivf_emb")
    src = spark.read.parquet("/tmp/r3_ivf_emb")
    _, c1 = SIM.ivf_index(src, n_lists=8, seed=11)
    _, c2 = SIM.ivf_index(src, n_lists=8, seed=11)
    assert np.array_equal(c1, c2)


def test_tune_nprobe_meets_target(spark):
    emb = _clustered_embeddings(spark)
    assigned, cents = SIM.ivf_index(emb, n_lists=8, seed=11)
    assigned = assigned.localCheckpoint(eager=False)
    qs = emb.where("vec_id < 24")
    nprobe, recall = SIM.tune_nprobe(
        assigned, cents, qs, target_recall=0.95, k=3)
    assert recall >= 0.95
    assert 1 <= nprobe <= 8
    # full-probe is exact, so a 1.0 target always terminates
    np_all, r_all = SIM.tune_nprobe(
        assigned, cents, qs, target_recall=1.0, k=3)
    assert r_all == 1.0


# ---------------------------------------------------------------------------
# decode hygiene (ADVICE findings)
# ---------------------------------------------------------------------------


def test_pixel_phash_zero_dim_jpeg_yields_null(spark):
    """A structurally-parseable JPEG declaring 0x0 dimensions must
    produce a NULL phash, not abort the job (ADVICE: empty pixel
    array hit IndexError inside phash64)."""
    from cerberus_cpp_spark.operators.image_checks import pixel_phash
    from cerberus_cpp_spark.sources.imagegen import synth_pixels
    from cerberus_cpp_spark.sources.jpegcodec import encode_jpeg

    good = encode_jpeg(synth_pixels(7, 16, 16), quality=95)
    # patch the SOF0 height/width fields to zero: marker FFC0,
    # payload = len(2) precision(1) height(2) width(2) ...
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    bad = bytearray(good)
    bad[sof + 5:sof + 9] = b"\x00\x00\x00\x00"
    df = spark.createDataFrame(
        [("good", bytearray(good)), ("zero", bytes(bad))],
        "image_id string, bytes binary")
    rows = {r["image_id"]: r["phash"] for r in pixel_phash(df).collect()}
    assert rows["good"] is not None
    assert rows["zero"] is None


def test_sample_frames_skips_corrupt_clip(spark):
    """One corrupt embedded frame drops its clip, not the job
    (ADVICE: sample_frames had no per-clip exception handling)."""
    from cerberus_cpp_spark.operators.multimodal import sample_frames
    from cerberus_cpp_spark.sources.avicodec import (
        encode_avi_mjpeg,
        synth_clip,
    )

    ok = synth_clip(5, 4)
    corrupt = encode_avi_mjpeg(
        [b"\xff\xd8\xff\xe0 not a real jpeg payload"],
        width=16, height=16)
    df = spark.createDataFrame(
        [("ok", bytearray(ok)), ("bad", bytearray(corrupt))],
        "clip_id string, bytes binary")
    rows = sample_frames(df, every_n=1, max_frames=4).collect()
    clips = {r["clip_id"] for r in rows}
    assert "ok" in clips and "bad" not in clips
    assert len(rows) == 4


# ---------------------------------------------------------------------------
# near-dup clustering (connected components)
# ---------------------------------------------------------------------------


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "id_a long, id_b long")


def test_clusters_transitive_chain(spark):
    from cerberus_cpp_spark.operators.dedup import near_duplicate_clusters

    out = near_duplicate_clusters(
        _pairs_df(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["doc_id"]: (r["cluster_id"], r["keep_id"])
           for r in out.collect()}
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1),
                   10: (10, 10), 11: (10, 10)}


def test_clusters_match_union_find_reference(spark):
    """Random graph vs a driver-side union-find reference."""
    import random

    from cerberus_cpp_spark.operators.dedup import near_duplicate_clusters

    rng = random.Random(17)
    n = 120
    edges = sorted({
        tuple(sorted(rng.sample(range(n), 2))) for _ in range(150)
    })
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    expected = {v: min(u for u in touched if find(u) == find(v))
                for v in touched}
    got = {r["doc_id"]: r["cluster_id"]
           for r in near_duplicate_clusters(
               _pairs_df(spark, edges)).collect()}
    assert got == expected


def test_clusters_long_path_converges(spark):
    """A 64-node path graph needs pointer jumping to converge in few
    rounds; plain propagation would need 63."""
    from cerberus_cpp_spark.operators.dedup import near_duplicate_clusters

    out = near_duplicate_clusters(
        _pairs_df(spark, [(i, i + 1) for i in range(63)]),
        max_iter=10)
    rows = out.collect()
    assert len(rows) == 64
    assert all(r["cluster_id"] == 0 and r["keep_id"] == 0 for r in rows)


def test_clusters_empty_pairs(spark):
    from cerberus_cpp_spark.operators.dedup import near_duplicate_clusters

    out = near_duplicate_clusters(_pairs_df(spark, []))
    assert out.collect() == []


def test_near_duplicate_groups_end_to_end(spark):
    """LSH pipeline → components: three exact-style variants of one
    doc form one cluster with the min id as survivor."""
    from cerberus_cpp_spark.operators.dedup import near_duplicate_groups

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    rows = [(1, base), (2, base + " upsilon"), (3, base + " phi chi"),
            (50, "entirely different words about spark shuffles and "
                 "partitions in a distributed engine context")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_duplicate_groups(df, threshold=0.5, max_bucket=None)
    got = {r["doc_id"]: r["keep_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# regex structural fast path
# ---------------------------------------------------------------------------


def test_regex_fast_path_equivalence(spark):
    """The translate-based structural predicate must agree with the
    anchored rlike on every adversarial case — including the
    interleaved-digit trap ('i1mg-…' strips to 'img-' but has five
    non-digits) and non-ASCII digits (not in [0-9])."""
    from cerberus_cpp_spark.plans.compiler import _regex_fast_path

    cases = ["img-123456789012", "i1mg-23456789012", "img-12345678901",
             "img-1234567890123", "IMG-123456789012", "img-1234567890x2",
             "ximg-12345678901", "", "img-", "123456789012img-",
             "img-12345678901١", "img-123456789012\n", None]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    fast = _regex_fast_path(F.col("s"), "img-[0-9]{12}")
    assert fast is not None
    out = df.select(
        "s",
        F.coalesce(fast, F.lit(False)).alias("fast"),
        # \A..\z = the compiler's anchoring since round 4: Java's $
        # matches before a trailing newline, \z does not (ADVICE r3)
        F.coalesce(F.col("s").rlike("\\A(?:img-[0-9]{12})\\z"),
                   F.lit(False)).alias("slow"),
    ).collect()
    for r in out:
        assert r["fast"] == r["slow"], r["s"]


def test_regex_fast_path_eligibility():
    from pyspark.sql import functions as F

    from cerberus_cpp_spark.plans.compiler import _regex_fast_path

    s = F.col("s")
    assert _regex_fast_path(s, "[0-9]+") is None          # variable len
    assert _regex_fast_path(s, "img.[0-9]{3}") is None    # regex meta
    assert _regex_fast_path(s, "a_b[0-9]{3}") is None     # excluded char
    assert _regex_fast_path(s, "[0-9]{0}") is None        # degenerate
    assert _regex_fast_path(s, "v2-[0-9]{4}") is not None  # digit prefix
    assert _regex_fast_path(s, "[0-9]{6}") is not None     # empty prefix


def test_structural_regex_opt_in_identical_violations(spark):
    """TableValidator(structural_regex=True) must emit exactly the
    violations of the default rlike path on adversarial ids."""
    from cerberus_cpp_spark.plans.engine import TableValidator

    rows = [("img-123456789012",), ("i1mg-23456789012",),
            ("img-12345678901",), ("zzz",), (None,),
            ("img-123456789012x",), ("img-123456789012\n",)]
    df = spark.createDataFrame(rows, "image_id string")
    rules = {"image_id": {"type": "string", "nullable": True,
                          "regex": "img-[0-9]{12}"}}
    slow = TableValidator(rules, allow_unknown=True) \
        .validate(df).violations("image_id").collect()
    fast = TableValidator(rules, allow_unknown=True,
                          structural_regex=True) \
        .validate(df).violations("image_id").collect()
    key = lambda r: (r["image_id"], r["path"], r["message"])  # noqa: E731
    assert sorted(slow, key=key) == sorted(fast, key=key)


def test_tune_nprobe_sf01_recall_pin(spark):
    """VERDICT done-criterion: recall-vs-target pin at sf0.1 on the
    real embeddings table (2000 x 64)."""
    import os

    path = "/root/testdata/sf0.1/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.1 testdata not present")
    emb = spark.read.parquet(path)
    assigned, cents = SIM.ivf_index(emb, n_lists=16, seed=11)
    assigned = assigned.localCheckpoint(eager=False)
    qs = emb.where("vec_id < 32")
    nprobe, recall = SIM.tune_nprobe(
        assigned, cents, qs, target_recall=0.9, k=5)
    assert recall >= 0.9
    assert 1 <= nprobe <= 16


# ---------------------------------------------------------------------------
# quarantine split + constraint suggestion
# ---------------------------------------------------------------------------


def test_quarantine_split(spark):
    from cerberus_cpp_spark.plans.engine import TableValidator

    df = spark.createDataFrame(
        [(1, 5, "x"), (2, -3, "y"), (3, 7, None), (4, 100, "z")],
        "id long, v long, s string")
    rules = {"v": {"type": "integer", "min": 0, "max": 50},
             "s": {"type": "string"}}
    res = TableValidator(rules, allow_unknown=True).validate(df)
    clean, quar = res.quarantine()
    clean_rows = clean.collect()
    quar_rows = quar.collect()
    assert len(clean_rows) + len(quar_rows) == 4
    bad = {r["id"]: r["n_violations"] for r in quar_rows}
    # id=2: min violated; id=4: max violated (exclusive: 100 >= 50).
    # id=3 is CLEAN: in presence='null' mode a NULL column means the
    # field is UNDEFINED, so no rule fires without `required`.
    assert bad == {2: 1, 4: 1}
    assert {r["id"] for r in clean_rows} == {1, 3}
    # quarantined rows keep ORIGINAL columns + violations array
    assert set(quar.columns) == {"id", "v", "s", "violations",
                                 "n_violations"}


def test_quarantine_clean_is_normalized(spark):
    from cerberus_cpp_spark.plans.engine import TableValidator

    df = spark.createDataFrame([(1, None), (2, 99)],
                               "id long, v long")
    rules = {"v": {"type": "integer", "default": 7, "nullable": True},
             "id": {"type": "integer", "rename": "key"}}
    res = TableValidator(rules, allow_unknown=True).validate(df)
    clean, quar = res.quarantine()
    rows = {r["key"]: r["v"] for r in clean.collect()}
    assert rows == {1: 7, 2: 99}  # default injected, rename applied
    assert quar.count() == 0


def test_suggest_rules_self_consistent(spark):
    from cerberus_cpp_spark.plans.engine import TableValidator
    from cerberus_cpp_spark.plans.suggest import suggest_rules

    df = spark.createDataFrame(
        [(1, 2.5, "a", [1, 2], None),
         (2, 9.0, "b", [1], "x"),
         (3, -4.25, "a", [1, 2, 3], "y")],
        "k long, f double, cat string, arr array<int>, maybe string")
    rules = suggest_rules(df, allowed_max_distinct=4)
    assert rules["k"] == {"type": "integer", "required": True,
                          "min": 0, "max": 4}
    # floor(min)-1 / floor(max)+1: strict bounds that stay strict
    # even when the extreme is integral
    assert rules["f"]["min"] == -6.0 and rules["f"]["max"] == 10.0
    assert rules["cat"]["allowed"] == ["a", "b"]
    assert rules["arr"] == {"type": "list", "required": True,
                            "minlength": 1, "maxlength": 3}
    assert rules["maybe"] == {"type": "string", "nullable": True,
                              "allowed": ["x", "y"]}
    res = TableValidator(rules, allow_unknown=True).validate(df)
    assert res.is_valid()


def test_suggest_rules_skips_high_cardinality_and_dates(spark):
    from cerberus_cpp_spark.plans.suggest import suggest_rules

    df = spark.range(0, 500).selectExpr(
        "concat('id', id) as uid",
        "timestamp('2024-01-01') + make_interval(0,0,0,0,0,0,id) as ts")
    rules = suggest_rules(df, allowed_max_distinct=16)
    assert "allowed" not in rules["uid"]          # 500 distinct
    assert "type" not in rules["ts"]              # reference omits
    assert rules["ts"] == {"required": True}


def test_bpe_ish_tokens_cross_engine_parity(spark) -> None:
    """The BPE-ish pre-tokenizer pattern (round 4) runs byte-identical
    on Java regex and DuckDB RE2 — contractions, Unicode letters,
    digit runs, punctuation clusters, and multi-space gaps."""
    import duckdb

    from cerberus_cpp_spark.operators import text as tx

    cases = [
        "Hello, world! It's 2026...",
        "  döner   kebab 42x",
        "a'b'll c''d",
        "№5 ¿qué? 3.14",
        "", "   ", "don't we've I'm you're he'd",
    ]
    df = spark.createDataFrame([(t,) for t in cases], "t string")
    got = {r["t"]: list(r["toks"]) for r in df.select(
        "t", tx.bpe_ish_tokens("t").alias("toks")).collect()}
    con = duckdb.connect()
    for t in cases:
        want = con.execute(
            "SELECT regexp_extract_all(?, ?)",
            [t, tx.BPE_ISH_PATTERN]).fetchone()[0]
        assert got[t] == want, (t, got[t], want)
    assert got["don't we've I'm you're he'd"] == [
        "don", "'t", " we", "'ve", " I", "'m", " you", "'re",
        " he", "'d"]
