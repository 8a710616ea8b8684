"""Scalar quantization (operators/similarity.py sq_train) — the
SQ8 middle rung of the quantizer ladder: the codebook is a plain
per-dim uniform grid in the pq_train tensor contract, so encode /
ADC search / distributed serving / IVF-residual composition are the
UNMODIFIED pq_* machinery with all its pins. Tests: grid exactness
(argmin == round-to-rung), determinism, near-lossless fidelity vs
PQ at the same pipeline, planted twins, distributed == driver, and
the residual composition."""

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
def grid(emb):
    return SIM.sq_train(emb, n_levels=256)


def _dim(emb) -> int:
    return len(emb.first()["embedding"])


def test_sq_train_shape_grid_determinism(emb, grid) -> None:
    d = _dim(emb)
    assert grid.shape == (d, 256, 1)
    # uniform rungs: constant step per dim, monotone
    steps = np.diff(grid[:, :, 0], axis=1)
    assert np.allclose(steps, steps[:, :1])
    assert (steps >= 0).all()
    again = SIM.sq_train(emb, n_levels=256)
    assert np.array_equal(grid, again)


def test_sq_train_guards(emb) -> None:
    with pytest.raises(ValueError, match="n_levels"):
        SIM.sq_train(emb, n_levels=257)
    with pytest.raises(ValueError, match="n_levels"):
        SIM.sq_train(emb, n_levels=1)


def test_sq_encode_is_round_to_rung(spark, emb, grid) -> None:
    """The generic per-subspace argmin over a uniform grid equals
    direct round-to-nearest-rung arithmetic (clamped)."""
    rows = emb.limit(64).collect()
    codes = {
        r["vec_id"]: np.frombuffer(r["code"], dtype=np.uint8)
        for r in SIM.pq_encode(
            spark.createDataFrame(rows), grid).collect()
    }
    lo = grid[:, 0, 0]
    hi = grid[:, -1, 0]
    span = np.where(hi > lo, hi - lo, 1.0)
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        expect = np.clip(
            np.round((v - lo) / span * 255), 0, 255
        ).astype(np.uint8)
        got = codes[r["vec_id"]]
        # ties at .5 between argmin and round can differ by 1 rung
        assert (np.abs(got.astype(int)
                       - expect.astype(int)) <= 1).all()
        # and reconstruction error is within half a rung per dim
        rec = lo + got * span / 255
        assert np.abs(rec - v).max() <= (span / 255).max() * 0.51


def test_sq_fidelity_beats_pq_same_bits_budget(spark, emb) -> None:
    """SQ8 reconstruction error is far below PQ m=8 on the same
    corpus (it spends 8× the bytes — the documented tradeoff)."""
    grid = SIM.sq_train(emb, n_levels=256)
    books = SIM.pq_train(emb, m=8, n_codes=64, seed=11)
    sq_err = (
        SIM.pq_encode(emb, grid, with_error=True)
        .agg(F.avg("pq_err")).first()[0]
    )
    pq_err = (
        SIM.pq_encode(emb, books, with_error=True)
        .agg(F.avg("pq_err")).first()[0]
    )
    assert sq_err < pq_err / 10


def test_sq_planted_twin_rank1(spark, emb, grid) -> None:
    planted = emb.where("vec_id < 8").select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    queries = emb.where("vec_id < 8").select("vec_id", "embedding")
    grid2 = SIM.sq_train(corpus, n_levels=256)
    codes = SIM.pq_encode(corpus, grid2)
    out = SIM.pq_topk(codes, grid2, queries, k=1,
                      corpus=corpus, rescore_n=16).collect()
    assert len(out) == 8
    for r in out:
        assert r["neighbor_id"] == r["query_id"] + 500000
        assert r["cosine"] == pytest.approx(1.0, abs=1e-12)


def test_sq_distributed_equals_driver(spark, emb, grid) -> None:
    queries = emb.where("vec_id < 6").select("vec_id", "embedding")
    codes = SIM.pq_encode(emb, grid).cache()
    drv = SIM.pq_topk(codes, grid, queries, k=3,
                      corpus=emb, rescore_n=16)
    dist = SIM.pq_topk_distributed(codes, grid, queries, k=3,
                                   corpus=emb, rescore_n=16,
                                   queries_per_block=2)
    a = sorted(map(tuple, drv.collect()))
    b = sorted(map(tuple, dist.collect()))
    assert a == b
    codes.unpersist()


def test_sq_residual_composition(spark, emb) -> None:
    """Residual SQ inside IVF: grid trained on coarse-cell
    residuals, searched through ivf_pq_topk(residual=True) — the
    planted twin survives the full composition."""
    planted = emb.where("vec_id < 6").select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    queries = emb.where("vec_id < 6").select("vec_id", "embedding")
    assigned, cents = SIM.ivf_index(corpus, n_lists=8, seed=11)
    grid = SIM.sq_train(corpus, n_levels=256, centroids=cents)
    codes = SIM.pq_encode(assigned, grid, keep_cols=("list_id",),
                          centroids=cents, list_col="list_id")
    out = SIM.ivf_pq_topk(codes, cents, grid, queries, k=1,
                          nprobe=2, corpus=corpus, rescore_n=8,
                          residual=True).collect()
    assert len(out) == 6
    for r in out:
        assert r["neighbor_id"] == r["query_id"] + 500000
        assert r["cosine"] == pytest.approx(1.0, abs=1e-12)
