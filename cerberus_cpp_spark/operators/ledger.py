"""Per-partition checkpoint ledger: resumable validation runs.

North-rule requirement: a killed run resumes without recomputing
validated partitions, with per-partition lineage + metrics. The
reference has no table scope at all (single in-memory document,
``validator.hh:146-179``); this is the distributed promotion of its
``validate() → bool`` verdict to partition granularity.

Design:
- The ledger is an append-only parquet directory. One row per
  (run_id, partition_value, chunk commit): status, row/violation
  metrics, wall time, schema fingerprint (lineage).
- ``pending_partitions`` = distinct partition values ANTI-JOINed
  against the ledger's completed set — partition-list scale
  (metadata, not data), so the driver may safely collect it.
- ``run`` processes pending partitions in chunks of
  ``partitions_per_commit``: ONE distributed job per chunk (the
  validation pass stays a narrow projection + tiny per-partition
  agg), then ONE atomic ledger append. Kill granularity = chunk.
- Partition pruning: the chunk filter is a literal IN-list on the
  partition column, so Parquet/Iceberg partition pruning (or at
  minimum row-group min/max skipping) applies to each chunk job.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors import AnalysisException

#: stand-in ledger key for rows whose partition column is NULL —
#: keeps NULL partitions validated + resumable (a plain IN-list
#: filter would silently never match them)
NULL_PARTITION = "__NULL__"

LEDGER_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("partition_value", T.StringType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("rows", T.LongType(), True),
    T.StructField("violations", T.LongType(), True),
    T.StructField("invalid_rows", T.LongType(), True),
    T.StructField("passed", T.BooleanType(), True),
    T.StructField("wall_sec", T.DoubleType(), True),
    T.StructField("committed_at", T.DoubleType(), False),
    T.StructField("lineage", T.StringType(), True),
])


class ValidationLedger:
    """Append-only parquet ledger of completed partition validations.

    Every chunk commit appends ONE small file; left unchecked, a
    10k-partition run at ``partitions_per_commit=8`` leaves ~1,250
    tiny files and every resume's ``read()`` degrades with file count
    (r3 verdict #4). ``compact_every`` bounds that: whenever the
    data-file count reaches the threshold, the ledger is folded into
    a single snapshot file. Compaction is CRASH-SAFE without
    renames: (1) the combined snapshot is APPENDED as one new file,
    (2) the old files are deleted. A crash between the two leaves
    exact duplicate rows, which ``read()``'s ``distinct()`` heals —
    never lost rows. (On a transactional table format — Iceberg —
    the commit itself would be atomic; this is the plain-parquet
    equivalent.)"""

    def __init__(self, spark: SparkSession, path: str,
                 *, compact_every: int = 32):
        self.spark = spark
        self.path = path
        self.compact_every = int(compact_every)

    def read(self) -> DataFrame:
        try:
            raw = self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)
            # exact-duplicate rows exist only transiently (crash
            # between compaction's append and its deletes); distinct
            # makes every reader see the healed ledger. The ledger is
            # partition-list scale, so the extra tiny shuffle is noise.
            return raw.distinct()
        except AnalysisException as e:
            # ONLY the missing-path case means "fresh ledger"; genuine
            # corruption / permission errors must propagate — silently
            # returning empty would discard all resume state and
            # revalidate everything (appending duplicate 'done' rows)
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return self.spark.createDataFrame([], LEDGER_SCHEMA)
            raise

    def completed_partitions(self, lineage: str | None = None) -> DataFrame:
        """(partition_value) rows already validated successfully.
        When ``lineage`` is given, ONLY rows validated under that
        exact lineage fingerprint count — after a schema/rule change
        old verdicts are stale and their partitions re-validate
        instead of being silently skipped."""
        done = self.read().where(F.col("status") == "done")
        if lineage is not None:
            done = done.where(F.col("lineage") == lineage)
        return done.select("partition_value").distinct()

    def append(self, rows: list[dict]) -> None:
        df = self._one_partition_frame(rows)
        df.write.mode("append").parquet(self.path)
        self._maybe_compact()

    def _one_partition_frame(self, rows: list) -> DataFrame:
        """Ledger rows as a SINGLE-partition DataFrame. Built from a
        1-slice parallelize, NOT createDataFrame().coalesce(1): the
        default path spreads the list over defaultParallelism Python
        partitions and coalesce(1) then pays one Python-worker round
        trip PER EMPTY PARTITION — measured 3.5-4 s per 2-row commit
        on local[32] vs 0.24 s this way (OPTIMIZATION_r06.md)."""
        data = [
            tuple(r[f.name] for f in LEDGER_SCHEMA.fields)
            if isinstance(r, dict) else tuple(r)
            for r in rows
        ]
        rdd = self.spark.sparkContext.parallelize(data, 1)
        return self.spark.createDataFrame(rdd, LEDGER_SCHEMA)

    # -- compaction ------------------------------------------------------

    def _fs_and_path(self):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = jpath.getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration())
        return fs, jpath

    def data_files(self) -> list:
        """Hadoop Paths of the ledger's parquet data files (works on
        any Hadoop-compatible FS, not just local disk)."""
        fs, jpath = self._fs_and_path()
        if not fs.exists(jpath):
            return []
        out = []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                out.append(st.getPath())
        return out

    def _maybe_compact(self) -> None:
        old = self.data_files()
        if len(old) < self.compact_every:
            return
        # materialize the snapshot BEFORE appending it, so its content
        # provably covers exactly `old` (no read-while-write on the
        # same directory). The ledger is partition-list scale — one
        # row per (partition, run) — so a driver-side collect is the
        # same metadata-sized transfer pending_partitions already does.
        snap_rows = self.read().collect()
        self._one_partition_frame(snap_rows) \
            .write.mode("append").parquet(self.path)
        fs, _ = self._fs_and_path()
        for p in old:
            fs.delete(p, False)


class KilledRun(RuntimeError):
    """Raised by the fault injector in tests."""


def _part_key(partition_col: str):
    """Ledger key for a partition column: string cast with NULLs
    mapped to the :data:`NULL_PARTITION` sentinel (so NULL-partition
    rows are validated, committed, and resumable like any other)."""
    return F.coalesce(
        F.col(partition_col).cast("string"), F.lit(NULL_PARTITION)
    )


def pending_partitions(
    df: DataFrame, partition_col: str, ledger: ValidationLedger,
    lineage: str | None = None,
    known_partitions: list[str] | None = None,
) -> list[str]:
    """Distinct partition values minus the ledger's completed set
    (for this ``lineage``, when given). Partition-list scale; safe to
    collect driver-side. Pass ``known_partitions`` (e.g. from
    ``sources.catalog.list_partitions`` — Iceberg metadata table or
    hive directory names) to skip the discovery scan entirely."""
    if known_partitions is not None:
        spark = df.sparkSession
        parts = spark.createDataFrame(
            [(str(p),) for p in known_partitions],
            "partition_value: string",
        ).distinct()
    else:
        parts = df.select(
            _part_key(partition_col).alias("partition_value")
        ).distinct()
    todo = parts.join(
        ledger.completed_partitions(lineage), on="partition_value",
        how="left_anti",
    )
    return sorted(r["partition_value"] for r in todo.collect())


def run_validation(
    df: DataFrame,
    validator,
    partition_col: str,
    ledger: ValidationLedger,
    *,
    partitions_per_commit: int = 4,
    fail_after_chunks: int | None = None,
    run_id: str | None = None,
    known_partitions: list[str] | None = None,
) -> dict:
    """Validate all pending partitions, committing the ledger after
    every chunk. Returns run summary. ``fail_after_chunks`` is the
    test fault-injector (raises KilledRun mid-run).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    # the fingerprint covers the FULL rule tree (not just field
    # names): any rule edit changes the lineage and forces
    # re-validation of previously-committed partitions
    lineage = json.dumps({
        "schema": validator.schema,
        "source_schema": df.schema.simpleString(),
        "partition_col": partition_col,
    }, sort_keys=True, default=str)
    # resume honors ONLY verdicts recorded under the same lineage
    # fingerprint — a schema/rule change re-validates everything
    todo = pending_partitions(df, partition_col, ledger, lineage,
                              known_partitions=known_partitions)
    chunks = [
        todo[i:i + partitions_per_commit]
        for i in range(0, len(todo), partitions_per_commit)
    ]
    processed = 0
    empty_partitions: list[str] = []
    for ci, chunk in enumerate(chunks):
        if fail_after_chunks is not None and ci >= fail_after_chunks:
            raise KilledRun(
                f"injected failure before chunk {ci} ({len(chunk)} parts)"
            )
        t0 = time.perf_counter()
        # pruning-friendly chunk predicate: a plain IN-list on the
        # partition column (pushes to parquet/Iceberg partition
        # pruning), with the NULL sentinel handled via isNull — NOT
        # the coalesce() key expression, which would defeat pushdown
        vals = [p for p in chunk if p != NULL_PARTITION]
        pred = F.col(partition_col).cast("string").isin(vals) \
            if vals else F.lit(False)
        if NULL_PARTITION in chunk:
            pred = pred | F.col(partition_col).isNull()
        part_str = _part_key(partition_col)
        slice_df = df.where(pred)
        res = validator.validate(slice_df)
        verdicts = (
            res.annotated.groupBy(part_str.alias("partition_value"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_violations").alias("violations"),
                F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
                (F.sum("n_violations") == 0).alias("passed"),
            )
            .collect()
        )
        wall = time.perf_counter() - t0
        now = time.time()
        got = {r["partition_value"]: r for r in verdicts}
        rows = []
        for p in chunk:
            r = got.get(p)
            rows.append({
                "run_id": run_id,
                "partition_value": p,
                "status": "done",
                "rows": int(r["rows"]) if r else 0,
                "violations": int(r["violations"]) if r else 0,
                "invalid_rows": int(r["invalid_rows"]) if r else 0,
                "passed": bool(r["passed"]) if r else True,
                "wall_sec": wall / max(len(chunk), 1),
                "committed_at": now,
                "lineage": lineage,
            })
        ledger.append(rows)
        empty_partitions.extend(p for p in chunk if p not in got)
        processed += len(chunk)
    return {
        "run_id": run_id,
        "partitions_total": len(todo),
        "partitions_processed": processed,
        "chunks": len(chunks),
        # a known partition that matched ZERO rows is either a
        # genuinely empty partition or a value-encoding mismatch
        # between the partition source and the column's string cast
        # (e.g. un-decoded hive escapes) — surfaced, never silent:
        # each is recorded done/rows=0 in the ledger AND listed here
        "empty_partitions": empty_partitions,
    }


def partition_anomalies(
    ledger_rows: DataFrame,
    *,
    metric: str = "invalid_rows",
    z: float = 3.5,
) -> DataFrame:
    """Outlier partitions by ROBUST z-score of the per-partition
    violation rate — the check that turns the ledger's per-partition
    metrics (north_rule: "per-partition lineage + metrics") into a
    verdict: a partition whose invalid rate sits far from its peers
    usually means a bad upstream shard/day, not random noise.

    ``rate = metric / rows`` per partition, then
    ``robust_z = |rate - median| / (1.4826 * MAD)`` (median absolute
    deviation — immune to the outliers it is hunting, unlike a
    mean/stddev z-score where one rotten partition inflates sigma and
    hides itself). ``MAD = 0`` (most partitions identical) degrades
    to flagging ANY partition whose rate differs from the median.

    The input is the (tiny) ledger table — one row per committed
    partition — so the two percentile aggregates and the 1-row
    cross-join are bounded regardless of table size; rows with
    ``rows = 0`` are skipped (no rate to judge)."""
    rated = ledger_rows.where(F.col("rows") > 0).withColumn(
        "rate", F.col(metric) / F.col("rows")
    )
    med = rated.agg(
        F.expr("percentile(rate, 0.5)").alias("med")
    )
    with_med = rated.crossJoin(med)
    stats = with_med.agg(
        F.expr("percentile(abs(rate - med), 0.5)").alias("mad"),
        F.first("med").alias("med"),
    )
    scored = rated.crossJoin(stats).withColumn(
        "robust_z",
        F.when(
            F.col("mad") > 0,
            F.abs(F.col("rate") - F.col("med"))
            / (F.lit(1.4826) * F.col("mad")),
        ),
    )
    flagged = scored.where(
        F.when(F.col("mad") > 0, F.col("robust_z") > F.lit(float(z)))
        .otherwise(F.col("rate") != F.col("med"))
    )
    return flagged.select(
        "partition_value",
        "rows",
        F.col(metric).alias("metric_value"),
        "rate",
        "med",
        "mad",
        "robust_z",
    )
