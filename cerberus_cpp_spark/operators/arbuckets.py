"""Aspect-ratio bucketing — the image-training batching layout.

Diffusion/vision training batches images of a SINGLE resolution per
batch; crops destroy composition, so modern pipelines (the
NovelAI/SDXL recipe) pre-assign every image to the nearest
fixed-pixel-budget bucket ``(bw, bh)`` and resize within it. This
module is the assignment as a Spark operator.

Everything is integer until one final IEEE-f64 division, so the
assignment is bit-portable and oracle-replayable (the repo-wide
discipline — see ``comoment_stats``): the distance of image
``(w, h)`` to bucket ``(bw, bh)`` is ``|w/h - bw/bh|``, compared as
``|w*bh - h*bw| / bh`` (the per-image constant ``1/h`` scales every
candidate equally and is dropped; the remaining division by the
bucket-specific ``bh`` is one exact-integer-over-small-integer f64
op that every engine rounds identically).

Scale shape: the bucket table is a few dozen rows of pure arithmetic
— it travels as LITERALS inside one projection (``F.least`` over
per-bucket structs, whole-stage codegen), so the assignment is
shuffle-free and zero-Python: no join, no window, no UDF. At 10^12
rows the operator adds one narrow stage to whatever scan it rides.

Reference analogue: ``rules.hh`` ``allowed`` (79-100) generalized —
instead of testing membership in a fixed value set, each row is
ASSIGNED the nearest member of a fixed candidate set.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ar_bucket_list(
    *,
    budget_px: int = 1024 * 1024,
    step: int = 64,
    max_ar_num: int = 4,
    max_ar_den: int = 1,
) -> list[tuple[int, int, int]]:
    """The deterministic bucket table ``[(bucket_id, bw, bh)]``:
    for each width ``bw`` (a multiple of ``step``), the largest
    height ``bh`` (a multiple of ``step``) with ``bw*bh <=
    budget_px``, keeping buckets whose aspect ratio lies in
    ``[den/num, num/den]``. Ordered by ``bw`` ascending;
    ``bucket_id`` is the position. Pure integer arithmetic — an SQL
    oracle regenerates it from ``range()`` (see the contract query).

    Defaults give the SDXL-style 1-megapixel family: 25 buckets from
    512x2048 through 1024x1024 to 2048x512."""
    if budget_px < step * step:
        raise ValueError("budget_px must fit at least one step^2 bucket")
    if step <= 0 or max_ar_num <= 0 or max_ar_den <= 0:
        raise ValueError("step and aspect bounds must be positive")
    out = []
    bw = step
    while bw * step <= budget_px:
        bh = (budget_px // bw) // step * step
        # AR window: den/num <= bw/bh <= num/den, cross-multiplied
        if bw * max_ar_den <= bh * max_ar_num \
                and bh * max_ar_den <= bw * max_ar_num:
            out.append((len(out), bw, bh))
        bw += step
    return out


def assign_ar_buckets(
    df: DataFrame,
    *,
    w_col: str = "w",
    h_col: str = "h",
    budget_px: int = 1024 * 1024,
    step: int = 64,
    max_ar_num: int = 4,
    max_ar_den: int = 1,
) -> DataFrame:
    """Every input column plus ``bucket_id``/``bucket_w``/``bucket_h``
    — the nearest-aspect-ratio bucket from :func:`ar_bucket_list`,
    ties broken toward the LOWER bucket_id (the more-portrait
    candidate, since the table is ordered by width). Rows with NULL
    or non-positive dimensions get NULL assignments (they have no
    aspect ratio; route them through the validation layer instead).

    One shuffle-free codegen projection: the bucket table is embedded
    as literals in a single ``least()`` over ``(distance, bucket_id,
    bw, bh)`` structs — struct ordering compares the f64 distance
    first, then the id, which IS the tie-break."""
    buckets = ar_bucket_list(budget_px=budget_px, step=step,
                             max_ar_num=max_ar_num,
                             max_ar_den=max_ar_den)
    for c in (w_col, h_col):
        if c not in df.columns:
            raise ValueError(f"missing dimension column {c!r}")
    clash = [c for c in ("bucket_id", "bucket_w", "bucket_h")
             if c in df.columns]
    if clash:
        raise ValueError(
            f"input already carries bucket columns {clash}; rename "
            f"or drop them first (a re-bucketing pass would emit "
            f"duplicate column names)")
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    cands = [
        F.struct(
            (F.abs(w * F.lit(int(bh)) - h * F.lit(int(bw)))
             .cast("double") / F.lit(float(bh))).alias("d"),
            F.lit(int(bid)).alias("bucket_id"),
            F.lit(int(bw)).alias("bucket_w"),
            F.lit(int(bh)).alias("bucket_h"),
        )
        for bid, bw, bh in buckets
    ]
    best = F.when(
        w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0),
        F.least(*cands),
    )
    return df.select(
        *df.columns,
        best.getField("bucket_id").alias("bucket_id"),
        best.getField("bucket_w").alias("bucket_w"),
        best.getField("bucket_h").alias("bucket_h"),
    )


def ar_resize_plan(
    df: DataFrame,
    *,
    w_col: str = "w",
    h_col: str = "h",
    bw_col: str = "bucket_w",
    bh_col: str = "bucket_h",
) -> DataFrame:
    """The cover-resize + center-crop plan that lands an image in its
    assigned bucket (compose after :func:`assign_ar_buckets`): scale
    preserving aspect ratio until the bucket is COVERED (the shorter
    relative side matches the bucket side, round-half-up), then crop
    the overflow symmetrically. Adds ``resize_w``/``resize_h`` (the
    intermediate dims, each >= its bucket side) and ``crop_x``/
    ``crop_y`` (top-left of the ``bucket_w x bucket_h`` crop box,
    floor of the half-overflow). All integer arithmetic
    (``(2*a + b) div (2*b)`` is round-half-up of a/b), one
    shuffle-free codegen projection, NULL in any input -> NULL plan.

    Exactness: when the image is wider than its bucket the plan
    matches heights (``resize_h = bucket_h``) and the width overflow
    is cropped; ties (exact-AR matches) take the same branch and
    produce zero crops, so the plan is total and deterministic."""
    for c in (w_col, h_col, bw_col, bh_col):
        if c not in df.columns:
            raise ValueError(f"missing column {c!r}")
    clash = [c for c in ("resize_w", "resize_h", "crop_x", "crop_y")
             if c in df.columns]
    if clash:
        raise ValueError(
            f"input already carries resize-plan columns {clash}; "
            f"rename or drop them first")
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    bw = F.col(bw_col).cast("long")
    bh = F.col(bh_col).cast("long")

    def rhu(a, b):
        # round-half-up of a/b for positive longs. The f64 division
        # is exact-enough by construction: numerator/denominator are
        # exact doubles and the true quotient is never closer than
        # 1/(2b) to an integer it doesn't equal, which dwarfs one
        # rounding ULP — so floor() lands identically in Spark and
        # the DuckDB oracle's integer `//`.
        return F.floor((2 * a + b) / (2 * b)).cast("long")

    valid = (w.isNotNull() & h.isNotNull() & bw.isNotNull()
             & bh.isNotNull() & (w > 0) & (h > 0))
    wider = (w * bh) >= (h * bw)
    rw = F.when(valid, F.when(wider, rhu(w * bh, h)).otherwise(bw))
    rh = F.when(valid, F.when(wider, bh).otherwise(rhu(h * bw, w)))
    return df.select(
        *df.columns,
        rw.cast("int").alias("resize_w"),
        rh.cast("int").alias("resize_h"),
        F.shiftright(rw - bw, 1).cast("int").alias("crop_x"),
        F.shiftright(rh - bh, 1).cast("int").alias("crop_y"),
    )


def pack_batches(
    df: DataFrame,
    *,
    batch_size: int,
    key: str,
    by: str = "bucket_id",
    n_shards: int = 256,
    drop_last: bool = True,
    seed: int = 0,
) -> DataFrame:
    """Deterministic fixed-size batch assembly within each bucket —
    the step after :func:`assign_ar_buckets` that a training run
    consumes: every row gets a ``shard`` (a stable md5 bucket of its
    ``key`` — NOT data order, so shard assignment is relayout- and
    append-stable, the ``split_bucket`` discipline), a pseudo-random
    but deterministic position inside its ``(bucket, shard)`` group
    (ordered by the md5 of ``key`` + ``seed``), and from it
    ``batch_id`` ("bucket:shard:index"), ``batch_index`` and
    ``batch_pos``. Stability contract, precisely: the SHARD of a row
    is a pure key function (appends never move it); positions and
    batch ids within a shard are deterministic for a GIVEN row set
    but SHIFT when rows are added to that shard — re-pack (or
    version the packing by snapshot) after incremental ingest, don't
    resume against stale batch ids. With ``drop_last`` the per-shard
    remainder rows (an incomplete final batch) keep their shard but
    get NULL batch columns — report, don't silently train on a short
    batch. Rows with a NULL ``by`` value or NULL ``key`` get NULL
    shard and batch columns.

    Scale shape: batches only need to be homogeneous WITHIN a bucket,
    so the window partitions on ``(bucket, shard)`` — ONE Exchange
    whose parallelism is ``n_buckets * n_shards`` (the naive
    per-bucket window would collapse 10^12 rows onto ~25 tasks).
    Both window functions (count + row_number) share the single
    Exchange+sort, and NULL-shard rows BYPASS it entirely (they are
    unioned back with NULL batch columns — at web scale even 0.1%
    unassignable rows would otherwise pile onto one (NULL, NULL)
    window partition and straggle). Remainder waste is bounded by
    ``n_buckets * n_shards * (batch_size-1)`` rows — size
    ``n_shards`` to your cluster, not your data."""
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    for c in (by, key):
        if c not in df.columns:
            raise ValueError(f"missing column {c!r}")
    clash = [c for c in ("shard", "batch_index", "batch_pos",
                         "batch_id") if c in df.columns]
    if clash:
        raise ValueError(
            f"input already carries pack_batches output columns "
            f"{clash}; rename or drop them first")
    from pyspark.sql import Window

    from .sketch import _hash48

    # NULL by OR NULL key -> NULL shard and batch columns: a row
    # without a key has no deterministic position (every NULL key
    # hashes identically, so their relative order would be
    # partition-dependent — the same reason split_bucket rejects
    # NULL keys). Duplicate keys likewise tie; use a unique id.
    shard = F.when(
        F.col(by).isNotNull() & F.col(key).isNotNull(),
        (_hash48(F.lit("shard"), F.col(key).cast("string"),
                 F.lit(str(int(seed)))) % n_shards).cast("int"))
    ordk = F.md5(F.concat_ws(
        ":", F.lit("pack"), F.col(key).cast("string"),
        F.lit(str(int(seed)))))
    base = df.select(*df.columns, shard.alias("shard"))
    valid = base.where(F.col("shard").isNotNull())
    skipped = base.where(F.col("shard").isNull())

    win = Window.partitionBy(F.col(by), F.col("shard"))
    rank = F.row_number().over(
        win.orderBy(ordk, F.col(key).cast("string"))) - 1
    n_in = F.count(F.lit(1)).over(win)
    full = (n_in - n_in % batch_size) if drop_last else n_in
    ranked = valid.select(*valid.columns, rank.alias("__rank"),
                          full.alias("__full"))
    packed = F.col("__rank") < F.col("__full")
    # integer div throughout (the module's bit-portability
    # discipline — no IEEE round-trip on the index arithmetic)
    bidx = F.when(packed, F.expr(f"__rank div {int(batch_size)}"))
    out_valid = ranked.select(
        *valid.columns,
        bidx.cast("long").alias("batch_index"),
        F.when(packed, F.col("__rank") % batch_size)
        .cast("int").alias("batch_pos"),
        F.when(packed, F.format_string(
            "%d:%d:%d", F.col(by).cast("long"), F.col("shard"),
            bidx)).alias("batch_id"),
    )
    out_skipped = skipped.select(
        *valid.columns,
        F.lit(None).cast("long").alias("batch_index"),
        F.lit(None).cast("int").alias("batch_pos"),
        F.lit(None).cast("string").alias("batch_id"),
    )
    return out_valid.unionByName(out_skipped)
