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
