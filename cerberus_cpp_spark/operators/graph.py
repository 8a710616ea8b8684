"""Graph primitives over edge DataFrames: bounded-depth BFS and
degree-oriented triangle counting.

Why they live here: the dedup family already runs one graph
algorithm at scale (connected components over near-dup pairs,
``operators/dedup.py``); these are the next two questions a curation
loop asks of the same pair graphs — "what else is within k hops of
this contaminated seed set" (blast-radius expansion for eval-set
decontamination) and "how clique-y is the duplicate graph" (triangle
density separates true duplicate clusters from hash-collision
chains). Reference analogue: the referential-integrity multi-hop
chain checks (SURVEY §2.3) generalized from FK paths to arbitrary
edges.

Scale shapes:

- ``bfs_hops`` is frontier expansion with a DRIVER-BOUNDED loop
  (``max_hops`` iterations, like the pointer-jumping rounds in
  ``dedup.connected_components``): each round is one equi-join of
  the CURRENT frontier against the edge table plus an anti-join
  against the visited set — the frontier never re-expands visited
  nodes, so total work is O(edges touched), not O(edges * rounds).
  Every shuffle is keyed on the node id; no step is
  data-proportional on the driver.
- ``triangle_count`` uses the classic degree orientation (each
  undirected edge points from its (degree, id)-smaller endpoint to
  the larger): the oriented graph is acyclic with max out-degree
  O(sqrt(m)) for ANY graph, so the wedge join's fan-out is bounded
  and each triangle is counted EXACTLY once. Two equi-joins, all
  integer arithmetic — the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simple_undirected(edges: DataFrame, *, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """Canonicalize an edge list into a simple undirected graph:
    drop self-loops and NULL endpoints, order each pair as
    (u = least, v = greatest), dedupe. One distinct aggregate."""
    return (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull()
                    & (F.col(src) != F.col(dst)))
        .select(F.least(src, dst).alias("u"),
                F.greatest(src, dst).alias("v"))
        .distinct()
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 3,
    directed: bool = False,
) -> DataFrame:
    """Minimum hop count from any seed to every node within
    ``max_hops`` edges: returns ``(node, hops)`` with seeds at 0.
    Undirected mode (default) walks edges both ways.

    Frontier loop, one round per hop (driver-bounded — the loop
    count is a parameter, never data-dependent): new frontier =
    neighbors of the current frontier anti-joined against all
    visited nodes, both sides keyed on the node id. Each round's
    frontier and visited set are lazily ``localCheckpoint``ed —
    each is referenced by the next round AND the final result, and
    without the truncation the lineage doubles per round (the same
    discipline as ``dedup.connected_components``; blocks are freed
    when the frames are garbage-collected). The early-exit probe
    (``limit(1)``) is the only per-round driver action and stops
    the loop as soon as a frontier drains."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    adj = edges.where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        adj = adj.unionByName(
            adj.select(F.col("b").alias("a"), F.col("a").alias("b")))
    adj = adj.distinct()

    frontier = (
        seeds.where(F.col(node).isNotNull())
        .select(F.col(node).alias("n")).distinct()
        .localCheckpoint(eager=False)
    )
    visited = frontier.withColumn("hops", F.lit(0)) \
        .localCheckpoint(eager=False)
    for h in range(1, int(max_hops) + 1):
        frontier = (
            adj.join(frontier, adj["a"] == frontier["n"])
            .select(F.col("b").alias("n")).distinct()
            .join(visited.select("n"), "n", "left_anti")
            .localCheckpoint(eager=False)
        )
        if frontier.limit(1).count() == 0:
            break
        visited = visited.unionByName(
            frontier.withColumn("hops", F.lit(h))
        ).localCheckpoint(eager=False)
    return visited.select(F.col("n").alias(node), "hops")


def triangle_count(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact triangle count of the simple undirected graph, one
    row: ``(n_nodes, n_edges, n_triangles)``.

    Degree orientation: point each edge from its (degree, id)-
    smaller endpoint to the larger — acyclic, out-degree bounded by
    O(sqrt(m)) — then count wedges (a→b, a→c with b < c ordered by
    the same key) closed by an oriented edge b→c. Each triangle has
    exactly one vertex with out-edges to the other two under a total
    order, so the count is exact with no division. Three
    aggregates + two equi-joins, all integers."""
    g = simple_undirected(edges, src=src, dst=dst)
    deg = (
        g.select(F.col("u").alias("x"))
        .unionByName(g.select(F.col("v").alias("x")))
        .groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    )
    # orient: keep (lo, hi) by the total key (degree, id)
    withd = (
        g.join(deg.withColumnRenamed("x", "u")
               .withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v")
              .withColumnRenamed("d", "dv"), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    o = withd.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    w1 = o.select(F.col("a"), F.col("b").alias("p"))
    w2 = o.select(F.col("a"), F.col("b").alias("q"))
    # wedge (p, q) normalized by id order == g's own (least,
    # greatest) convention, so the closure join hits g directly
    wedges = w1.join(w2, "a").where(F.col("p") < F.col("q"))
    closed = wedges.join(
        g.select(F.col("u").alias("p"), F.col("v").alias("q")),
        ["p", "q"])
    return (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(g.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(closed.agg(
            F.count(F.lit(1)).alias("n_triangles")))
    )
