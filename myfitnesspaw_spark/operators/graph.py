"""Iterative link analysis over pair graphs (PageRank).

Complements operators/dedup.py's connected components: CC answers
"which docs are the same", PageRank answers "which doc is the most
central of its duplicate neighborhood" — the canonical-pick signal a
curation pass uses when 'lowest id wins' is too crude.

Determinism contract (cross-engine hash parity): ranks are exact
integer units.  Each contribution is ``rank DIV deg`` (truncating
integer division, identical in Spark and DuckDB), the neighbor sum is
an integer SUM (order-independent), and the damping update is
``0.15·SCALE + (85·Σ) DIV 100`` — no floats anywhere, so N unrolled
iterations produce bit-identical units in both engines.

Scale shape: per round, ONE join of the rank table to the symmetric
edge list on the source key and ONE map-side-combined sum on the
destination key — the textbook distributed PageRank step.  The edge
list is checkpointed once (reused every round); the rank lineage is
truncated per round with ``localCheckpoint`` like the CC loops.  No
driver-side collect anywhere; round count is a fixed small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000
PR_DAMP_NUM = 85  # damping = 0.85 as a rational
PR_DAMP_DEN = 100


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iterations: int = 3,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Exact-integer PageRank over an UNDIRECTED pair graph.

    Every node starts at ``scale`` units; each of ``iterations`` rounds
    sets ``rank' = 0.15·scale + 0.85·Σ_in (rank DIV deg)`` in
    truncating integer arithmetic.  Nodes are the edge endpoints, so
    every node has degree ≥ 1 (no dangling-mass correction needed).

    Returns ``(node, deg, rank_units)``.
    """
    from myfitnesspaw_spark.operators.dedup import _loop_shuffle_partitions

    # Materialize the pair-derivation lineage ONCE (eager: the edge
    # count below both pins it and sizes the loop's shuffle width).
    edges = edges.localCheckpoint()
    sym = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d")).unionByName(
        edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
    )
    # Same loop discipline as the CC operators: the rank/edge tables
    # are orders of magnitude smaller than the corpus the pairs came
    # from, so the per-round join + sum must not pay a corpus-sized
    # shuffle-partition count in empty-task scheduling overhead.
    with _loop_shuffle_partitions(edges.sparkSession, edges.count()):
        deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        nodes = deg.select(F.col("s").alias("node"), "deg").localCheckpoint(
            eager=False
        )
        base = (15 * scale) // 100
        ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
        for _ in range(iterations):
            contrib = ranks.join(
                sym, ranks["node"] == sym["s"]
            ).select(F.col("d"), F.expr("rank DIV deg").alias("c"))
            sums = contrib.groupBy("d").agg(F.sum("c").alias("csum"))
            ranks = (
                nodes.join(sums, nodes["node"] == sums["d"], "left")
                .select(
                    "node",
                    "deg",
                    (
                        F.lit(base)
                        + F.expr(
                            f"({PR_DAMP_NUM} * coalesce(csum, 0L)) DIV {PR_DAMP_DEN}"
                        )
                    ).cast("long").alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
    return ranks.select("node", "deg", F.col("rank").alias("rank_units"))
