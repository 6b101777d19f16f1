"""Embedding similarity search: brute-force cosine top-k and a
bucket-pruned (IVF-style) near-duplicate variant.

The dot product / norm stay JVM-side as higher-order-function folds
over the ``array<float>`` column — sequential fold order is the SAME
order DuckDB's list fold uses, and float→double widening is exact, so
the only cross-engine slack is final-ulp; results are rounded to 6
decimals before ranking/thresholding, which both engines agree on.

Scale shapes (100 TB stance):
- ``cosine_topk``: the query set is the small side → broadcast against
  the partitioned corpus; per-corpus-partition local scoring, then one
  top-k shuffle on query_id.  This is exactly how a brute-force scan
  over a sharded 10-billion-vector corpus is built.
- ``bucket_near_dup``: IVF-style — vectors only compare within their
  coarse bucket (here the ``label`` column plays the centroid
  assignment a k-means step would produce), so the join shuffles on
  the bucket key and cost drops from N² to Σ bucket².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myfitnesspaw_spark.operators.dedup import topk_per_key

COS_DECIMALS = 6


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity rounded to ``COS_DECIMALS`` decimals."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), COS_DECIMALS)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the ``k``
    nearest corpus vectors (excluding itself).

    Returns ``(query_id, neighbor_id, rank, cos)``; ties break on
    neighbor id so ranking is deterministic cross-engine.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    return topk_per_key(
        scored, ["query_id"], [F.col("cos").desc(), F.col("neighbor_id").asc()], k
    ).select("query_id", "neighbor_id", "rank", "cos")


def bucket_near_dup(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    threshold: float,
) -> DataFrame:
    """IVF-style near-dup: pairs within the same coarse bucket whose
    cosine ≥ ``threshold``.  Returns ``(id_a, id_b, bucket, cos)``
    with ``id_a < id_b``."""
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col(bucket_col).alias("bucket")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col(bucket_col).alias("bucket")
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "bucket", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
