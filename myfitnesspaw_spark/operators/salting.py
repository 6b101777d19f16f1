"""Exact skew decomposition for same-key pair self-joins.

A self-join on a bucket/band key does Σ|group|²/2 comparisons, and at
100 TB ONE hot key (a degenerate LSH band over a slice of
near-identical crawl documents, a giant coarse cluster) turns that
into a single straggler task — or an executor OOM.  The cure used
across the engine's near-dup operators is Suri & Vassilvitskii's
triangle-count partitioning ("Counting triangles and the curse of the
last reducer", WWW'11): decompose each key's pair space into
G(G+1)/2 salt-cells.  Every row gets ``salt = pmod(hash(id), G)`` and
is replicated into the G cells ``{min(salt,t), max(salt,t)}``; a pair
is accepted ONLY in its canonical cell ``{min,max}`` of the two
salts, so the output is duplicate-free and RESULT-IDENTICAL to the
unsalted join while the hot key's quadratic work spreads over
G(G+1)/2 parallel tasks at G× row replication.  G=1 degenerates to
the plain join.

Consumers: ``similarity.bucket_near_dup`` (embedding buckets),
``similarity.srp_lsh_pairs`` and ``dedup.minhash_lsh_pairs`` (LSH
band keys).  The salt column is derived from the row id, never the
key, so replication is uniform even when the key distribution is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"
CELL_COL = "__cell"


def with_salt_cells(df: DataFrame, id_col: str, salt_groups: int) -> DataFrame:
    """Append ``__salt`` (= pmod(hash(id), G)) and the exploded
    ``__cell`` struct (ci ≤ cj) replicating each row into its G
    cells.  ``array_distinct`` collapses the duplicate {salt, salt}
    diagonal cell, so replication is exactly G rows per input row."""
    g = salt_groups
    salted = df.withColumn(SALT_COL, F.pmod(F.hash(F.col(id_col)), F.lit(g)))
    return salted.select(
        "*",
        F.explode(
            F.array_distinct(
                F.array(
                    *[
                        F.struct(
                            F.least(F.col(SALT_COL), F.lit(t)).alias("ci"),
                            F.greatest(F.col(SALT_COL), F.lit(t)).alias("cj"),
                        )
                        for t in range(g)
                    ]
                )
            )
        ).alias(CELL_COL),
    )


def canonical_cell_pred(
    salt_a: str = "__salt_a",
    salt_b: str = "__salt_b",
    cell: str = CELL_COL,
) -> Column:
    """Accept a joined pair only in the one cell equal to
    ``{min(salt_a, salt_b), max(salt_a, salt_b)}`` — each unordered
    pair shares exactly that cell, so no post-join distinct is needed
    to undo the replication.  ``cell`` may be alias-qualified (e.g.
    ``"a.__cell"``) when both join sides carry the cell column."""
    return (F.col(f"{cell}.ci") == F.least(F.col(salt_a), F.col(salt_b))) & (
        F.col(f"{cell}.cj") == F.greatest(F.col(salt_a), F.col(salt_b))
    )
