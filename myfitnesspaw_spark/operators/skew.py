"""Skew mitigation: salted join for hot keys.

AQE's skew-join split handles most runtime skew
(``spark.sql.adaptive.skewJoin``, on in session.py), but it only
splits SORT-MERGE join partitions; a broadcast-ineligible join against
a dimension with a few mega-hot keys still bottlenecks a handful of
tasks.  Salting fixes that structurally: replicate the build side N
ways, spread the probe side across the N replicas with a
DETERMINISTIC salt (hash of stable probe columns — never ``rand()``,
which breaks retry idempotency and result stability), join on
(key, salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt_from: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side replicated ``num_salts``× and the
    probe side salted by ``pmod(hash(salt_from), num_salts)``.

    Result-identical to ``probe.join(build, on, how)`` for 'inner' and
    'left' — every probe row meets exactly one replica of each
    matching build row.  ``salt_from`` should be high-cardinality
    probe columns (e.g. its primary key) so salts distribute evenly
    within each hot key.
    """
    salted_probe = probe.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(num_salts))
    )
    replicas = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted_probe.join(replicas, [*on, "__salt"], how).drop("__salt")
