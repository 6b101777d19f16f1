"""Training-shard writer: the data-loader-facing sink of the LLM
pipeline — packed sequences land as size-targeted parquet shards plus
a JSON manifest the loader (and a resumable writer) can trust.

Why not a plain ``df.write.parquet``: a training job wants (a) shards
of a PREDICTABLE size so data-parallel workers stride evenly, (b) a
manifest recording per-shard row counts / token totals / content
digest so ingestion can verify shards without re-reading them all, and
(c) deterministic shard assignment so a re-run produces byte-stable
membership (resume/dedup-safe).

Scale shape: shard count derives from a cheap count aggregate; the
write is ONE ``repartition(n, key)`` hash shuffle (deterministic
membership — rows carry their shard id, computed from the hash key,
not from task placement); per-shard stats are computed by RE-READING
the written parquet — one extra columnar scan of the output, pruned
to the key/token columns.  Recomputing them from the input lineage
would run the plan a second time, and for any nondeterministic input
(a sample, an unordered limit, a rand-derived column) the manifest
would then describe rows that were never written — the verifier would
later flag intact data as corrupt.  Reading back what the files
actually contain makes the manifest trustworthy by construction.
The manifest is a driver-side JSON of O(shards) size — never row data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_shard_manifest.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    token_col: str | None = None,
    target_rows_per_shard: int = 10_000,
) -> dict:
    """Write ``df`` as deterministic hash shards under ``path``.

    Every row's shard is ``pmod(hash(key_cols), n_shards)`` — a pure
    function of its key, so membership is stable across re-runs and
    cluster sizes.  The data is written partitioned by ``shard_id``
    (one directory per shard), and a manifest records, per shard:
    row count, token total (when ``token_col`` given), and an
    order-insensitive content digest (sum of per-row key hashes —
    mergeable, so a verifier can recompute it shard-local).

    Returns the manifest dict (also written to ``path/MANIFEST_NAME``).
    """
    n_rows = df.count()
    n_shards = max(1, (n_rows + target_rows_per_shard - 1) // target_rows_per_shard)
    keyed = df.withColumn(
        "shard_id", F.pmod(F.hash(*key_cols), F.lit(n_shards)).cast("int")
    )
    # 60-bit md5 prefix per row, summed as decimal(38,0): order-
    # insensitive, mergeable, overflow-safe into the billions of rows.
    digest_long = F.expr(
        "conv(substring(md5(concat_ws('\x1f', {cols})), 1, 15), 16, 10)".format(
            cols=", ".join(key_cols)
        )
    ).cast("decimal(38,0)")
    stats_agg = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(digest_long).alias("digest_sum"),
    ]
    if token_col is not None:
        stats_agg.append(F.sum(token_col).alias("tokens"))
    # One shuffle: the repartition co-locates each shard for the write.
    shuffled = keyed.repartition(n_shards, "shard_id")
    shuffled.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    # Stats come from the WRITTEN files, not the input lineage: the
    # write and a lineage re-execution are separate jobs, so for a
    # nondeterministic input plan they can observe different rows —
    # the manifest must describe the bytes on disk (the same scan
    # verify_training_shards performs; column-pruned to key/token
    # columns, so the read-back touches a fraction of the output).
    written = df.sparkSession.read.parquet(path)
    stats = {
        int(r["shard_id"]): {
            "rows": int(r["rows"]),
            "digest_sum": str(r["digest_sum"]),
            **({"tokens": int(r["tokens"])} if token_col is not None else {}),
        }
        for r in written.groupBy("shard_id").agg(*stats_agg).collect()
    }
    manifest = {
        "n_rows": sum(s["rows"] for s in stats.values()),
        "n_shards": n_shards,
        "key_cols": key_cols,
        "token_col": token_col,
        "shards": {str(k): v for k, v in sorted(stats.items())},
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_training_shards(spark: SparkSession, path: str) -> dict:
    """Re-read the shards and verify the manifest: per-shard row
    counts and content digests recomputed from the data must match.
    Returns ``{"ok": bool, "mismatches": [...]}`` — the ingestion-side
    integrity gate."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    df = spark.read.parquet(path)
    key_cols = manifest["key_cols"]
    digest_long = F.expr(
        "conv(substring(md5(concat_ws('\x1f', {cols})), 1, 15), 16, 10)".format(
            cols=", ".join(key_cols)
        )
    ).cast("decimal(38,0)")
    got = {
        str(r["shard_id"]): {
            "rows": int(r["rows"]),
            "digest_sum": str(r["digest_sum"]),
        }
        for r in df.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("rows"), F.sum(digest_long).alias("digest_sum"))
        .collect()
    }
    mismatches = []
    for sid, want in manifest["shards"].items():
        have = got.get(sid)
        if have is None:
            mismatches.append({"shard": sid, "err": "missing"})
        elif have["rows"] != want["rows"] or have["digest_sum"] != want["digest_sum"]:
            mismatches.append({"shard": sid, "want": want, "have": have})
    for sid in set(got) - set(manifest["shards"]):
        mismatches.append({"shard": sid, "err": "unexpected"})
    return {"ok": not mismatches, "mismatches": mismatches}
