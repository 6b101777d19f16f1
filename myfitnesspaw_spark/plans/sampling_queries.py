"""Corpus-sampling and sketch queries (round 2, continued): count-min
heavy hitters, deterministic stratified sampling, and passage-level
dedup — the remaining curation ops a 100 TB training-data pass runs
before (and instead of) touching full documents.

Reference relation: the reference has no sampling/sketch surface at
all (its whole corpus is one user's days,
`/root/reference/myfitnesspaw/__init__.py:22-26`); these extend the
north-star LLM-pipeline inventory alongside plans/curation_queries.py.

Determinism contract: every hash is md5 hex; hex digits convert to
integers via the strpos-nibble trick (portable to DuckDB, no
engine-specific hex cast); counters and estimates are exact integer
sums, so the sketch the oracle builds is cell-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myfitnesspaw_spark.functions.text import normalize_text, tokens
from myfitnesspaw_spark.sources import load_table, scatter

_HEX = "0123456789abcdef"
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


def _hex_byte(h: Column, off: int) -> Column:
    """Integer value 0..255 of the hex-digit pair at 0-based ``off`` —
    byte ``off/2`` of the digest, portable as ``strpos`` arithmetic."""
    v1 = F.instr(F.lit(_HEX), F.substring(h, off + 1, 1)) - 1
    v2 = F.instr(F.lit(_HEX), F.substring(h, off + 2, 1)) - 1
    return (v1 * 16 + v2).cast("long")


def _hex_byte_sql(expr: str, off: int) -> str:
    return (
        f"CAST((strpos('{_HEX}', substr({expr}, {off + 1}, 1)) - 1) * 16"
        f" + strpos('{_HEX}', substr({expr}, {off + 2}, 1)) - 1 AS BIGINT)"
    )


# --- cms_heavy_hitters ----------------------------------------------------
# Count-min sketch over the token stream: depth 4 × width 256 counters,
# the 4 row-hashes taken as bytes 0..3 of ONE md5 per token (the same
# one-digest-many-hashes discipline as MinHash).  The sketch is tiny
# mergeable state — the structure a streaming/distributed frequency
# pass keeps instead of a full vocabulary — and the query reports the
# top-K true heavy hitters with their CMS estimate plus the in-query
# accuracy contract (estimate never undercounts; overestimate bounded
# by the row's worst-case collision mass).
#
# Scale shape: ONE corpus pass (token explode → vocabulary counts,
# map-side combined); the 1024-cell sketch, the estimate, and the
# corpus total all derive from the checkpointed vocabulary (the
# contract needs ground truth; a production pass would keep only the
# sketch).  The estimate join broadcasts the 1024-row sketch; the
# top-K window runs over the aggregated vocabulary, not the corpus.

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 20


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    occ = docs.select(F.explode(tokens(F.col("text"))).alias("token")).where(
        F.col("token") != ""
    )

    # ONE corpus pass: the token explode + count shuffle happens once,
    # and the sketch derives from the VOCABULARY (counter = Σ n_true
    # over tokens hashing to the cell — identical counters to a
    # per-occurrence build, same as the oracle's tok-derived sketch).
    # md5 and the 4× cell expand run per DISTINCT token, not per
    # occurrence — at 100 TB that is the difference between touching
    # the corpus twice and touching it once.  localCheckpoint pins the
    # vocabulary (bounded) so its three consumers (sketch, estimate,
    # total) don't re-run the corpus aggregation.
    true_counts = occ.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_true")
    ).localCheckpoint()
    return cms_report_from_counts(true_counts)


def cms_report_from_counts(true_counts: DataFrame) -> DataFrame:
    """Heavy-hitter report from a ``(token, n_true)`` vocabulary table.

    Shared tail of the batch and STREAMING sketch builds: because every
    CMS counter is an integer SUM over the vocabulary, any partition of
    the corpus into batches merges additively to the identical sketch —
    which is what lets the streaming variant share the batch oracle.
    """
    hashed = true_counts.select("n_true", F.md5(F.col("token")).alias("__h"))
    cells = hashed.select(
        "n_true",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        (_hex_byte(F.col("__h"), 2 * j) % CMS_WIDTH).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("n_true", "c.depth", "c.bucket")

    sketch = cells.groupBy("depth", "bucket").agg(F.sum("n_true").alias("counter"))

    total = true_counts.agg(F.sum("n_true").alias("__N"))

    # Estimate = min over depths of the token's counter.
    tok_cells = true_counts.select(
        "token", "n_true", F.md5(F.col("token")).alias("__h")
    ).select(
        "token",
        "n_true",
        *[
            (_hex_byte(F.col("__h"), 2 * j) % CMS_WIDTH).alias(f"b{j}")
            for j in range(CMS_DEPTH)
        ],
    )
    est = tok_cells
    for j in range(CMS_DEPTH):
        sk_j = F.broadcast(
            sketch.where(F.col("depth") == j).select(
                F.col("bucket").alias(f"b{j}"), F.col("counter").alias(f"c{j}")
            )
        )
        est = est.join(sk_j, f"b{j}")
    cms = F.least(*[F.col(f"c{j}") for j in range(CMS_DEPTH)])

    # Top-K via orderBy+limit → TakeOrderedAndProject: every partition
    # computes a partial top-K and only K rows reach the driver-side
    # merge.  The row_number() form this replaces compiled to a GLOBAL
    # (unpartitioned) window — a single-partition sort of the whole
    # vocabulary, the exact anti-pattern a 100 TB vocabulary cannot
    # survive.  The sort (n_true desc, token asc) is total, so the
    # selected rows are identical.
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n_true",
            cms.alias("n_cms"),
            (cms - F.col("n_true")).alias("overestimate"),
            # Classic CMS guarantee at width w: overestimate ≤ N/w is the
            # EXPECTED collision mass per row; min over 4 rows makes the
            # 4×-expectation bound hold with overwhelming probability.
            (cms - F.col("n_true") <= F.lit(4) * F.col("__N") / F.lit(CMS_WIDTH)).alias(
                "bound_ok"
            ),
        )
        .orderBy(F.desc("n_true"), F.asc("token"))
        .limit(CMS_TOPK)
    )


def _cms_oracle() -> str:
    bucket_cols = ", ".join(
        f"{_hex_byte_sql('md5(token)', 2 * j)} % {CMS_WIDTH} AS b{j}"
        for j in range(CMS_DEPTH)
    )
    cell_rows = ", ".join(f"({j}, b{j})" for j in range(CMS_DEPTH))
    est_joins = "\n".join(
        f"JOIN sketch s{j} ON s{j}.depth = {j} AND s{j}.bucket = t.b{j}"
        for j in range(CMS_DEPTH)
    )
    least_cs = ", ".join(f"s{j}.counter" for j in range(CMS_DEPTH))
    return f"""
WITH occ AS (
  SELECT unnest({_WORDS}) AS token FROM documents
),
occ2 AS (SELECT token FROM occ WHERE token <> ''),
tok AS (
  SELECT token, COUNT(*) AS n_true, {bucket_cols}
  FROM occ2 GROUP BY token
),
cells AS (
  SELECT t.token, c.depth, c.bucket, t.n_true
  FROM tok t, LATERAL (VALUES {cell_rows}) AS c(depth, bucket)
),
sketch AS (
  -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which the driver's hash
  -- degrades to float64 (964.0 vs Spark's bigint 964) — the one r3
  -- hash-mismatch.  BIGINT keeps both engines integer-typed.
  SELECT depth, bucket, CAST(SUM(n_true) AS BIGINT) AS counter
  FROM cells GROUP BY 1, 2
),
total AS (SELECT SUM(n_true) AS n FROM tok),
est AS (
  SELECT t.token, t.n_true, LEAST({least_cs}) AS n_cms
  FROM tok t
  {est_joins}
)
SELECT token, n_true, n_cms, n_cms - n_true AS overestimate,
       n_cms - n_true <= 4 * total.n / {CMS_WIDTH} AS bound_ok
FROM est, total
ORDER BY n_true DESC, token
LIMIT {CMS_TOPK}
"""


CMS_HEAVY_HITTERS_ORACLE = _cms_oracle()


# --- stratified_sample ----------------------------------------------------
# Deterministic per-stratum downsampling: language l keeps documents
# whose md5(doc_id) byte-0 bucket falls below rate[l] of 256 — the
# re-run-stable, cross-engine-portable form of `sampleBy`.  A pure
# row-local filter: no shuffle, no state, survives any repartitioning,
# and composes with partition pruning at 100 TB (the filter rides into
# the scan).

STRATA_RATES = {"en": 64, "de": 128, "es": 192, "fr": 255, "zh": 32}


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    bucket = _hex_byte(F.md5(F.col("doc_id").cast("string")), 0)
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r))
            for lang, r in STRATA_RATES.items()
        ],
        F.lit(0),
    )
    return docs.select(
        "doc_id", "lang", bucket.alias("bucket"), rate.alias("rate")
    ).where(F.col("bucket") < F.col("rate"))


def _stratified_oracle() -> str:
    cases = " ".join(f"WHEN '{lang}' THEN {r}" for lang, r in STRATA_RATES.items())
    b = _hex_byte_sql("md5(CAST(doc_id AS VARCHAR))", 0)
    return f"""
WITH d AS (
  SELECT doc_id, lang, {b} AS bucket,
         CAST(CASE lang {cases} ELSE 0 END AS INT) AS rate
  FROM documents
)
SELECT doc_id, lang, bucket, rate FROM d WHERE bucket < rate
"""


STRATIFIED_SAMPLE_ORACLE = _stratified_oracle()


# --- passage_dedup --------------------------------------------------------
# Sub-document (passage-level) dedup: chunk each doc into fixed
# 10-token passages, keep only the globally-first occurrence of each
# distinct passage (ordered by doc_id, position), and reassemble the
# surviving text per document — the line/passage-level pass corpus
# pipelines run between exact-dup and near-dup stages.
#
# Scale shape: chunking is row-local (one slice per passage, no
# re-tokenize per chunk); the only shuffle is the first-occurrence
# window on md5(passage) — a uniformly distributed key, skew-free by
# construction; reassembly aggregates on doc_id (second shuffle),
# sorting positions row-locally inside the aggregated array.

PASSAGE_TOKENS = 10


def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    n_chunks = F.ceil(F.size("__toks") / PASSAGE_TOKENS).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(F.col("__toks"), i * PASSAGE_TOKENS + 1, PASSAGE_TOKENS), " "
        ),
    )
    passages = toks.where(F.size("__toks") > 0).select(
        "doc_id", F.posexplode(chunks).alias("pos", "passage")
    )

    w = Window.partitionBy(F.md5(F.col("passage"))).orderBy("doc_id", "pos")
    ranked = passages.withColumn("rn", F.row_number().over(w))

    kept = F.when(F.col("rn") == 1, F.struct(F.col("pos"), F.col("passage")))
    agg = ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.sort_array(F.collect_list(kept)).alias("__kept"),
    )
    return agg.select(
        "doc_id",
        "n_passages",
        "n_kept",
        # NULL (not '') when every passage was dropped, matching the
        # oracle's FILTERed string_agg over zero rows.
        F.when(
            F.col("n_kept") > 0,
            F.array_join(F.transform(F.col("__kept"), lambda s: s["passage"]), " "),
        ).alias("text_dedup"),
    )


# --- fixed_size_sample ----------------------------------------------------
# Deterministic fixed-SIZE sampling per stratum (vs stratified_sample's
# fixed-RATE): rank documents inside each source by md5(doc_id) — a
# uniform, re-run-stable permutation — and keep the first K.  This is
# "give me exactly K docs per source for eval" with no RNG state.
#
# Scale shape: one shuffle on the stratum key for the window.  A
# stratum that dominates the corpus serializes into one task; at
# 100 TB the fix is a two-phase top-K (per-input-partition local
# row_number prune to K, then the global window over ≤ K×partitions
# survivors) — same plan shape as TakeOrderedAndProject, and the local
# prune composes here because md5 rank is partition-independent.

SAMPLE_K = 25


def fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rank_key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(rank_key, "doc_id")
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= SAMPLE_K)
    )


FIXED_SIZE_SAMPLE_ORACLE = f"""
WITH r AS (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, lang, rk FROM r WHERE rk <= {SAMPLE_K}
"""


PASSAGE_DEDUP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
),
p AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(w, i * {PASSAGE_TOKENS} + 1,
                                    (i + 1) * {PASSAGE_TOKENS}), ' ') AS passage
  FROM t, LATERAL (
    SELECT unnest(generate_series(0, CAST(ceil(len(w) / {PASSAGE_TOKENS}.0) AS BIGINT) - 1)) AS i
  )
  WHERE len(w) > 0
),
r AS (
  SELECT doc_id, pos, passage,
         ROW_NUMBER() OVER (PARTITION BY md5(passage) ORDER BY doc_id, pos) AS rn
  FROM p
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
       string_agg(passage, ' ' ORDER BY pos) FILTER (WHERE rn = 1) AS text_dedup
FROM r GROUP BY doc_id
"""


# --- hll_union_rollup -----------------------------------------------------
# The MERGEABILITY of the HLL sketch is the whole scale story: leaf
# sketches built per (event_type, day) are unioned up to event_type
# WITHOUT touching rows again — exactly how a 100 TB warehouse keeps
# daily distinct-user sketches and answers monthly/any-range distincts
# by sketch merge (re-aggregation), not re-scan.  Here both levels are
# checked against the exact distinct count: the merged estimate must
# land within the sketch's error bound (lgK=12 → ±~1.6% at 3σ; 5%
# contract), certified in-query as a boolean the oracle reproduces.


def hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("__est"),
        F.count(F.lit(1)).alias("n_leaf_sketches"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_leaf_sketches",
        "exact_distinct",
        (
            F.abs(F.col("__est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("merged_within_5pct"),
    )


HLL_UNION_ROLLUP_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_leaf_sketches,
       COUNT(DISTINCT user_id) AS exact_distinct,
       TRUE AS merged_within_5pct
FROM events GROUP BY 1
"""


# --- hll_sketch_refresh -----------------------------------------------------
# The PERSISTED-STATE completion of the sketch story (companion to
# minhash_signature_refresh's signature store): hll_union_rollup
# certifies sketch mergeability within one job, but the 100 TB pattern
# is a daily job that appends the day's (event_type, day) leaf
# sketches to a WAREHOUSE STORE and answers any-range distincts by
# merging stored sketches — never rescanning history.  This query
# certifies that protocol end to end:
#
# 1. PRIOR RUNS (simulated): leaf sketches for the 24 history days
#    (day < 2024-01-25 — the testdata event range is fixed at
#    2024-01-01..30 at every sf) persisted through the parquet index
#    store; the binary sketch column must round-trip the file format
#    losslessly for the estimate to survive.
# 2. REFRESH: only the 6 batch days are scanned and sketched; the
#    merge unions STORED binaries with fresh ones per event_type.
#
# The certification contract mirrors hll_union_rollup: the merged
# estimate must land within 5% of the exact distinct (lgK=12 is
# ±~1.6% at 3σ), emitted as a boolean the oracle reproduces — the
# exact side exists for certification only; the refresh path a
# warehouse runs is history-scan-free by construction.

HLL_REFRESH_CUTOFF = "2024-01-25"


def hll_sketch_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.sinks.warehouse import (
        read_index_store,
        store_path,
        write_index_store,
    )

    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    cutoff = F.lit(HLL_REFRESH_CUTOFF).cast("date")
    history = (
        events.where(day < cutoff)
        .groupBy("event_type", day.alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    path = store_path("hll_daily", sf_dir)
    write_index_store(history, path)
    store = read_index_store(spark, path, "event_type string, d date, sketch binary")

    batch = (
        events.where(day >= cutoff)
        .groupBy("event_type", day.alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    leaves = store.withColumn("__h", F.lit(1)).unionByName(
        batch.withColumn("__h", F.lit(0))
    )
    merged = leaves.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("__est"),
        F.sum("__h").cast("long").alias("n_history_sketches"),
        F.sum(F.lit(1) - F.col("__h")).cast("long").alias("n_batch_sketches"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    # excess_err_bp: basis points OVER the 5% bar, clamped to 0 while
    # within it — constant (hash-stable) on success, but a future
    # failure self-reports its magnitude instead of a bare flipped
    # boolean (ADVICE r11: lgConfigK default or estimator changes
    # would otherwise surface as an unexplained hash mismatch).
    err_excess = F.abs(F.col("__est") - F.col("exact_distinct")) - 0.05 * F.col(
        "exact_distinct"
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_history_sketches",
        "n_batch_sketches",
        "exact_distinct",
        (
            F.abs(F.col("__est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("merged_within_5pct"),
        F.greatest(
            F.lit(0).cast("long"),
            F.ceil(err_excess * 10000 / F.col("exact_distinct")).cast("long"),
        ).alias("excess_err_bp"),
    )


HLL_SKETCH_REFRESH_ORACLE = f"""
SELECT event_type,
       COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
         FILTER (WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) < DATE '{HLL_REFRESH_CUTOFF}')
         AS n_history_sketches,
       COUNT(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
         FILTER (WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) >= DATE '{HLL_REFRESH_CUTOFF}')
         AS n_batch_sketches,
       COUNT(DISTINCT user_id) AS exact_distinct,
       TRUE AS merged_within_5pct,
       CAST(0 AS BIGINT) AS excess_err_bp
FROM events GROUP BY 1
"""


# --- weighted_sample ------------------------------------------------------
# Deterministic importance sampling: each document keeps with
# probability proportional to a per-row weight (here: token count
# capped at 256 — the "sample long documents more" curation policy).
# The per-row uniform is md5 bytes 2-3 of doc_id (a 16-bit lattice,
# independent of the byte-0 lattice stratified_sample draws from), and
# the keep test is `u16 < weight·256` in exact integers — re-run
# stable, engine-portable, and a pure row-local filter that rides into
# the scan at 100 TB exactly like the stratified variant.

_WSAMPLE_CAP = 256


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    weight = F.least(F.size(tokens(F.col("text"))), F.lit(_WSAMPLE_CAP))
    u16 = (
        _hex_byte(F.md5(F.col("doc_id").cast("string")), 2) * 256
        + _hex_byte(F.md5(F.col("doc_id").cast("string")), 4)
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            weight.alias("weight"),
            u16.alias("u16"),
        )
        .where(F.col("u16") < F.col("weight") * 256)
        .select("doc_id", "lang", "weight", "u16")
    )


WEIGHTED_SAMPLE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, lang,
         LEAST(len({_WORDS}), {_WSAMPLE_CAP}) AS weight,
         {_hex_byte_sql("md5(CAST(doc_id AS VARCHAR))", 2)} * 256
         + {_hex_byte_sql("md5(CAST(doc_id AS VARCHAR))", 4)} AS u16
  FROM documents
)
SELECT doc_id, lang, CAST(weight AS INT) AS weight, u16
FROM w WHERE u16 < weight * 256
"""
