"""Corpus-curation and warehouse-history queries (round 2):
TF-IDF vocabulary scoring, benchmark-contamination check, Gopher-style
repetition quality, PII redaction, SCD2 history build, time-range pair
join, histogramming, and a DataSketches-HLL distinct check — each with
a DuckDB oracle.

These extend the training-data-pipeline surface (SURVEY.md §7.2.7)
with the remaining ops a 100 TB curation pass runs: vocabulary/IDF
statistics, train-vs-eval n-gram contamination, repetition filters
(Rae et al., Gopher §A.1.1), PII scrubbing, and dimension-history
(SCD2) builds for the warehouse side.

Determinism contract (the driver hash-compares cells): integer
arithmetic wherever a value crosses a group boundary; IDF uses
integer-scaled floor division (``N*1e6 DIV df``) instead of ``ln`` —
Java's ``Math.log`` and libm may differ in the last ulp, integer DIV
cannot; ratios are a single double division of exact ints, rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myfitnesspaw_spark.checkpoints import materialize_instance_sized
from myfitnesspaw_spark.functions.numeric import epoch_us
from myfitnesspaw_spark.functions.text import normalize_text, tokens
from myfitnesspaw_spark.operators.dedup import shingle_sets
from myfitnesspaw_spark.sources import load_table, scatter

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"


# --- tf_idf_topk ----------------------------------------------------------

TFIDF_K = 5
_IDF_SCALE = 1_000_000


def tf_idf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K TF-IDF terms per document.

    Scale shape: one shuffle for the per-(doc, term) count, one
    map-side-combined aggregate for document frequency (vocabulary-
    sized, broadcast back), one window for top-K.  The corpus count
    joins in as a 1-row broadcast rather than a driver-side collect so
    the plan stays fully lazy.

    IDF is integer-scaled floor division (``N·10⁶ DIV df``): monotone
    in N/df, exact in both engines (``ln`` is last-ulp engine-dependent).
    """
    docs = scatter(load_table(spark, sf_dir, "documents"))
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # tf feeds both the df aggregate and the scoring join; checkpoint
    # it so the corpus explode runs once (same discipline as bm25_rank).
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * ((F.col("n_docs") * _IDF_SCALE).cast("long") / F.col("df")).cast("long")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_K)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


TF_IDF_ORACLE = f"""
WITH d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
terms AS (SELECT doc_id, unnest(w) AS term FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, f.df,
         t.tf * ((n.n_docs * {_IDF_SCALE}) // f.df) AS score
  FROM tf t JOIN dfreq f ON t.term = f.term, n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= {TFIDF_K}
"""


# --- bm25_rank ------------------------------------------------------------
# Okapi BM25 retrieval scoring over the documents corpus for the 3
# highest-document-frequency query terms — the ranking function a
# corpus-curation / retrieval pass runs after TF-IDF.  Classic form:
#
#   score = IDF(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
#
# with k1=1.2, b=0.75.  Both factors are computed in exact integer
# arithmetic so Spark and DuckDB agree bit-for-bit: the log-IDF is
# replaced by the monotone rational surrogate (N − df + 1)·10⁶ DIV
# (df + 1) (ln is last-ulp engine-dependent — same substitution as
# tf_idf_topk's DIV-scaled IDF), and the tf saturation term is cleared
# of fractions by multiplying through by 10·total_tokens:
#
#   tfc = tf·22·total_tokens·10³ DIV ((10·tf + 3)·total_tokens + 9·dl·n_docs)
#
# (22 = 10·(k1+1); 3 = 10·k1·(1−b); 9 = 10·k1·b; dl/avgdl =
# dl·n_docs/total_tokens).  Scale shape: tf/df/dl are the same
# aggregates TF-IDF builds; the query-term set and the corpus totals
# are 1-row/3-row broadcasts; one window ranks top-10 per term.  At
# real scale you'd keep doubles — the integer form is the
# cross-engine-parity variant and preserves the exact ranking.

BM25_TOPK = 10
_BM25_IDF_SCALE = 1_000_000
_BM25_TF_SCALE = 1_000
_BM25_QTERMS = 3


def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # ONE corpus pass: tf is the only aggregate that reads the token
    # explode; dl (Σ tf per doc), df, and the corpus totals all derive
    # from it.  localCheckpoint pins tf so its three consumers don't
    # each re-run the corpus explode.
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    qterms = df_counts.orderBy(F.col("df").desc(), F.col("term").asc()).limit(
        _BM25_QTERMS
    )
    # Long `/` in Spark routes through double (53-bit mantissa) — use
    # the exact integer DIV the oracle's `//` also uses.
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            ((F.col("n_docs") - F.col("df") + 1) * _BM25_IDF_SCALE).alias("idf_num"),
            (F.col("df") + 1).alias("idf_den"),
            (F.col("tf") * 22 * F.col("total_tokens") * _BM25_TF_SCALE).alias("tf_num"),
            (
                (10 * F.col("tf") + 3) * F.col("total_tokens")
                + 9 * F.col("dl") * F.col("n_docs")
            ).alias("tf_den"),
        )
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            F.expr("(idf_num DIV idf_den) * (tf_num DIV tf_den)").alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BM25_TOPK)
        .select("term", "rank", "doc_id", "tf", "dl", "score")
    )


BM25_ORACLE = f"""
WITH d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
terms AS (SELECT doc_id, unnest(w) AS term FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY 1),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
qterms AS (SELECT term, df FROM dfreq ORDER BY df DESC, term ASC LIMIT {_BM25_QTERMS}),
scored AS (
  SELECT t.term, t.doc_id, t.tf, l.dl,
         (((x.n_docs - q.df + 1) * {_BM25_IDF_SCALE}) // (q.df + 1))
         * ((t.tf * 22 * x.total_tokens * {_BM25_TF_SCALE})
            // ((10 * t.tf + 3) * x.total_tokens + 9 * l.dl * x.n_docs)) AS score
  FROM tf t
  JOIN qterms q ON t.term = q.term
  JOIN dl l ON t.doc_id = l.doc_id, totals x
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY term
                               ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT term, CAST(rank AS INT) AS rank, doc_id, tf, dl, CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= {BM25_TOPK}
"""


# --- ngram_contamination --------------------------------------------------
# Decontamination pass: which training docs share an 8-word n-gram with
# any doc in the held-out eval slice (doc_id % 17 == 0)?  The standard
# pre-training hygiene check (e.g. GPT-3 §C, PaLM §7) — at scale the
# eval side is tiny and broadcasts; the train side streams through.

CONTAM_N = 8
_EVAL_MOD = 17


def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    grams = shingle_sets(docs, "doc_id", "text", n=CONTAM_N)
    train = grams.where(F.col("doc_id") % _EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    ev = grams.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    return (
        train.join(ev, "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


NGRAM_CONTAMINATION_ORACLE = f"""
WITH d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         list_aggregate(w[i:i+{CONTAM_N - 1}], 'string_agg', ' ') AS gram
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(w) - {CONTAM_N - 1})) AS i)
  WHERE len(w) >= {CONTAM_N}
)
SELECT t.doc_id AS train_doc_id, e.doc_id AS eval_doc_id,
       COUNT(*) AS n_shared_grams
FROM g t JOIN g e ON t.gram = e.gram
WHERE t.doc_id % {_EVAL_MOD} != 0 AND e.doc_id % {_EVAL_MOD} = 0
GROUP BY 1, 2
"""


# --- decontaminated_corpus ------------------------------------------------
# The REMOVAL step that closes the contamination loop (detect →
# remove), mirroring dedup's detect → cluster → survivors symmetry:
# drop from the TRAIN split every document sharing at least
# DECONTAM_MIN_SHARED n-grams with the eval split (the GPT-3 appendix
# C recipe: exact n-gram overlap against benchmarks, offending
# documents removed before training).
#
# Scale shape: the contaminated-id set comes from the SAME inverted-
# index shingle join as ngram_contamination (candidate-bounded, eval
# side restricted pre-shuffle), distinct-ed down to train doc ids —
# result-bounded but corpus-proportional worst case, so the final
# LEFT ANTI carries NO broadcast hint (SURVEY §4.1 policy: stats/AQE
# decide; a forced broadcast of a could-be-huge hit set is an OOM).

DECONTAM_MIN_SHARED = 1


def decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    # Both join sides (train + eval) read the gram table; checkpoint so
    # the extraction runs once (r20, wave-3 single-extraction pattern).
    grams = materialize_instance_sized(
        shingle_sets(docs, "doc_id", "text", n=CONTAM_N)
    )
    train = grams.where(F.col("doc_id") % _EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    ev = grams.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    contaminated = (
        train.join(ev, "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= DECONTAM_MIN_SHARED)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
    )
    return (
        docs.where(F.col("doc_id") % _EVAL_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


DECONTAMINATED_CORPUS_ORACLE = f"""
WITH d AS (SELECT doc_id, {{words}} AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         list_aggregate(w[i:i+{CONTAM_N - 1}], 'string_agg', ' ') AS gram
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(w) - {CONTAM_N - 1})) AS i)
  WHERE len(w) >= {CONTAM_N}
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM g t JOIN g e ON t.gram = e.gram
  WHERE t.doc_id % {_EVAL_MOD} != 0 AND e.doc_id % {_EVAL_MOD} = 0
  GROUP BY t.doc_id, e.doc_id
  HAVING COUNT(*) >= {DECONTAM_MIN_SHARED}
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
LEFT JOIN contaminated c ON d.doc_id = c.doc_id
WHERE d.doc_id % {_EVAL_MOD} != 0 AND c.doc_id IS NULL
""".format(words=_WORDS)


# --- bloom_decontaminated_corpus ---------------------------------------------
# Decontamination through a PERSISTED BLOOM FILTER of the benchmark
# n-grams — the third member of the index-store family (MinHash bands,
# HLL sketches, now membership).  At 100 TB the benchmark gram set is
# fixed and small but the corpus is not: shipping the benchmark into a
# shuffle join on every ingest (decontaminated_corpus's shape) moves
# the corpus' gram stream; the production pattern builds the bloom
# ONCE, persists it, and every ingest applies it as a SCAN-LOCAL
# prefilter — only grams the bloom admits (true hits + false
# positives) reach the exact verification join.
#
# The bloom is hand-rolled and deterministic — BLOOM_K bit positions
# per gram from md5 hex slices, OR-ed into BLOOM_WORDS 64-bit words by
# a bit_or aggregate — because Spark's built-in BloomFilterAggregate
# is an optimizer-internal expression, not a callable function, and a
# portable bloom must rebuild bit-identically from the same grams.
# Build and probe share _bloom_pos, so the no-false-negative property
# holds by construction; the collected filter (256 longs — bounded,
# like IVF centroids / PQ codebooks) rides into every probe task as
# one array literal, making the prefilter pure whole-stage codegen.
#
# CERTIFIED CLAIM: the bloom-prefilter path is RESULT-IDENTICAL to
# the exact path — false positives are re-checked by the exact join,
# false negatives don't exist — so this registers against the very
# same oracle as decontaminated_corpus and must hash-match it.

BLOOM_BITS = 16_384  # m = 2^14 bits -> 256 64-bit words
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 3


def _bloom_pos(gram, j: int):
    """Bit position j for a gram: 4 md5 hex chars (16 bits) mod m.
    The ONE definition both the build and the probe use."""
    return (
        F.conv(F.substring(F.md5(gram), 4 * j + 1, 4), 16, 10).cast("long")
        % BLOOM_BITS
    )


def bloom_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.sinks.warehouse import (
        read_index_store,
        store_path,
        write_index_store,
    )

    docs = scatter(load_table(spark, sf_dir, "documents"))
    # THREE consumers read the gram table (bloom build, the exact-verify
    # eval side, the train probe side); localCheckpoint materializes the
    # tokenize+shingle extraction once instead of re-running it per
    # consumer (r20, guide §2.4 / the wave-3 single-extraction pattern).
    grams = materialize_instance_sized(
        shingle_sets(docs, "doc_id", "text", n=CONTAM_N)
    )
    ev = grams.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )

    # -- simulated prior run: build the benchmark bloom, persist it.
    coords = ev.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("shingle"), j) for j in range(BLOOM_K)])
        ).alias("pos")
    )
    bloom_rows = (
        coords.select(
            F.expr("int(pos div 64)").alias("word_idx"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    path = store_path("benchmark_bloom", sf_dir)
    write_index_store(bloom_rows, path)
    stored = {
        int(r["word_idx"]): int(r["bits"])
        for r in read_index_store(spark, path, "word_idx int, bits long").collect()
    }
    bloom_lit = F.array(
        *[F.lit(stored.get(i, 0)).cast("long") for i in range(BLOOM_WORDS)]
    )

    # -- ingest: scan-local bloom prefilter on the train gram stream.
    probed = grams.where(F.col("doc_id") % _EVAL_MOD != 0).withColumn(
        "__bloom", bloom_lit
    )
    cond = F.lit(True)
    for j in range(BLOOM_K):
        probed = probed.withColumn(f"__p{j}", _bloom_pos(F.col("shingle"), j))
        cond = cond & F.expr(
            f"(element_at(__bloom, int(__p{j} div 64) + 1)"
            f" & shiftleft(1L, int(__p{j} % 64))) != 0"
        )
    candidates = probed.where(cond).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )

    # -- exact verification on the admitted grams only (kills false
    # -- positives; same pair-count threshold as decontaminated_corpus).
    contaminated = (
        candidates.join(ev, "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= DECONTAM_MIN_SHARED)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
    )
    return (
        docs.where(F.col("doc_id") % _EVAL_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


# --- repetition_quality ---------------------------------------------------
# Gopher-style repetition filters (Rae et al. 2021, §A.1.1): fraction
# of tokens in the most frequent word, and fraction of duplicate word
# trigrams.  High values flag boilerplate/spam before training.


def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    words = toks.select("doc_id", F.explode("__toks").alias("word"))
    wc = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    # KEPT AS A WINDOW on purpose (r20): Spark 4 plans rn==1 filters as
    # WindowGroupLimit — a map-side partial top-1 BEFORE the exchange —
    # so the "replace the window with a partial-aggregable min(struct)"
    # rewrite has nothing left to save and measured NEUTRAL-to-SLOWER
    # (best-of-5 A/B at sf0.1: 1.231s window vs 1.406-1.853s struct;
    # the struct form pays per-row struct construction in the partial
    # aggregate).  Don't re-try without re-measuring.
    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("word").asc())
    top = (
        wc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_word"), F.col("cnt").alias("top_word_cnt"))
    )
    # Trigram stats are per-row array ops — no extra shuffle.
    tri = toks.select(
        "doc_id",
        F.size("__toks").alias("n_words"),
        F.when(F.size("__toks") >= 3, F.size("__toks") - 2)
        .otherwise(F.lit(0))
        .alias("n_tri"),
        F.size(
            F.array_distinct(
                F.transform(
                    F.slice("__toks", 1, F.greatest(F.size("__toks") - 2, F.lit(0))),
                    lambda x, i: F.concat_ws(
                        " ",
                        x,
                        F.element_at(F.col("__toks"), i + 2),
                        F.element_at(F.col("__toks"), i + 3),
                    ),
                )
            )
        ).alias("n_tri_distinct"),
    )
    return top.join(tri, "doc_id").select(
        "doc_id",
        "n_words",
        "top_word",
        "top_word_cnt",
        F.round(F.col("top_word_cnt") / F.col("n_words"), 6).alias("top_word_frac"),
        F.when(
            F.col("n_tri") > 0,
            F.round(F.lit(1) - F.col("n_tri_distinct") / F.col("n_tri"), 6),
        ).alias("dup_trigram_frac"),
    )


REPETITION_ORACLE = f"""
WITH d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
wc AS (
  SELECT doc_id, word, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(w) AS word FROM d) GROUP BY 1, 2
),
top AS (
  SELECT doc_id, word AS top_word, cnt AS top_word_cnt
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, word ASC) AS rn FROM wc)
  WHERE rn = 1
),
tri AS (
  SELECT doc_id, len(w) AS n_words,
         CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE 0 END AS n_tri,
         len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            FOR i IN generate_series(1, len(w) - 2)])) AS n_tri_distinct
  FROM d
)
SELECT t.doc_id, r.n_words, t.top_word, t.top_word_cnt,
       ROUND(t.top_word_cnt / r.n_words, 6) AS top_word_frac,
       CASE WHEN r.n_tri > 0
            THEN ROUND(1 - r.n_tri_distinct / r.n_tri, 6) END AS dup_trigram_frac
FROM top t JOIN tri r ON t.doc_id = r.doc_id
"""


# --- pii_redact -----------------------------------------------------------
# PII scrubbing: plant a deterministic email into every 7th doc, then
# count + redact with the same regex both engines compile (character
# classes only — portable across Java regex and RE2).

_PII_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            normalize_text(F.col("text")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(normalize_text(F.col("text")))
    with_text = docs.select("doc_id", planted.alias("t"))
    return with_text.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_RE)).alias("n_pii"),
        F.md5(F.regexp_replace("t", _PII_RE, "<EMAIL>")).alias("redacted_md5"),
    )


PII_REDACT_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN {_NORM} || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              ELSE {_NORM} END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_RE}')) AS INT) AS n_pii,
       md5(regexp_replace(t, '{_PII_RE}', '<EMAIL>', 'g')) AS redacted_md5
FROM p
"""


# --- scd2_user_state ------------------------------------------------------
# SCD2 dimension-history build: collapse each user's event stream into
# contiguous event_type regimes with [valid_from, valid_to) intervals,
# version numbers, and an is_current flag — the standard warehouse
# change-history pattern (the reference's INSERT OR REPLACE keeps only
# the latest state; SCD2 keeps all of them, queryable as-of any time).


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "event_id", "ts", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.date_format(F.lead("ts").over(w2), fmt).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_id, ts, event_type FROM e
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       lead(ts) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- error_click_window_join ----------------------------------------------
# Time-range pair join: every (error, click) pair of the same user
# within ±1 hour.  The scale path avoids the per-user quadratic
# blow-up of a naive equi-join-then-filter by bucketing time into
# window-sized bins and joining on (user, bin ± 1): each pair is found
# in exactly one bin combination, so no dedup pass is needed, and the
# shuffle key (user, bin) is fine-grained enough to defeat per-user
# skew.

RANGE_WIN_S = 3600
_BIN_US = RANGE_WIN_S * 1_000_000


def error_click_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id", "event_id", "event_type",
        epoch_us(F.col("ts")).alias("us"),
    )
    errors = base.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_id"),
        F.col("us").alias("err_us"),
        F.explode(
            F.array(
                (F.col("us") / _BIN_US).cast("long") - 1,
                (F.col("us") / _BIN_US).cast("long"),
                (F.col("us") / _BIN_US).cast("long") + 1,
            )
        ).alias("bin"),
    )
    clicks = base.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("us").alias("clk_us"),
        (F.col("us") / _BIN_US).cast("long").alias("bin"),
    )
    return (
        errors.join(clicks, ["user_id", "bin"])
        .where(F.abs(F.col("clk_us") - F.col("err_us")) <= _BIN_US)
        .select(
            "user_id", "err_id", "click_id",
            (F.col("clk_us") - F.col("err_us")).alias("delta_us"),
        )
    )


ERROR_CLICK_WINDOW_ORACLE = f"""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
SELECT a.user_id, a.event_id AS err_id, b.event_id AS click_id,
       b.us - a.us AS delta_us
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND a.event_type = 'error' AND b.event_type = 'click'
 AND abs(b.us - a.us) <= CAST({RANGE_WIN_S} AS BIGINT) * 1000000
"""


# --- price_histogram ------------------------------------------------------

HIST_BUCKETS = 20
HIST_WIDTH = 30_000.0  # covers o_totalprice's range in 20 buckets


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — the one-pass profiling aggregate.  The
    bucket id is a pure projection, so the plan is a single map-side-
    combined hash aggregate with HIST_BUCKETS output rows."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(F.floor(F.col("o_totalprice") / HIST_WIDTH).cast("int"), F.lit(0)),
        F.lit(HIST_BUCKETS - 1),
    )
    return (
        orders.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


PRICE_HISTOGRAM_ORACLE = f"""
SELECT CAST(least(greatest(CAST(floor(o_totalprice / {HIST_WIDTH}) AS INT), 0),
                  {HIST_BUCKETS - 1}) AS INT) AS bucket,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY 1
"""


# --- hll_distinct_users ---------------------------------------------------
# DataSketches HLL: the approximate-distinct sketch a 100 TB pipeline
# uses where COUNT(DISTINCT) won't fit (mergeable across partitions /
# days).  The sketch estimate is deterministic for fixed input, so the
# oracle can assert the accuracy contract (±5%) as a value: the Spark
# side emits the exact count AND whether the sketch landed within
# bounds; DuckDB emits the exact count and literal TRUE.


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("__est"),
    )
    return agg.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("__est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("hll_within_5pct"),
    )


HLL_DISTINCT_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct,
       TRUE AS hll_within_5pct
FROM events GROUP BY 1
"""


# --- iqr_outlier_docs -----------------------------------------------------
# Per-language IQR outlier screen over document length: Tukey fences
# (Q1 − 1.5·IQR, Q3 + 1.5·IQR) computed with the EXACT interpolating
# percentile, then applied back to rows — the distribution-based
# filter a curation pass runs on length/perplexity before training.
#
# Scale shape: exact percentile needs the per-group values (one
# shuffle, sort within group); at 100 TB swap in percentile_approx
# (GK sketch, mergeable — same plan shape, bounded memory; the
# approx-quantile accuracy contract is certified separately by
# `approx_quantiles_contract`).  The per-lang fence table is
# group-cardinality and broadcasts back onto the scan.


def iqr_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fences = docs.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.lit(0.25)).alias("q1"),
        F.percentile(F.col("n_chars"), F.lit(0.75)).alias("q3"),
    )
    bounded = fences.select(
        "lang",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounded), "lang")
        .where((F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi")))
        .select("doc_id", "lang", "n_chars", "lo", "hi")
    )


IQR_OUTLIER_ORACLE = """
WITH fences AS (
  SELECT lang,
         quantile_cont(n_chars, 0.25) AS q1,
         quantile_cont(n_chars, 0.75) AS q3
  FROM documents GROUP BY lang
),
bounded AS (
  SELECT lang, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
  FROM fences
)
SELECT d.doc_id, d.lang, d.n_chars, b.lo, b.hi
FROM documents d JOIN bounded b USING (lang)
WHERE d.n_chars < b.lo OR d.n_chars > b.hi
"""


# --- sequence_packing -----------------------------------------------------
# Context-window packing — the tokenize→concatenate→chunk step every
# LLM training pipeline runs between curation and the data loader.
# Documents are streamed per source in doc_id order; each doc's START
# OFFSET in its source's token stream assigns it to the pack (training
# context) the stream-chunker would place it in: pack_id = start_off
# DIV budget.  This is the offset-binning form used at scale (exact
# first-fit packing is sequential by definition); packs can overflow
# the budget by at most one document's tokens, which the rollup makes
# visible per pack.
#
# Scale shape: the cumulative offset is a window PARTITIONED BY source
# (never global), the rollup is one map-side-combined aggregate on
# (source, pack_id) — two shuffles total, no Python, no collect.

PACK_BUDGET = 256  # tokens per training context


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = toks.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    packed = off.withColumn("pack_id", F.expr(f"start_off DIV {PACK_BUDGET}"))
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SEQUENCE_PACKING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, len({_WORDS}) AS n_tokens FROM documents
),
off AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM toks
)
SELECT source, CAST(start_off // {PACK_BUDGET} AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM off GROUP BY 1, 2
"""


# --- inverted_index_build -------------------------------------------------
# Posting-list construction — the retrieval-side inverse of the corpus:
# per token, document frequency + total occurrences over the FULL
# postings, and a deterministic capped posting string (first
# IDX_POSTINGS_CAP docs by doc_id, each as doc:tf:first_pos) standing
# in for the block a search engine would store.
#
# Scale shape: one shuffle builds per-(token, doc) term frequencies
# (map-side combined from the posexplode); the stats rollup and the
# cap window both run PARTITIONED BY token on that aggregated table —
# never over raw occurrences; the cap bounds every posting string.
# collect_list goes through array_sort(struct) so the assembled string
# is order-deterministic regardless of shuffle arrival.

IDX_POSTINGS_CAP = 5


def inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    occ = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token")
    ).where(F.col("token") != "")
    # Checkpointed (r20): stats and the postings window both consume
    # this aggregate through token-keyed exchanges that differ from its
    # own (token, doc_id) exchange, so ReuseExchange never fired and
    # the tokenize+posexplode extraction ran TWICE over the corpus
    # (plan: 2 Scans, 2 Generates).  One materialization feeds both.
    tf = occ.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.min("pos").alias("first_pos")
    ).localCheckpoint()
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("n_occurrences"),
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    capped = tf.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= IDX_POSTINGS_CAP
    )
    postings = capped.groupBy("token").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf", "first_pos"))),
                lambda s: F.concat_ws(
                    ":", s["doc_id"], s["tf"], s["first_pos"]
                ),
            ),
            ",",
        ).alias("postings")
    )
    return stats.join(postings, "token")


INVERTED_INDEX_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
),
occ AS (
  SELECT doc_id, w[i.i] AS token, i.i - 1 AS pos
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) i
  WHERE w[i.i] <> ''
),
tf AS (
  SELECT token, doc_id, COUNT(*) AS tf, MIN(pos) AS first_pos
  FROM occ GROUP BY 1, 2
),
stats AS (
  SELECT token, COUNT(*) AS doc_freq, CAST(SUM(tf) AS BIGINT) AS n_occurrences
  FROM tf GROUP BY 1
),
capped AS (
  SELECT token, doc_id, tf, first_pos,
         ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rk
  FROM tf
),
postings AS (
  SELECT token,
         string_agg(doc_id || ':' || tf || ':' || first_pos, ',' ORDER BY doc_id)
           AS postings
  FROM capped WHERE rk <= {IDX_POSTINGS_CAP} GROUP BY token
)
SELECT s.token, s.doc_freq, s.n_occurrences, p.postings
FROM stats s JOIN postings p USING (token)
"""


# --- repeated_ngram_spans -------------------------------------------------
# Exact-substring duplication profile (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — the ExactSubstr
# signal): for every document, how many of its word-5-gram window
# INSTANCES also occur elsewhere in the corpus (any other doc, or a
# second time in the same doc)?  Near-dup families score whole-doc
# similarity; this is the span-level evidence — boilerplate headers,
# license blocks, templated sentences — that survives whole-doc dedup
# and that ExactSubstr-style pipelines cut at the span level.
#
# Instances, not distinct shingles: a doc repeating its own banner
# twice has BOTH instances counted as duplicated, exactly like the
# suffix-array criterion (a substring occurring >= 2 times corpus-
# wide).  Output: per doc with >= 1 window, total window instances,
# duplicated instances, and the dup share in exact-integer ppm.
#
# Scale shape (the suffix-array equivalent for a shuffle engine):
# one map-side-combined groupBy(doc, gram) collapses within-doc
# repeats first and is materialized ONCE (localCheckpoint — the
# rollup's exchange is gram-keyed while the aggregate's is
# (doc, gram)-keyed, so ReuseExchange cannot share them); one
# gram-keyed rollup computes corpus counts, the join back rides the
# same gram key, then a per-doc sum.  No all-pairs, no suffix-array
# build: the gram multiset IS the index.
#
# The shuffle key is a 64-bit md5 prefix of the gram, not the gram
# string: shuffle bytes stop growing with n-gram length (Lee et al.
# hash their substrings for the same reason), and because BOTH
# engines hash the same UTF-8 strings the result is bit-identical
# cross-engine even in the (astronomically rare, deterministic)
# collision case.  Measured 0.96 s vs 1.15 s string-keyed at sf0.1.

SPAN_N = 5


def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.functions.text import word_shingles

    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    inst = toks.select(
        "doc_id",
        F.explode(word_shingles(F.col("__toks"), SPAN_N)).alias("gram"),
    ).select("doc_id", F.substring(F.md5("gram"), 1, 16).alias("gram"))
    # Checkpointed (r20): gram_totals AND the join both consume this
    # aggregate, but their exchanges differ ((doc, gram) vs gram) so
    # ReuseExchange never fired and the tokenize+shingle+md5 extraction
    # ran TWICE over the corpus (plan: 2 Scans, 2 Generates).  One
    # materialization of the compact (doc, gram, count) table feeds
    # both.
    per_doc_gram = inst.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("c_dg")
    ).localCheckpoint()
    gram_totals = per_doc_gram.groupBy("gram").agg(F.sum("c_dg").alias("c_g"))
    return (
        per_doc_gram.join(gram_totals, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("c_dg").alias("n_windows"),
            F.sum(F.when(F.col("c_g") >= 2, F.col("c_dg")).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.expr("n_dup_windows * 1000000 DIV n_windows").alias("dup_ppm"),
        )
    )


REPEATED_SPANS_ORACLE = f"""
WITH d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
inst AS (
  SELECT doc_id,
         substr(md5(list_aggregate(w[i:i+{SPAN_N - 1}], 'string_agg', ' ')),
                1, 16) AS gram
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(w) - {SPAN_N - 1})) AS i)
  WHERE len(w) >= {SPAN_N}
),
per_doc_gram AS (
  SELECT doc_id, gram, COUNT(*) AS c_dg FROM inst GROUP BY 1, 2
),
gram_totals AS (
  SELECT gram, CAST(SUM(c_dg) AS BIGINT) AS c_g FROM per_doc_gram GROUP BY 1
)
SELECT p.doc_id,
       CAST(SUM(p.c_dg) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN g.c_g >= 2 THEN p.c_dg ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       CAST(SUM(CASE WHEN g.c_g >= 2 THEN p.c_dg ELSE 0 END) * 1000000
            // SUM(p.c_dg) AS BIGINT) AS dup_ppm
FROM per_doc_gram p JOIN gram_totals g USING (gram)
GROUP BY p.doc_id
"""


# --- exact_substring_removal ----------------------------------------------
# The MATERIALIZATION step behind repeated_ngram_spans' profile — the
# ExactSubstr CUT (Lee et al. 2022 remove every substring occurring
# >= 2 times corpus-wide; repeated_ngram_spans only measures it, the
# same profile→action gap the near-dup family closed with
# dedup_survivors).  A token is removed iff ANY word-SPAN_N-gram
# window covering it occurs >= 2 times in the corpus (instances, not
# distinct: a doc repeating its own banner has both instances cut);
# the cleaned doc is the surviving tokens rejoined.  Output per doc:
# token count, removed-token count, and the cleaned text.
#
# Scale shape (no suffix array — the gram multiset is the index):
# positions ride ALONG the same gram-keyed shuffle the profile uses
# (64-bit md5-prefix keys, gram-length-independent shuffle bytes;
# the groupBy(gram) totals and the dup-gram semi-join share one
# exchange), duplicated windows fan out to at most SPAN_N covered
# indices each, and reconstruction is ONE doc-keyed join of the
# corpus scan against a removed-index set bounded by per-doc token
# count (row-local, like the token array itself).  The index filter
# is an array-lambda inside codegen — zero Python anywhere.

def exact_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.functions.text import word_shingles

    docs = scatter(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    inst = toks.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("__toks"), SPAN_N)).alias("pos", "gram"),
    ).select("doc_id", "pos", F.substring(F.md5("gram"), 1, 16).alias("gram"))
    dup_grams = (
        inst.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c_g"))
        .where(F.col("c_g") >= 2)
        .select("gram")
    )
    covered = (
        inst.join(dup_grams, "gram", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + SPAN_N - 1)
            ).alias("idx"),
        )
    )
    removed = covered.groupBy("doc_id").agg(F.collect_set("idx").alias("removed"))
    out = toks.join(removed, "doc_id", "left").select(
        "doc_id",
        "__toks",
        F.coalesce("removed", F.array().cast("array<int>")).alias("__rem"),
    )
    kept = F.filter(
        F.col("__toks"), lambda t, i: ~F.array_contains(F.col("__rem"), i)
    )
    return out.select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size("__rem").cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )


EXACT_SUBSTRING_REMOVAL_ORACLE = f"""
WITH d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
inst AS (
  SELECT doc_id, i - 1 AS pos,
         substr(md5(list_aggregate(w[i:i+{SPAN_N - 1}], 'string_agg', ' ')),
                1, 16) AS gram
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(w) - {SPAN_N - 1})) AS i)
  WHERE len(w) >= {SPAN_N}
),
gram_totals AS (
  SELECT gram, COUNT(*) AS c_g FROM inst GROUP BY 1
),
covered AS (
  SELECT DISTINCT doc_id, pos + j AS idx
  FROM inst JOIN gram_totals USING (gram),
       LATERAL (SELECT unnest(generate_series(0, {SPAN_N - 1})) AS j)
  WHERE c_g >= 2
),
rem AS (SELECT doc_id, list(idx) AS removed FROM covered GROUP BY 1)
SELECT d.doc_id,
       CAST(len(d.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(r.removed), 0) AS BIGINT) AS n_removed,
       COALESCE(
         list_aggregate(
           [d.w[i] FOR i IN generate_series(1, len(d.w))
            IF r.doc_id IS NULL OR NOT list_contains(r.removed, i - 1)],
           'string_agg', ' '),
         '') AS cleaned_text
FROM d LEFT JOIN rem r ON d.doc_id = r.doc_id
"""


# --- corpus_refresh_pipeline ----------------------------------------------
# The INCREMENTAL capstone — the nightly corpus-maintenance loop that
# corpus_build_pipeline's one-shot build turns into in production:
# an incoming batch (doc_id % 9 == 0, eval rows excluded — benchmark
# docs never enter training) is (1) exact-deduped against the EXISTING
# corpus by normalized-content hash, (2) its survivors decontaminated
# against the eval split by exact 8-gram overlap, (3) admitted, with
# per-source accounting of every drop.  Precedence is dedup-first: a
# doc that is both a duplicate and contaminated counts once, as a
# duplicate.
#
# Scale shape: O(batch) everywhere a delta pass must be — the batch
# side of both joins is restricted BEFORE any shuffle; the existing-
# corpus side contributes one hash projection (map-side) and the
# candidate-bounded shingle index already priced by ngram_contamination;
# drops are LEFT ANTIs with no broadcast hint (hit sets are batch-
# proportional worst case); the final rollup is one map-side-combined
# groupBy(source).

REFRESH_BATCH_MOD = 9


def corpus_refresh_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    is_batch = (F.col("doc_id") % REFRESH_BATCH_MOD == 0) & (
        F.col("doc_id") % _EVAL_MOD != 0
    )
    batch = docs.where(is_batch)
    existing = docs.where(~is_batch)

    # (1) exact content dedup vs the existing corpus.
    content = F.md5(normalize_text(F.col("text")))
    batch_h = batch.select("doc_id", "source", content.alias("h"))
    existing_h = existing.select(content.alias("h")).distinct()
    dup_ids = batch_h.join(existing_h, "h", "left_semi").select("doc_id")

    survivors = batch.join(dup_ids, "doc_id", "left_anti")

    # (2) decontaminate survivors vs the eval split (8-gram overlap).
    ev = shingle_sets(
        docs.where(F.col("doc_id") % _EVAL_MOD == 0), "doc_id", "text", n=CONTAM_N
    ).select("shingle").distinct()
    surv_grams = shingle_sets(survivors, "doc_id", "text", n=CONTAM_N)
    contam_ids = (
        surv_grams.join(ev, "shingle", "left_semi").select("doc_id").distinct()
    )
    admitted = survivors.join(contam_ids, "doc_id", "left_anti")

    # (3) per-source accounting.
    def cnt(df, name):
        return df.groupBy("source").agg(F.count(F.lit(1)).alias(name))

    return (
        cnt(batch, "n_batch")
        .join(cnt(batch.join(dup_ids, "doc_id", "left_semi"), "n_dup"), "source", "left")
        .join(cnt(survivors.join(contam_ids, "doc_id", "left_semi"), "n_contam"), "source", "left")
        .join(cnt(admitted, "n_admitted"), "source", "left")
        .select(
            "source",
            "n_batch",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.coalesce("n_contam", F.lit(0)).alias("n_contam"),
            F.coalesce("n_admitted", F.lit(0)).alias("n_admitted"),
        )
    )


CORPUS_REFRESH_ORACLE = f"""
WITH b AS (
  SELECT doc_id, source, text FROM documents
  WHERE doc_id % {REFRESH_BATCH_MOD} = 0 AND doc_id % {_EVAL_MOD} != 0
),
ex AS (
  SELECT text FROM documents
  WHERE NOT (doc_id % {REFRESH_BATCH_MOD} = 0 AND doc_id % {_EVAL_MOD} != 0)
),
dup AS (
  SELECT DISTINCT b.doc_id FROM b
  JOIN (SELECT DISTINCT md5({_NORM}) AS h FROM ex) e
    ON md5(trim(regexp_replace(lower(b.text), '\\s+', ' ', 'g'))) = e.h
),
surv AS (SELECT * FROM b WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
evg AS (
  SELECT DISTINCT list_aggregate(w[i:i+{CONTAM_N - 1}], 'string_agg', ' ') AS gram
  FROM (SELECT {_WORDS} AS w FROM documents WHERE doc_id % {_EVAL_MOD} = 0) d,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {CONTAM_N - 1})) AS i)
  WHERE len(w) >= {CONTAM_N}
),
sg AS (
  SELECT DISTINCT s.doc_id,
         list_aggregate(w[i:i+{CONTAM_N - 1}], 'string_agg', ' ') AS gram
  FROM (SELECT doc_id, {_WORDS} AS w FROM surv) s,
       LATERAL (SELECT unnest(generate_series(1, len(w) - {CONTAM_N - 1})) AS i)
  WHERE len(w) >= {CONTAM_N}
),
contam AS (SELECT DISTINCT sg.doc_id FROM sg JOIN evg USING (gram)),
admitted AS (SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM contam))
SELECT b.source,
       COUNT(*) AS n_batch,
       CAST(COUNT(CASE WHEN b.doc_id IN (SELECT doc_id FROM dup) THEN 1 END) AS BIGINT) AS n_dup,
       CAST(COUNT(CASE WHEN b.doc_id IN (SELECT doc_id FROM contam) THEN 1 END) AS BIGINT) AS n_contam,
       CAST(COUNT(CASE WHEN b.doc_id IN (SELECT doc_id FROM admitted) THEN 1 END) AS BIGINT) AS n_admitted
FROM b GROUP BY b.source
"""


# --- quality_filter_cascade -------------------------------------------------
# The FILTER-FUNNEL report every production curation pass keeps next to
# its Gopher/C4-style rule stack (Rae et al. 2021 §A.1.1; Raffel et al.
# 2020 §2.2): documents flow through an ORDERED rule cascade and each
# rejected doc is attributed to its FIRST failing rule, so the output
# is the per-stage funnel (n_in → n_rejected → n_out) that tells a
# pipeline owner which rule does the cutting and how the survivor
# count decays stage by stage.  The registry certifies the FEATURES
# elsewhere (text_stats, repetition_quality, lang_id) — this query
# certifies the cascade semantics: first-fail attribution and the
# telescoping funnel identity n_out(s) = n_in(s) - n_rejected(s),
# n_in(s+1) = n_out(s).
#
# Scale shape: every feature is ROW-LOCAL (one tokenize per doc, no
# per-rule re-tokenize — the CASE reads materialized counts), so the
# whole cascade is map-only over the scan; the sole "shuffle" is a
# single whole-corpus aggregate into ONE row of five counters
# (map-side partial combine does all the work), then a 4-row explode
# on the driver-sized result.  At 100 TB this is a scan + one
# all-to-one partial-agg merge — the cheapest distributed shape there
# is; adding rules adds counters, not passes.

CASCADE_MIN_WORDS = 20
CASCADE_MAX_WORDS = 90
CASCADE_LANGS = ("en", "es", "de", "fr")
# distinct-word ratio < 0.4 == 5 * n_distinct < 2 * n_words (exact ints)
CASCADE_DISTINCT_NUM, CASCADE_DISTINCT_DEN = 2, 5


def quality_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    w = tokens(F.col("text"))
    feats = docs.select(
        F.col("lang"),
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    )
    ff = (
        F.when(F.col("n_words") < CASCADE_MIN_WORDS, 1)
        .when(F.col("n_words") > CASCADE_MAX_WORDS, 2)
        # NULL-lang must REJECT: a bare NOT IN is NULL for NULL lang
        # in both engines, silently allowlisting unknown-language docs.
        .when(F.col("lang").isNull() | ~F.col("lang").isin(*CASCADE_LANGS), 3)
        .when(
            CASCADE_DISTINCT_DEN * F.col("n_distinct")
            < CASCADE_DISTINCT_NUM * F.col("n_words"),
            4,
        )
        .otherwise(0)
    )
    agg = feats.select(ff.alias("ff")).agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.count(F.when(F.col("ff") == s, 1)).alias(f"r{s}")
            for s in (1, 2, 3, 4)
        ],
    )
    t, r1, r2, r3, r4 = (F.col(c) for c in ("total", "r1", "r2", "r3", "r4"))
    rows = F.array(
        *[
            F.struct(
                F.lit(stage).cast("int").alias("stage"),
                F.lit(rule).alias("rule"),
                n_in.alias("n_in"),
                rej.alias("n_rejected"),
                (n_in - rej).alias("n_out"),
            )
            for stage, rule, n_in, rej in (
                (1, "min_words", t, r1),
                (2, "max_words", t - r1, r2),
                (3, "lang_allowlist", t - r1 - r2, r3),
                (4, "distinct_ratio", t - r1 - r2 - r3, r4),
            )
        ]
    )
    return agg.select(F.explode(rows).alias("f")).select("f.*")


def _cascade_oracle() -> str:
    langs = ", ".join(f"'{lang}'" for lang in CASCADE_LANGS)
    stages = [
        ("1", "min_words", "total", "r1"),
        ("2", "max_words", "total - r1", "r2"),
        ("3", "lang_allowlist", "total - r1 - r2", "r3"),
        ("4", "distinct_ratio", "total - r1 - r2 - r3", "r4"),
    ]
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({s} AS INTEGER) AS stage, '{rule}' AS rule,\n"
        f"       {n_in} AS n_in, {rej} AS n_rejected,\n"
        f"       {n_in} - {rej} AS n_out FROM a"
        for s, rule, n_in, rej in stages
    )
    return f"""
WITH d AS (SELECT lang, {_WORDS} AS w FROM documents),
f AS (
  SELECT CASE
    WHEN len(w) < {CASCADE_MIN_WORDS} THEN 1
    WHEN len(w) > {CASCADE_MAX_WORDS} THEN 2
    WHEN lang IS NULL OR lang NOT IN ({langs}) THEN 3
    WHEN {CASCADE_DISTINCT_DEN} * len(list_distinct(w))
       < {CASCADE_DISTINCT_NUM} * len(w) THEN 4
    ELSE 0 END AS ff
  FROM d
),
a AS (
  SELECT COUNT(*) AS total,
         COUNT(*) FILTER (WHERE ff = 1) AS r1,
         COUNT(*) FILTER (WHERE ff = 2) AS r2,
         COUNT(*) FILTER (WHERE ff = 3) AS r3,
         COUNT(*) FILTER (WHERE ff = 4) AS r4
  FROM f
)
{selects}
"""


QUALITY_FILTER_CASCADE_ORACLE = _cascade_oracle()
