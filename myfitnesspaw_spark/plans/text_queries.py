"""Training-data pipeline queries over ``documents`` / ``embeddings``:
text analysis, dedup (exact / Jaccard / MinHash-LSH / SimHash), and
embedding similarity search — each with a DuckDB oracle.

Cross-engine determinism contract (the driver hash-compares cells):
- integer arithmetic everywhere a SUM crosses a group boundary (float
  group-sums are addition-order-dependent and engines disagree);
- md5 hex strings as the only string hash (identical in both engines);
- float results are either a single op over exact ints (ratios) or a
  sequential left fold over an array (dot products) — both engines
  fold lists left-to-right, so even doubles are bit-identical.

The corpus has PLANTED near-duplicates (docs containing the marker
token "dup", word-trigram Jaccard ≈ 0.98) which the three near-dup
detectors must surface; exact-dup and embedding-near-dup inputs union
deterministic copies in-query since the base corpus has none.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myfitnesspaw_spark.checkpoints import materialize_instance_sized
from myfitnesspaw_spark.functions.text import (
    bpe_ish_token_count,
    char_bigram_codes,
    normalize_text,
    rolling_fingerprint,
    split_chars,
    tokens,
)
from myfitnesspaw_spark.functions.url import TRACKING_PARAMS, canonicalize_url
from myfitnesspaw_spark.operators.dedup import (
    SIMHASH_BITS,
    exact_dedup_keep_min,
    jaccard_pairs_prefix,
    jaccard_pairs_prefix_arrays,
    minhash_lsh_pairs,
    shingle_arrays,
    shingle_sets,
    simhash_pairs,
)
from myfitnesspaw_spark.operators.similarity import bucket_near_dup, cosine_topk
from myfitnesspaw_spark.sources import load_table, scatter

# Shared SQL fragments for the oracles -----------------------------------

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_WORDS = f"string_split({_NORM}, ' ')"
# Distinct word-trigram shingles per doc (DuckDB; 1-based lists).
_SHINGLES_CTE = f"""
d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i)
  WHERE len(w) >= 3
)
"""

STOPWORDS = ("the", "a")


# --- text_stats -----------------------------------------------------------


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality metrics: token counts (whitespace + BPE-ish
    regex), distinct ratio, stopword ratio, and a composite quality
    score — the filters a corpus-curation pass runs before training."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    norm = normalize_text(F.col("text"))
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_chars = F.length(norm)
    stop_ratio = n_stop / n_tokens
    quality = F.round(
        0.4 * (F.least(n_tokens, F.lit(100)) / F.lit(100))
        + 0.3 * (n_distinct / n_tokens)
        + 0.3 * (F.lit(1) - stop_ratio),
        6,
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        n_chars.alias("n_chars_norm"),
        n_stop.alias("n_stop"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality.alias("quality_score"),
    )


TEXT_STATS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_NORM} AS norm, {_WORDS} AS w FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_tokens,
         len(list_distinct(w)) AS n_distinct,
         len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
         length(norm) AS n_chars_norm,
         len(list_filter(w, t -> t IN ('the', 'a'))) AS n_stop
  FROM d
)
SELECT doc_id, n_tokens, n_distinct, bpe_tokens, n_chars_norm, n_stop,
       ROUND(n_stop / n_tokens, 6) AS stop_ratio,
       ROUND(0.4 * (least(n_tokens, 100) / 100)
             + 0.3 * (n_distinct / n_tokens)
             + 0.3 * (1 - n_stop / n_tokens), 6) AS quality_score
FROM m
"""


# --- lang_id --------------------------------------------------------------


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language ID: per-language bigram profiles are
    counted from the labeled corpus itself, each doc is scored by
    Σ count_doc(bigram) × freq_lang(bigram) (exact integer sum), and
    the argmax language (lexicographic tie-break) is predicted.

    Scale: the profile table is tiny (langs × bigrams) → broadcast;
    the doc-side bigram aggregate shuffles on (doc_id, bigram).
    """
    # Integer bigram codes keyed on longs instead of 2-char strings
    # (same counts, cheaper shuffles).  The char array is materialized
    # in its own projection and the codes are built INSIDE the explode
    # (a Generate node): adjacent Projects would be collapsed by
    # Catalyst, re-inlining the split into the transform lambda, which
    # re-evaluates per element — measured 50× slower.
    chars = scatter(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        split_chars(F.col("text")).alias("__chars"),
    )
    docs = chars.select("doc_id", "lang_true")
    # ONE corpus pass: the char explode + (doc, bigram) count shuffle
    # runs once (localCheckpoint pins the bounded per-doc bigram
    # table); the per-language profile derives from it by re-keying
    # through the doc→lang map — freq = Σ cnt over a language's docs,
    # identical counts to re-exploding the corpus per branch.  The map
    # is one row PER DOC (corpus-sized), so it carries no broadcast
    # hint: AQE broadcasts it while it fits and shuffles it at scale.
    doc_bg = (
        chars.select(
            "doc_id", F.explode(char_bigram_codes(F.col("__chars"))).alias("bg")
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    profile = (
        doc_bg.join(docs, "doc_id")
        .groupBy(F.col("lang_true").alias("lang"), "bg")
        .agg(F.sum("cnt").alias("freq"))
    )
    scores = (
        doc_bg.join(F.broadcast(profile), "bg")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("freq")).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang").asc())
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("lang_pred"), "score")
    )
    return pred.join(docs.select("doc_id", "lang_true"), "doc_id").select(
        "doc_id",
        "lang_true",
        "lang_pred",
        "score",
        (F.col("lang_pred") == F.col("lang_true")).alias("is_match"),
    )


LANG_ID_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang AS lang_true, {_NORM} AS norm FROM documents
),
bg AS (
  SELECT doc_id, lang_true, substr(norm, i, 2) AS bg
  FROM d, LATERAL (SELECT unnest(generate_series(1, length(norm) - 1)) AS i)
),
doc_bg AS (
  SELECT doc_id, bg, COUNT(*) AS cnt FROM bg GROUP BY 1, 2
),
profile AS (
  SELECT lang_true AS lang, bg, COUNT(*) AS freq FROM bg GROUP BY 1, 2
),
scores AS (
  SELECT b.doc_id, p.lang, SUM(b.cnt * p.freq) AS score
  FROM doc_bg b JOIN profile p ON b.bg = p.bg
  GROUP BY 1, 2
),
pred AS (
  SELECT doc_id, lang AS lang_pred, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM scores
)
SELECT p.doc_id, d.lang_true, p.lang_pred, CAST(p.score AS BIGINT) AS score,
       p.lang_pred = d.lang_true AS is_match
FROM pred p JOIN d ON p.doc_id = d.doc_id
WHERE p.rn = 1
"""


# --- doc_fingerprint ------------------------------------------------------


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (mod-prime polynomial fold)."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        rolling_fingerprint(F.col("text")).alias("fingerprint"),
        F.length(normalize_text(F.col("text"))).alias("n_chars_norm"),
    )


DOC_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split({_NORM}, ''),
                                     c -> CAST(ord(c) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007
       ) AS fingerprint,
       length({_NORM}) AS n_chars_norm
FROM documents
"""


# --- exact_dedup ----------------------------------------------------------
# The base corpus has no exact dups; union a deterministic copy of every
# 20th doc (id + 1_000_000) so the operator has real work.


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    copies = docs.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return exact_dedup_keep_min(docs.unionByName(copies), "doc_id", "text")


EXACT_DEDUP_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
)
SELECT md5({_NORM}) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       COUNT(*) AS n_copies
FROM corpus GROUP BY 1
"""


# --- ngram_jaccard_pairs --------------------------------------------------

JACCARD_THRESHOLD = 0.8


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_arrays(docs, "doc_id", "text", n=3)
    # Scale path: prefix-filtered candidates + exact verify; result-
    # identical to the brute inverted-index join the oracle runs.
    return jaccard_pairs_prefix_arrays(sh, "doc_id", JACCARD_THRESHOLD)


NGRAM_JACCARD_ORACLE = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.id_a, s.id_b, s.n_shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
       s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) AS jaccard
FROM shared s
JOIN sizes sa ON s.id_a = sa.doc_id
JOIN sizes sb ON s.id_b = sb.doc_id
WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
"""


# --- dedup_clusters: connected components over near-dup pairs -------------


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative hash-min connected components over the ≥0.8-Jaccard
    pair graph: every doc in a near-dup pair gets its cluster's min
    doc_id as canonical id (the survivor a curation pass would keep)."""
    from myfitnesspaw_spark.operators.dedup import connected_components

    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_arrays(docs, "doc_id", "text", n=3)
    pairs = jaccard_pairs_prefix_arrays(sh, "doc_id", JACCARD_THRESHOLD).select("id_a", "id_b")
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster"
    )


# Transitive closure via recursive CTE — exactly the min-label
# propagation the Spark loop converges to.
DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
),
nodes AS (SELECT id_a AS node FROM edges UNION SELECT id_b FROM edges),
sym AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION ALL
  SELECT id_b, id_a FROM edges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT y.d, r.lbl FROM reach r JOIN sym y ON y.s = r.node
)
SELECT node AS doc_id, MIN(lbl) AS cluster FROM reach GROUP BY node
"""


# --- incremental_cc_refresh ---------------------------------------------------
# Incremental CLUSTER MAINTENANCE — the fourth persisted-state member
# (bands, sketches, bloom, now the dedup graph's labels): a production
# dedup job does not re-run connected components over the whole pair
# graph per batch; it persists the label table and, on refresh, runs
# CC over (stored label edges ∪ delta pairs).  Correct by the
# CONTRACTION property: the label table is a spanning contraction of
# the base pair graph — each (node, cluster) row is an edge to the
# component's minimum — so its union with the batch-touching pairs
# has exactly the components of the FULL pair graph, and min-labels
# are preserved because every stored edge points AT a real minimum
# node id.  The query therefore registers against dedup_clusters'
# own oracle (full-graph transitive closure) and must hash-match it.
#
# Scale shape: the refresh-path CC runs on |labels| + |delta| edges —
# label-table-sized plus batch-activity-sized — never the full pair
# graph; delta pairs come from the probe-side-restricted inverted
# index (jaccard_pairs_delta, O(batch activity)).  The base CC and
# base shingling here are the simulated prior run that seeds the
# store, same stance as every index-store query.


def incremental_cc_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-store CC refresh whose probe index is rebuilt by
    re-shingling the FULL corpus each refresh — a deliberate 100×
    caveat kept as the contrast half of a pair: ``indexed_cc_refresh``
    below is the scale-safe successor (stored shingle index, O(batch)
    refresh compute) and is what a production deployment should copy.
    """
    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_delta,
    )
    from myfitnesspaw_spark.sinks.warehouse import (
        read_index_store,
        store_path,
        write_index_store,
    )

    docs = scatter(load_table(spark, sf_dir, "documents"))
    base = docs.where(F.col("doc_id") % 10 != 0)

    # -- simulated prior run: CC over base-only pairs, labels persisted.
    sh_base = shingle_arrays(base, "doc_id", "text", n=3)
    base_pairs = jaccard_pairs_prefix_arrays(sh_base, "doc_id", JACCARD_THRESHOLD).select(
        "id_a", "id_b"
    )
    path = store_path("cc_labels", sf_dir)
    write_index_store(connected_components(base_pairs), path)
    stored = read_index_store(spark, path, "node bigint, cluster bigint")

    # -- refresh: CC over stored label edges + batch-touching pairs.
    sh_all = shingle_sets(docs, "doc_id", "text", n=3)
    batch_ids = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    delta = jaccard_pairs_delta(
        sh_all, "doc_id", JACCARD_THRESHOLD, batch_ids
    ).select("id_a", "id_b")
    label_edges = stored.select(
        F.col("node").alias("id_a"), F.col("cluster").alias("id_b")
    )
    merged = label_edges.unionByName(delta)
    return connected_components(merged).select(
        F.col("node").alias("doc_id"), "cluster"
    )


# --- indexed_cc_refresh -------------------------------------------------------
# incremental_cc_refresh with the LAST full-corpus pass removed
# (VERDICT r11 #7): that query re-shingles the whole corpus per
# refresh to rebuild the probe-side inverted index — an honest 100×
# caveat noted in its plan.  Here the prior run persists the exploded
# shingle index ALONGSIDE the label table (the same parquet index
# store that already holds bands/sketches/bloom/labels), and the
# refresh shingles ONLY the batch docs: probe index = stored shingles
# ∪ batch shingles, so every refresh-side input is O(|store| read +
# |batch| compute) — no base text is ever re-tokenized.  Same output
# contract as dedup_clusters/incremental_cc_refresh, certified
# against the same full-graph transitive-closure oracle.


def indexed_cc_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_delta,
    )
    from myfitnesspaw_spark.sinks.warehouse import (
        read_index_store,
        store_path,
        write_bucketed_index_store,
        write_index_store,
    )

    docs = scatter(load_table(spark, sf_dir, "documents"))
    base = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)

    # -- simulated prior run: shingle the base corpus ONCE, persist the
    # exploded shingle index, and persist the CC label table computed
    # from that same stored index (read back so the certified refresh
    # consumes exactly what a real prior run would have left behind).
    #
    # r21 (guide §6 layout-for-the-reader, VERDICT r20 #3): the index
    # is written BUCKETED BY doc_id — every consumer of the stored
    # shingles clusters by doc_id first (the PPJoin prefix-ranking
    # window, both sizes aggregations, the verify attach joins), so
    # the bucketed scan's HashPartitioning(doc_id) replaces 4
    # exchanges of the whole index per refresh (plan: 9 → 5 Exchange
    # on the prior-run leg; at 100 TB the stored index never
    # re-shuffles).  jaccard_pairs_prefix skips its localCheckpoint
    # for the same reason (a checkpoint forgets the bucketing); the
    # scan itself is the materialization barrier.  Bucketing by
    # `shingle` instead was evaluated and rejected: both
    # shingle-keyed joins sit ABOVE lineage that re-clusters by
    # doc_id (prefix ranks) or a union (delta probe), so a
    # shingle layout helps no operator in either consumer.
    idx_path = store_path("cc_shingle_idx", sf_dir)
    sh_stored = write_bucketed_index_store(
        shingle_sets(base, "doc_id", "text", n=3), idx_path, "doc_id"
    )
    base_pairs = jaccard_pairs_prefix(
        sh_stored, "doc_id", JACCARD_THRESHOLD, checkpoint=False
    ).select("id_a", "id_b")
    lbl_path = store_path("cc_labels_idx", sf_dir)
    write_index_store(connected_components(base_pairs), lbl_path)
    stored = read_index_store(spark, lbl_path, "node bigint, cluster bigint")

    # -- refresh: shingle only the batch, probe store ∪ batch, CC over
    # label edges + delta pairs (contraction property, as in
    # incremental_cc_refresh).
    sh_batch = shingle_sets(batch, "doc_id", "text", n=3)
    sh_probe = sh_stored.unionByName(sh_batch)
    delta = jaccard_pairs_delta(
        sh_probe, "doc_id", JACCARD_THRESHOLD, batch.select("doc_id")
    ).select("id_a", "id_b")
    label_edges = stored.select(
        F.col("node").alias("id_a"), F.col("cluster").alias("id_b")
    )
    return connected_components(label_edges.unionByName(delta)).select(
        F.col("node").alias("doc_id"), "cluster"
    )


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same cluster assignment as :func:`dedup_clusters`, computed with
    the large-star/small-star contraction (O(log^2 n) rounds) instead
    of hash-min propagation (O(diameter) rounds) — the variant you run
    at 100 TB where the near-dup graph's diameter is unbounded.  Shares
    DEDUP_CLUSTERS_ORACLE: identical (doc_id, cluster) output."""
    from myfitnesspaw_spark.operators.dedup import connected_components_star

    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_arrays(docs, "doc_id", "text", n=3)
    pairs = jaccard_pairs_prefix_arrays(sh, "doc_id", JACCARD_THRESHOLD).select("id_a", "id_b")
    return connected_components_star(pairs).select(
        F.col("node").alias("doc_id"), "cluster"
    )


# --- dedup_graph_triangles ------------------------------------------------
# Local clustering over the near-dup graph: per-doc triangle counts
# (degree-ordered orientation, operators/graph.py::triangle_counts).
# Next to degree and PageRank this separates dense duplicate CLIQUES
# (neighbors all near-dup each other — collapse aggressively) from
# template/boilerplate HUBS (high degree, no closure — a different
# cleanup decision).  The oracle counts each {a<b<c} triangle once via
# the ordered three-way join — semantics, not strategy; the engine's
# oriented form does O(m^1.5) work instead of deg² wedges.


def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.graph import triangle_counts

    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_arrays(docs, "doc_id", "text", n=3)
    pairs = jaccard_pairs_prefix_arrays(sh, "doc_id", JACCARD_THRESHOLD).select("id_a", "id_b")
    return triangle_counts(pairs).select(
        F.col("node").alias("doc_id"), "deg", "n_triangles"
    )


DEDUP_TRIANGLES_ORACLE = f"""
WITH {{shingles}},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM edges
  UNION ALL
  SELECT id_b, id_a FROM edges
),
deg AS (SELECT u AS doc_id, COUNT(*) AS deg FROM sym GROUP BY 1),
tri AS (
  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
  FROM edges e1
  JOIN edges e2 ON e2.id_a = e1.id_b
  JOIN edges e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
),
per AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT doc_id, COUNT(*) AS n_triangles FROM per GROUP BY 1)
SELECT d.doc_id, d.deg,
       CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles
FROM deg d LEFT JOIN cnt c USING (doc_id)
""".format(shingles=_SHINGLES_CTE)


# --- minhash_lsh_pairs ----------------------------------------------------

MH_HASHES = 16
MH_BAND_ROWS = 2


def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.sources import sf_is_small

    docs = scatter(load_table(spark, sf_dir, "documents"))
    # Scale-aware hot-band salting, same policy as embedding_near_dup:
    # result-identical at any G, so bench scale skips the G× row
    # replication while a crawl-scale corpus (where one degenerate
    # band of near-identical docs is routine) spreads each band key's
    # quadratic candidate space over G(G+1)/2 tasks.
    return minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=MH_HASHES,
        band_rows=MH_BAND_ROWS,
        threshold=JACCARD_THRESHOLD,
        salt_groups=1 if sf_is_small(sf_dir) else 4,
    )


def _minhash_sig_band_ctes() -> str:
    """The sh → sig → bands CTE fragment (shingles, 16-seed rotation
    signatures, banded keys) — factored so the streaming ingest-probe
    oracle (plans/stream_queries.py) replays the IDENTICAL banding the
    batch pair oracles use.

    Rotation family (mirrors functions/text.py::minhash_signature):
    seed i = min over shingles of the md5 digest cyclically rotated
    by 2i hex chars; i=0 reduces to the plain digest."""
    sig_cols = ",\n         ".join(
        f"min(substr(md5(shingle), {2 * i + 1}) || substr(md5(shingle), 1, {2 * i})) AS h{i}"
        for i in range(MH_HASHES)
    )
    band_rows = ", ".join(
        f"({b}, h{b * MH_BAND_ROWS} || '|' || h{b * MH_BAND_ROWS + 1})"
        for b in range(MH_HASHES // MH_BAND_ROWS)
    )
    return f"""{_SHINGLES_CTE},
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, t.band, t.key
  FROM sig, LATERAL (VALUES {band_rows}) AS t(band, key)
)"""


def _minhash_pair_ctes() -> str:
    """Shared oracle CTE chain — banded-MinHash candidates (``cand``)
    plus exact-Jaccard verification (``ver``) — interpolated into both
    MINHASH_LSH_ORACLE and MINHASH_DEDUP_E2E_ORACLE so the pair
    semantics can never drift between the stage query and the
    end-to-end closure."""
    return f"""{_minhash_sig_band_ctes()},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
ver AS (
  SELECT s.id_a, s.id_b,
         s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) AS jaccard
  FROM shared s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
)"""


MINHASH_LSH_ORACLE = f"""
WITH {_minhash_pair_ctes()}
SELECT c.id_a, c.id_b, v.jaccard
FROM cand c JOIN ver v ON c.id_a = v.id_a AND c.id_b = v.id_b
"""


# --- minhash_jaccard_calibration -------------------------------------------
# The ESTIMATOR-ACCURACY certificate for the MinHash family: every LSH
# query above trusts that signature agreement tracks exact Jaccard
# (Broder 1997's E[matches/K] = J), but nothing in the registry
# certifies that the 16-seed rotation family actually calibrates on
# this corpus.  This query buckets every banded-LSH candidate pair by
# its EXACT Jaccard decile and reports, per decile, the pair count,
# the summed signature-match components (sum_match / (n_pairs * 16) is
# the family's estimate of the decile's mean Jaccard), and how many
# pairs clear the production threshold — the table an operator reads
# before trusting a banding config at crawl scale.
#
# All-integer output contract: deciles via integer division
# (10*n_shared) div n_union, match counts as ints, threshold compare
# cross-multiplied (5*n_shared >= 4*n_union for 0.8) — no float ever
# crosses a group boundary, so the driver hash cannot drift.
#
# Scale shape: identical to minhash_lsh_pairs up through candidates —
# the SAME code (operators/dedup.minhash_signatures +
# minhash_band_candidates), so the certified family cannot drift from
# the stage operator; the exact side then counts intersections by
# joining each shingle side THROUGH the checkpointed candidate list
# (verify_pairs' shape — cost Σ|shingles of candidate docs|, never a
# corpus- or candidate-doc-quadratic self-join).  The final aggregate
# is ≤10 rows.  At crawl scale the candidate join inherits the
# hot-band story of the stage query (operators/salting.py) — a
# calibration pass typically runs on a corpus sample anyway.

MH_CAL_DECILE_CAP = 9


def minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fractions import Fraction

    from myfitnesspaw_spark.operators.dedup import (
        minhash_band_candidates,
        minhash_signatures,
    )

    thr = Fraction(JACCARD_THRESHOLD).limit_denominator(1000)
    docs = scatter(load_table(spark, sf_dir, "documents"))
    # ONE side table holding both per-doc verification inputs (r20):
    # the distinct shingle array (carry_shingles) and the 16 signature
    # columns, checkpointed once and read 3× (bands + both pair
    # sides).  This replaces the previous THREE checkpoints (sh, sig,
    # exploded shingles) and the exploded-shingle machinery — the
    # shingle-keyed "shared" join + pair groupBy and the sizes groupBy
    # were two corpus-sized exchanges; intersection counts and set
    # sizes are now row-local array ops on the two attached arrays.
    # checkpoint=False is sanctioned here: ``sh`` itself has exactly
    # one consumer (the sig chain) — ``side`` is the shared barrier.
    _, sig = minhash_signatures(
        docs, "doc_id", "text", MH_HASHES, 3, checkpoint=False, carry_shingles=True
    )
    side = sig.localCheckpoint()
    # Checkpointed: cand feeds the pair build AND nothing else heavy —
    # its lineage (band self-join + distinct) is the shuffle-heavy
    # stage and must not replay per consumer.
    cand = minhash_band_candidates(
        side, "doc_id", MH_HASHES, MH_BAND_ROWS
    ).localCheckpoint()

    sigv = F.array(*[F.col(f"h{i}") for i in range(MH_HASHES)])
    side_a = side.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("__sh_a"),
        sigv.alias("sig_a"),
    )
    side_b = side.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("__sh_b"),
        sigv.alias("sig_b"),
    )
    # Generate barrier (struct through explode(array(...))): the three
    # stats feed four downstream expressions; materializing them once
    # keeps the interpreted array_intersect to one evaluation per pair.
    stats = F.struct(
        F.size(F.array_intersect("__sh_a", "__sh_b")).cast("long").alias("n_shared"),
        F.size("__sh_a").cast("long").alias("n_a"),
        F.size("__sh_b").cast("long").alias("n_b"),
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
        ).alias("n_match"),
    )
    pairs = (
        cand.join(side_a, "id_a")
        .join(side_b, "id_b")
        .select(F.explode(F.array(stats)).alias("__v"))
        .select(
            F.col("__v.n_shared").alias("n_shared"),
            (F.col("__v.n_a") + F.col("__v.n_b") - F.col("__v.n_shared")).alias(
                "n_union"
            ),
            F.col("__v.n_match").alias("n_match"),
        )
    )
    decile = F.least(
        F.lit(MH_CAL_DECILE_CAP).cast("long"),
        F.expr("(10 * n_shared) div n_union"),
    )
    return (
        pairs.select(decile.alias("jacc_decile"), "n_match", "n_shared", "n_union")
        .groupBy("jacc_decile")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("n_match").alias("sum_match"),
            F.count(
                F.when(
                    thr.denominator * F.col("n_shared")
                    >= thr.numerator * F.col("n_union"),
                    1,
                )
            ).alias("n_above_threshold"),
        )
    )


def _minhash_calibration_oracle() -> str:
    from fractions import Fraction

    thr = Fraction(JACCARD_THRESHOLD).limit_denominator(1000)
    match_sum = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(MH_HASHES)
    )
    return f"""
WITH {_minhash_pair_ctes()},
pairs AS (
  SELECT COALESCE(s.n_shared, 0) AS n_shared,
         sa.n_sh + sb.n_sh - COALESCE(s.n_shared, 0) AS n_union,
         {match_sum} AS n_match
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  LEFT JOIN shared s ON s.id_a = c.id_a AND s.id_b = c.id_b
)
SELECT LEAST(CAST({MH_CAL_DECILE_CAP} AS BIGINT), (10 * n_shared) // n_union) AS jacc_decile,
       COUNT(*) AS n_pairs,
       CAST(SUM(n_match) AS BIGINT) AS sum_match,
       COUNT(*) FILTER (WHERE {thr.denominator} * n_shared >= {thr.numerator} * n_union)
         AS n_above_threshold
FROM pairs GROUP BY 1
"""


MINHASH_CALIBRATION_ORACLE = _minhash_calibration_oracle()


# --- simhash_pairs --------------------------------------------------------

SIMHASH_MAX_HAMMING = 3


def simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    return simhash_pairs(docs, "doc_id", "text", max_hamming=SIMHASH_MAX_HAMMING)


def _simhash_oracle() -> str:
    bit_votes = ",\n         ".join(
        f"SUM(cnt * (CASE WHEN substr(md5(token), {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    fp_sum = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    band_rows = ", ".join(f"({b}, (simhash >> {8 * b}) & 255)" for b in range(4))
    return f"""
WITH d AS (SELECT doc_id, {_WORDS} AS w FROM documents),
tok AS (
  SELECT doc_id, token, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(w) AS token FROM d)
  GROUP BY 1, 2
),
votes AS (
  SELECT doc_id,
         {bit_votes}
  FROM tok GROUP BY doc_id
),
fp AS (SELECT doc_id, {fp_sum} AS simhash FROM votes),
bands AS (
  SELECT doc_id, simhash, t.band, t.byte
  FROM fp, LATERAL (VALUES {band_rows}) AS t(band, byte)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM bands a JOIN bands b ON a.band = b.band AND a.byte = b.byte
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""


SIMHASH_ORACLE = _simhash_oracle()


# --- deterministic sampling / split assignment ----------------------------
# Training-data curation needs REPRODUCIBLE sampling: engine RNGs are
# not portable (Spark's sample() and DuckDB's USING SAMPLE draw
# different rows), so the split key is a hash of the stable id —
# identical everywhere, stable under re-runs, join-free to recompute.

# 256 buckets from the first two md5 hex chars (portable: hex-digit
# value = position in a lookup string, identical in any engine — no
# hex→int cast, whose BLOB detour differs between engines).
_HEX = "0123456789abcdef"
_VAL_LT, _TEST_LT = 26, 52  # ≈10% / ≈10% of 256


def _split_bucket(id_col):
    h = F.md5(id_col.cast("string"))
    v1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    v2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (v1 * 16 + v2).cast("long")


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents"))
    bucket = _split_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < _VAL_LT, F.lit("val"))
        .when(bucket < _TEST_LT, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", bucket.alias("bucket"), split.alias("split"))


TRAIN_SPLIT_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         CAST((strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1
              AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {_VAL_LT} THEN 'val'
            WHEN bucket < {_TEST_LT} THEN 'test'
            ELSE 'train' END AS split
FROM b
"""


# --- leakage_safe_split -------------------------------------------------------
# Train/val/test assignment that cannot LEAK through near-duplicates:
# train_val_test_split hashes the doc id, so the two members of a
# near-dup pair land in different splits ~64% of the time — the exact
# mechanism behind inflated eval numbers on deduplicated-later corpora
# (Lee et al. 2022 measure over 1% of eval examples with train-set
# near-dups).  The fix every careful pipeline ships: hash the near-dup
# GROUP, not the document — connected components over the verified
# pair graph give each doc a canonical group representative, every doc
# inherits its representative's md5-lattice bucket, and a group is
# atomic across splits by construction.
#
# Scale shape: the pair graph and CC label table are near-dup-sized
# (tiny next to the corpus); the corpus-side work is one LEFT join of
# the label table (AQE broadcasts it) + a row-local bucket projection.
# Isolated docs (no near-dup) coalesce to themselves — their split
# matches train_val_test_split's exactly, so the two queries disagree
# only where disagreeing is the point.


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.dedup import connected_components

    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_arrays(docs, "doc_id", "text", n=3)
    pairs = jaccard_pairs_prefix_arrays(sh, "doc_id", JACCARD_THRESHOLD).select("id_a", "id_b")
    labels = connected_components(pairs).withColumnRenamed("node", "doc_id")
    grouped = docs.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster", F.col("doc_id")).alias("group_rep")
    )
    bucket = _split_bucket(F.col("group_rep"))
    split = (
        F.when(bucket < _VAL_LT, F.lit("val"))
        .when(bucket < _TEST_LT, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return grouped.select(
        "doc_id", "group_rep", bucket.alias("bucket"), split.alias("split")
    )


LEAKAGE_SAFE_SPLIT_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
),
nodes AS (SELECT id_a AS node FROM edges UNION SELECT id_b FROM edges),
sym AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION ALL
  SELECT id_b, id_a FROM edges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT y.d, r.lbl FROM reach r JOIN sym y ON y.s = r.node
),
assign AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
grouped AS (
  SELECT d.doc_id, COALESCE(a.cluster, d.doc_id) AS group_rep
  FROM documents d LEFT JOIN assign a ON d.doc_id = a.node
),
b AS (
  SELECT doc_id, group_rep,
         CAST((strpos('{_HEX}', substr(md5(CAST(group_rep AS VARCHAR)), 1, 1)) - 1) * 16
              + strpos('{_HEX}', substr(md5(CAST(group_rep AS VARCHAR)), 2, 1)) - 1
              AS BIGINT) AS bucket
  FROM grouped
)
SELECT doc_id, group_rep, bucket,
       CASE WHEN bucket < {_VAL_LT} THEN 'val'
            WHEN bucket < {_TEST_LT} THEN 'test'
            ELSE 'train' END AS split
FROM b
"""


# --- sentence splitting: native posexplode + Python UDTF ------------------


def sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional sentence split — native ``posexplode`` over a regex
    split (the Spark-first answer; the UDTF variant below demonstrates
    the extension surface for logic regex can't express)."""
    docs = scatter(load_table(spark, sf_dir, "documents"))
    sentences = F.split(F.col("text"), r"\.\s+")
    return docs.select(
        "doc_id", F.posexplode(sentences).alias("sentence_no", "sentence")
    ).where(F.trim(F.col("sentence")) != "")


SENTENCE_SPLIT_ORACLE = r"""
SELECT doc_id, CAST(i - 1 AS INT) AS sentence_no, s[i] AS sentence
FROM (SELECT doc_id, string_split_regex(text, '\.\s+') AS s FROM documents),
     LATERAL (SELECT unnest(generate_series(1, len(s))) AS i)
WHERE trim(s[i]) <> ''
"""


def sentence_split_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same split as a Spark 4 Python UDTF (one row in, N rows out) —
    the lateral-table-function plumbing for splitters that need real
    code (a sentencepiece model, a parser); result-identical to the
    native form, so it shares the posexplode oracle."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sentence_no int, sentence string")
    class SentenceSplitter:
        def eval(self, row):  # TABLE argument arrives as one Row
            for i, s in enumerate(re.split(r"\.\s+", row.text)):
                if s.strip():
                    yield row.doc_id, i, s

    docs = scatter(load_table(spark, sf_dir, "documents"))
    return SentenceSplitter(docs.select("doc_id", "text").asTable())


# --- ann_topk_cosine ------------------------------------------------------

ANN_K = 5
ANN_QUERY_MOD = 50

# DuckDB cosine with a sequential left fold — the SAME fold order Spark's
# `aggregate` uses, so the doubles are bit-identical, not just close.
_DUCK_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (acc, v) -> acc + v)"
)
_DUCK_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, v) -> acc + v))"
)


def _duck_cosine(a: str, b: str) -> str:
    return (
        f"ROUND({_DUCK_DOT.format(a=a, b=b)} / "
        f"({_DUCK_NORM.format(a=a)} * {_DUCK_NORM.format(a=b)}), 6)"
    )


def _ann_topk_from(vecs: DataFrame) -> DataFrame:
    """Brute-force truth search over a prepared corpus frame — split
    out (r20) so ivf_recall_eval can feed truth AND approx from ONE
    checkpointed scan instead of five independent scan+scatter trees."""
    queries = vecs.where(F.col("vec_id") % ANN_QUERY_MOD == 0)
    return cosine_topk(queries, vecs, "vec_id", "embedding", ANN_K)


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_topk_from(scatter(load_table(spark, sf_dir, "embeddings")))


# Shared oracle CTE fragments for the ANN family — interpolated into
# ANN_TOPK_ORACLE, IVF_ANN_ORACLE, and IVF_RECALL_ORACLE (the recall
# contract composes the other two), _minhash_pair_ctes-style, so the
# notion of "truth" / "approx" can never drift between the stage
# queries and the evaluation that scores them.

_ANN_Q_CTE = f"""q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id % {ANN_QUERY_MOD} = 0
)"""


def _bf_ranked_ctes(scored: str = "scored", ranked: str = "ranked") -> str:
    """Brute-force cosine scoring of ``q`` against the corpus, ranked
    per query (cos DESC, neighbor_id ASC)."""
    return f"""{scored} AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_duck_cosine("q.qv", "c.embedding")} AS cos
  FROM q JOIN embeddings c ON c.vec_id <> q.query_id
),
{ranked} AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM {scored}
)"""


ANN_TOPK_ORACLE = f"""
WITH {_ANN_Q_CTE},
{_bf_ranked_ctes()}
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= {ANN_K}
"""


# --- embedding_near_dup ---------------------------------------------------
# IVF-style bucket pruning: `label` plays the coarse-centroid assignment.
# The base table has no high-cosine pairs (max ≈ 0.51), so union planted
# copies of every 25th vector; threshold 0.45 also surfaces a few
# natural within-bucket pairs.

NEAR_DUP_THRESHOLD = 0.45


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = scatter(load_table(spark, sf_dir, "embeddings"))
    copies = vecs.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    corpus = vecs.select("vec_id", "embedding", "label").unionByName(copies)
    # Scale-aware salting (result-identical by construction at any G):
    # the exact salt-cell decomposition spreads each label bucket's
    # quadratic pair space over G(G+1)/2 cells — with ~5 labels the
    # unsalted join caps at 5 parallel tasks and one hot label is a
    # straggler.  But salting costs G× row replication, which at small
    # data is pure overhead (r4 measured 0.84→1.37 s at sf0.1), so G
    # follows the data scale: plain join up to sf0.1, G=4 (10 cells
    # per bucket) beyond — and when the scale is unknown, assume big.
    from myfitnesspaw_spark.sources import sf_is_small

    return bucket_near_dup(
        corpus,
        "vec_id",
        "embedding",
        "label",
        NEAR_DUP_THRESHOLD,
        salt_groups=1 if sf_is_small(sf_dir) else 4,
        # The input lineage is a raw scan + self-union: without the
        # barrier each self-join side re-ran it plus the norm fold
        # (4 parquet scans in the final plan, r20 wave 5).
        checkpoint_base=True,
    )


EMBEDDING_NEAR_DUP_ORACLE = f"""
WITH corpus AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 25 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(a.label AS INT) AS bucket,
       {_duck_cosine("a.embedding", "b.embedding")} AS cos
FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_duck_cosine("a.embedding", "b.embedding")} >= {NEAR_DUP_THRESHOLD}
"""


# --- ivf_ann_topk ---------------------------------------------------------
# The scale path next to brute-force ann_topk_cosine: a deterministic
# coarse quantizer (centroids = the IVF_NC lowest-id vectors — a seeded
# k-means init without the Lloyd steps, which would be float-sum
# order-dependent cross-engine), shuffle-free nearest-centroid
# assignment, and probe-limited search of the IVF_NPROBE nearest
# clusters per query.

IVF_NC = 16
IVF_NPROBE = 3


def _ivf_topk_from(vecs: DataFrame) -> DataFrame:
    """Probe-limited IVF search over a prepared corpus frame (r20 —
    see :func:`_ann_topk_from`)."""
    from myfitnesspaw_spark.operators.similarity import ivf_ann_topk as _ivf

    # The coarse quantizer is driver-side by design (like every IVF
    # index build): IVF_NC rows collected once, re-broadcast as
    # literals into the assignment projection.
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in vecs.where(F.col("vec_id") < IVF_NC).collect()
    ]
    queries = vecs.where(F.col("vec_id") % ANN_QUERY_MOD == 0)
    return _ivf(queries, vecs, "vec_id", "embedding", cents, IVF_NPROBE, ANN_K)


def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk_from(scatter(load_table(spark, sf_dir, "embeddings")))


def _ivf_ranked_ctes(scored: str = "scored", ranked: str = "ranked") -> str:
    """Probe-limited IVF search of ``q`` (cent/assigned/probes +
    scoring), ranked per query — requires ``q`` in scope."""
    return f"""cent AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_NC}
),
assigned AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_duck_cosine("e.embedding", "c.cv")} DESC, c.cid ASC
           ) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.query_id, q.qv, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_duck_cosine("q.qv", "c.cv")} DESC, c.cid ASC
           ) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= {IVF_NPROBE}
),
{scored} AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_duck_cosine("p.qv", "a.embedding")} AS cos
  FROM probes p JOIN assigned a USING (cid)
  WHERE a.vec_id <> p.query_id
),
{ranked} AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM {scored}
)"""


IVF_ANN_ORACLE = f"""
WITH {_ANN_Q_CTE},
{_ivf_ranked_ctes()}
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= {ANN_K}
"""


# --- ivf_recall_eval --------------------------------------------------------
# The ACCURACY CONTRACT for the approximate index, completing the pair
# with minhash_jaccard_calibration: recall@K of the probe-limited IVF
# search against the brute-force ground truth, per query.  This is the
# measurement an operator runs before trusting an (NC, NPROBE) config
# at corpus scale — IVF trades recall for the probe bound, and nothing
# else in the registry certifies WHERE that trade lands on this data.
#
# Output is one row per evaluation query: exact hit count against the
# top-K truth set plus recall in exact integer ppm (10⁶·hits DIV K) —
# no float crosses the hash.
#
# Scale shape: the ground-truth side is brute force BY DESIGN — recall
# evaluation always pays exact search, which is why it runs on the
# SAMPLED query set (vec_id % ANN_QUERY_MOD), not the corpus; that is
# the same anchors×corpus cost as the already-registered
# ann_topk_cosine.  The IVF side inherits its probe-limited plan.  The
# final intersection joins two K·|queries|-row frames on (query,
# neighbor) — evaluation-set-sized, broadcastable at any corpus scale.
#
# The oracle is COMPOSED from the same CTE fragments that build
# ANN_TOPK_ORACLE and IVF_ANN_ORACLE (_ANN_Q_CTE / _bf_ranked_ctes /
# _ivf_ranked_ctes), so truth/approx cannot drift from the stage
# oracles by construction; tests/test_registry_oracle.py certifies
# the composition against the Spark side.


def ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE checkpointed scan feeds truth, approx (incl. its centroid
    # collect), and the query universe (r20, guide §2.4): composing the
    # two standalone queries built five independent scan+scatter trees
    # of the same embeddings table (plan: 5 Scans, 4 scatter
    # Exchanges); the shared frame leaves one.
    vecs = scatter(load_table(spark, sf_dir, "embeddings")).localCheckpoint()
    truth = _ann_topk_from(vecs).select("query_id", "neighbor_id")
    approx = _ivf_topk_from(vecs).select("query_id", "neighbor_id")
    hits = (
        approx.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    # Query universe straight off the shared frame (the oracle's q
    # CTE) — NOT truth.select("query_id").distinct(), which would
    # replay the whole brute-force subtree just to list ids.
    queries = vecs.where(F.col("vec_id") % ANN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id")
    )
    per_q = queries.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("__hits", F.lit(0)).cast("long").alias("n_hits")
    )
    return per_q.select(
        "query_id",
        "n_hits",
        F.expr(f"(1000000 * n_hits) div {ANN_K}").alias("recall_ppm"),
    )


IVF_RECALL_ORACLE = f"""
WITH {_ANN_Q_CTE},
{_bf_ranked_ctes("bf_scored", "bf_ranked")},
truth AS (
  SELECT query_id, neighbor_id FROM bf_ranked WHERE rank <= {ANN_K}
),
{_ivf_ranked_ctes("ivf_scored", "ivf_ranked")},
approx AS (
  SELECT query_id, neighbor_id FROM ivf_ranked WHERE rank <= {ANN_K}
),
hits AS (
  SELECT a.query_id, COUNT(*) AS n_hits
  FROM approx a JOIN truth t
    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
  GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000000 * CAST(COALESCE(h.n_hits, 0) AS BIGINT)) // {ANN_K} AS recall_ppm
FROM q LEFT JOIN hits h USING (query_id)
"""


# --- kmeans_clusters ------------------------------------------------------
# Iterative Lloyd k-means (operators/clustering.py): k=8 centroids
# seeded from the lowest vec_ids, 2 fixed rounds (the oracle unrolls
# them), exact integer micro-unit arithmetic throughout so assignment,
# means, and WCSS hash-match DuckDB bit-for-bit.

KMEANS_K = 8
KMEANS_ITER = 2


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.clustering import (
        assign_clusters,
        lloyd_iterations,
        scale_to_micro,
    )

    # Materialized ONCE: every Lloyd round (and the final assignment)
    # is its own action; without the checkpoint each re-runs the scan,
    # the micro-unit scaling, and the scatter() exchange.
    vecs = (
        scatter(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", scale_to_micro(F.col("embedding")).alias("v"))
        .localCheckpoint()
    )
    init = [
        (int(r["vec_id"]), [int(x) for x in r["v"]])
        for r in vecs.where(F.col("vec_id") < KMEANS_K).collect()
    ]
    cents = lloyd_iterations(vecs, "v", init, KMEANS_ITER)
    final = assign_clusters(vecs, "v", cents)
    return final.groupBy(F.col("cluster").cast("long").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dist").alias("wcss"),
    )


_KM = {"K": KMEANS_K, "S": 1_000_000}

KMEANS_ORACLE = f"""
WITH pts AS (
  SELECT vec_id, i AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {_KM["S"]}) AS BIGINT) AS val
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
),
c0 AS (SELECT vec_id AS cid, dim, val FROM pts WHERE vec_id < {_KM["K"]}),
d1 AS (
  SELECT p.vec_id, c.cid, SUM((p.val - c.val) * (p.val - c.val)) AS dist
  FROM pts p JOIN c0 c USING (dim) GROUP BY 1, 2
),
a1 AS (SELECT vec_id, cid FROM (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d1) WHERE rn = 1),
c1 AS (
  SELECT a.cid, p.dim,
         CAST(TRUNC(CAST(SUM(p.val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS val
  FROM pts p JOIN a1 a ON p.vec_id = a.vec_id GROUP BY 1, 2
),
d2 AS (
  SELECT p.vec_id, c.cid, SUM((p.val - c.val) * (p.val - c.val)) AS dist
  FROM pts p JOIN c1 c USING (dim) GROUP BY 1, 2
),
a2 AS (SELECT vec_id, cid FROM (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d2) WHERE rn = 1),
c2 AS (
  SELECT a.cid, p.dim,
         CAST(TRUNC(CAST(SUM(p.val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS val
  FROM pts p JOIN a2 a ON p.vec_id = a.vec_id GROUP BY 1, 2
),
d3 AS (
  SELECT p.vec_id, c.cid, SUM((p.val - c.val) * (p.val - c.val)) AS dist
  FROM pts p JOIN c2 c USING (dim) GROUP BY 1, 2
),
a3 AS (SELECT vec_id, cid, dist FROM (
  SELECT vec_id, cid, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d3) WHERE rn = 1)
SELECT cid AS cluster, COUNT(*) AS n_points, CAST(SUM(dist) AS BIGINT) AS wcss
FROM a3 GROUP BY 1
"""


# --- embedding_dim_stats --------------------------------------------------
# Per-dimension profile of the embedding column — the feature-space
# screen (dead dimensions, scale drift) run before indexing/training a
# 100 TB vector corpus.  posexplode turns (vec_id, array) into
# (dim, value) pairs; ONE map-side-combined aggregate per dimension
# computes n / min / max / sum / sum-of-squares in exact integer
# micro-units (q = ROUND(v·10⁶), float32→double is exact, so both
# engines quantize identically; Σq² ≤ D·N·10¹² stays far inside int64
# at any per-dimension row count this side of 10⁶ — shard the sum by
# vec_id range first at corpus scales beyond that).  D dims → D output
# rows; the shuffle carries 5 numbers per (partition, dim).

_DIM_SCALE = 1_000_000


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = scatter(load_table(spark, sf_dir, "embeddings"))
    q = F.round(F.col("val").cast("double") * _DIM_SCALE).cast("long")
    return (
        vecs.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select((F.col("pos") + 1).alias("dim"), q.alias("q"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            F.sum("q").alias("sum_q"),
            F.sum(F.col("q") * F.col("q")).alias("sumsq_q"),
        )
    )


EMBEDDING_DIM_STATS_ORACLE = f"""
WITH pts AS (
  SELECT CAST(i AS INT) AS dim,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_DIM_SCALE}) AS BIGINT) AS q
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
)
SELECT dim, COUNT(*) AS n, MIN(q) AS min_q, MAX(q) AS max_q,
       CAST(SUM(q) AS BIGINT) AS sum_q, CAST(SUM(q * q) AS BIGINT) AS sumsq_q
FROM pts GROUP BY 1
"""


# --- dedup_survivors ------------------------------------------------------
# The MATERIALIZATION step that closes the dedup pipeline: detect →
# cluster → emit the deduplicated corpus.  Survivors = every doc that
# is its cluster's canonical minimum (cluster = min reachable doc_id)
# plus every doc in no near-dup pair at all — implemented as one LEFT
# ANTI join of the corpus against the non-canonical cluster members.
# Scale shape: the CC label table is pair-graph-sized (tiny next to
# the corpus); the anti join broadcasts it onto the corpus scan.

def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.dedup import connected_components

    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_arrays(docs, "doc_id", "text", n=3)
    pairs = jaccard_pairs_prefix_arrays(sh, "doc_id", JACCARD_THRESHOLD).select("id_a", "id_b")
    losers = (
        connected_components(pairs)
        .where(F.col("node") != F.col("cluster"))
        .select(F.col("node").alias("doc_id"))
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


DEDUP_SURVIVORS_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
),
nodes AS (SELECT id_a AS node FROM edges UNION SELECT id_b FROM edges),
sym AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION ALL
  SELECT id_b, id_a FROM edges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT y.d, r.lbl FROM reach r JOIN sym y ON y.s = r.node
),
assign AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
losers AS (SELECT node AS doc_id FROM assign WHERE node <> cluster)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
WHERE l.doc_id IS NULL
"""


# --- minhash_dedup_e2e ----------------------------------------------------
# The single certified CLOSURE of the MinHash path (VERDICT r8 #3):
# detect (banded LSH candidates + exact verify) → cluster (hash-min
# connected components) → materialize (survivors with their cluster
# size), in ONE query — the registry certifies every stage separately
# (minhash_lsh_pairs → dedup_clusters → dedup_survivors) but a real
# curation pass runs them as one plan, and a wiring bug between stages
# (wrong id column, dropped isolated docs, off-by-one on the canonical
# pick) is invisible to stage-level certification.
#
# Survivors = each cluster's min doc_id plus every doc in no verified
# pair; n_members = docs the survivor represents (1 for isolated docs)
# — the multiplicity a downstream mixture/sampling pass needs to
# reweight the deduplicated corpus (SlimPajama-style global dedup
# keeps counts for exactly this reason).
#
# Scale shape: pair generation is the candidate-bounded LSH join
# (never all-pairs; hot bands salt-cell-decomposed at crawl scale);
# CC runs on the pair graph only (tiny next to the corpus, label
# table = near-dup docs only); the final step is one LEFT ANTI plus
# one LEFT join of two label-table-sized sides onto the corpus scan —
# AQE broadcasts both at real scale.  Nothing in the plan is
# corpus-quadratic.


def minhash_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.dedup import connected_components
    from myfitnesspaw_spark.sources import sf_is_small

    docs = scatter(load_table(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=MH_HASHES,
        band_rows=MH_BAND_ROWS,
        threshold=JACCARD_THRESHOLD,
        salt_groups=1 if sf_is_small(sf_dir) else 4,
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    losers = cc.where(F.col("node") != F.col("cluster")).select(
        F.col("node").alias("doc_id")
    )
    members = cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        docs.join(losers, "doc_id", "left_anti")
        .join(members.withColumnRenamed("cluster", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.coalesce("n_members", F.lit(1).cast("long")).alias("n_members"),
        )
    )


MINHASH_DEDUP_E2E_ORACLE = f"""
WITH RECURSIVE {_minhash_pair_ctes()},
edges AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN ver v ON c.id_a = v.id_a AND c.id_b = v.id_b
),
nodes AS (SELECT id_a AS node FROM edges UNION SELECT id_b FROM edges),
sym AS (
  SELECT id_a AS s, id_b AS d FROM edges
  UNION ALL
  SELECT id_b, id_a FROM edges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT y.d, r.lbl FROM reach r JOIN sym y ON y.s = r.node
),
assign AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
losers AS (SELECT node AS doc_id FROM assign WHERE node <> cluster),
members AS (SELECT cluster, COUNT(*) AS n_members FROM assign GROUP BY 1)
SELECT d.doc_id, d.lang, d.source, d.n_chars,
       CAST(COALESCE(m.n_members, 1) AS BIGINT) AS n_members
FROM documents d
LEFT JOIN losers l ON d.doc_id = l.doc_id
LEFT JOIN members m ON d.doc_id = m.cluster
WHERE l.doc_id IS NULL
"""


# --- delta_dedup_pairs ----------------------------------------------------
# Incremental (delta) near-dup detection — the run a daily-updated
# corpus actually executes: only pairs TOUCHING the new batch are
# computed; base×base pairs were found by prior runs.  The probe side
# of the inverted-index join is restricted to the delta BEFORE the
# shuffle (O(delta activity), not O(corpus²)); the delta here is the
# deterministic 10% slice doc_id % 10 = 0.  The oracle is free to
# compute all pairs and filter — semantics, not strategy.

def delta_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.dedup import jaccard_pairs_delta

    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    delta = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    return jaccard_pairs_delta(sh, "doc_id", JACCARD_THRESHOLD, delta)


DELTA_DEDUP_ORACLE = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.id_a, s.id_b, s.n_shared,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) AS jaccard
FROM shared s
JOIN sizes sa ON s.id_a = sa.doc_id
JOIN sizes sb ON s.id_b = sb.doc_id
WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
  AND (s.id_a % 10 = 0 OR s.id_b % 10 = 0)
"""


# --- neardup_refresh_pipeline ---------------------------------------------
# The INCREMENTAL near-dup closure — delta_dedup_pairs' detection
# carried through cluster + survivor materialization at the refresh
# capstone's O(batch) shape (VERDICT r8 #3): an incoming batch (the
# deterministic 10% slice doc_id % 10 = 0, same as delta_dedup_pairs)
# is admitted after (1) dropping every batch doc near-dup of the
# EXISTING corpus, then (2) connected components over the remaining
# batch×batch near-dup edges, keeping each cluster's min doc_id.
# Precedence is corpus-dedup-first, mirroring corpus_refresh_pipeline:
# a batch doc that is both a corpus dup and a batch dup counts once,
# as a corpus dup, and its batch edges vanish with it BEFORE
# clustering (so a batch doc whose only near-dup was itself dropped
# survives — transitive near-dupness is not direct near-dupness).
#
# Scale shape: O(batch activity) everywhere — pair generation is the
# delta-restricted inverted-index join (probe side cut to the batch
# BEFORE the shuffle, operators/dedup.py::jaccard_pairs_delta); CC
# runs on batch×batch edges only; the drop set is batch-activity-
# sized and anti-joins the batch slice of the scan, never the corpus.


def neardup_refresh_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_delta,
    )

    docs = scatter(load_table(spark, sf_dir, "documents"))
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    batch_ids = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    # One materialization: the pair table feeds the corpus-dup split,
    # the batch-edge filter, and (via CC) the loser set.
    pairs = (
        jaccard_pairs_delta(sh, "doc_id", JACCARD_THRESHOLD, batch_ids)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    a_b = F.col("id_a") % 10 == 0
    b_b = F.col("id_b") % 10 == 0
    dup_exist = (
        pairs.where(a_b != b_b)
        .select(F.when(a_b, F.col("id_a")).otherwise(F.col("id_b")).alias("doc_id"))
        .distinct()
    )
    bedges = (
        pairs.where(a_b & b_b)
        .join(dup_exist.withColumnRenamed("doc_id", "id_a"), "id_a", "left_anti")
        .join(dup_exist.withColumnRenamed("doc_id", "id_b"), "id_b", "left_anti")
        .select("id_a", "id_b")
    )
    losers = (
        connected_components(bedges)
        .where(F.col("node") != F.col("cluster"))
        .select(F.col("node").alias("doc_id"))
    )
    drops = dup_exist.unionByName(losers)
    return (
        docs.where(F.col("doc_id") % 10 == 0)
        .join(drops, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


NEARDUP_REFRESH_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT s.id_a, s.id_b
  FROM shared s
  JOIN sizes sa ON s.id_a = sa.doc_id
  JOIN sizes sb ON s.id_b = sb.doc_id
  WHERE s.n_shared / (sa.n_sh + sb.n_sh - s.n_shared) >= {JACCARD_THRESHOLD}
    AND (s.id_a % 10 = 0 OR s.id_b % 10 = 0)
),
dup_exist AS (
  SELECT DISTINCT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS doc_id
  FROM edges WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
),
bedges AS (
  SELECT id_a, id_b FROM edges
  WHERE id_a % 10 = 0 AND id_b % 10 = 0
    AND id_a NOT IN (SELECT doc_id FROM dup_exist)
    AND id_b NOT IN (SELECT doc_id FROM dup_exist)
),
nodes AS (SELECT id_a AS node FROM bedges UNION SELECT id_b FROM bedges),
sym AS (
  SELECT id_a AS s, id_b AS d FROM bedges
  UNION ALL
  SELECT id_b, id_a FROM bedges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT y.d, r.lbl FROM reach r JOIN sym y ON y.s = r.node
),
assign AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
batch_losers AS (SELECT node AS doc_id FROM assign WHERE node <> cluster)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id % 10 = 0
  AND d.doc_id NOT IN (SELECT doc_id FROM dup_exist)
  AND d.doc_id NOT IN (SELECT doc_id FROM batch_losers)
"""


# --- minhash_signature_refresh ----------------------------------------------
# The SIGNATURE-PERSISTING incremental near-dup refresh (VERDICT r9
# #6, carried through r10 #6): neardup_refresh_pipeline re-shingles
# the whole corpus per batch because its exact inverted index has no
# persisted state; a production LSH dedup job instead signs each doc
# ONCE at ingest, persists the banded signature table, and a later
# batch probes the stored bands — never re-shingling or re-signing
# the base corpus.  This query certifies that full refresh protocol:
#
# 1. PRIOR RUN (simulated): MinHash-sign the base corpus (doc_id %
#    10 != 0) and persist its band table via the warehouse index
#    store (sinks/warehouse.py::write_index_store — real parquet
#    write through the committer, read back under the contracted
#    explicit schema).
# 2. REFRESH: sign only the incoming batch (doc_id % 10 = 0); probe
#    the stored bands with the batch's bands (batch×base candidates)
#    plus a batch×batch band self-join; exact-verify candidates by
#    re-shingling the CANDIDATE docs only (fetch-texts step);
#    corpus-dup-first precedence, CC over batch×batch edges, admit
#    the rest — the same admission semantics as
#    neardup_refresh_pipeline, but through the LSH candidate set.
#
# Scale shape: the refresh path's cost is O(batch bands + candidate
# activity) — the base corpus contributes only the (persisted, band-
# key-partitioned) store side of one join.  Batch and base ids are
# disjoint, so least/greatest orients cross pairs with no dedup rule;
# the probe join inherits the hot-band story of
# minhash_band_candidates (salt-cell decomposition at crawl scale —
# at bench scale the plain join wins, same policy as every LSH
# query).  The oracle composes _minhash_pair_ctes (signatures over
# ALL docs, candidates filtered to pairs touching the batch), which
# is result-identical because a doc's signature depends only on its
# own shingles — the certified claim is exactly that the split
# sign/persist/probe protocol cannot drift from the one-shot LSH
# semantics.

def minhash_signature_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        minhash_band_table,
        minhash_signatures,
        shingle_arrays,
        verify_pairs_arrays,
    )
    from myfitnesspaw_spark.sinks.warehouse import (
        read_index_store,
        store_path,
        write_index_store,
    )

    docs = scatter(load_table(spark, sf_dir, "documents"))
    base = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)

    # -- simulated prior run: sign the base once, persist its bands.
    # checkpoint=False (sanctioned single-consumer case): sig_base is
    # consumed exactly once, by the store write below — the default
    # checkpoint materialized the base shingle arrays for no second
    # reader (r20).
    _, sig_base = minhash_signatures(
        base, "doc_id", "text", MH_HASHES, checkpoint=False
    )
    path = store_path("minhash_bands", sf_dir)
    write_index_store(
        minhash_band_table(sig_base, "doc_id", MH_HASHES, MH_BAND_ROWS), path
    )
    store = read_index_store(spark, path, "doc_id bigint, band int, key string")

    # -- refresh: sign ONLY the batch, probe the persisted bands.
    # checkpoint=False again: sig_batch's one consumer is the probe
    # band table, which is itself the checkpointed barrier.
    _, sig_batch = minhash_signatures(
        batch, "doc_id", "text", MH_HASHES, checkpoint=False
    )
    probe = minhash_band_table(
        sig_batch, "doc_id", MH_HASHES, MH_BAND_ROWS
    ).localCheckpoint()  # feeds both the store probe and the self-join
    cross = (
        probe.alias("p")
        .join(store.alias("s"), ["band", "key"])
        .select(
            F.least(F.col("p.doc_id"), F.col("s.doc_id")).alias("id_a"),
            F.greatest(F.col("p.doc_id"), F.col("s.doc_id")).alias("id_b"),
        )
    )
    within = (
        probe.select(F.col("doc_id").alias("id_a"), "band", "key")
        .join(probe.select(F.col("doc_id").alias("id_b"), "band", "key"), ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # Checkpointed (r20): the candidate list has THREE readers — both
    # branches of the cand_ids union and the verify join — and its
    # lineage (store scan + probe join + self-join + distinct) used to
    # replay per reader.
    candidates = cross.unionByName(within).distinct().localCheckpoint()

    # -- exact verification re-shingles the CANDIDATE docs only (the
    # fetch-texts step of the protocol — the band store remains the
    # ONLY persisted state).  r20: the shingles are kept as per-doc
    # DISTINCT ARRAYS and verified row-locally (verify_pairs_arrays);
    # the exploded-table checkpoint, the shingle-keyed count join, and
    # the sizes groupBy are gone — intersection/set sizes never shuffle.
    cand_ids = (
        candidates.select(F.col("id_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cand_arrs = shingle_arrays(
        docs.join(cand_ids, "doc_id", "left_semi"), "doc_id", "text", n=3
    )
    cand_arrs = materialize_instance_sized(cand_arrs)  # read twice: both verify sides
    pairs = (
        verify_pairs_arrays(cand_arrs, candidates, "doc_id", JACCARD_THRESHOLD)
        .select("id_a", "id_b")
        .localCheckpoint()  # feeds the corpus-dup split, the batch-edge filter, CC
    )

    # -- admission: corpus-dup-first precedence, CC over batch edges
    # (identical to neardup_refresh_pipeline).
    a_b = F.col("id_a") % 10 == 0
    b_b = F.col("id_b") % 10 == 0
    dup_exist = (
        pairs.where(a_b != b_b)
        .select(F.when(a_b, F.col("id_a")).otherwise(F.col("id_b")).alias("doc_id"))
        .distinct()
    )
    bedges = (
        pairs.where(a_b & b_b)
        .join(dup_exist.withColumnRenamed("doc_id", "id_a"), "id_a", "left_anti")
        .join(dup_exist.withColumnRenamed("doc_id", "id_b"), "id_b", "left_anti")
        .select("id_a", "id_b")
    )
    losers = (
        connected_components(bedges)
        .where(F.col("node") != F.col("cluster"))
        .select(F.col("node").alias("doc_id"))
    )
    drops = dup_exist.unionByName(losers)
    return batch.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


MINHASH_SIG_REFRESH_ORACLE = f"""
WITH RECURSIVE {_minhash_pair_ctes()},
edges AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN ver v ON c.id_a = v.id_a AND c.id_b = v.id_b
  WHERE (c.id_a % 10 = 0 OR c.id_b % 10 = 0)
),
dup_exist AS (
  SELECT DISTINCT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS doc_id
  FROM edges WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
),
bedges AS (
  SELECT id_a, id_b FROM edges
  WHERE id_a % 10 = 0 AND id_b % 10 = 0
    AND id_a NOT IN (SELECT doc_id FROM dup_exist)
    AND id_b NOT IN (SELECT doc_id FROM dup_exist)
),
nodes AS (SELECT id_a AS node FROM bedges UNION SELECT id_b FROM bedges),
sym AS (
  SELECT id_a AS s, id_b AS d FROM bedges
  UNION ALL
  SELECT id_b, id_a FROM bedges
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT y.d, r.lbl FROM reach r JOIN sym y ON y.s = r.node
),
assign AS (SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY node),
batch_losers AS (SELECT node AS doc_id FROM assign WHERE node <> cluster)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id % 10 = 0
  AND d.doc_id NOT IN (SELECT doc_id FROM dup_exist)
  AND d.doc_id NOT IN (SELECT doc_id FROM batch_losers)
"""


# --- url_dedup --------------------------------------------------------------
# URL-normalization dedup — the crawl-level dedup step that runs BEFORE
# any content hashing: canonicalize each document's URL (lowercase
# scheme/host, drop default ports / www. / fragments / tracking params /
# trailing slashes) and keep one survivor per canonical URL.  The
# reference has no web-crawl surface; this is a first-class pretraining
# pipeline op (VERDICT r7 #4 named it the one common op without a named
# query).  The documents table has no URL column, so a deterministic
# MESSY url is constructed per doc_id — same construction in the oracle
# CTE — exercising every normalization rule: case variants, :443 ports,
# www. prefixes, utm_*/fbclid/gclid strips around a KEPT page= param,
# fragments, and trailing slashes.  doc_id div 3 gives dup groups of up
# to 3 whose members differ only in junk.
#
# Scale shape: canonicalization is a scan-local codegen projection
# (functions/url.py — zero Python, zero joins); the dedup is ONE hash
# shuffle on the canonical key with full map-side combine.  At 100 TB
# this is the cheapest possible dedup pass: no candidate generation, no
# similarity join, shuffle bytes = one (url, id, count) row per doc.

def _messy_url() -> F.Column:
    doc_id = F.col("doc_id")
    scheme = (
        F.when(doc_id % 3 == 0, F.lit("https"))
        .when(doc_id % 3 == 1, F.lit("HTTPS"))
        .otherwise(F.lit("Https"))
    )
    host = F.when(doc_id % 2 == 0, F.lit("Example.COM")).otherwise(
        F.lit("www.example.com")
    )
    port = F.when(doc_id % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(F.lit("/articles/"), F.expr("CAST(doc_id DIV 3 AS STRING)"))
    slash = F.when(doc_id % 6 == 0, F.lit("/")).otherwise(F.lit(""))
    q_track = (
        F.when(doc_id % 4 == 0, F.lit("utm_source=feed&utm_campaign=w"))
        .when(doc_id % 4 == 1, F.lit("fbclid=x1"))
        .when(doc_id % 4 == 2, F.lit("gclid=g2&utm_medium=m"))
        .otherwise(F.lit(""))
    )
    q_real = F.when(doc_id % 7 == 0, F.lit("page=2")).otherwise(F.lit(""))
    qs = (
        F.when(
            (q_track != F.lit("")) & (q_real != F.lit("")),
            F.concat(q_track, F.lit("&"), q_real),
        )
        .when(q_track != F.lit(""), q_track)
        .when(q_real != F.lit(""), q_real)
        .otherwise(F.lit(""))
    )
    query = F.when(qs != F.lit(""), F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    frag = F.when(doc_id % 2 == 0, F.lit("#sec1")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, slash, query, frag)


def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scatter(load_table(spark, sf_dir, "documents")).select("doc_id")
    urls = docs.select("doc_id", _messy_url().alias("url"))
    return (
        urls.select("doc_id", canonicalize_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("long").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# The DuckDB twin of functions/url.py::canonicalize_url as a WITH
# fragment parametric on the source relation ({src} must expose
# doc_id, url).  Shared between URL_DEDUP_ORACLE and the direct
# cross-engine parity test in tests/test_url.py so the pass-through
# branch (never exercised by the synthetic corpus, whose URLs all
# parse) still has DuckDB-vs-Spark coverage.
URL_NORM_CTES = f"""
n AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)
      AS authority,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$', 1) AS rest
  FROM {{src}}
),
n2 AS (
  SELECT doc_id, url, scheme, rest,
    regexp_extract(authority, '^(.*@)', 1) AS userinfo,
    lower(regexp_replace(authority, '^.*@', '')) AS hostport
  FROM n
),
h AS (
  SELECT doc_id, url, scheme, rest, userinfo,
    regexp_replace(
      CASE scheme WHEN 'https' THEN regexp_replace(hostport, ':443$', '')
                  WHEN 'http'  THEN regexp_replace(hostport, ':80$', '')
                  ELSE hostport END,
      '^www\\.', '') AS host
  FROM n2
),
c AS (
  SELECT doc_id,
    CASE WHEN scheme = '' OR host = '' THEN url
         ELSE scheme || '://' || userinfo || host
           || regexp_replace(regexp_extract(rest, '^[^?#]*', 0), '/+$', '')
           || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END
    END AS canonical_url
  FROM (
    SELECT doc_id, url, scheme, userinfo, host, rest,
      regexp_replace(regexp_replace(regexp_extract(rest, '^[^?#]*\\?([^#]*)', 1),
        '(^|&)({TRACKING_PARAMS})=[^&]*', '', 'g'), '^&+', '') AS cq
    FROM h
  )
)"""

URL_DEDUP_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS' ELSE 'Https' END AS scheme,
    CASE WHEN doc_id % 2 = 0 THEN 'Example.COM' ELSE 'www.example.com' END AS hostp,
    CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END AS port,
    '/articles/' || CAST(doc_id // 3 AS VARCHAR) AS path,
    CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END AS slash,
    CASE doc_id % 4 WHEN 0 THEN 'utm_source=feed&utm_campaign=w'
                    WHEN 1 THEN 'fbclid=x1'
                    WHEN 2 THEN 'gclid=g2&utm_medium=m' ELSE '' END AS qt,
    CASE WHEN doc_id % 7 = 0 THEN 'page=2' ELSE '' END AS qr,
    CASE WHEN doc_id % 2 = 0 THEN '#sec1' ELSE '' END AS frag
  FROM documents
),
u AS (
  SELECT doc_id,
    scheme || '://' || hostp || port || path || slash ||
    (CASE WHEN qt <> '' AND qr <> '' THEN '?' || qt || '&' || qr
          WHEN qt <> '' THEN '?' || qt
          WHEN qr <> '' THEN '?' || qr ELSE '' END) || frag AS url
  FROM p
),
{URL_NORM_CTES.format(src="u")}
SELECT canonical_url,
       CAST(MIN(doc_id) AS BIGINT) AS survivor_doc_id,
       COUNT(*) AS n_dups
FROM c GROUP BY 1
"""
