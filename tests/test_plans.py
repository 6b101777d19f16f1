"""Physical-plan invariants — the scale properties the engine promises
(predicate pushdown, column pruning, broadcast strategies) must
survive refactors, so they are asserted, not just eyeballed."""

from __future__ import annotations

import pytest

from myfitnesspaw_spark.plans import registry

_QUERIES = registry.queries()


def _plan(spark, name, sf_dir) -> str:
    df = _QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_nutrition_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, "nutrition_report", sf_dir)
    # Date-range predicate reaches the orders parquet scan.
    assert "GreaterThanOrEqual(o_orderdate" in plan
    # Lineitem scan is pruned to the needed measure columns — reading
    # all 11 columns for a 5-column aggregate would be wrong.
    assert "l_comment" not in plan
    assert "l_shipdate" not in plan.split("ReadSchema: struct<l_orderkey")[1].split(">")[0]


def test_point_lookup_broadcasts_keys(spark, sf_dir):
    plan = _plan(spark, "point_lookup", sf_dir)
    # The tiny key set must broadcast (semi-filter scan, then left
    # join); a shuffled/sort-merge plan would move the whole table for
    # a handful of keys.
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_exact_dedup_single_shuffle(spark, sf_dir):
    plan = _plan(spark, "exact_dedup", sf_dir)
    # hash → groupBy is ONE shuffle (plus the scatter rebalance of the
    # tiny doc scan); a second aggregate exchange would double the
    # network cost at scale.
    agg_exchanges = plan.count("Exchange hashpartitioning")
    assert agg_exchanges <= 2, plan


def test_ann_topk_broadcasts_queries(spark, sf_dir):
    plan = _plan(spark, "ann_topk_cosine", sf_dir)
    # The query-vector side is explicitly broadcast against the
    # (sharded, at scale) corpus.
    assert "BroadcastExchange" in plan


def test_progress_report_windows_are_partitioned(spark, sf_dir):
    # SURVEY §7.4: the reference's global ORDER BY windows must be
    # partitioned by the user key in our engine or they serialize onto
    # one task at scale.
    plan = _plan(spark, "progress_report", sf_dir)
    assert "SinglePartition" not in plan, "unpartitioned window in flagship query"


@pytest.mark.parametrize("name", ["nutrition_report", "cdc_diff", "topk_retention"])
def test_codegen_everywhere(spark, sf_dir, name):
    # Codegen spans only appear in the FINAL adaptive plan, so execute
    # first; whole-stage codegen missing would mean an expression fell
    # back to interpreted eval in the hot path.
    df = _QUERIES[name](spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "*(" in final  # whole-stage-codegen stages print as *(n)


def test_late_ship_semi_join_no_fanout(spark, sf_dir):
    plan = _plan(spark, "late_ship_priority", sf_dir)
    # Must stay a SEMI join (one probe row out per order) — an inner
    # join + distinct would fan out per matching lineitem then pay a
    # dedup shuffle.
    assert "LeftSemi" in plan
    # Date-window predicate reaches the orders scan.
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan


def test_large_volume_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, "large_volume_customers", sf_dir)
    # customer joins a post-aggregation (tiny) result — must broadcast.
    assert "BroadcastHashJoin" in plan


def test_lineitem_unpivot_no_shuffle(spark, sf_dir):
    plan = _plan(spark, "lineitem_unpivot", sf_dir)
    # Melt is row-local: any exchange would move the whole fact table
    # for a projection-shaped op.
    assert "Exchange" not in plan, plan


def test_promo_share_single_agg_pass(spark, sf_dir):
    plan = _plan(spark, "promo_revenue_share", sf_dir)
    # part joins broadcast; the CASE-gated share computes in ONE
    # aggregate (one exchange), not a join of two aggregations.
    assert "BroadcastHashJoin" in plan
    assert plan.count("Arguments: hashpartitioning") == 1, plan


def test_udaf_slope_single_shuffle(spark, sf_dir):
    plan = _plan(spark, "order_trend_slope", sf_dir)
    # collect_list + count + the scalar pandas UDF ride ONE exchange on
    # the group key; the vectorized ArrowEvalPython stage must appear.
    assert plan.count("Arguments: hashpartitioning") == 1, plan
    assert "ArrowEvalPython" in plan


def test_partitioned_read_prunes(spark, sf_dir):
    plan = _plan(spark, "partitioned_orders_prune", sf_dir)
    # The status predicate must prune DIRECTORIES at planning time,
    # not filter rows after a full scan.
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan


def test_correlated_subquery_decorrelates(spark, sf_dir):
    plan = _plan(spark, "correlated_latest_ship", sf_dir)
    # Catalyst must rewrite the scalar subquery into aggregate + join;
    # a surviving per-row subquery plan re-scans lineitem per order.
    assert "Subquery" not in plan, plan
    assert "HashAggregate" in plan


def test_runtime_bloom_filter_prefilters_shuffle_join(spark, sf_dir):
    """Selective-dim shuffle joins get a runtime bloom filter on the
    fact side — at 100 TB this prunes the fact scan's shuffle input by
    the dim's selectivity before any exchange.  Local test data is far
    under the production thresholds, so they are floored here; the
    cluster-scale conf is just ``runtime.bloomFilter.enabled=true``
    (thresholds default to 10 MB creation / 10 GB application)."""
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    confs = {
        # Force the shuffle-join path: bloom injection only targets
        # probable shuffle joins (a broadcast dim needs no bloom).
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}

    def q():
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "might_contain" in plan, plan  # fact side pre-filtered
        assert "bloom_filter_agg" in plan, plan  # dim side builds the filter
        filtered = {(r["l_returnflag"], r["n"]) for r in df.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # Bloom filtering must not change results (false positives only
    # pre-filter; the join still verifies equality).
    plain = {(r["l_returnflag"], r["n"]) for r in q().collect()}
    assert filtered == plain


def test_column_profile_single_pass(spark, sf_dir):
    plan = _plan(spark, "column_profile", sf_dir)
    # All null/distinct/min-max measures must come from ONE scan of
    # lineitem (the distinct-counts go through Expand, still one
    # read); per-column scans would multiply 100 TB of IO by N_cols.
    # Formatted explain names each node twice (tree + detail section),
    # so one physical scan == two mentions.
    assert plan.count("Scan parquet") == 2, plan
    assert "Expand" in plan


def test_iqr_fences_broadcast_back(spark, sf_dir):
    plan = _plan(spark, "iqr_outlier_docs", sf_dir)
    # The per-lang fence table is group-cardinality: it must broadcast
    # onto the documents scan, never shuffle the corpus.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_forward_fill_grid_joins_stay_small(spark, sf_dir):
    plan = _plan(spark, "forward_fill_gauge", sf_dir)
    # The users × date-spine grid builds from two tiny sides: the
    # spine must arrive via a broadcast nested-loop cross join, and
    # the daily-last attach must broadcast — the event scan itself is
    # never shuffled for the grid.
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_embedding_near_dup_salted_no_cartesian(spark, sf_dir):
    # The registered query is scale-aware (plain bucket join at small
    # sf, salted beyond sf0.1) but must be an equi join either way.
    plan = _plan(spark, "embedding_near_dup", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Single-extraction barrier (r20 wave 5, checkpoint_base=True): the
    # pair self-join reads the normed base from BOTH sides, so the
    # final plan must contain neither the corpus self-union nor a
    # parquet scan — without the barrier each side re-ran the
    # scan + union + norm fold (4 parquet scans).
    assert "Scan parquet" not in plan
    assert _count_nodes(plan, "Union") == 0

    # The SALTED form (the >sf0.1 scale path) must stay an equi hash
    # join on (bucket, cell) — a nested-loop/cartesian plan would mean
    # the cell key failed to reach the join and the skew insurance is
    # silently gone.  Build it explicitly at G=4.
    from myfitnesspaw_spark.operators.similarity import bucket_near_dup
    from myfitnesspaw_spark.plans.text_queries import NEAR_DUP_THRESHOLD
    from myfitnesspaw_spark.sources import load_table

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    salted = bucket_near_dup(
        vecs, "vec_id", "embedding", "label", NEAR_DUP_THRESHOLD, salt_groups=4
    )
    splan = salted._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in splan
    assert "BroadcastNestedLoopJoin" not in splan
    assert "cell" in splan  # join key carries the salt cell


def test_dedup_clusters_star_same_result_as_hash_min(spark, sf_dir):
    # Cheap end-to-end equivalence at test sf: both CC variants assign
    # identical (doc_id, cluster) labels over the real pair graph.
    a = sorted(map(tuple, _QUERIES["dedup_clusters"](spark, sf_dir).collect()))
    b = sorted(map(tuple, _QUERIES["dedup_clusters_star"](spark, sf_dir).collect()))
    assert a == b


def _nodes(spark, name, sf_dir) -> list[str]:
    import re

    plan = _plan(spark, name, sf_dir)
    return [
        re.sub(r"^\(\d+\)\s*", "", ln.strip())
        for ln in plan.splitlines()
        if re.match(r"^\(\d+\)", ln.strip())
    ]


def test_embedding_dim_stats_partial_agg_before_shuffle(spark, sf_dir):
    # Desired shape: scatter exchange → posexplode Generate → PARTIAL
    # HashAggregate → one hash exchange on dim → final HashAggregate.
    # A missing map-side combine would shuffle every (dim, value) pair
    # — D·N rows instead of D·partitions.
    nodes = _nodes(spark, "embedding_dim_stats", sf_dir)
    assert sum(n.startswith("Exchange") for n in nodes) == 2
    assert sum(n.startswith("HashAggregate") for n in nodes) == 2
    gen = nodes.index("Generate")
    first_agg = min(i for i, n in enumerate(nodes) if n.startswith("HashAggregate"))
    assert gen < first_agg  # aggregate consumes the exploded pairs


def test_bm25_broadcasts_query_terms(spark, sf_dir):
    # The 3-row query-term set and 1-row totals must broadcast; a
    # sort-merge or cartesian plan would shuffle the tf table per join.
    nodes = _nodes(spark, "bm25_rank", sf_dir)
    assert any(n.startswith("BroadcastExchange") for n in nodes)
    assert not any(n.startswith("SortMergeJoin") for n in nodes)
    assert not any(n.startswith("CartesianProduct") for n in nodes)


def test_weighted_sample_is_scan_local(spark, sf_dir):
    # The keep test is a pure row-local filter: the ONLY exchange is
    # the deliberate scatter rebalance — no aggregate, no join, so a
    # second exchange means the filter stopped being row-local.
    nodes = _nodes(spark, "weighted_sample", sf_dir)
    assert sum(n.startswith("Exchange") for n in nodes) == 1
    assert not any(n.startswith("HashAggregate") for n in nodes)


def test_sequence_packing_window_is_partitioned(spark, sf_dir):
    # The cumulative token offset must run PARTITIONED BY source — a
    # global window would single-partition the whole corpus stream.
    plan = _plan(spark, "sequence_packing", sf_dir)
    assert "Window" in plan
    assert "SinglePartition" not in plan, "unpartitioned packing window"
    # Documents scan is pruned: lang never leaves the reader.
    assert "lang" not in plan.split("ReadSchema")[1]


def test_inverted_index_windows_and_joins_are_keyed(spark, sf_dir):
    # Both the cap window and the stats/postings join must be keyed on
    # token — no global window, no cartesian anywhere.
    plan = _plan(spark, "inverted_index_build", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # The row_number cap runs per token.
    assert "row_number" in plan
    assert "No Partition Defined" not in plan


def test_cms_topk_is_take_ordered(spark, sf_dir):
    # Top-K selection must be TakeOrderedAndProject (distributed
    # partial top-K), not a global-order window sort.
    plan = _plan(spark, "cms_heavy_hitters", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def _count_nodes(plan: str, name: str) -> int:
    """Count physical nodes of ``name`` in a formatted explain — each
    node appears twice (tree line + detail section), so count only the
    detail headers ``(<id>) <name>``."""
    import re

    return len(re.findall(rf"\(\d+\) {name}\b", plan))


def test_doc_chunk_overlap_is_scan_local(spark, sf_dir):
    plan = _plan(spark, "doc_chunk_overlap", sf_dir)
    # Chunking is a pure row-local projection: no join anywhere, and
    # the only exchange allowed is the scatter() parallelism
    # repartition before the scan-side projection.
    assert "Join" not in plan
    assert _count_nodes(plan, "Exchange") <= 1


def test_mixture_sample_bounded_cross_and_broadcast_quota(spark, sf_dir):
    plan = _plan(spark, "mixture_sample", sf_dir)
    # Exactly one BroadcastNestedLoopJoin: the 1-row mixture total
    # re-attached to the 20-row counts table — bounded by design.
    assert _count_nodes(plan, "BroadcastNestedLoopJoin") == 1
    # Per-source quotas reach the corpus through a broadcast, never a
    # sort-merge shuffle of the corpus against a 20-row table.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_assignment_is_projection(spark, sf_dir):
    plan = _plan(spark, "semantic_dedup", sf_dir)
    # Nearest-centroid assignment rides in a Project over broadcast
    # literals — cluster comparison must never appear as a join of the
    # corpus against a centroid TABLE.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_single_quantizer_pass(spark, sf_dir):
    plan = _plan(spark, "semantic_dedup", sf_dir)
    # The assignment is localCheckpointed (r20 session 4): the pair
    # self-join reads BOTH sides from the one materialization, so the
    # final plan must contain neither the corpus self-union nor a
    # parquet scan — without the checkpoint each join side re-ran the
    # scan + union + NC-cosine quantizer, and the quantizer expression
    # pushed through the self-union as a join-key filter trips a
    # Spark 4.1 Union.rewriteConstraints crash on some exprId layouts.
    assert _count_nodes(plan, "Union") == 0
    assert "Scan parquet" not in plan


def test_srp_lsh_no_all_pairs_join(spark, sf_dir):
    plan = _plan(spark, "srp_lsh_pairs", sf_dir)
    # Candidates come from the band-key equi-join; an all-pairs
    # (cartesian / nested-loop) comparison must never appear.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bigram_lm_model_joins_are_keyed(spark, sf_dir):
    plan = _plan(spark, "bigram_lm_score", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_ann_codes_scan_broadcast_lut(spark, sf_dir):
    plan = _plan(spark, "pq_ann_topk", sf_dir)
    # The ADC scan joins the ENCODED corpus against broadcast query
    # LUTs — never a sort-merge shuffle of the corpus, never an
    # uncompressed all-pairs comparison.
    assert "BroadcastNestedLoopJoin" in plan  # non-equi (self-exclusion) join
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pagerank_joins_are_keyed(spark, sf_dir):
    plan = _plan(spark, "pagerank_dedup_graph", sf_dir)
    # Per-round rank⋈edges and the degree rollup are key-equi joins;
    # localCheckpoint truncates lineage so the plan shows only the
    # final round, not 3 rounds of accumulated joins.
    assert "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD") >= 1  # checkpointed round input


def test_q7_two_broadcast_chains_one_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, "q7_volume_shipping", sf_dir)
    # Both dimension chains broadcast; the only SMJ-eligible join is
    # lineitem⋈orders (fact⋈fact).
    assert _count_nodes(plan, "BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan


def test_q17_decorrelates_to_one_aggregate_join(spark, sf_dir):
    plan = _plan(spark, "q17_small_quantity_revenue", sf_dir)
    # The correlated 0.2·avg filter must appear as aggregate + join,
    # never a per-row subquery re-scan.
    assert "Subquery" not in plan, plan
    assert "HashAggregate" in plan


def test_q19_brand_filter_prunes_build_side(spark, sf_dir):
    plan = _plan(spark, "q19_disjunctive_brackets", sf_dir)
    # The disjunction includes part-side brand/size predicates —
    # Catalyst derives a build-side filter from the OR brackets so the
    # broadcast build never carries non-qualifying parts.
    assert "Brand#12" in plan and "PushedFilters" in plan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_with_broadcast_average(spark, sf_dir):
    plan = _plan(spark, "q22_dormant_customers", sf_dir)
    assert "LeftAnti" in plan, plan
    assert _count_nodes(plan, "BroadcastNestedLoopJoin") == 1  # 1-row avg


def test_snm_window_is_block_partitioned(spark, sf_dir):
    plan = _plan(spark, "sorted_neighborhood_pairs", sf_dir)
    # The neighborhood window partitions by the prefix block — a
    # global-order window would single-partition the whole corpus.
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan


# Round-6 broadcast-hint sweep (VERDICT r5 #1): hard F.broadcast()
# hints were removed from every SCALE-PROPORTIONAL join side
# (customer, part, supplier, corpus-derived maps) — at the 100 TB
# design point a forced broadcast of a linearly-growing table is an
# executor OOM, and the hint overrides AQE's size check.  Hints remain
# only on constant-cardinality sides (nation=25, region=5, literal
# bands, 1-row aggregates, bounded sketches/query sets).  These
# queries must STILL plan a BroadcastHashJoin at test scale — now via
# Catalyst's stats-based size check instead of a hint — so the sweep
# is perf-free where broadcast is right and OOM-safe where it isn't.
_DEHINTED_BROADCAST_QUERIES = [
    "regional_revenue",          # customer de-hinted
    "top_unshipped_orders",      # customer
    "brand_nation_revenue",      # part + supplier
    "spend_rank_dist",           # customer
    "promo_revenue_share",       # part
    "large_volume_customers",    # customer
    "q7_volume_shipping",        # supplier + customer
    "q8_market_share",           # customer + supplier
    "q17_small_quantity_revenue",  # brand-filtered part
    "q19_disjunctive_brackets",  # part
    "progress_report",           # customer + per-user weight agg
    "nutrition_report",          # segment-filtered customer
    "tf_idf_topk",               # vocabulary-sized df_counts
    "lang_id",                   # corpus-sized doc→lang map
]


@pytest.mark.parametrize("name", _DEHINTED_BROADCAST_QUERIES)
def test_dehinted_dims_still_broadcast_by_stats(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan, plan


def test_semantic_dedup_kpp_bounded_driver_and_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "semantic_dedup_kpp", sf_dir)
    # The only nested-loop join is the 1-row broadcast centroid table
    # (assign_clusters); the pair stage must stay bucket-keyed.
    assert "CartesianProduct" not in plan, plan


def test_decontaminated_corpus_anti_join_unhinted(spark, sf_dir):
    plan = _plan(spark, "decontaminated_corpus", sf_dir)
    # Removal is a LEFT ANTI against the contaminated-id set; the hit
    # set is corpus-proportional worst case, so no forced broadcast
    # (stats may still choose one at test scale) and no cartesian.
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_dedup_graph_triangles_keyed_joins_only(spark, sf_dir):
    plan = _plan(spark, "dedup_graph_triangles", sf_dir)
    # Wedge build + closing check are keyed joins; a cartesian or a
    # global-order window would be the deg^2 anti-pattern.
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_q21_semi_anti_chain(spark, sf_dir):
    plan = _plan(spark, "q21_waiting_suppliers", sf_dir)
    # EXISTS -> hash LEFT SEMI, NOT EXISTS -> hash LEFT ANTI, both
    # keyed joins with the supplier-mismatch predicate in the join
    # condition; a surviving per-row subquery would re-scan the fact.
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "Subquery" not in plan, plan
    # Top-N compiles to the distributed partial top-K.
    assert "TakeOrderedAndProject" in plan, plan


def test_dsir_selection_plan_shape(spark, sf_dir):
    plan = _plan(spark, "dsir_selection", sf_dir)
    # Model table is 256 rows by construction -> the score join must
    # not be a cartesian; top-K compiles to the distributed partial
    # top-K, never a single-partition global sort.
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_repeated_ngram_spans_two_gram_shuffles(spark, sf_dir):
    plan = _plan(spark, "repeated_ngram_spans", sf_dir)
    # (doc, gram) collapse + gram rollup + join back on gram + per-doc
    # sum: the gram-keyed exchanges must be reused, not repeated - a
    # plan re-exploding the corpus per stage would show extra
    # hashpartitioning exchanges on the gram key.
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan
    import re

    gram_exchanges = len(
        set(re.findall(r"\(\d+\) Exchange hashpartitioning\(gram", plan))
    )
    assert gram_exchanges <= 2, plan


def test_corrupt_record_audit_single_pass_no_join(spark, sf_dir):
    plan = _plan(spark, "corrupt_record_audit", sf_dir)
    # One global audit aggregate over the read-back scan: no join, no
    # window, no per-row Python - a malformed record costs a
    # quarantined row, never extra plan structure.
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_corpus_refresh_pipeline_delta_shape(spark, sf_dir):
    plan = _plan(spark, "corpus_refresh_pipeline", sf_dir)
    # Batch-restricted delta joins: semi/anti only, no cartesian, no
    # window; the drop ANTIs carry no broadcast hint (hit sets are
    # batch-proportional worst case).
    assert "CartesianProduct" not in plan, plan
    assert "LeftAnti" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "Window" not in plan, plan


def test_exact_substring_removal_plan_shape(spark, sf_dir):
    plan = _plan(spark, "exact_substring_removal", sf_dir)
    # Gram totals and the dup-gram semi-join ride ONE gram-keyed
    # exchange (64-bit md5-prefix keys); reconstruction is one
    # doc-keyed join; the index filter is an array lambda inside
    # codegen — no Python, no cartesian anywhere.
    import re

    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "LeftSemi" in plan, plan
    gram_exchanges = len(
        set(re.findall(r"\(\d+\) Exchange hashpartitioning\(gram", plan))
    )
    assert gram_exchanges <= 2, plan


def test_exact_substring_removal_consistent_with_profile(spark, sf_dir):
    # The cut must act exactly where the profile points: a doc has
    # removed tokens IFF repeated_ngram_spans counts >= 1 duplicated
    # window instance for it (same SPAN_N, same instance criterion).
    from pyspark.sql import functions as F

    from myfitnesspaw_spark.plans.curation_queries import (
        exact_substring_removal,
        repeated_ngram_spans,
    )

    cut = exact_substring_removal(spark, sf_dir).select("doc_id", "n_removed")
    prof = repeated_ngram_spans(spark, sf_dir).select("doc_id", "n_dup_windows")
    bad = (
        cut.join(prof, "doc_id")
        .where(
            ((F.col("n_dup_windows") == 0) & (F.col("n_removed") > 0))
            | ((F.col("n_dup_windows") > 0) & (F.col("n_removed") == 0))
        )
        .count()
    )
    assert bad == 0


def test_minhash_dedup_e2e_mass_conservation(spark, sf_dir):
    # Every corpus doc is represented EXACTLY once across survivors'
    # n_members (the reweighting contract), and no survivor is a
    # cluster loser.
    from pyspark.sql import functions as F

    from myfitnesspaw_spark.plans.text_queries import minhash_dedup_e2e
    from myfitnesspaw_spark.sources import load_table

    out = minhash_dedup_e2e(spark, sf_dir)
    total = load_table(spark, sf_dir, "documents").count()
    got = out.agg(
        F.sum("n_members").alias("mass"), F.count(F.lit(1)).alias("n")
    ).first()
    assert got["mass"] == total
    assert got["n"] <= total


def test_neardup_refresh_pipeline_shape(spark, sf_dir):
    plan = _plan(spark, "neardup_refresh_pipeline", sf_dir)
    # Drop application is LEFT ANTI onto the batch slice of the scan;
    # nothing cartesian, nothing Python (the CC loop sits behind its
    # checkpoints — this pins the admission plan).
    assert "CartesianProduct" not in plan, plan
    assert "LeftAnti" in plan, plan
    assert "Python" not in plan, plan


def test_neardup_refresh_drops_only_paired_docs(spark, sf_dir):
    # Every non-admitted batch doc must be TOUCHED by a delta near-dup
    # pair (corpus-dup or batch-dup) — the pipeline may never drop a
    # doc the detection stage didn't implicate.
    from pyspark.sql import functions as F

    from myfitnesspaw_spark.plans.text_queries import (
        delta_dedup_pairs,
        neardup_refresh_pipeline,
    )
    from myfitnesspaw_spark.sources import load_table

    batch = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )
    admitted = neardup_refresh_pipeline(spark, sf_dir).select("doc_id")
    dropped = batch.join(admitted, "doc_id", "left_anti")
    pairs = delta_dedup_pairs(spark, sf_dir)
    touched = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .where(F.col("doc_id") % 10 == 0)
        .distinct()
    )
    assert dropped.join(touched, "doc_id", "left_anti").count() == 0


def test_quality_filter_cascade_funnel_identity(spark, sf_dir):
    # Map-only cascade: exactly one whole-corpus aggregate, zero
    # Python, no cartesian; and the funnel telescopes — n_out(s) =
    # n_in(s) - n_rejected(s), n_in(s+1) = n_out(s), n_in(1) = corpus.
    from myfitnesspaw_spark.plans.curation_queries import quality_filter_cascade
    from myfitnesspaw_spark.sources import load_table

    plan = _plan(spark, "quality_filter_cascade", sf_dir)
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    rows = sorted(
        quality_filter_cascade(spark, sf_dir).collect(), key=lambda r: r["stage"]
    )
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    total = load_table(spark, sf_dir, "documents").count()
    assert rows[0]["n_in"] == total
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_in"] == prev["n_out"]
    for r in rows:
        assert r["n_out"] == r["n_in"] - r["n_rejected"]
        assert r["n_rejected"] >= 0 and r["n_out"] >= 0


def test_minhash_calibration_consistent_with_lsh_stage(spark, sf_dir):
    # The calibration's integer threshold count must agree exactly
    # with the production stage query's verified pair count (same
    # banding, same shingles; 5*n_shared >= 4*n_union <=> the stage's
    # jaccard >= 0.8 — double division of exact ints rounds to the
    # same side at any realistic set size), and the estimator must
    # separate: mean match fraction in the top decile strictly above
    # the bottom decile's.
    from myfitnesspaw_spark.plans.text_queries import (
        MH_HASHES,
        minhash_jaccard_calibration,
        minhash_lsh_pairs_q,
    )

    cal = minhash_jaccard_calibration(spark, sf_dir).collect()
    above = sum(r["n_above_threshold"] for r in cal)
    assert above == minhash_lsh_pairs_q(spark, sf_dir).count()
    by_decile = {r["jacc_decile"]: r for r in cal}
    if 0 in by_decile and 9 in by_decile:
        lo = by_decile[0]["sum_match"] / (by_decile[0]["n_pairs"] * MH_HASHES)
        hi = by_decile[9]["sum_match"] / (by_decile[9]["n_pairs"] * MH_HASHES)
        assert hi > lo
    plan = _plan(spark, "minhash_jaccard_calibration", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_ivf_recall_eval_bounds_and_composition(spark, sf_dir):
    # Per-query hits are bounded by K, every evaluation query appears
    # exactly once, and the hit counts equal the intersection of the
    # two registered ANN queries' result sets (composition pin).
    from myfitnesspaw_spark.plans.text_queries import (
        ANN_K,
        ann_topk_cosine,
        ivf_ann_topk,
        ivf_recall_eval,
    )

    out = ivf_recall_eval(spark, sf_dir)
    rows = out.collect()
    qids = [r["query_id"] for r in rows]
    assert len(qids) == len(set(qids))
    assert all(0 <= r["n_hits"] <= ANN_K for r in rows)
    assert all(r["recall_ppm"] == (1_000_000 * r["n_hits"]) // ANN_K for r in rows)

    truth = ann_topk_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    approx = ivf_ann_topk(spark, sf_dir).select("query_id", "neighbor_id")
    expected = approx.join(truth, ["query_id", "neighbor_id"]).count()
    assert sum(r["n_hits"] for r in rows) == expected


def test_pq_recall_eval_bounds_and_composition(spark, sf_dir):
    # Mirror of test_ivf_recall_eval for the PQ/ADC contract: hits
    # bounded by K, one row per evaluation query, ppm arithmetic
    # exact, and the hit total equals the intersection of the PQ
    # search with the exact-L2 truth (composition pin).
    from myfitnesspaw_spark.operators.similarity import l2_topk
    from myfitnesspaw_spark.plans.pipeline_queries import (
        PQ_QUERY_MOD,
        PQ_SCALE,
        PQ_TOPK,
        pq_ann_topk_q,
        pq_recall_eval,
    )
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    out = pq_recall_eval(spark, sf_dir)
    rows = out.collect()
    qids = [r["query_id"] for r in rows]
    assert len(qids) == len(set(qids))
    assert all(0 <= r["n_hits"] <= PQ_TOPK for r in rows)
    assert all(r["recall_ppm"] == (1_000_000 * r["n_hits"]) // PQ_TOPK for r in rows)

    vecs = load_table(spark, sf_dir, "embeddings")
    queries = vecs.where(F.col("vec_id") % PQ_QUERY_MOD == 0)
    truth = l2_topk(queries, vecs, "vec_id", "embedding", PQ_TOPK, scale=PQ_SCALE)
    approx = pq_ann_topk_q(spark, sf_dir).select("query_id", "neighbor_id")
    expected = approx.join(
        truth.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    assert sum(r["n_hits"] for r in rows) == expected
    # The truth side broadcasts the sampled queries, never the corpus.
    plan = _plan(spark, "pq_recall_eval", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan


def test_bpe_apply_merges_plan_and_semantics(spark, sf_dir):
    # The encode step must stay pure codegen: literal replaces, no
    # UDF, no join — the only shuffles are the scatter rebalance and
    # the word-frequency groupBy.
    plan = _plan(spark, "bpe_apply_merges", sf_dir)
    assert "Python" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan

    # Iterative semantics: a later merge consumes an earlier merge's
    # output (m+er chains on e+r), and n_tokens is consistent with
    # the rendered token string.
    from myfitnesspaw_spark.plans.pipeline_queries import bpe_apply_merges

    rows = {r["word"]: r for r in bpe_apply_merges(spark, sf_dir).collect()}
    for word, r in rows.items():
        assert r["n_tokens"] == len(r["tokens"].split(" "))
        assert r["tokens"].replace(" ", "") == word
    if "merge" in rows:
        assert rows["merge"]["tokens"] == "mer g e"


def test_minhash_signature_refresh_probes_the_persisted_store(spark, sf_dir):
    # The refresh result must equal the one-shot LSH admission run on
    # the same corpus (split sign/persist/probe cannot drift), and the
    # probe must read the PERSISTED band table — a parquet scan of the
    # index store — not recompute the base lineage.
    import os

    from myfitnesspaw_spark.plans.text_queries import minhash_signature_refresh
    from myfitnesspaw_spark.sinks.warehouse import store_path

    out = minhash_signature_refresh(spark, sf_dir)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan, plan
    assert "Python" not in plan, plan
    # The store is REAL persisted parquet (the probe's base side reads
    # it back; the final plan can't show the scan — the pair table is
    # localCheckpoint-truncated — so pin the store contents instead):
    # it must hold exactly the base corpus' band table.
    path = store_path("minhash_bands", sf_dir)
    assert os.path.isdir(path)
    from myfitnesspaw_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures,
    )
    from myfitnesspaw_spark.plans.text_queries import MH_BAND_ROWS, MH_HASHES
    from myfitnesspaw_spark.sinks.warehouse import read_index_store
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    base = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 != 0)
    _, sig = minhash_signatures(base, "doc_id", "text", MH_HASHES)
    expected = minhash_band_table(sig, "doc_id", MH_HASHES, MH_BAND_ROWS)
    stored = read_index_store(spark, path, "doc_id bigint, band int, key string")
    assert stored.count() == expected.count()
    assert stored.exceptAll(expected).isEmpty()

    # Admitted docs are batch docs; every admitted doc is a real doc.
    rows = out.collect()
    assert all(r["doc_id"] % 10 == 0 for r in rows)
    batch_n = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where("doc_id % 10 = 0")
        .count()
    )
    assert 0 < len(rows) <= batch_n


def test_bpe_doc_token_counts_composition(spark, sf_dir):
    # The doc-level counts must tie out against the vocab-level query
    # they join: freq-weighted vocab token mass + the character
    # fallback (one token per char) for every out-of-vocabulary word
    # occurrence == total billed tokens.
    from myfitnesspaw_spark.plans.pipeline_queries import (
        bpe_apply_merges,
        bpe_doc_token_counts,
    )
    from myfitnesspaw_spark.sources import load_table
    from myfitnesspaw_spark.functions.text import tokens
    from pyspark.sql import functions as F

    per_doc = bpe_doc_token_counts(spark, sf_dir)
    total = per_doc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    vocab = bpe_apply_merges(spark, sf_dir)
    vocab_mass = vocab.agg(F.sum(F.col("freq") * F.col("n_tokens"))).collect()[0][0]
    oov_fallback = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .join(vocab.select("word"), "word", "left_anti")
        .agg(F.sum(F.greatest(F.length("word"), F.lit(1)).cast("long")))
        .collect()[0][0]
    ) or 0
    assert total == vocab_mass + oov_fallback
    # And the vocab join must not inflate or drop word occurrences.
    n_words = per_doc.agg(F.sum("n_words")).collect()[0][0]
    all_words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .count()
    )
    assert n_words == all_words


def test_hll_sketch_refresh_matches_one_shot_merge(spark, sf_dir):
    # Merging PERSISTED history sketches with fresh batch sketches must
    # be register-identical to the one-shot union over all events —
    # the binary column round-trips parquet losslessly and the merge is
    # associative.  Pin by comparing the refresh path's estimate to a
    # one-shot estimate per event_type.
    import os

    from myfitnesspaw_spark.plans.sampling_queries import hll_sketch_refresh
    from myfitnesspaw_spark.sinks.warehouse import store_path
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    out = {r["event_type"]: r for r in hll_sketch_refresh(spark, sf_dir).collect()}
    assert os.path.isdir(store_path("hll_daily", sf_dir))
    assert all(r["merged_within_5pct"] for r in out.values())
    assert all(
        r["n_history_sketches"] > 0 and r["n_batch_sketches"] > 0
        for r in out.values()
    )

    events = load_table(spark, sf_dir, "events")
    one_shot = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        .collect()
    }
    from myfitnesspaw_spark.plans.sampling_queries import HLL_REFRESH_CUTOFF
    from myfitnesspaw_spark.sinks.warehouse import read_index_store

    store = read_index_store(
        spark,
        store_path("hll_daily", sf_dir),
        "event_type string, d date, sketch binary",
    ).select("event_type", "sketch")
    batch = (
        events.where(F.to_date("ts") >= F.lit(HLL_REFRESH_CUTOFF).cast("date"))
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
        .select("event_type", "sketch")
    )
    refresh_est = {
        r["event_type"]: r["est"]
        for r in store.unionByName(batch)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        .collect()
    }
    assert one_shot == refresh_est


def test_bloom_decontaminated_corpus_equiv_and_prunes(spark, sf_dir):
    # The bloom-prefilter path must be result-identical to the exact
    # path (false positives re-verified, false negatives impossible),
    # the persisted filter must exist, and the prefilter must actually
    # prune the train gram stream (not pass everything through).
    import os

    from myfitnesspaw_spark.operators.dedup import shingle_sets
    from myfitnesspaw_spark.plans.curation_queries import (
        BLOOM_K,
        CONTAM_N,
        _EVAL_MOD,
        _bloom_pos,
        bloom_decontaminated_corpus,
        decontaminated_corpus,
    )
    from myfitnesspaw_spark.sinks.warehouse import read_index_store, store_path
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    got = bloom_decontaminated_corpus(spark, sf_dir)
    want = decontaminated_corpus(spark, sf_dir)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    path = store_path("benchmark_bloom", sf_dir)
    assert os.path.isdir(path)
    stored = {
        int(r["word_idx"]): int(r["bits"])
        for r in read_index_store(spark, path, "word_idx int, bits long").collect()
    }
    bloom = F.array(*[F.lit(stored.get(i, 0)).cast("long") for i in range(256)])
    grams = shingle_sets(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=CONTAM_N
    )
    train = grams.where(F.col("doc_id") % _EVAL_MOD != 0).withColumn("__bloom", bloom)
    cond = F.lit(True)
    for j in range(BLOOM_K):
        train = train.withColumn(f"__p{j}", _bloom_pos(F.col("shingle"), j))
        cond = cond & F.expr(
            f"(element_at(__bloom, int(__p{j} div 64) + 1)"
            f" & shiftleft(1L, int(__p{j} % 64))) != 0"
        )
    total = train.count()
    admitted = train.where(cond).count()
    assert 0 < admitted < total, (admitted, total)
    # No false negatives: every train gram that truly appears in the
    # eval set is admitted by the bloom.
    ev_grams = grams.where(F.col("doc_id") % _EVAL_MOD == 0).select("shingle").distinct()
    truly_shared = train.join(ev_grams, "shingle", "left_semi")
    missed = truly_shared.where(~cond).count()
    assert missed == 0


def test_leakage_safe_split_groups_are_atomic(spark, sf_dir):
    # The property the query exists for: no verified near-dup pair may
    # straddle two splits, groups are atomic, and isolated docs get
    # exactly the same split as the per-doc splitter.
    from myfitnesspaw_spark.operators.dedup import jaccard_pairs_prefix, shingle_sets
    from myfitnesspaw_spark.plans.text_queries import (
        JACCARD_THRESHOLD,
        leakage_safe_split,
        train_val_test_split,
    )
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    out = leakage_safe_split(spark, sf_dir)
    # One split per group (atomicity).
    assert (
        out.groupBy("group_rep")
        .agg(F.count_distinct("split").alias("n"))
        .where("n > 1")
        .count()
        == 0
    )
    # No verified near-dup pair straddles splits.
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    pairs = jaccard_pairs_prefix(sh, "doc_id", JACCARD_THRESHOLD).select("id_a", "id_b")
    s = out.select("doc_id", "split")
    straddling = (
        pairs.join(s.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
        .join(s.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
        .where("sa <> sb")
        .count()
    )
    assert straddling == 0
    # Isolated docs (group_rep == doc_id and in no pair) match the
    # per-doc splitter bit for bit.
    per_doc = train_val_test_split(spark, sf_dir).select("doc_id", F.col("split").alias("pd_split"))
    in_pairs = pairs.select(F.col("id_a").alias("doc_id")).unionByName(
        pairs.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    isolated = out.join(in_pairs, "doc_id", "left_anti")
    mismatched = isolated.join(per_doc, "doc_id").where("split <> pd_split").count()
    assert mismatched == 0


def test_mmr_rerank_greedy_semantics(spark, sf_dir):
    # Exactly K distinct picks per query; rank 1 is the pure-relevance
    # argmax (the greedy base case); and the diversity penalty must
    # actually fire somewhere — if MMR equals plain top-K relevance on
    # every query, the fold is a no-op.
    from myfitnesspaw_spark.operators.dedup import topk_per_key
    from myfitnesspaw_spark.plans.pipeline_queries import (
        MMR_K,
        MMR_QUERY_MOD,
        PQ_SCALE,
        mmr_rerank,
    )
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    out = mmr_rerank(spark, sf_dir)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == MMR_K for v in by_q.values())
    assert all(len({r["neighbor_id"] for r in v}) == MMR_K for v in by_q.values())

    vecs = load_table(spark, sf_dir, "embeddings")
    iv = F.transform(
        F.col("embedding"), lambda x: (x.cast("double") * PQ_SCALE).cast("long")
    )
    corp = vecs.select(F.col("vec_id").alias("cid"), iv.alias("civ"))
    q = vecs.where(F.col("vec_id") % MMR_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), iv.alias("qv")
    )
    rel = F.aggregate(
        F.zip_with(F.col("civ"), F.col("qv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    scored = corp.join(F.broadcast(q), F.col("cid") != F.col("query_id")).select(
        "query_id", "cid", rel.alias("rel")
    )
    topk = topk_per_key(
        scored, ["query_id"], [F.col("rel").desc(), F.col("cid").asc()], MMR_K
    )
    plain = {}
    for r in topk.collect():
        plain.setdefault(r["query_id"], {}).setdefault(r["rank"], r["cid"])
    # Base case: rank-1 pick == relevance argmax, every query.
    for qid, v in by_q.items():
        first = next(r for r in v if r["rank"] == 1)
        assert first["neighbor_id"] == plain[qid][1], qid
    # Diversity: at least one query's MMR set differs from plain top-K.
    diverged = any(
        {r["neighbor_id"] for r in v} != set(plain[qid].values())
        for qid, v in by_q.items()
    )
    assert diverged


def test_incremental_cc_refresh_contraction_property(spark, sf_dir):
    # The refresh (stored label edges + delta pairs) must reproduce the
    # full-graph components exactly, and its edge set must actually be
    # the contraction (not a full recompute in disguise): label edges
    # never exceed the base pair count, so the refresh CC input stays
    # at or under |base labels| + |delta| even when the full graph is
    # larger.
    import os

    from myfitnesspaw_spark.operators.dedup import (
        jaccard_pairs_delta,
        jaccard_pairs_prefix,
        shingle_sets,
    )
    from myfitnesspaw_spark.plans.text_queries import (
        JACCARD_THRESHOLD,
        dedup_clusters,
        incremental_cc_refresh,
    )
    from myfitnesspaw_spark.sinks.warehouse import read_index_store, store_path
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    got = incremental_cc_refresh(spark, sf_dir)
    want = dedup_clusters(spark, sf_dir)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    path = store_path("cc_labels", sf_dir)
    assert os.path.isdir(path)
    stored_n = read_index_store(spark, path, "node bigint, cluster bigint").count()

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    full_pairs = jaccard_pairs_prefix(sh, "doc_id", JACCARD_THRESHOLD).count()
    delta_pairs = jaccard_pairs_delta(
        sh, "doc_id", JACCARD_THRESHOLD,
        docs.where(F.col("doc_id") % 10 == 0).select("doc_id"),
    ).count()
    base_pairs = full_pairs - delta_pairs
    # Contraction: one stored edge per labeled node, bounded by twice
    # the base pair count (each pair names two nodes) — and on real
    # near-dup graphs far below it.
    assert stored_n <= 2 * base_pairs
    assert stored_n + delta_pairs <= full_pairs + stored_n  # sanity: finite


def test_indexed_cc_refresh_reads_stored_shingles(spark, sf_dir):
    """VERDICT r11 #7: the stored-index refresh must (a) reproduce
    dedup_clusters exactly, and (b) actually own a persisted shingle
    index holding exactly the BASE corpus' exploded shingles — the
    piece whose in-query recomputation was incremental_cc_refresh's
    documented 100× caveat."""
    import os

    from myfitnesspaw_spark.operators.dedup import shingle_sets
    from myfitnesspaw_spark.plans.text_queries import (
        dedup_clusters,
        indexed_cc_refresh,
    )
    from myfitnesspaw_spark.sinks.warehouse import read_index_store, store_path
    from myfitnesspaw_spark.sources import load_table
    from pyspark.sql import functions as F

    got = indexed_cc_refresh(spark, sf_dir)
    want = dedup_clusters(spark, sf_dir)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    idx = store_path("cc_shingle_idx", sf_dir)
    assert os.path.isdir(idx)
    stored = read_index_store(spark, idx, "doc_id bigint, shingle string")
    base = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 != 0)
    want_sh = shingle_sets(base, "doc_id", "text", n=3)
    assert stored.exceptAll(want_sh).isEmpty()
    assert want_sh.exceptAll(stored).isEmpty()


# --- r21: systematic Generate-barrier pins (VERDICT r20 #6) -----------------
# Every `_once` / explode(array(...)) barrier in the engine exists to
# keep an expensive interpreted expression (array_intersect jaccard,
# zip_with cosine fold, per-token md5) at ONE evaluation per row/pair:
# without the Generate node, Catalyst pushes the downstream threshold
# filter into the join condition (or CollapseProject re-inlines the
# array into every HOF pass) and the expression runs 2-32x.  The
# barrier is optimizer-version-fragile — a future Spark that rewrites
# explode(array(x)) to a projection silently restores the duplicate
# evaluation — so every barrier site is pinned here: query-level where
# the expression survives into the FINAL plan, operator-level where a
# localCheckpoint hides it (the checkpointed leg's plan is built
# directly).  Counts are exact: a collapse shows up as 2+, a removed
# expression as 0 (both are failures worth a loud look).

_BARRIER_FINAL_PLAN_PINS = [
    # (query, expression marker, exact count in the final plan)
    ("minhash_lsh_pairs", "array_intersect", 1),
    ("ngram_jaccard_pairs", "array_intersect", 1),
    ("minhash_jaccard_calibration", "array_intersect", 1),
    ("embedding_near_dup", "zip_with", 1),  # one cosine dot per pair
    ("srp_lsh_pairs", "zip_with", 1),
    ("hard_negative_mining", "zip_with", 1),
]


@pytest.mark.parametrize("name,marker,count", _BARRIER_FINAL_PLAN_PINS)
def test_barrier_single_evaluation_in_final_plan(spark, sf_dir, name, marker, count):
    plan = _plan(spark, name, sf_dir)
    assert plan.count(marker) == count, (
        f"{name}: expected exactly {count}x {marker!r} in the final plan "
        f"(got {plan.count(marker)}) — the Generate barrier no longer pins "
        "a single evaluation (or the expression vanished)"
    )


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_barrier_verify_pairs_arrays_single_intersect(spark):
    """Operator-level pin for the sites a localCheckpoint hides from
    final plans (minhash_dedup_e2e, minhash_signature_refresh,
    neardup_refresh_pipeline, delta/CC pipelines): verify_pairs_arrays'
    jaccard must fold exactly once per pair even though its threshold
    filter references it."""
    from pyspark.sql import functions as F

    from myfitnesspaw_spark.operators.dedup import verify_pairs_arrays

    arrs = spark.createDataFrame(
        [(1, ["a b c", "b c d"]), (2, ["a b c", "c d e"])], "doc_id long, sh array<string>"
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = _opt_plan(verify_pairs_arrays(arrs, cands, "doc_id", 0.5))
    assert plan.count("array_intersect") == 1


def test_barrier_bucket_near_dup_single_cosine(spark):
    from myfitnesspaw_spark.operators.similarity import bucket_near_dup

    vecs = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.1]), (3, 1, [0.0, 1.0])],
        "vid long, label int, vec array<float>",
    )
    plan = _opt_plan(bucket_near_dup(vecs, "vid", "vec", "label", 0.9))
    assert plan.count("zip_with") == 1  # one _dot fold per pair


def test_barrier_minhash_signatures_single_md5_pass(spark):
    """The per-shingle md5 array materializes through the Generate
    barrier once; the 16 rotation-minimum passes must reference the
    exploded attribute, never re-inline the md5 transform per seed."""
    from myfitnesspaw_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "b c d e f g")], "doc_id long, text string"
    )
    _, sig = minhash_signatures(docs, "doc_id", "text", 16, checkpoint=False)
    plan = _opt_plan(sig)
    assert plan.count("md5") == 1


def test_barrier_simhash_fingerprints_single_md5_pass(spark):
    from myfitnesspaw_spark.operators.dedup import simhash_fingerprints

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "b c d e f g")], "doc_id long, text string"
    )
    plan = _opt_plan(simhash_fingerprints(docs, "doc_id", "text"))
    assert plan.count("md5") == 1  # 32 bit votes share ONE hashed array
