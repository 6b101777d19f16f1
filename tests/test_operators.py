"""Operator unit tests with tiny inline fixtures — the reference's
test style (exact expected tuple lists over edge-case fixtures:
empty maps, empty bodies, changed records; `test_tasks.py:50-79`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from myfitnesspaw_spark.functions.text import word_shingles
from myfitnesspaw_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_prefix,
    shingle_sets,
)
from myfitnesspaw_spark.operators.normalize import (
    filter_nonempty,
    flatten_with_parent,
    project_map_keys,
)
from myfitnesspaw_spark.streaming import sessionize


def test_word_shingles_edges(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["a", "b", "c"]), (3, ["a", "b"]), (4, [])],
        "id int, toks array<string>",
    )
    out = {
        r["id"]: r["sh"]
        for r in df.select("id", word_shingles(F.col("toks"), 3).alias("sh")).collect()
    }
    assert out == {1: ["a b c", "b c d"], 2: ["a b c"], 3: [], 4: []}


def test_prefix_filter_equals_brute_force(spark):
    # Identical result sets from the brute inverted-index join and the
    # PPJoin prefix-filtered path (zero recall loss by construction).
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "an entirely different sentence with other words here"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    sh = shingle_sets(docs, "doc_id", "text", 3)
    brute = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs(sh, "doc_id", 0.5).collect()
    }
    pref = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs_prefix(sh, "doc_id", 0.5).collect()
    }
    assert brute == pref
    assert (1, 4, 1.0) in pref  # exact dup pair must survive


def test_flatten_drops_empty_arrays(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"]), (2, [])], "id int, meals array<string>"
    )
    rows = flatten_with_parent(df, ["id"], "meals", "meal").collect()
    assert [(r["id"], r["meal"]) for r in rows] == [(1, "x"), (1, "y")]


def test_project_map_keys_missing_is_null(spark):
    df = spark.createDataFrame(
        [(1, {"calories": 100.0}), (2, {"calories": 200.0, "fat": 9.0})],
        "id int, goals map<string,double>",
    )
    rows = project_map_keys(df, "goals", ["calories", "fat"], ["id"]).collect()
    assert [(r["id"], r["calories"], r["fat"]) for r in sorted(rows)] == [
        (1, 100.0, None),
        (2, 200.0, 9.0),
    ]


def test_filter_nonempty(spark):
    df = spark.createDataFrame(
        [(1, "note"), (2, ""), (3, None)], "id int, body string"
    )
    assert [r["id"] for r in filter_nonempty(df, "body").collect()] == [1]


def test_date_spine_reversed_range_raises(spark):
    import pytest

    from myfitnesspaw_spark.operators import date_spine

    with pytest.raises(ValueError, match="reversed"):
        date_spine(spark, "2024-02-01", "2024-01-01")
    assert date_spine(spark, "2024-01-01", "2024-01-03").count() == 3


def test_replace_by_keys_idempotent_reprocess(spark):
    # SURVEY §7.4: re-running a day's load must not duplicate child
    # rows — the cascade-delete-then-insert semantics made explicit.
    from myfitnesspaw_spark.operators import replace_by_keys

    existing = spark.createDataFrame(
        [(1, "d1", "meal_a"), (1, "d1", "meal_b"), (2, "d1", "meal_c")],
        "user long, date string, name string",
    )
    incoming = spark.createDataFrame(
        [(1, "d1", "meal_a2")], "user long, date string, name string"
    )
    once = replace_by_keys(existing, incoming, ["user", "date"])
    assert sorted((r.user, r.name) for r in once.collect()) == [
        (1, "meal_a2"), (2, "meal_c")
    ]
    twice = replace_by_keys(once, incoming, ["user", "date"])
    assert sorted((r.user, r.name) for r in twice.collect()) == [
        (1, "meal_a2"), (2, "meal_c")
    ]


def test_salted_join_equals_plain_join(spark):
    from myfitnesspaw_spark.operators.skew import salted_join

    probe = spark.createDataFrame(
        [(i, i % 3, f"p{i}") for i in range(100)], "pk long, key long, pval string"
    )
    build = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (2, "c2")], "key long, bval string"
    )
    plain = {
        tuple(r) for r in probe.join(build, "key", "inner").collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(probe, build, ["key"], ["pk"], num_salts=4).collect()
    }
    assert salted == plain


def test_asof_join_backward_semantics(spark):
    from myfitnesspaw_spark.operators.temporal import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (1, 5, "L0"), (2, 7, "L3")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "R@10"), (1, 15, "R@15"), (2, 9, "R@9")],
        "k long, ts long, rv string",
    )
    out = {
        (r["k"], r["ts"]): r["asof_rv"]
        for r in asof_join_backward(left, right, ["k"], "ts", ["rv"]).collect()
    }
    # equal ts matches; earlier left rows see nothing; later see latest ≤ ts
    assert out == {(1, 5): None, (1, 10): "R@10", (1, 20): "R@15", (2, 7): None}


def test_sessionize_gap_boundary(spark):
    # Events exactly at the 30-min gap stay in one session; one µs
    # beyond starts a new one.
    df = spark.createDataFrame(
        [
            (7, "2024-01-01 00:00:00", 1.0),
            (7, "2024-01-01 00:30:00", 1.0),  # == gap → same session
            (7, "2024-01-01 01:00:00.000001", 1.0),  # > gap → new session
            (8, "2024-01-01 00:00:00", 2.5),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = sessionize(df, gap_minutes=30).collect()
    got = {(r["user_id"], r["session_no"]): (r["n_events"], r["value_cents"]) for r in rows}
    assert got == {(7, 1): (2, 200), (7, 2): (1, 100), (8, 1): (1, 250)}


def test_order_trend_slope_degenerate_groups(spark):
    # Degenerate groups (single order, or all orders on one date) have
    # an undefined slope and must be dropped — mirroring the oracle's
    # WHERE den <> 0 — not emitted as NULL/NaN.
    from myfitnesspaw_spark.plans.udaf_queries import _SLOPE_SCHEMA, _fit_slope

    df = spark.createDataFrame(
        [
            (1, 100, 1000),  # two dates, exact slope (3000-1000)/(110-100)
            (1, 110, 3000),
            (2, 50, 500),    # single order → dropped
            (3, 60, 100),    # two orders, same date → dropped
            (3, 60, 900),
        ],
        "o_custkey long, x long, y long",
    )
    rows = df.groupBy("o_custkey").applyInPandas(_fit_slope, _SLOPE_SCHEMA).collect()
    got = {r["o_custkey"]: (r["n_orders"], r["slope_cents_per_day"]) for r in rows}
    assert got == {1: (2, 200.0)}


def test_kmeans_assignment_tiebreak_and_exactness(spark):
    # Equidistant point assigns to the LOWER centroid id (oracle's
    # ORDER BY dist, cid); distances are exact integers.
    from myfitnesspaw_spark.operators.clustering import assign_clusters

    df = spark.createDataFrame(
        [(10, [0, 0]), (11, [4, 0]), (12, [2, 0]), (13, [3, 0])],
        "vec_id long, v array<bigint>",
    )
    cents = [(0, [0, 0]), (1, [4, 0])]
    rows = assign_clusters(df, "v", cents).select("vec_id", "cluster", "dist").collect()
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in rows}
    assert got == {10: (0, 0), 11: (1, 0), 12: (0, 4), 13: (1, 1)}


def test_lloyd_drops_empty_clusters(spark):
    # A centroid that captures no points disappears from the next
    # round's centroid list (the oracle mirrors this by construction).
    from myfitnesspaw_spark.operators.clustering import lloyd_iterations

    df = spark.createDataFrame(
        [(1, [0, 0]), (2, [1, 0]), (3, [0, 1])],
        "vec_id long, v array<bigint>",
    )
    cents = lloyd_iterations(df, "v", [(0, [0, 0]), (1, [100, 100])], n_iter=1)
    assert [cid for cid, _ in cents] == [0]
    assert cents[0][1] == [0, 0]  # trunc((0+1+0)/3), trunc((0+0+1)/3)


def test_star_cc_matches_hash_min_on_chain(spark):
    # Chain 0-1-2-...-19 plus a separate triangle: worst case for
    # hash-min (rounds = diameter) and the case the star variant
    # exists for.  Both must label every node with its component min.
    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(19)]
    tri = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(chain + tri, "id_a long, id_b long")

    expect = {i: 0 for i in range(20)} | {100: 100, 101: 100, 102: 100}

    hm = {
        r["node"]: r["cluster"]
        for r in connected_components(edges, max_iter=25).collect()
    }
    stats: dict = {}
    star = {
        r["node"]: r["cluster"]
        for r in connected_components_star(edges, stats=stats).collect()
    }
    assert hm == expect
    assert star == expect
    # The point of the algorithm: round count ~log n, independent of
    # the 19-hop diameter (hash-min needs one round per hop; the star
    # variant took 5 + 1 confirming round here).
    assert stats["rounds"] <= 7


def test_star_cc_edge_cases(spark):
    from myfitnesspaw_spark.operators.dedup import connected_components_star

    # Self-loops and duplicate/reversed edges collapse; two components.
    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 1), (1, 2), (7, 8)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["cluster"] for r in connected_components_star(edges).collect()
    }
    assert got == {1: 1, 2: 1, 7: 7, 8: 7}


def test_bucket_near_dup_salted_equals_unsalted(spark):
    # The salt-cell decomposition must be result-identical to the
    # plain bucket self-join (exact skew handling, no dup pairs).
    from myfitnesspaw_spark.operators.similarity import bucket_near_dup

    rows = [(i, [1.0, float(i % 3)], "hot" if i < 12 else "cold") for i in range(16)]
    df = spark.createDataFrame(rows, "vid long, v array<double>, b string")

    plain = bucket_near_dup(df, "vid", "v", "b", 0.9)
    salted = bucket_near_dup(df, "vid", "v", "b", 0.9, salt_groups=4)
    p = sorted((r["id_a"], r["id_b"], r["bucket"]) for r in plain.collect())
    s = sorted((r["id_a"], r["id_b"], r["bucket"]) for r in salted.collect())
    assert p == s
    assert len(s) == len(set(s))  # canonical-cell filter: no duplicates


def test_bucket_near_dup_cap_bounds_candidates(spark):
    # max_bucket=m caps worst-case candidates at m*(m-1)/2 per bucket,
    # deterministically (same survivors on re-run).
    from myfitnesspaw_spark.operators.similarity import bucket_near_dup

    rows = [(i, [1.0, 0.0], "hot") for i in range(50)]
    df = spark.createDataFrame(rows, "vid long, v array<double>, b string")
    capped = bucket_near_dup(df, "vid", "v", "b", 0.0, max_bucket=10)
    got = sorted((r["id_a"], r["id_b"]) for r in capped.collect())
    assert len(got) == 45  # 10*9/2 — the documented bound, all cos=1 pairs kept
    again = sorted(
        (r["id_a"], r["id_b"])
        for r in bucket_near_dup(df, "vid", "v", "b", 0.0, max_bucket=10).collect()
    )
    assert got == again


def test_png_codec_round_trip_all_filters():
    # Pure-Python property: encode→decode is identity for every
    # scanline filter type (height ≥ 5 cycles through all five).
    from myfitnesspaw_spark.operators.multimodal import (
        png_decode_gray,
        png_encode_gray,
        synth_pixels,
    )

    for doc_id, w, h in [(0, 8, 8), (7, 37, 23), (123456, 44, 30), (99, 9, 5)]:
        pixels = synth_pixels(doc_id, w, h)
        data = png_encode_gray(pixels, w, h)
        dw, dh, decoded = png_decode_gray(data)
        assert (dw, dh) == (w, h)
        assert decoded == pixels

    # Corruption is detected, not silently decoded.
    good = png_encode_gray(synth_pixels(1, 8, 8), 8, 8)
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip a byte inside IHDR payload
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CRC"):
        png_decode_gray(bytes(bad))


def test_multimodal_decode_matches_oracle(spark, duck):
    from myfitnesspaw_spark.plans.stream_queries import (
        MULTIMODAL_DECODE_ORACLE,
        multimodal_decode,
    )
    from tests.conftest import SF_DIR, assert_matches_oracle

    assert_matches_oracle(multimodal_decode(spark, SF_DIR), duck, MULTIMODAL_DECODE_ORACLE)


def test_jaccard_pairs_delta_equals_filtered_full(spark, sf_dir):
    # The incremental (delta-probe) join must equal the full pair set
    # filtered to pairs touching the delta — each pair found EXACTLY
    # once (delta×delta pairs are reachable from both probe directions
    # and must not double-count n_shared).
    from pyspark.sql import functions as F

    from myfitnesspaw_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_delta,
        shingle_sets,
    )
    from myfitnesspaw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    delta = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")

    got = sorted(map(tuple, jaccard_pairs_delta(sh, "doc_id", 0.4, delta).collect()))
    full = jaccard_pairs(sh, "doc_id", 0.4).where(
        (F.col("id_a") % 10 == 0) | (F.col("id_b") % 10 == 0)
    )
    want = sorted(map(tuple, full.collect()))
    assert got == want and got  # non-empty at the fixture threshold


def test_observe_quality_metrics_ride_the_action(spark, sf_dir):
    """observe_quality: metrics computed inside the SAME job as the
    action match direct aggregates — the free in-flight quality gate."""
    import pyspark.sql.functions as F

    from myfitnesspaw_spark.functions.observe import observe_quality
    from myfitnesspaw_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    observed, obs = observe_quality(
        docs, "docs_quality", key_col="doc_id", value_col="n_chars"
    )
    n_collected = observed.count()
    got = obs.get
    direct = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id").isNull().cast("long")).alias("nk"),
        F.sum(F.col("n_chars").isNull().cast("long")).alias("nv"),
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
    ).collect()[0]
    assert got["n_rows"] == direct["n"] == n_collected
    assert got["n_null_key"] == direct["nk"] == 0
    assert got["n_null_value"] == direct["nv"] == 0
    assert got["value_min"] == direct["mn"]
    assert got["value_max"] == direct["mx"]


def test_tws_runtime_gate_and_merge_fold():
    """The state-API-v2 operator gates on its protobuf runtime dep and
    the shared batch fold is exact-integer in both paths."""
    import pandas as pd

    from myfitnesspaw_spark.streaming import tws

    # Gate mirrors the ACTUAL capability (ADVICE r6): pyspark's
    # generated protobuf state channel importable AND the grouped-data
    # API present — not merely `google.protobuf` installed.  Only the
    # import itself may fall through to the gate-off branch: a broad
    # except would swallow the equality AssertionError and green-light
    # the exact mismatch this test exists to catch.
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        importable = True
    except Exception:  # ImportError or a broken generated _pb2
        importable = False
    if importable:
        from pyspark.sql.group import GroupedData

        assert tws.HAS_TWS_RUNTIME == hasattr(
            GroupedData, "transformWithStateInPandas"
        )
    else:
        assert not tws.HAS_TWS_RUNTIME

    chunks = [
        pd.DataFrame({"event_type": ["a", "b", "a"], "cents": [100, 5, 3], "us": [10, 20, 5]}),
        pd.DataFrame({"event_type": ["b"], "cents": [7], "us": [1]}),
    ]
    prior = {"a": (1, 1, 1, 100)}
    got = tws._merge_rows(iter(chunks), prior.get)
    assert got == {"a": (3, 104, 1, 100), "b": (2, 12, 1, 20)}


def test_sf_is_small_parses_and_assumes_big():
    from myfitnesspaw_spark.sources import sf_is_small

    assert sf_is_small("/root/testdata/sf0.001")
    assert sf_is_small("/root/testdata/sf0.1")
    assert not sf_is_small("/tmp/scale_probe_sf8")
    assert not sf_is_small("/data/prod_corpus")  # unknown -> assume big
    assert not sf_is_small("/data/sf2.5")
    # The marker must sit on the BASENAME (ADVICE r6): a big corpus
    # under a dir whose ancestry mentions sf0.1 keeps its skew guards.
    assert not sf_is_small("/data/sf0.1/bigcorpus")
    assert not sf_is_small("/data/sf0.1_copy/prod")
    assert sf_is_small("/root/testdata/sf0.01/")  # trailing slash ok
    assert not sf_is_small("/x/mysf0.1")  # no separator before marker


def test_anchor_batched_empty_and_single(spark):
    """Degenerate inputs: zero anchors still yields an empty frame of
    the right schema through every batch; n_batches=1 is the plain
    path."""
    import pyspark.sql.functions as F

    from myfitnesspaw_spark.plans.pipeline_queries import _anchor_batched

    anchors = spark.createDataFrame([], "anchor_id bigint, v bigint")

    def one_batch(part):
        return part.select("anchor_id", (F.col("v") * 2).alias("v2"))

    for n in (1, 3):
        out = _anchor_batched(anchors, "anchor_id", n, one_batch)
        assert out.columns == ["anchor_id", "v2"]
        assert out.count() == 0


def test_dsir_and_spans_partitioning_invariance(spark, sf_dir):
    """dsir_selection's top-K (tie-broken by doc_id) and the span
    profile must be byte-identical under a different input
    partitioning - no shuffle-arrival-order dependence."""
    from pyspark.sql import functions as F

    from myfitnesspaw_spark.plans.curation_queries import repeated_ngram_spans
    from myfitnesspaw_spark.plans.pipeline_queries import dsir_selection
    from myfitnesspaw_spark.sources import load_table

    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        a1 = [tuple(r) for r in dsir_selection(spark, sf_dir).collect()]
        s1 = sorted(tuple(r) for r in repeated_ngram_spans(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a2 = [tuple(r) for r in dsir_selection(spark, sf_dir).collect()]
        s2 = sorted(tuple(r) for r in repeated_ngram_spans(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
    assert a1 == a2  # ordered top-K, deterministic tie-break
    assert s1 == s2
