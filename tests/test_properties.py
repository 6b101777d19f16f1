"""Property-based tests (hypothesis) — the reference has none
(SURVEY §5); randomized invariants guard the pure logic cheaply.
Spark round-trips are batched into ONE DataFrame per test so the
property suite stays fast."""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from myfitnesspaw_spark.report import (
    PALETTE_DEFAULT,
    PALETTE_NEGATIVE,
    chart_segments,
    prepare_table,
)


@given(
    total=st.integers(-10_000, 10_000),
    delta=st.integers(-5_000, 5_000),
    goal=st.integers(1, 20_000),
)
@settings(max_examples=200, deadline=None)
def test_chart_segments_invariants(total, delta, goal):
    segments, palette = chart_segments(total, delta, goal)
    widths = dict(segments)
    assert set(widths) == {"done", "today", "remaining"}
    assert all(w >= 0 for w in widths.values())
    assert palette is (PALETTE_NEGATIVE if delta < 0 else PALETTE_DEFAULT)
    # The bar never exceeds goal unless progress itself does.
    assert widths["done"] + widths["today"] + widths["remaining"] >= goal or (
        widths["remaining"] == 0
    )


@given(
    st.lists(
        st.tuples(
            st.dates(date(2024, 1, 1), date(2024, 3, 1)),
            st.one_of(st.none(), st.integers(-500, 500)),
        ),
        max_size=30,
    ),
    st.integers(1, 10),
)
@settings(max_examples=200, deadline=None)
def test_prepare_table_invariants(rows, num_rows):
    today = date(2024, 3, 2)
    out = prepare_table(rows, deficit_idx=1, date_idx=0, num_rows=num_rows, today=today)
    assert len(out) <= num_rows
    assert all(r[1] is not None for r in out)
    assert out == sorted(out, key=lambda r: r[0])
    if out:
        assert out[-1][0] == today - timedelta(days=1)  # freshness guard
    assert all(r in rows for r in out)


def _py_shingles(toks: list[str], n: int = 3) -> list[str]:
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_word_shingles_matches_python_reference(spark):
    import random

    from pyspark.sql import functions as F

    from myfitnesspaw_spark.functions.text import word_shingles

    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    cases = [
        [rng.choice(vocab) for _ in range(rng.randint(0, 12))] for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(cases)], "id int, toks array<string>"
    )
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", word_shingles(F.col("toks"), 3).alias("sh")).collect()
    }
    for i, toks in enumerate(cases):
        assert got[i] == _py_shingles(toks), (i, toks)


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_png_encoder_roundtrip(h, w, seed):
    # encode_png must produce a decodable PNG whose scanlines carry the
    # exact input pixels (filter 0, no loss).
    import struct
    import zlib

    import numpy as np

    from myfitnesspaw_spark.report.chart import encode_png

    rgb = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
    png = encode_png(rgb)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    iw, ih = struct.unpack(">II", png[16:24])
    assert (iw, ih) == (w, h)
    idat = png[png.index(b"IDAT") + 4 :]
    raw = zlib.decompress(idat[: idat.rindex(b"IEND") - 8])
    back = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (back[:, 0] == 0).all()  # filter byte 0 per scanline
    assert (back[:, 1:].reshape(h, w, 3) == rgb).all()


@given(
    sa=st.integers(0, 15),
    sb=st.integers(0, 15),
    g=st.integers(1, 16),
)
@settings(max_examples=300, deadline=None)
def test_salt_cell_pairing_exactly_once(sa, sb, g):
    # The pairing argument behind bucket_near_dup's skew decomposition:
    # rows with salts sa, sb share ≥1 cell, and the canonical-cell
    # filter (cell == {min,max} of the two salts) selects EXACTLY one —
    # so every pair joins once, with no post-join dedup.
    sa, sb = sa % g, sb % g
    cells_a = {(min(sa, t), max(sa, t)) for t in range(g)}
    cells_b = {(min(sb, t), max(sb, t)) for t in range(g)}
    shared = cells_a & cells_b
    canonical = (min(sa, sb), max(sa, sb))
    assert canonical in shared
    matched = [c for c in shared if c == canonical]
    assert len(matched) == 1


def test_star_cc_random_graphs_match_union_find(spark):
    # Seeded random graphs: the distributed star contraction must agree
    # with a direct union-find on the same edges.
    import numpy as np

    from myfitnesspaw_spark.operators.dedup import connected_components_star

    def union_find(edges):
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min-label per node
        return {n: find(n) for n in parent}

    rng = np.random.RandomState(42)
    for trial in range(4):
        n = int(rng.randint(10, 60))
        m = int(rng.randint(5, 120))
        edges = [
            (int(rng.randint(0, n)), int(rng.randint(0, n))) for _ in range(m)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        expect = union_find(edges)
        # union-find roots are not min-of-component by construction;
        # normalize: min node per root group.
        groups: dict = {}
        for node, root in expect.items():
            groups.setdefault(root, []).append(node)
        want = {n_: min(g_) for r_, g_ in groups.items() for n_ in g_}
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["cluster"]
            for r in connected_components_star(df).collect()
        }
        assert got == want, f"trial {trial}"


def test_star_cc_adversarial_shapes(spark):
    # Adversarial topologies for the contraction (VERDICT r4 #7):
    # a long path chain (worst case for hash-min propagation — the
    # shape star CC exists to beat), a high-degree star, self-loops,
    # and a barbell (two chains bridged by one edge).  All must label
    # every node with its component minimum, converge (witness hit,
    # not max_iter exhaustion), and do so in far fewer rounds than the
    # chain's diameter.
    from myfitnesspaw_spark.operators.dedup import connected_components_star

    chain = [(i, i + 1) for i in range(200)]  # diameter 200
    star = [(1000, 1000 + i) for i in range(1, 80)]  # hub 1000
    loops = [(5, 5), (1000, 1000), (2000, 2000)]  # self-loops dropped
    barbell = (
        [(3000 + i, 3000 + i + 1) for i in range(30)]
        + [(4000 + i, 4000 + i + 1) for i in range(30)]
        + [(3030, 4000)]
    )
    edges = chain + star + loops + barbell
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    stats: dict = {}
    got = {
        r["node"]: r["cluster"]
        for r in connected_components_star(df, stats=stats).collect()
    }

    assert stats["converged"] is True
    assert stats["rounds"] <= 10, stats  # O(log^2 n), not O(diameter)

    for i in range(201):  # chain: all label 0
        assert got[i] == 0
    for i in range(1, 80):  # star: all label hub-min 1000
        assert got[1000 + i] == 1000
    assert got[1000] == 1000
    for i in range(31):  # barbell: one component, min 3000
        assert got[3000 + i] == 3000
        assert got[4000 + i] == 3000
    # Pure self-loop node 2000 has no real edge → not a graph node.
    assert 2000 not in got
    # Node 5 sits inside the chain; its self-loop must not perturb it.
    assert got[5] == 0


def test_star_cc_warns_on_max_iter_exhaustion(spark):
    # Exhausting max_iter without the fixed-point witness must WARN and
    # record converged=False (ADVICE r4: silent truncation could emit
    # labels that are not component minima).
    import warnings

    from myfitnesspaw_spark.operators.dedup import connected_components_star

    chain = [(i, i + 1) for i in range(80)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    stats: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components_star(df, max_iter=1, stats=stats).collect()
    assert stats["converged"] is False
    assert any(
        issubclass(w.category, RuntimeWarning) and "fixed point" in str(w.message)
        for w in caught
    )


@given(
    w=st.integers(1, 50),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_random_content(w, h, seed):
    # Pure-Python property over the multimodal codec (no Spark): any
    # pixel field survives encode→decode exactly, for every dimension
    # combination (h < 5 exercises partial filter-cycle coverage, w = 1
    # the degenerate scanline).
    import random

    from myfitnesspaw_spark.operators.multimodal import (
        png_decode_gray,
        png_encode_gray,
    )

    rng = random.Random(seed)
    pixels = bytes(rng.randrange(256) for _ in range(w * h))
    dw, dh, decoded = png_decode_gray(png_encode_gray(pixels, w, h))
    assert (dw, dh, decoded) == (w, h, pixels)


@given(seed=st.integers(0, 2**31 - 1), n=st.integers(4, 40))
@settings(max_examples=20, deadline=None)
def test_pagerank_python_reference(spark, seed, n):
    """pagerank_integer matches a direct Python evaluation of the same
    integer recurrence on random undirected graphs."""
    import random

    from myfitnesspaw_spark.operators.graph import PR_SCALE, pagerank_integer

    rng = random.Random(seed)
    edges = set()
    for _ in range(n):
        a, b = rng.randrange(30), rng.randrange(30)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    if not edges:
        edges = {(0, 1)}
    edges = sorted(edges)

    sym = {}
    for a, b in edges:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    ranks = {v: PR_SCALE for v in sym}
    base = (15 * PR_SCALE) // 100
    for _ in range(3):
        sums = {v: 0 for v in sym}
        for v, nbrs in sym.items():
            c = ranks[v] // len(nbrs)
            for d in nbrs:
                sums[d] += c
        ranks = {v: base + (85 * sums[v]) // 100 for v in sym}
    expected = {(v, len(sym[v]), ranks[v]) for v in sym}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r["node"], r["deg"], r["rank_units"])
        for r in pagerank_integer(df, iterations=3).collect()
    }
    assert got == expected


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=10, deadline=None)
def test_srp_first_collision_uniqueness(spark, seed):
    """Candidate pairs are unique by construction (first-collision-band
    rule) and identical to the distinct-based formulation."""
    import random

    from myfitnesspaw_spark.operators.similarity import srp_lsh_pairs
    from myfitnesspaw_spark.plans.pipeline_queries import _srp_signs

    rng = random.Random(seed)
    rows = []
    for i in range(30):
        vec = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, vec))
        if i % 7 == 0:  # planted near-dups: identical copies
            rows.append((i + 1000, list(vec)))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = srp_lsh_pairs(df, "vec_id", "embedding", _srp_signs(), 4, 0.95).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate candidate pair emitted"
    # Every planted identical copy must be found (identical signature
    # ⇒ collides in every band ⇒ candidate; cosine = 1 ≥ threshold).
    planted = {(i, i + 1000) for i in range(0, 30, 7)}
    assert planted <= set(pairs)


def test_pq_encode_donor_roundtrip(spark):
    """Codebook donor vectors encode to their own code in every
    subspace (distance 0 to themselves beats every other entry, ties
    break low)."""
    import random

    from myfitnesspaw_spark.operators.similarity import pq_encode

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    codebooks = [
        [[int(v * 1_000_000) for v in vec[m * 4 : (m + 1) * 4]] for vec in vecs]
        for m in range(4)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    ).withColumn(
        "iv",
        F.transform(F.col("embedding"), lambda x: (x * 1_000_000).cast("long")),
    )
    got = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(df, "iv", codebooks).select("vec_id", "codes").collect()
    }
    for i in range(4):
        assert got[i] == [i] * 4, f"donor {i} did not round-trip: {got[i]}"


def test_minhash_hot_band_salting_result_identical(spark):
    """VERDICT r5 #3: a degenerate corpus (hundreds of identical docs
    — every one sharing every band key) must complete under the
    salt-cell band join with the EXACT same pair set as the unsalted
    join: the decomposition spreads the m² candidate space over
    G(G+1)/2 tasks without changing semantics."""
    from myfitnesspaw_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "the same exact crawl boilerplate text repeated verbatim") for i in range(200)]
    rows += [(1000 + i, f"unique document number {i} with its own words {i * 17}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    kw = dict(num_hashes=8, band_rows=2, threshold=0.8)
    plain = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df, "doc_id", "text", **kw).collect()
    }
    salted = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text", salt_groups=4, **kw).collect()
    }
    assert salted == plain
    # All identical-doc pairs found: C(200, 2) of them.
    assert len({p for p in plain if p[0] < 1000 and p[1] < 1000}) == 200 * 199 // 2

    # The bounded-approximation knob: capping each band key at m rows
    # caps candidates at m(m-1)/2 per band — the capped result is a
    # subset of the exact pairs, and the distinct docs are unaffected.
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", max_band_rows=32, **kw
        ).collect()
    }
    assert capped <= plain
    assert {p for p in plain if p[0] >= 1000} == {p for p in capped if p[0] >= 1000}


def test_srp_hot_band_salting_result_identical(spark):
    """Same contract for the SRP band join: duplicate vector swarms
    share every (band, bval) key; the salted join must return the
    identical pair set."""
    import random

    from myfitnesspaw_spark.operators.similarity import srp_lsh_pairs
    from myfitnesspaw_spark.plans.pipeline_queries import _srp_signs

    rng = random.Random(7)
    dup = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(i, list(dup)) for i in range(120)]
    rows += [(1000 + i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    plain = {
        (r["id_a"], r["id_b"])
        for r in srp_lsh_pairs(df, "vec_id", "embedding", _srp_signs(), 8, 0.95).collect()
    }
    salted = {
        (r["id_a"], r["id_b"])
        for r in srp_lsh_pairs(
            df, "vec_id", "embedding", _srp_signs(), 8, 0.95, salt_groups=3
        ).collect()
    }
    assert salted == plain
    assert {(a, b) for a in range(120) for b in range(a + 1, 120)} <= plain


def test_anchor_batching_result_identical(spark, sf_dir):
    """VERDICT r5 #7: chunking the anchor broadcast into fixed-size
    batches (the past-10^6-anchors OOM guard) must be result-identical
    to the single-broadcast plan — anchor slices are disjoint and all
    downstream state is per-anchor."""
    from myfitnesspaw_spark.plans.pipeline_queries import (
        hard_negative_mining,
        random_negative_sampling,
    )

    for fn in (hard_negative_mining, random_negative_sampling):
        one = {tuple(r) for r in fn(spark, sf_dir, anchor_batches=1).collect()}
        batched = {tuple(r) for r in fn(spark, sf_dir, anchor_batches=3).collect()}
        assert batched == one, fn.__name__


def test_cc_stats_rounds_reported(spark):
    """Both CC variants report their round count through the optional
    stats out-param (the rounds-vs-size probe input) without changing
    the labels."""
    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], ["id_a", "id_b"]
    )
    st: dict = {}
    labels = {
        (r["node"], r["cluster"])
        for r in connected_components(edges, stats=st).collect()
    }
    assert st["rounds"] >= 1
    expected = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20), (22, 20)}
    assert labels == expected
    st2: dict = {}
    labels2 = {
        (r["node"], r["cluster"])
        for r in connected_components_star(edges, stats=st2).collect()
    }
    assert st2["rounds"] >= 1 and labels2 == expected


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=8, deadline=None)
def test_triangle_counts_match_brute_force(spark, seed):
    """Degree-ordered triangle counting equals the brute-force
    enumeration on random graphs (including multi-clique, hub, and
    isolated-edge shapes)."""
    import itertools
    import random

    from myfitnesspaw_spark.operators.graph import triangle_counts

    rng = random.Random(seed)
    n = rng.randint(4, 24)
    edges = set()
    for _ in range(rng.randint(3, 60)):
        a, b = rng.sample(range(n), 2)
        edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)

    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for v, nbrs in adj.items():
        if not nbrs:
            continue  # isolated nodes are not graph nodes (no edges)
        t = sum(
            1 for x, y in itertools.combinations(sorted(nbrs), 2) if y in adj[x]
        )
        expected[v] = (len(nbrs), t)

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: (r["deg"], r["n_triangles"])
        for r in triangle_counts(df).collect()
    }
    assert got == expected


@given(seed=st.integers(0, 2**31 - 1))
@settings(max_examples=4, deadline=None)
def test_triangle_counts_canonicalize_noisy_input(spark, seed):
    """Duplicate rows, reversed orientations, and self-loops in the
    input edge list must not inflate deg or triangle counts — the
    operator canonicalizes defensively (ADVICE r6) instead of relying
    on a documented precondition."""
    import random

    from myfitnesspaw_spark.operators.graph import triangle_counts

    rng = random.Random(seed)
    n = rng.randint(4, 16)
    clean = set()
    for _ in range(rng.randint(3, 40)):
        a, b = rng.sample(range(n), 2)
        clean.add((min(a, b), max(a, b)))
    clean = sorted(clean)

    noisy = list(clean)
    noisy += [(b, a) for a, b in rng.sample(clean, len(clean) // 2)]  # reversed dups
    noisy += rng.sample(clean, min(3, len(clean)))  # exact dups
    noisy += [(v, v) for v in rng.sample(range(n), 2)]  # self-loops
    rng.shuffle(noisy)

    want = {
        (r["node"], r["deg"], r["n_triangles"])
        for r in triangle_counts(
            spark.createDataFrame(clean, ["id_a", "id_b"])
        ).collect()
    }
    got = {
        (r["node"], r["deg"], r["n_triangles"])
        for r in triangle_counts(
            spark.createDataFrame(noisy, ["id_a", "id_b"])
        ).collect()
    }
    assert got == want


def test_incremental_cc_refresh_contraction_random(spark):
    """The refresh protocol behind incremental_cc_refresh /
    indexed_cc_refresh rests on one graph property: CC over (stored
    base labels as edges) ∪ (pairs touching the batch) equals CC over
    ALL pairs.  The registered queries certify it on ONE fixed corpus
    and split (doc_id % 10); seeded random graphs and splits check the
    contraction itself, not the split the testdata happens to have."""
    import numpy as np

    from myfitnesspaw_spark.operators.dedup import connected_components

    rng = np.random.RandomState(1307)
    for trial in range(3):
        n = int(rng.randint(8, 40))
        m = int(rng.randint(4, 80))
        edges = sorted(
            {
                (int(rng.randint(0, n)), int(rng.randint(0, n)))
                for _ in range(m)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        batch = {int(x) for x in rng.choice(n, size=max(1, n // 4), replace=False)}

        full = spark.createDataFrame(edges, "id_a long, id_b long")
        want = {
            (r["node"], r["cluster"])
            for r in connected_components(full).collect()
        }

        base_edges = [(a, b) for a, b in edges if a not in batch and b not in batch]
        delta_edges = [(a, b) for a, b in edges if a in batch or b in batch]
        label_edges = []
        if base_edges:
            stored = connected_components(
                spark.createDataFrame(base_edges, "id_a long, id_b long")
            )
            # exactly what the refresh queries feed back: node→cluster
            # rows as edges (the component min labels itself, so the
            # merged graph carries self-loops — they must be harmless).
            label_edges = [(r["node"], r["cluster"]) for r in stored.collect()]
        merged = label_edges + delta_edges
        if not merged:
            continue
        got = {
            (r["node"], r["cluster"])
            for r in connected_components(
                spark.createDataFrame(merged, "id_a long, id_b long")
            ).collect()
        }
        assert got == want, f"trial {trial} (n={n}, batch={sorted(batch)})"


def test_jaccard_pairs_delta_matches_restricted_full(spark):
    """jaccard_pairs_delta's exactly-once flag rule (probe<index, or
    probe>index when the index doc is NOT itself delta) must emit
    precisely the full pair set restricted to pairs touching the
    delta — no delta×delta pair twice, no base×delta pair missed,
    regardless of which side of the id order the delta member sits.
    Random corpora + random delta subsets; the full set comes from
    jaccard_pairs_prefix (itself oracle-checked elsewhere)."""
    import numpy as np

    from myfitnesspaw_spark.operators.dedup import (
        jaccard_pairs_delta,
        jaccard_pairs_prefix,
        shingle_sets,
    )

    rng = np.random.RandomState(4113)
    vocab = ["alpha", "beta", "gamma", "delta", "echo", "foxtrot"]
    threshold = 0.3
    for trial in range(3):
        n_docs = int(rng.randint(10, 18))
        rows = [
            (
                i,
                " ".join(
                    vocab[int(k)]
                    for k in rng.randint(0, len(vocab), int(rng.randint(4, 12)))
                ),
            )
            for i in range(n_docs)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sh = shingle_sets(docs, "doc_id", "text", n=3)
        batch = sorted(
            int(x)
            for x in rng.choice(n_docs, size=max(1, n_docs // 3), replace=False)
        )
        batch_df = spark.createDataFrame([(b,) for b in batch], "doc_id long")

        key = lambda r: (r["id_a"], r["id_b"], r["n_shared"], r["n_a"], r["n_b"])
        full = {
            key(r) for r in jaccard_pairs_prefix(sh, "doc_id", threshold).collect()
        }
        bs = set(batch)
        want = {p for p in full if p[0] in bs or p[1] in bs}
        got = {
            key(r)
            for r in jaccard_pairs_delta(sh, "doc_id", threshold, batch_df).collect()
        }
        assert got == want, f"trial {trial} (batch={batch})"


def test_prefix_filter_equals_brute_random_corpora(spark):
    """Zero recall loss of the PPJoin path on RANDOM corpora: the
    prefix / length / positional filters (Xiao et al. WWW'08, added
    r6) prune candidates by threshold arithmetic whose boundary cases
    (ceil/floor of t·|set|, overlap lower bound) a fixed 4-doc corpus
    (test_operators.test_prefix_filter_equals_brute_force) cannot
    sweep.  Seeded random corpora × three thresholds, exact set
    equality against the brute inverted-index join."""
    import numpy as np

    from myfitnesspaw_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
        shingle_sets,
    )

    rng = np.random.RandomState(80)
    vocab = ["alpha", "beta", "gamma", "delta", "echo", "foxtrot", "golf"]
    for trial, threshold in enumerate([0.3, 0.5, 0.8]):
        # Random base docs plus near-duplicate mutations of them (one
        # token replaced / one appended / exact copy) so every
        # threshold sees genuine pairs, not a vacuous empty==empty.
        n_base = int(rng.randint(5, 9))
        texts = [
            [
                vocab[int(k)]
                for k in rng.randint(0, len(vocab), int(rng.randint(5, 10)))
            ]
            for _ in range(n_base)
        ]
        for src in range(n_base):
            kind = int(rng.randint(0, 3))
            mut = list(texts[src])
            if kind == 0 and mut:
                mut[int(rng.randint(0, len(mut)))] = vocab[
                    int(rng.randint(0, len(vocab)))
                ]
            elif kind == 1:
                mut.append(vocab[int(rng.randint(0, len(vocab)))])
            texts.append(mut)
        rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
        sh = shingle_sets(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            3,
        )
        key = lambda r: (
            r["id_a"], r["id_b"], r["n_shared"], r["n_a"], r["n_b"],
        )
        brute = {key(r) for r in jaccard_pairs(sh, "doc_id", threshold).collect()}
        pref = {
            key(r)
            for r in jaccard_pairs_prefix(sh, "doc_id", threshold).collect()
        }
        assert pref == brute, f"trial {trial} t={threshold}"
        assert brute, f"degenerate trial t={threshold}: no pairs — mutate harder"


def test_hashmin_and_star_cc_agree_random_graphs(spark):
    """The two CC implementations (hash-min propagation, the oracle
    twin; large-star/small-star contraction, the O(log² n)-rounds
    scale path) are registered with the same oracle but only on the
    fixed corpus.  On random graphs they must emit identical
    (node, min-of-component) labelings."""
    import numpy as np

    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = np.random.RandomState(2027)
    for trial in range(3):
        n = int(rng.randint(10, 50))
        m = int(rng.randint(5, 100))
        edges = sorted(
            {(int(rng.randint(0, n)), int(rng.randint(0, n))) for _ in range(m)}
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        hashmin = {
            (r["node"], r["cluster"]) for r in connected_components(df).collect()
        }
        star = {
            (r["node"], r["cluster"])
            for r in connected_components_star(df).collect()
        }
        assert hashmin == star, f"trial {trial}"


def test_minhash_lsh_never_misses_exact_duplicates(spark):
    """Deterministic safety floor of banded MinHash: two docs with the
    SAME text have identical shingle sets, hence identical signatures,
    hence collide in EVERY band — an exact-duplicate pair can never be
    lost to banding, at any corpus shape.  Random corpora with planted
    exact-copy groups; every planted pair must appear with jaccard 1.0
    (near-miss mutations are probabilistic recall and NOT asserted)."""
    import numpy as np

    from myfitnesspaw_spark.operators.dedup import minhash_lsh_pairs

    rng = np.random.RandomState(515)
    vocab = ["alpha", "beta", "gamma", "delta", "echo", "foxtrot"]
    for trial in range(3):
        n_base = int(rng.randint(6, 10))
        texts = [
            " ".join(
                vocab[int(k)]
                for k in rng.randint(0, len(vocab), int(rng.randint(5, 12)))
            )
            for _ in range(n_base)
        ]
        planted = []
        rows = [(i, t) for i, t in enumerate(texts)]
        for j in range(int(rng.randint(2, 5))):
            src = int(rng.randint(0, n_base))
            dup_id = n_base + j
            rows.append((dup_id, texts[src]))
            planted.append((src, dup_id))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=16, band_rows=2, threshold=0.8
            ).collect()
        }
        for a, b in planted:
            # the copy may itself duplicate another doc; membership +
            # jaccard 1.0 is the guaranteed part.
            pair = (min(a, b), max(a, b))
            assert pair in got, f"trial {trial}: exact-dup pair {pair} missed"
            assert got[pair] == 1.0, f"trial {trial}: {pair} jaccard {got[pair]}"


def test_refresh_protocol_degenerate_batches(spark):
    """Production edge cases of the incremental refresh protocol that
    the fixed doc_id%10 split never exercises: an EMPTY batch (a
    nightly refresh with no new docs) must return exactly the stored
    clustering, and an everything-is-new batch (first run against an
    empty store) must equal the full recompute."""
    from myfitnesspaw_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_delta,
        jaccard_pairs_prefix,
        shingle_sets,
    )

    rows = [
        (0, "alpha beta gamma delta echo"),
        (1, "alpha beta gamma delta echo"),          # dup of 0
        (2, "alpha beta gamma delta foxtrot"),       # near-dup of 0/1
        (3, "golf hotel india juliet kilo"),
        (4, "golf hotel india juliet lima"),          # near-dup of 3
        (5, "mike november oscar papa quebec"),       # singleton
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_sets(docs, "doc_id", "text", n=3)
    t = 0.3
    full_pairs = jaccard_pairs_prefix(sh, "doc_id", t).select("id_a", "id_b")
    want = {
        (r["node"], r["cluster"])
        for r in connected_components(full_pairs).collect()
    }
    assert want  # the fixture must have clusters

    # empty batch: delta pairs empty; CC over label edges alone must
    # reproduce the stored clustering byte-for-byte.
    empty = spark.createDataFrame([], "doc_id long")
    delta_empty = jaccard_pairs_delta(sh, "doc_id", t, empty).select(
        "id_a", "id_b"
    )
    assert delta_empty.count() == 0
    from pyspark.sql import functions as F

    stored = connected_components(full_pairs)
    label_edges = stored.select(
        F.col("node").alias("id_a"), F.col("cluster").alias("id_b")
    )
    got_empty = {
        (r["node"], r["cluster"])
        for r in connected_components(
            label_edges.unionByName(delta_empty)
        ).collect()
    }
    assert got_empty == want

    # everything-new batch against an empty store: delta must carry
    # ALL pairs and CC over it alone equals the full recompute.
    all_ids = docs.select("doc_id")
    delta_all = jaccard_pairs_delta(sh, "doc_id", t, all_ids).select(
        "id_a", "id_b"
    )
    full_set = {tuple(r) for r in full_pairs.collect()}
    assert {tuple(r) for r in delta_all.collect()} == full_set
    got_all = {
        (r["node"], r["cluster"])
        for r in connected_components(delta_all).collect()
    }
    assert got_all == want


def test_type_class_spark_arrow_parity_exhaustive():
    """The shared cross-engine type-class map
    (myfitnesspaw_spark/typeclass.py, split out of conftest per ADVICE
    r13) must assign the SAME class to a Spark type and the Arrow type
    Spark converts it to — otherwise the oracle sweep's schema-parity
    arm would false-positive on a correct oracle.  Enumerate every
    supported logical type through both vocabularies, including the
    width variants Arrow distinguishes but one class must absorb."""
    import pyarrow as pa
    from pyspark.sql import types as T

    from myfitnesspaw_spark.typeclass import type_class

    pairs = [
        (T.ByteType(), pa.int8(), "int"),
        (T.ShortType(), pa.int16(), "int"),
        (T.IntegerType(), pa.int32(), "int"),
        (T.LongType(), pa.int64(), "int"),
        (T.LongType(), pa.uint64(), "int"),  # DuckDB UBIGINT
        (T.FloatType(), pa.float32(), "float"),
        (T.DoubleType(), pa.float64(), "float"),
        (T.DecimalType(12, 2), pa.decimal128(12, 2), "decimal"),
        (T.BooleanType(), pa.bool_(), "bool"),
        (T.StringType(), pa.string(), "str"),
        (T.StringType(), pa.large_string(), "str"),
        (T.DateType(), pa.date32(), "date"),
        (T.TimestampType(), pa.timestamp("us"), "timestamp"),
        (T.TimestampNTZType(), pa.timestamp("us"), "timestamp"),
        (T.BinaryType(), pa.binary(), "binary"),
        (T.BinaryType(), pa.large_binary(), "binary"),
        (T.ArrayType(T.LongType()), pa.list_(pa.int64()), "list"),
        (T.ArrayType(T.DoubleType()), pa.large_list(pa.float64()), "list"),
        (
            T.MapType(T.StringType(), T.LongType()),
            pa.map_(pa.string(), pa.int64()),
            "nested",
        ),
        (
            T.StructType([T.StructField("a", T.LongType())]),
            pa.struct([("a", pa.int64())]),
            "nested",
        ),
        (T.NullType(), pa.null(), "null"),
    ]
    for spark_t, arrow_t, expected in pairs:
        assert type_class(spark_t) == expected, spark_t
        assert type_class(arrow_t) == expected, arrow_t

    # The hazard the map exists for stays DISTINGUISHED, never merged:
    # DuckDB HUGEINT surfaces as float64 through this Arrow build.
    assert type_class(T.LongType()) != type_class(pa.float64())
    # Unknown types degrade to a labeled class, not a crash or a
    # false "match" with anything known.
    assert type_class(pa.duration("s")).startswith("other:")
    assert type_class(T.DayTimeIntervalType()).startswith("other:")


def _py_bpe_tokens(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Classic token-walk BPE application (Sennrich et al. semantics):
    one pass per merge, leftmost, non-overlapping, merged output not
    rescanned within its own pass."""
    toks = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_encode_expr_matches_token_walk_reference(spark):
    """The bracket-replace BPE encode (plans/pipeline_queries.py::
    bpe_encode_expr — the codegen-string trick both bpe_apply_merges
    and its DuckDB oracle build on) must equal the classic token-walk
    application for RANDOM chained merge tables and adversarial words.
    The equivalence claim is subtle (a replace could in principle
    create a new same-pass match at its boundary), so it is pinned
    empirically over a narrow alphabet where collisions are dense:
    repeated-letter runs ('eee'), self-merges (e,e), and merges
    consuming earlier outputs (m+er after e+r) all occur by
    construction."""
    import random

    from pyspark.sql import functions as F

    from myfitnesspaw_spark.plans.pipeline_queries import bpe_encode_expr

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        letters = "abcde"
        # Chained merge table: each merge draws from the vocab built so
        # far (singles + earlier merge outputs), so later merges can
        # only fire on earlier merges' output tokens.
        vocab = list(letters)
        merges: list[tuple[str, str]] = []
        for _ in range(rng.randint(1, 8)):
            a, b = rng.choice(vocab), rng.choice(vocab)
            merges.append((a, b))
            vocab.append(a + b)
        words = ["".join(rng.choice(letters) for _ in range(rng.randint(1, 12)))
                 for _ in range(150)]
        # Adversarial additions: uniform runs and exact merge-pair runs.
        words += [c * n for c in letters for n in (2, 3, 4, 5)]
        words += [(a + b) * 3 for a, b in merges]

        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "id int, word string"
        )
        spaced = F.expr("trim(BOTH '<>' FROM replace(__enc, '><', ' '))")
        got = {
            r["id"]: r["toks"]
            for r in df.withColumn("__enc", bpe_encode_expr(F.col("word"), merges))
            .select("id", F.split(spaced, " ").alias("toks"))
            .collect()
        }
        for i, w in enumerate(words):
            assert got[i] == _py_bpe_tokens(w, merges), (seed, w, merges)


def test_jaccard_prefix_arrays_equals_exploded_wrapper(spark):
    """The r20 array-form PPJoin pipeline (row-local prefix ranks from
    md5-sorted arrays + row-local array_intersect verification) must
    emit the exploded wrapper's exact full contract — pairs, counts,
    sizes, jaccard — on random corpora across thresholds, including
    the ceil/floor boundary cases of the prefix/length/positional
    filters that a fixed corpus cannot sweep."""
    import numpy as np

    from myfitnesspaw_spark.operators.dedup import (
        jaccard_pairs_prefix,
        jaccard_pairs_prefix_arrays,
        shingle_arrays,
        shingle_sets,
    )

    rng = np.random.RandomState(2026)
    vocab = ["alpha", "beta", "gamma", "delta", "echo", "foxtrot", "golf"]
    for trial, threshold in enumerate([0.3, 0.5, 0.8]):
        n_base = int(rng.randint(5, 9))
        texts = [
            [
                vocab[int(k)]
                for k in rng.randint(0, len(vocab), int(rng.randint(5, 10)))
            ]
            for _ in range(n_base)
        ]
        for src in range(n_base):
            kind = int(rng.randint(0, 3))
            mut = list(texts[src])
            if kind == 0 and mut:
                mut[int(rng.randint(0, len(mut)))] = vocab[
                    int(rng.randint(0, len(vocab)))
                ]
            elif kind == 1:
                mut.append(vocab[int(rng.randint(0, len(vocab)))])
            texts.append(mut)
        # A doc too short to shingle (empty array row in the array
        # form, absent entirely in the exploded form) must not differ.
        texts.append(["alpha"])
        rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        key = lambda r: (
            r["id_a"], r["id_b"], r["n_shared"], r["n_a"], r["n_b"],
            round(r["jaccard"], 12),
        )
        exploded = {
            key(r)
            for r in jaccard_pairs_prefix(
                shingle_sets(docs, "doc_id", "text", 3), "doc_id", threshold
            ).collect()
        }
        arrays = {
            key(r)
            for r in jaccard_pairs_prefix_arrays(
                shingle_arrays(docs, "doc_id", "text", 3), "doc_id", threshold
            ).collect()
        }
        assert arrays == exploded, f"trial {trial} t={threshold}"
        assert exploded, f"degenerate trial t={threshold}: no pairs"
