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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from myfitnesspaw_spark.checkpoints import materialize_instance_sized
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


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the two norms PRECOMPUTED per row (r20, guide
    §2.3 "narrower/ cheaper per-pair work"): a pair stage that joins N
    rows into P ≫ N pairs evaluates ``_norm`` 2P times when it is
    inlined in :func:`cosine`, but only N times when projected on each
    side before the join.  The division sees the SAME doubles (same
    fold over the same floats), so the rounded result is bit-identical
    — only where the norm fold runs changes."""
    return F.round(_dot(a, b) / (na * nb), COS_DECIMALS)


def _once(col: Column, alias: str) -> Column:
    """Materialize ``col`` through a Generate barrier so a filter on the
    aliased output CANNOT be pushed below it into a join condition.
    Catalyst rewrites ``Filter(Project(Join))`` into a join condition
    when the predicate references both sides; for an expensive
    interpreted expression (a cosine fold) that means evaluating it
    TWICE per pair — once in the join loop, once in the output
    projection (the guide §4.4 duplicate-evaluation trap, JVM edition).
    ``explode(array(col))`` is one row in / one row out and pins the
    evaluation above the join."""
    return F.explode(F.array(col)).alias(alias)


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
    # Norms are projected per ROW before the pair join (r20): the
    # brute-force join scores |Q|·|C| pairs, and the inlined form paid
    # both norm folds per pair instead of once per row.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos"),
        )
    )
    return topk_per_key(
        scored, ["query_id"], [F.col("cos").desc(), F.col("neighbor_id").asc()], k
    ).select("query_id", "neighbor_id", "rank", "cos")


def _lit_vec(vec: list[float]) -> Column:
    """A literal double array — the broadcast form of one centroid."""
    return F.array(*[F.lit(float(x)) for x in vec])


def _py_norm(vec: list[float]) -> float:
    """Python twin of ``_norm``: sequential double fold then sqrt —
    bit-identical to the engines' evaluation of the same centroid."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _centroid_scores(
    vec_col: str, centroids: list[tuple[int, list[float]]]
) -> Column:
    """``array<struct<cos, ncid>>`` of the row vector scored against
    every centroid, as ONE ``transform`` over a 2-D literal.

    Expression-tree size is the scale trap here, not row work: K
    centroids × D dims × a full cosine each (the naive build) is a
    100k-node tree that stalls the DRIVER in analysis/codegen minutes
    before the first task runs.  One lambda over a literal
    array-of-arrays keeps the tree O(K·D) flat literals + O(1) logic,
    and the row norm is computed once instead of once per centroid —
    centroid norms are Python-precomputed constants (``_py_norm`` is
    fold-order-identical, so rounding still matches the oracle).
    """
    cents = sorted(centroids)
    cvecs = F.array(*[_lit_vec(v) for _, v in cents])
    cnorms = F.array(*[F.lit(_py_norm(v)) for _, v in cents])
    cids = F.array(*[F.lit(int(cid)) for cid, _ in cents])
    nv = _norm(F.col(vec_col))
    return F.zip_with(
        F.zip_with(cvecs, cnorms, lambda cv, cn: F.struct(cv.alias("v"), cn.alias("n"))),
        cids,
        lambda c, cid: F.struct(
            F.round(_dot(F.col(vec_col), c["v"]) / (nv * c["n"]), COS_DECIMALS).alias("cos"),
            (-cid).alias("ncid"),
        ),
    )


def ivf_coarse_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    out_col: str = "cid",
) -> DataFrame:
    """IVF coarse quantization: nearest-centroid id per row, computed as
    a PURE PROJECTION — the quantizer (a handful of KB even at K=4096)
    rides into every task as literals, so assignment over a 100 TB corpus
    is embarrassingly parallel with zero shuffle.

    Ties on (rounded) cosine break toward the LOWER centroid id:
    ``array_max`` picks the lexicographically greatest ``(cos, -cid)``
    struct, mirroring the oracle's ``ORDER BY cos DESC, cid ASC``.
    """
    scored = _centroid_scores(vec_col, centroids)
    return df.withColumn(out_col, (-F.array_max(scored)["ncid"]).cast("int"))


def ivf_probe_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    n_probe: int,
    out_col: str = "cid",
) -> DataFrame:
    """For each query row emit its ``n_probe`` nearest centroid ids
    (one output row per probe) — row-local sort of K scored structs,
    then a slice; no shuffle."""
    scored = F.sort_array(_centroid_scores(vec_col, centroids), asc=False)
    return (
        df.withColumn("_probe", F.explode(F.slice(scored, 1, n_probe)))
        .withColumn(out_col, (-F.col("_probe.ncid")).cast("int"))
        .drop("_probe")
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    n_probe: int,
    k: int,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are searched only inside the
    ``n_probe`` clusters nearest each query — cost drops from O(N·Q) to
    O(N·Q·n_probe/K).  This is the scale path next to the brute-force
    ``cosine_topk`` baseline: at 10B vectors the coarse assignment is a
    shuffle-free projection, the probe table is tiny (broadcast), and the
    only shuffle is the final top-k on query_id.

    Returns ``(query_id, neighbor_id, rank, cos)`` like ``cosine_topk``;
    each corpus vector lives in exactly one cluster, so no dedup needed.
    """
    # Per-row norms ride the assign/probe projections (r20) so the
    # probe-pair scoring pays one dot fold per pair, not three folds.
    assigned = ivf_coarse_assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            _norm(F.col(vec_col)).alias("__cn"),
        ),
        "cv",
        centroids,
    )
    probes = ivf_probe_centroids(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            _norm(F.col(vec_col)).alias("__qn"),
        ),
        "qv",
        centroids,
        n_probe,
    )
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos"),
        )
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
    salt_groups: int = 1,
    max_bucket: int | None = None,
    checkpoint_base: bool = False,
) -> DataFrame:
    """IVF-style near-dup: pairs within the same coarse bucket whose
    cosine ≥ ``threshold``.  Returns ``(id_a, id_b, bucket, cos)``
    with ``id_a < id_b``.

    Skew control — a self-join on the bucket key does Σ|bucket|²/2
    comparisons, and at 100 TB one hot bucket turns that into a single
    straggler task.  Two independent knobs:

    * ``salt_groups`` (exact): decompose each bucket's pair space into
      G(G+1)/2 salt-cells (Suri & Vassilvitskii's triangle-count
      partitioning).  Every row gets ``salt = hash(id) % G`` and is
      replicated into the G cells ``{min(salt,t),max(salt,t)}``; a
      pair joins ONLY in its canonical cell ``{min,max}`` of the two
      salts, so output is duplicate-free and result-identical to the
      unsalted join while the hot bucket's quadratic work spreads over
      G(G+1)/2 parallel tasks at G× row replication.  G=1 is the
      plain join.

    * ``max_bucket`` (bounded approximation): deterministically keep
      only the first ``m`` rows per bucket (ordered by ``hash(id)``,
      id tiebreak), capping worst-case candidates at m·(m-1)/2 per
      bucket.  Pairs beyond the cap are dropped — the documented
      trade when an adversarial bucket would otherwise dominate the
      job.  ``None`` (default) keeps exact semantics.
    """
    # Per-row norm before the pair join (r20): the bucket self-join
    # evaluates Σ|bucket|²/2 pairs; the inlined cosine paid both norm
    # folds per PAIR, this pays them once per ROW.
    base = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.col(bucket_col).alias("bucket"),
        _norm(F.col(vec_col)).alias("__nv"),
    )
    if max_bucket is not None:
        w = Window.partitionBy("bucket").orderBy(F.hash("vid").asc(), F.col("vid").asc())
        base = (
            base.withColumn("__bn", F.row_number().over(w))
            .where(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    if checkpoint_base:
        # Opt-in single-extraction barrier (r20 wave 5): the pair
        # self-join reads ``base`` from BOTH sides, and with one side
        # behind a BroadcastExchange no ReusedExchange can dedup them —
        # a caller whose input lineage is an un-materialized scan (or
        # scan + union) otherwise re-runs it, plus the per-row norm
        # fold, once per side.  Callers that already checkpoint their
        # assignment upstream (semantic_dedup/_kpp) leave this off:
        # there the residual duplicate work is one cheap norm fold over
        # an ExistingRDD read.
        base = materialize_instance_sized(base)

    if salt_groups <= 1:
        a = base.select(
            F.col("vid").alias("id_a"),
            F.col("vec").alias("va"),
            F.col("__nv").alias("__na"),
            "bucket",
        )
        b = base.select(
            F.col("vid").alias("id_b"),
            F.col("vec").alias("vb"),
            F.col("__nv").alias("__nb"),
            "bucket",
        )
        joined = a.join(b, "bucket")
    else:
        from myfitnesspaw_spark.operators.salting import (
            CELL_COL,
            SALT_COL,
            canonical_cell_pred,
            with_salt_cells,
        )

        cells = with_salt_cells(base, "vid", salt_groups)
        a = cells.select(
            F.col("vid").alias("id_a"),
            F.col("vec").alias("va"),
            F.col("__nv").alias("__na"),
            F.col(SALT_COL).alias("__salt_a"),
            "bucket",
            CELL_COL,
        )
        b = cells.select(
            F.col("vid").alias("id_b"),
            F.col("vec").alias("vb"),
            F.col("__nv").alias("__nb"),
            F.col(SALT_COL).alias("__salt_b"),
            "bucket",
            CELL_COL,
        )
        # Canonical-cell filter: each unordered pair matches in exactly
        # one of its shared cells, so no post-join distinct is needed.
        joined = a.join(b, ["bucket", CELL_COL]).where(canonical_cell_pred())

    # Generate barrier (_once): without it the threshold filter is
    # pushed into the join condition and the cosine fold is evaluated
    # twice per pair (A/B-measured ~1.6× slower at sf0.1).
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "bucket",
            _once(
                cosine_prenormed(
                    F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")
                ),
                "cos",
            ),
        )
        .where(F.col("cos") >= threshold)
    )


def srp_signature_col(int_vec: Column, signs: list[list[int]]) -> Column:
    """Signed-random-projection signature of an integer vector column
    as a long: bit j = [Σ_d int_vec[d]·signs[j][d] ≥ 0].

    ``signs`` is an NB×D ±1 matrix embedded as ONE 2-D literal (same
    flat-tree discipline as ``_centroid_scores`` — NB separate folds
    would build an O(NB·D) expression tree per reference).  Exact
    integer arithmetic end to end, so the signature is reproducible
    cross-engine bit for bit.

    PERF: ``int_vec`` MUST be a materialized column attribute, not an
    inline expression — expressions captured by the transform lambda
    re-evaluate once per hyperplane (NB×).
    """
    signs2d = F.array(*[F.array(*[F.lit(int(s)) for s in row]) for row in signs])
    bits = F.transform(
        signs2d,
        lambda srow: F.when(
            F.aggregate(
                F.zip_with(int_vec, srow, lambda a, s: a * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(len(signs))])
    return F.aggregate(
        F.zip_with(bits, powers, lambda b, p: b * p),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def srp_lsh_pairs(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    signs: list[list[int]],
    band_bits: int,
    threshold: float,
    scale: int = 1_000_000,
    salt_groups: int = 1,
) -> DataFrame:
    """Cosine near-duplicate pairs via signed-random-projection LSH —
    the embedding-side sibling of SimHash (which bands token hashes).

    Pipeline: float vector → exact integer micro-units (truncation,
    both engines agree) → NB-bit SRP signature (one shuffle-free
    projection) → signature split into NB/band_bits bands → band-key
    self-join for candidates (the ONLY shuffle that grows with N;
    identical/near vectors agree on whole bands with high
    probability) → exact cosine verify on candidates only.  Never
    compares all pairs; band keys are content-derived and uniform
    under the hyperplane family, so the shuffle has no planted skew.

    A pair colliding in k bands would surface k times; instead of a
    ``distinct`` (a full extra shuffle of the candidate set), each row
    carries its 8-byte full signature through the band join and a pair
    is kept ONLY at its lowest colliding band — a row-local predicate
    (both signatures are present post-join), so candidates are unique
    by construction and the dedup shuffle disappears at any scale.

    ``salt_groups`` > 1 applies the exact salt-cell decomposition
    (``operators/salting.py``) under the band join: a DEGENERATE band
    (thousands of identical vectors sharing one (band, bval) key —
    uniform hyperplanes spread random vectors, but true duplicate
    swarms all land together) would otherwise emit m² candidate rows
    in one task.  Result-identical at any G.

    Returns ``(id_a, id_b, cos)`` with ``id_a < id_b``, each pair once.
    """
    from myfitnesspaw_spark.operators.salting import (
        canonical_cell_pred,
        with_salt_cells,
    )
    nb = len(signs)
    n_bands = nb // band_bits
    base = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    # Checkpointed (r20 wave 3, mirroring the minhash/simhash wave-2
    # fix): the band self-join reads this table from BOTH sides, and
    # with one side a BroadcastExchange no ReusedExchange can dedup
    # them — the NB-hyperplane signature fold (the dominant per-row
    # cost) ran TWICE over the corpus, and the verify sides re-scanned
    # the source twice more (plan: 8 Scans total).  One (vid, vec, sig)
    # row per doc, so the materialization is a short job against a
    # halved projection pass; the verify sides read the same table.
    sig = (
        base.withColumn(
            "iv",
            F.transform(
                F.col("vec"), lambda x: (x.cast("double") * scale).cast("long")
            ),
        )
        .withColumn("sig", srp_signature_col(F.col("iv"), signs))
        .drop("iv")
        .localCheckpoint()
    )
    bands = sig.select(
        "vid",
        "sig",
        F.expr(
            f"explode(transform(sequence(0, {n_bands - 1}), b -> struct("
            f"b AS band, pmod(sig DIV CAST(pow(2, {band_bits} * b) AS BIGINT), "
            f"{1 << band_bits}) AS bval)))"
        ).alias("bk"),
    ).select("vid", "sig", "bk.band", "bk.bval")
    # First-collision-band predicate: every band below the joined one
    # must DISAGREE between the two signatures.  sig < 2^NB so the
    # double-typed pow/divide is exact.
    def _band_of(sig_col: Column, b: Column) -> Column:
        return F.pmod(
            F.floor(
                sig_col / F.pow(F.lit(2.0), (b * band_bits).cast("double"))
            ).cast("long"),
            F.lit(1 << band_bits),
        )

    # Self-contained predicate: band 0 short-circuits to TRUE before
    # the sequence is built — sequence(0, band-1) with band == 0 is the
    # DESCENDING two-element [0, -1] (inferred-step hazard, SKILL.md),
    # which would evaluate _band_of at b = -1 with a fractional
    # pow(2, -band_bits) divisor.
    first_collision = F.when(F.col("a.band") == 0, F.lit(True)).otherwise(
        F.forall(
            F.sequence(F.lit(0), F.greatest(F.col("a.band") - 1, F.lit(0))),
            lambda b: _band_of(F.col("a.sig"), b) != _band_of(F.col("b.sig"), b),
        )
    )
    if salt_groups > 1:
        cells = with_salt_cells(bands, "vid", salt_groups)
        join_cond = (
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.vid") < F.col("b.vid"))
            & canonical_cell_pred("a.__salt", "b.__salt", cell="a.__cell")
        )
        cand = (
            cells.alias("a")
            .join(cells.alias("b"), join_cond)
            .where(first_collision)
            .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        )
    else:
        cand = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bval") == F.col("b.bval"))
                & (F.col("a.vid") < F.col("b.vid")),
            )
            .where(first_collision)
            .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        )
    # Generate barrier on the cosine (r20): without it the threshold
    # filter lands in the second join's condition and the fold runs
    # twice per candidate pair.  Norms stay INLINE here (unlike
    # bucket_near_dup): the LSH candidate set is far smaller than the
    # corpus, so per-pair norm folds are cheaper than projecting norms
    # onto every corpus row of both verify sides.
    va = sig.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"))
    vb = sig.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            _once(cosine(F.col("va"), F.col("vb")), "cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _sq_l2(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² over two integer vectors — exact integer L2²."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _micro_int_vec(
    df: DataFrame, id_col: str, vec_col: str, name: str, scale: int
) -> DataFrame:
    """``(name, iv)`` with the float vector quantized to truncated
    micro-ints — the ONE quantization both ``pq_ann_topk`` and its
    ground truth ``l2_topk`` apply, hoisted so the recall eval's
    "codebook loss only, never float slack" contract cannot be broken
    by the two paths drifting apart."""
    return df.withColumn(
        "iv",
        F.transform(
            F.col(vec_col), lambda x: (x.cast("double") * scale).cast("long")
        ),
    ).select(F.col(id_col).alias(name), "iv")


def l2_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """Brute-force EXACT top-k by integer L2² — the ground truth the
    PQ/ADC path approximates, on the same micro-int quantization
    (``trunc(x·scale)``) so the only difference from ``pq_ann_topk``
    is the codebook loss being measured, never float slack.

    Scale: identical topology to ``cosine_topk`` — broadcast query
    vectors against the sharded corpus, one top-k shuffle on
    query_id.  Recall evaluation always pays exact search, which is
    why it runs on a sampled query set, not the corpus.

    Returns ``(query_id, neighbor_id, rank, dist)``, rank by ascending
    exact distance (neighbor id tiebreak).
    """
    corp = _micro_int_vec(corpus, id_col, vec_col, "neighbor_id", scale)
    q = _micro_int_vec(queries, id_col, vec_col, "query_id", scale).select(
        "query_id", F.col("iv").alias("qv")
    )
    scored = corp.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        _sq_l2(F.col("iv"), F.col("qv")).alias("dist"),
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.col("dist").asc(), F.col("neighbor_id").asc()],
        k,
    ).select("query_id", "neighbor_id", "rank", "dist")


def pq_encode(
    df: DataFrame,
    int_vec_col: str,
    codebooks: list[list[list[int]]],
    out_col: str = "codes",
) -> DataFrame:
    """Product-quantization encoding: split the D-dim integer vector
    into M = len(codebooks) subvectors and store, per subspace, the id
    of the nearest codebook entry (exact integer L2², ties toward the
    lower code).  The codebook (M×K×D/M ints — a handful of KB even at
    K=256) rides into every task as ONE 3-D literal, so encoding a
    100 TB corpus is a shuffle-free projection, exactly like IVF
    coarse assignment.  Output column: ``array<int>`` of M codes —
    the compressed representation an ADC scan reads instead of the
    full vector (8 bytes vs 256 here; 64× at production D).
    """
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    cb3d = F.array(
        *[
            F.array(*[F.array(*[F.lit(int(v)) for v in code]) for code in book])
            for book in codebooks
        ]
    )
    iv = F.col(int_vec_col)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mm: F.array_min(
            F.zip_with(
                F.element_at(cb3d, mm + 1),
                F.sequence(F.lit(0), F.lit(len(codebooks[0]) - 1)),
                lambda cv, c: F.struct(
                    _sq_l2(F.slice(iv, mm * sub_d + 1, F.lit(sub_d)), cv).alias(
                        "dist"
                    ),
                    c.alias("code"),
                ),
            )
        )["code"],
    )
    return df.withColumn(out_col, codes)


def pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[int]]],
    k: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """PQ/ADC approximate top-k: the corpus is scanned in COMPRESSED
    form (M one-byte codes per vector), each query precomputes its
    M×K lookup table of subspace distances row-locally, and the scan
    cost per (query, vector) drops from D multiplies to M array
    lookups — the standard memory-bound ANN shape (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search").

    Scale: queries (with their LUTs) broadcast against the sharded
    encoded corpus — identical topology to ``cosine_topk``, but the
    corpus side streams codes instead of vectors, so the working set
    shrinks by the compression ratio.  The only shuffle is the final
    top-k on query_id.  Exact integer arithmetic end to end.

    Returns ``(query_id, neighbor_id, rank, approx_dist)``, rank by
    ascending ADC distance (neighbor id tiebreak).
    """
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    cb3d = F.array(
        *[
            F.array(*[F.array(*[F.lit(int(v)) for v in code]) for code in book])
            for book in codebooks
        ]
    )

    enc = pq_encode(
        _micro_int_vec(corpus, id_col, vec_col, "neighbor_id", scale),
        "iv",
        codebooks,
    ).select("neighbor_id", "codes")
    lut = (
        _micro_int_vec(queries, id_col, vec_col, "query_id", scale)
        .withColumn(
            "lut",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda mm: F.transform(
                    F.element_at(cb3d, mm + 1),
                    lambda cv: _sq_l2(
                        F.slice(F.col("iv"), mm * sub_d + 1, F.lit(sub_d)), cv
                    ),
                ),
            ),
        )
        .select("query_id", "lut")
    )
    scored = (
        enc.join(F.broadcast(lut), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("lut"),
                    lambda code, lrow: F.element_at(lrow, code + 1),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("approx_dist"),
        )
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.col("approx_dist").asc(), F.col("neighbor_id").asc()],
        k,
    ).select("query_id", "neighbor_id", "rank", "approx_dist")
