"""Lint-style enforcement of the broadcast-hint policy (SURVEY §4.1,
VERDICT r6 #7): a hard ``F.broadcast()`` is allowed ONLY on a side
whose cardinality is bounded by CONSTRUCTION — a literal table, a
1-row/top-K aggregate, a fixed dimension (nation/region), a codebook/
centroid/anchor batch — never on a scale-proportional table.  Scale-
proportional sides must carry no hint; stats/AQE broadcast them while
small (pinned by test_dehinted_dims_still_broadcast_by_stats).

Every existing site is allowlisted below WITH its boundedness reason;
a new ``F.broadcast`` anywhere in the package fails this test until
it is reviewed and added here with a construction-bound argument.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "myfitnesspaw_spark")

# (relative file, enclosing function) -> (n_sites, boundedness reason)
ALLOWED = {
    ("plans/io_queries.py", "csv_roundtrip_nation"): (1, "nation dim: 25 rows by TPC-H construction"),
    ("plans/curation_queries.py", "tf_idf_topk"): (1, "n_docs: 1-row corpus-count aggregate"),
    ("plans/curation_queries.py", "bm25_rank"): (2, "query-term literals + 1-row totals aggregate"),
    ("plans/curation_queries.py", "iqr_outlier_docs"): (1, "1-row quantile-bounds aggregate"),
    ("plans/pipeline_queries.py", "mixture_sample"): (2, "1-row total + per-source quota table (|sources| rows)"),
    ("plans/pipeline_queries.py", "one_batch"): (2, "anchor batch: LIMIT-bounded slice"),
    ("plans/pipeline_queries.py", "corpus_build_pipeline"): (2, "1-row total + per-source quota table"),
    ("plans/pipeline_queries.py", "mmr_rerank"): (1, "query vectors: sampled probe set (corpus/MMR_QUERY_MOD anchors)"),
    ("plans/sampling_queries.py", "cms_report_from_counts"): (2, "CMS sketch rows (depth*width literals) + 1-row total"),
    ("plans/text_queries.py", "lang_id"): (1, "language profile: |langs|*|ngrams| literal-bounded"),
    ("plans/olap_queries.py", "regional_revenue"): (2, "nation/region dims: fixed 25/5 rows"),
    ("plans/olap_queries.py", "brand_nation_revenue"): (1, "nation dim"),
    ("plans/olap_queries.py", "price_band_join"): (1, "literal band table"),
    ("plans/olap_queries.py", "q7_volume_shipping"): (2, "nation dim, twice-aliased"),
    ("plans/olap_queries.py", "q8_market_share"): (3, "nation dims + region filter"),
    ("plans/olap_queries.py", "q22_dormant_customers"): (1, "1-row avg-balance aggregate"),
    ("operators/incremental.py", "point_lookup"): (1, "lookup key set: caller-bounded probe list"),
    ("operators/clustering.py", "assign_clusters"): (1, "centroid table: K rows"),
    ("operators/similarity.py", "cosine_topk"): (1, "query vectors: caller-bounded probe set"),
    ("operators/similarity.py", "l2_topk"): (1, "query vectors: caller-bounded probe set (recall-eval sample)"),
    ("operators/similarity.py", "ivf_ann_topk"): (1, "probe-cell assignments: |queries|*nprobe rows"),
    ("operators/similarity.py", "pq_ann_topk"): (1, "ADC lookup table: M*K literals"),
}


def _broadcast_sites():
    sites = []
    for dirpath, _, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, PKG)
            tree = ast.parse(open(path).read())

            class V(ast.NodeVisitor):
                def __init__(self):
                    self.stack = []

                def visit_FunctionDef(self, n):
                    self.stack.append(n.name)
                    self.generic_visit(n)
                    self.stack.pop()

                visit_AsyncFunctionDef = visit_FunctionDef

                def visit_Call(self, n):
                    fn = n.func
                    if isinstance(fn, ast.Attribute) and fn.attr == "broadcast":
                        ctx = self.stack[-1] if self.stack else "<module>"
                        arg = ast.unparse(n.args[0]) if n.args else ""
                        sites.append((rel, ctx, arg))
                    self.generic_visit(n)

            V().visit(tree)
    return sites


def test_broadcast_sites_are_allowlisted():
    sites = _broadcast_sites()
    counts: dict[tuple[str, str], int] = {}
    for rel, ctx, _ in sites:
        counts[(rel, ctx)] = counts.get((rel, ctx), 0) + 1

    extra = {k: v for k, v in counts.items() if k not in ALLOWED}
    assert not extra, (
        f"New F.broadcast site(s) {extra}: a hard hint is only allowed on "
        "a construction-bounded side — review against SURVEY §4.1 and add "
        "to ALLOWED with the boundedness reason."
    )
    changed = {
        k: (v, ALLOWED[k][0]) for k, v in counts.items() if v != ALLOWED[k][0]
    }
    assert not changed, f"Broadcast site count changed (got, allowed): {changed}"
    # Allowlist entries whose code was removed should be pruned.
    gone = [k for k in ALLOWED if k not in counts]
    assert not gone, f"Stale ALLOWED entries: {gone}"


def test_broadcast_never_wraps_raw_table_scan():
    """The worst failure mode at 100 TB: F.broadcast(load_table(...))
    pins a scale-proportional scan on every executor.  No argument of
    any broadcast call may be a direct load_table / spark.read /
    spark.table lineage root."""
    for rel, ctx, arg in _broadcast_sites():
        low = arg.replace(" ", "")
        for banned in ("load_table(", "spark.read", "spark.table(", ".read.parquet("):
            assert banned not in low, (
                f"{rel}::{ctx} broadcasts a raw table scan ({arg!r}) — "
                "scale-proportional sides must stay un-hinted (SURVEY §4.1)"
            )
