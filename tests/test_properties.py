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
