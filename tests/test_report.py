"""Report-layer unit tests (R1-R5) — inline expected values, like the
reference's `tests/myfitnesspaw/test_tasks.py` style."""

from __future__ import annotations

from datetime import date

from myfitnesspaw_spark.report import (
    PALETTE_DEFAULT,
    PALETTE_NEGATIVE,
    ProgressReport,
    chart_segments,
    prepare_table,
    render_html,
)

TODAY = date(2024, 2, 10)

# rows: (date, deficit, total)
ROWS = [
    (date(2024, 2, 5), 100, 100),
    (date(2024, 2, 6), None, 100),  # no-meals day → dropped (types.py:196)
    (date(2024, 2, 7), 250, 350),
    (date(2024, 2, 8), -50, 300),
    (date(2024, 2, 9), 200, 500),  # yesterday → fresh
]


def test_prepare_table_drops_nulls_and_tails():
    out = prepare_table(ROWS, deficit_idx=1, date_idx=0, num_rows=3, today=TODAY)
    assert out == [
        (date(2024, 2, 7), 250, 350),
        (date(2024, 2, 8), -50, 300),
        (date(2024, 2, 9), 200, 500),
    ]


def test_prepare_table_freshness_guard():
    stale = [r for r in ROWS if r[0] < date(2024, 2, 9)]
    assert prepare_table(stale, 1, 0, num_rows=3, today=TODAY) == []


def test_prepare_table_empty():
    assert prepare_table([], 1, 0, today=TODAY) == []


def test_chart_segments_positive_day():
    segments, palette = chart_segments(total_so_far=500, today_delta=200, end_goal=1000)
    assert segments == [("done", 300), ("today", 200), ("remaining", 500)]
    assert palette is PALETTE_DEFAULT


def test_chart_segments_negative_day_flips_palette():
    segments, palette = chart_segments(total_so_far=300, today_delta=-50, end_goal=1000)
    assert segments == [("done", 300), ("today", 50), ("remaining", 650)]
    assert palette is PALETTE_NEGATIVE


def _report(rows=ROWS):
    return ProgressReport(
        username="alice",
        end_goal=1000,
        rows=rows,
        columns=["date", "deficit", "total"],
        deficit_idx=1,
        date_idx=0,
        total_idx=2,
        num_rows=3,
        today=TODAY,
    )


def test_report_context():
    ctx = _report().context()
    assert ctx["user"] == "Alice"
    assert ctx["fresh"] is True
    assert len(ctx["table"]) == 3
    assert ctx["segments"] == [("done", 300), ("today", 200), ("remaining", 500)]


def test_day_number_counts_non_null_rows():
    assert _report().day_number == 4


def test_render_html_fresh_and_stale():
    html = render_html(_report())
    assert "<h1>Alice — progress</h1>" in html
    assert html.count("<tr>") == 1 + 3  # header + 3 data rows
    stale = _report(rows=[(date(2024, 2, 5), 100, 100)])
    assert "report skipped" in render_html(stale)
