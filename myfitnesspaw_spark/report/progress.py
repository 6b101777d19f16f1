"""Report layer (SURVEY.md §2.8, R1-R5): driver-side presentation over
a collected progress-report result.

The reference builds a ``ProgressReport`` from the Q1 rows — filters
NULL-deficit days, guards on freshness, slices the last N rows, derives
stacked-bar chart segments, and renders an HTML email
(`/root/reference/myfitnesspaw/types.py:55-201`, `tasks.py:705-750`).
All of that is post-``collect()`` presentation: row counts are bounded
by the report window, so it belongs on the driver, not in the engine.
Rendering is dependency-free string templating (the reference's jinja2
isn't guaranteed here); matplotlib-style chart PNGs are represented by
their computed segments, which is the testable part.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, timedelta

#: Palette roles, as in the reference's ``styles.py`` (values differ;
#: the selection LOGIC — negative deficit flips the palette — is the
#: load-bearing behavior, `types.py:136-157`).
PALETTE_DEFAULT = {"done": "#4caf50", "today": "#2196f3", "remaining": "#e0e0e0"}
PALETTE_NEGATIVE = {"done": "#4caf50", "today": "#f44336", "remaining": "#e0e0e0"}


def prepare_table(
    rows: list[tuple],
    deficit_idx: int,
    date_idx: int,
    num_rows: int = 7,
    today: date | None = None,
) -> list[tuple]:
    """R1: drop NULL-deficit rows, freshness-guard, tail-N.

    Mirrors ``ProgressReport._prepare_nutrition_table``
    (`types.py:192-201`): rows whose deficit is NULL are dropped; if
    the newest surviving row is not yesterday, emit NOTHING (a stale
    scrape must not render as current); otherwise keep the last
    ``num_rows`` rows in ascending date order.
    """
    kept = [r for r in rows if r[deficit_idx] is not None]
    kept.sort(key=lambda r: r[date_idx])
    if not kept:
        return []
    ref_today = today or date.today()
    if kept[-1][date_idx] != ref_today - timedelta(days=1):
        return []
    return kept[-num_rows:]


def chart_segments(
    total_so_far: int, today_delta: int, end_goal: int
) -> tuple[list[tuple[str, int]], dict[str, str]]:
    """R2: stacked-bar segments (done / today's ± / remaining) vs the
    end goal, with the negative-branch palette flip
    (`types.py:129-190`).

    Returns ``(segments, palette)`` where segments are cumulative-safe
    non-negative widths in goal units.
    """
    if today_delta >= 0:
        done = max(total_so_far - today_delta, 0)
        segments = [
            ("done", done),
            ("today", today_delta),
            ("remaining", max(end_goal - done - today_delta, 0)),
        ]
        return segments, PALETTE_DEFAULT
    # Negative day: today's segment renders as a give-back slice and
    # the palette switches (`types.py:142-157`).
    done = max(total_so_far, 0)
    segments = [
        ("done", done),
        ("today", abs(today_delta)),
        ("remaining", max(end_goal - done - abs(today_delta), 0)),
    ]
    return segments, PALETTE_NEGATIVE


@dataclass
class ProgressReport:
    """R3/R5: the assembled template context (`types.py:87-127`)."""

    username: str
    end_goal: int
    rows: list[tuple]
    columns: list[str]
    deficit_idx: int
    date_idx: int
    total_idx: int
    num_rows: int = 7
    today: date | None = None
    table: list[tuple] = field(init=False)

    def __post_init__(self) -> None:
        self.table = prepare_table(
            self.rows, self.deficit_idx, self.date_idx, self.num_rows, self.today
        )

    @property
    def is_fresh(self) -> bool:
        return bool(self.table)

    @property
    def day_number(self) -> int | None:
        return len([r for r in self.rows if r[self.deficit_idx] is not None]) or None

    def context(self) -> dict:
        last = self.table[-1] if self.table else None
        total = int(last[self.total_idx]) if last else 0
        today_delta = int(last[self.deficit_idx]) if last else 0
        segments, palette = chart_segments(total, today_delta, self.end_goal)
        return {
            "user": self.username.capitalize(),
            "end_goal": self.end_goal,
            "columns": self.columns,
            "table": self.table,
            "segments": segments,
            "palette": palette,
            "fresh": self.is_fresh,
        }


def render_html_jinja(
    report: ProgressReport,
    chart_cid: str | None = None,
    style: dict | None = None,
) -> str:
    """R4 full parity: jinja2 template-inheritance rendering.

    The reference renders ``mfp_progress_report.jinja2`` extending
    ``lisko_report_base.jinja2`` with ``data``/``style`` context dicts
    (`/root/reference/myfitnesspaw/tasks.py:720-729`,
    `types.py:87-127`); this renders the engine's own inheritance pair
    under ``report/templates/``.  ``chart_cid`` switches the chart slot
    to an inline ``cid:`` image (pair with an
    :class:`myfitnesspaw_spark.report.email.Attachment` carrying the
    same content id).  Raises ImportError where jinja2 is absent —
    callers fall back to :func:`render_html`.
    """
    from pathlib import Path

    from jinja2 import Environment, FileSystemLoader, select_autoescape

    env = Environment(
        loader=FileSystemLoader(Path(__file__).parent / "templates"),
        autoescape=select_autoescape(["html", "j2"]),
    )
    ctx = report.context()
    if not ctx["fresh"]:
        return "<html><body><p>No fresh data — report skipped.</p></body></html>"
    data = {
        "title": f"{ctx['user']} — progress",
        "user": ctx["user"],
        "end_goal": ctx["end_goal"],
        "columns": ctx["columns"],
        "table": ctx["table"],
        "segments": ctx["segments"],
        "palette": ctx["palette"],
        "chart_cid": chart_cid,
        "report_name": "Progress Report",
    }
    return env.get_template("progress_report.html.j2").render(
        data=data, style=style or {}
    )


def render_html(report: ProgressReport) -> str:
    """R4/K8: dependency-free HTML rendering of the report context
    (the reference's jinja2 template, `tasks.py:720-729`, reduced to
    stdlib string building so it runs anywhere).  Where jinja2 is
    installed, :func:`render_html_jinja` provides the
    template-inheritance form."""
    ctx = report.context()
    if not ctx["fresh"]:
        return "<html><body><p>No fresh data — report skipped.</p></body></html>"
    head = "".join(f"<th>{c}</th>" for c in ctx["columns"])
    body = "".join(
        "<tr>" + "".join(f"<td>{v}</td>" for v in row) + "</tr>" for row in ctx["table"]
    )
    bar = "".join(
        f'<span style="background:{ctx["palette"][name]};'
        f'display:inline-block;width:{max(width, 0)}px">&nbsp;</span>'
        for name, width in ctx["segments"]
    )
    return (
        f"<html><body><h1>{ctx['user']} — progress</h1>"
        f"<div>{bar}</div>"
        f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
        f"</body></html>"
    )
