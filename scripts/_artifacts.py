"""Single source of truth for what counts as a round artifact in git
hygiene checks — imported by BOTH bench.py's best-effort stderr
warning and scripts/round_close.py's hard gate, so the two can never
drift on the artifact set (they are the same policy)."""

from __future__ import annotations

import re

ARTIFACT_RE = re.compile(
    r"(CORRECTNESS_r\d+\.json|BENCH_r\d+\.json|"
    r"bench_full\.json|BASELINE_BENCH\.json)$"
)


def porcelain_names(line: str) -> list[str]:
    """Every path on a ``git status --porcelain`` v1 line.  Handles
    rename/copy lines (``R  old -> new`` — BOTH sides are returned,
    so a renamed-but-uncommitted artifact still matches) and quoted
    paths (git quotes names with special characters)."""
    names = []
    for part in line[3:].split(" -> "):
        part = part.strip()
        if len(part) >= 2 and part.startswith('"') and part.endswith('"'):
            part = part[1:-1]
        if part:
            names.append(part)
    return names


def is_artifact_line(line: str) -> bool:
    return any(ARTIFACT_RE.match(n) for n in porcelain_names(line))
