"""Report every registered query's driver-certification age.

The driver certifies the FIRST 50 registrations each round
(CORRECTNESS_r{N}.json).  ROTATION INVARIANT (plans/queries.py
docstring): no query's latest green row may be more than MAX_AGE
rounds old — and no query may sit never-certified — unless it is IN
the current window awaiting refresh this round.  This script joins the registry
against every CORRECTNESS artifact and prints, per query: the latest
round with a green row, its age, and whether it sits in the current
50-entry window; it EXITS NON-ZERO when the invariant is violated
(VERDICT r6 #4), so the rotation is a decision, not an accident.

It also prints the OVERFLOW — queries that already need refresh but
did not fit in the window — which is exactly the list the next
round's rotation must front.

Usage::

    python scripts/certification_age.py [current_round]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A query older than this many rounds, sitting OUTSIDE the current
# window, violates the rotation invariant and fails the report.
# MAX_AGE=4 since r8 (VERDICT r7 #1): the arithmetic bound for a
# registry cycling through 47 effective slots per round (50-slot
# window minus 3 permanent canaries) is satisfiable up to
# 3 + 4*47 = 191 registered queries on the conservative
# recert-every-4-rounds schedule.  GROWTH FREEZE (r12, VERDICT r11
# #3): tests/test_bench_book.py::test_registry_growth_freeze_bound
# asserts the registry stays <= 191, so crossing the bound is a test
# failure decided by editing the constants here, not a surprise
# violation.  (The exact invariant — age MAX_AGE+1 is legal while
# in-window — would allow 3 + 5*47 = 238, but the conservative bound
# keeps one full round of slack for a zero-turn round like r10.)
# Never-certified out-of-window remains an instant failure, and
# age == MAX_AGE out-of-window still prints as OVERFLOW (it MUST
# front the next window); only age > MAX_AGE violates.
MAX_AGE = 4
WINDOW = 50


def green_row(row) -> bool:
    """A CORRECTNESS row counts as green only when every recorded
    dimension matched and no error is present."""
    return (
        isinstance(row, dict)
        and bool(row.get("rows_match"))
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
        and not row.get("err")
    )


def classify(
    names: list[str],
    latest_green: dict[str, int],
    current: int,
    max_age: int = MAX_AGE,
    window_size: int = WINDOW,
):
    """Pure invariant logic (unit-tested in tests/test_bench_book.py):
    returns ``(rows, never, stale, violations)`` where rows are
    ``(name, green_round, age, in_window)``, ``never`` is
    never-certified-and-out-of-window, ``stale`` (age >= max_age, out
    of window, oldest first) is exactly the overflow the NEXT round's
    window must front, and ``violations`` (never + age > max_age) is
    the non-zero-exit set.  "Stale" derives from max_age so the
    report, the overflow list, and the violation exit can never
    desynchronize if the policy constant changes."""
    window = set(names[:window_size])
    rows = []
    for name in names:
        green = latest_green.get(name)
        age = None if green is None else current - green
        rows.append((name, green, age, name in window))
    never = [r for r in rows if r[1] is None and not r[3]]
    stale = sorted(
        (r for r in rows if r[2] is not None and r[2] >= max_age and not r[3]),
        key=lambda r: -r[2],
    )
    violations = list(never) + [r for r in stale if r[2] > max_age]
    return rows, never, stale, violations


def main() -> int:
    from myfitnesspaw_spark.plans import registry

    names = list(registry.queries())
    latest_green: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if green_row(row):
                latest_green[name] = max(latest_green.get(name, 0), rnd)

    current = int(sys.argv[1]) if len(sys.argv) > 1 else (max(rounds) + 1 if rounds else 1)
    rows, never, stale, violations = classify(names, latest_green, current)
    print(
        f"{len(rows)} registered; {min(WINDOW, len(rows))} in the "
        f"r{current} window"
    )
    print(f"never driver-certified AND out of window: {len(never)}")
    for name, *_ in never:
        print(f"  NEVER  {name}")
    # The stale set IS the overflow the next round's window must
    # front: due for refresh (age >= MAX_AGE) but not in this window.
    print(
        f"certified >={MAX_AGE} rounds ago AND out of window "
        f"(= overflow to front in r{current + 1}): {len(stale)}"
    )
    for name, green, age, _ in stale:
        print(f"  OVERFLOW  age {age}  (r{green})  {name}")
    in_window_new = [r[0] for r in rows if r[1] is None and r[3]]
    print(f"in-window, awaiting first certification this round: {len(in_window_new)}")

    if violations:
        print(
            f"INVARIANT VIOLATED: {len(violations)} queries are "
            f"never-certified or older than {MAX_AGE} rounds while out of "
            "the window"
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
