"""Mechanize the per-round certification-window rotation.

Each round the driver certifies the FIRST 50 registrations in
``plans/queries.py`` (3 permanent canaries + 47 rotating slots), and
the rotation invariant (no query older than MAX_AGE=4 out-of-window)
leaves ZERO slack at 170 registered queries — a mis-executed rotation
forces a violation one round later.  Rounds 8–14 executed it by hand
(r14 via an ad-hoc block parse); this script makes it one command:

    python scripts/rotate_window.py <round> --check   # verify only
    python scripts/rotate_window.py <round> --write   # rewrite order

Ordering policy (exactly the hand rotation r8–r14 applied, derived
from the invariant):

1. The three canaries stay pinned at the front.
2. The rest of the window is every out-of-window query due for
   refresh (age >= MAX_AGE entering <round>, or never certified) —
   the pre-committed "front" — in prior registration order, then the
   OLDEST remaining queries oldest-first (prior order within a
   cohort) until the window holds 50.
3. Below the window marker, the remainder sorts oldest-cohort-first
   (so the next round's front is contiguous at the marker), prior
   registration order within a cohort.

``--write`` rewrites ONLY the registration order and section
comments — interleaved hand-written comments between registrations
are DISCARDED and regenerated as the canonical section comments, so
keep per-query annotations inside the registration call (docstring /
``register`` kwargs), never as free-floating comments.  The module
docstring is left in place and must still be updated by hand (it
carries the pre-commit prose the next round executes).  ``--check``
exits non-zero if the current file order differs from the computed
one — wire it into round-close to make a botched rotation a gate
failure instead of a next-round surprise.

ROUND-AWARENESS (VERDICT r14 #1 / ADVICE r14): with no explicit
round argument, ``--check`` accepts the order computed for EITHER
round ``max(CORRECTNESS)+1`` (the rotation freshly applied for the
round in flight) or round ``max(CORRECTNESS)`` as of the artifacts
that existed when that rotation was applied (the order the newest
artifact certified).  The driver drops ``CORRECTNESS_rN.json``
BEFORE the r{N+1} rotation is applied, so a strict next-round-only
check is red at every judging point by construction.  An explicit
round argument keeps the strict single-round form (used at
rotation time).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES_PY = os.path.join(REPO, "myfitnesspaw_spark", "plans", "queries.py")
CANARIES = ["progress_report", "streaming_hourly_rollup", "dedup_clusters"]
MAX_AGE = 4
WINDOW = 50

class RotationUnsatisfiable(Exception):
    """The due set no longer fits the window — invariant already lost."""


WINDOW_MARKER = (
    "# ---------------------------------------------------------------\n"
    "# --- The 50-query driver window ends here.\n"
    "# ---------------------------------------------------------------\n"
)


def parse_blocks(text: str) -> tuple[str, dict[str, str], list[str]]:
    """Split queries.py into (header, name->registration block, order).

    The header is everything through the ``registry import register``
    line (docstring + imports).  Registration blocks are matched by
    paren balance so multi-line ``register(...)(...)`` calls stay
    intact; interleaved comments are DROPPED (the writer regenerates
    section comments)."""
    lines = text.splitlines(keepends=True)
    reg_import = next(
        i for i, l in enumerate(lines)
        if l.startswith("from myfitnesspaw_spark.plans.registry import register")
    )
    header = "".join(lines[: reg_import + 1])
    blocks: dict[str, str] = {}
    order: list[str] = []
    i = reg_import + 1
    while i < len(lines):
        line = lines[i]
        if line.startswith("register("):
            m = re.match(r'register\("([^"]+)"', line)
            if m is None:
                raise ValueError(
                    f"{QUERIES_PY}:{i + 1}: cannot parse registration name "
                    f"from {line.rstrip()!r} — register() calls must open "
                    f'with their double-quoted name on the same line '
                    f"(a formatter may have wrapped it)"
                )
            name = m.group(1)
            buf = [line]
            depth = line.count("(") - line.count(")")
            i += 1
            while depth > 0:
                buf.append(lines[i])
                depth += lines[i].count("(") - lines[i].count(")")
                i += 1
            blocks[name] = "".join(buf)
            order.append(name)
        else:
            i += 1
    return header, blocks, order


def latest_green_rounds(upto: int | None = None) -> dict[str, int]:
    """Latest driver-green round per query, from every CORRECTNESS
    artifact (same green predicate as scripts/certification_age.py).

    ``upto`` restricts to artifacts from rounds <= upto — the
    rotation for round N is computed from the artifacts that exist
    when it is applied (rounds <= N-1), so a retrospective check of
    round N's order must snapshot the same way or newer artifacts
    re-age the inputs and the recomputation diverges."""
    from scripts.certification_age import green_row

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if upto is not None and rnd > upto:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if green_row(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def newest_round() -> int:
    """Round of the newest CORRECTNESS artifact (0 if none)."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    return max(rounds) if rounds else 0


def rotation_for_round(order: list[str], current: int) -> list[str]:
    """The rotation for round ``current`` as computed AT ROTATION TIME:
    from the artifacts of rounds <= current-1 only (the rotation for N
    is applied before CORRECTNESS_rN exists)."""
    return compute_rotation(order, latest_green_rounds(upto=current - 1), current)


def match_live_order(order: list[str]) -> int | None:
    """Round-aware order check: the round whose rotation the live
    order IS, or None.

    The live order is correct at every point of the round cycle if it
    equals the rotation for round ``newest_round()+1`` (freshly
    applied for the round in flight — the state between rotation and
    the next driver run) OR for round ``newest_round()`` (the order
    the newest artifact certified — the state between the driver
    dropping CORRECTNESS_rN and the r{N+1} rotation being applied).
    Anything else is a botched or skipped rotation."""
    newest = newest_round()
    for rnd in (newest + 1, newest):
        if rnd >= 1:
            try:
                if rotation_for_round(order, rnd) == order:
                    return rnd
            except RotationUnsatisfiable:
                continue
    return None


def compute_rotation(
    order: list[str],
    latest: dict[str, int],
    current: int,
    canaries: list[str] = None,
    max_age: int = None,
    window: int = None,
) -> list[str]:
    """Pure ordering policy (unit-tested in tests/test_bench_book.py).

    Returns the full new registration order for round ``current``.
    ``order`` is the PRIOR registration order (the tiebreak within a
    cohort); ``latest`` maps name -> latest green round (absent =
    never certified, treated as infinitely old)."""
    # Module-constant fallbacks resolve at CALL time (not def time) so
    # tests can monkeypatch the policy constants through the public
    # entry points (rotation_for_round / match_live_order).
    canaries = canaries or CANARIES
    max_age = MAX_AGE if max_age is None else max_age
    window = WINDOW if window is None else window
    # Explicit raise, not assert: `python -O` strips asserts, and a
    # mangled prior order slipping through here would mis-rotate the
    # whole certification window.
    if order[: len(canaries)] != canaries:
        raise ValueError(
            f"canaries must lead the prior order: {order[:3]!r}"
        )
    rest = [n for n in order if n not in canaries]
    prior_pos = {n: i for i, n in enumerate(order)}

    def age(n: str) -> float:
        g = latest.get(n)
        return float("inf") if g is None else current - g

    due = [n for n in rest if age(n) >= max_age]
    fresh = sorted(
        (n for n in rest if age(n) < max_age),
        key=lambda n: (-age(n), prior_pos[n]),
    )
    slots = window - len(canaries)
    if len(due) > slots:
        raise RotationUnsatisfiable(
            f"{len(due)} due queries exceed {slots} window slots for "
            f"r{current} — either a round was lost, or this ran before "
            f"the PRIOR round's CORRECTNESS artifact landed (the usual "
            f"cause: rotate for round N only once CORRECTNESS_r{{N-1}} "
            f"exists)"
        )
    in_window = due + fresh[: slots - len(due)]
    below = fresh[slots - len(due):]
    return canaries + in_window + below


def render(header: str, blocks: dict[str, str], new_order: list[str],
           current: int) -> str:
    """Regenerate the registration section with canonical comments."""
    canaries = new_order[:3]
    in_window = new_order[3:WINDOW]
    below = new_order[WINDOW:]
    out = [header, "\n"]
    out.append(
        "# --- Window part 1: permanent canaries (pinned in-window every round\n"
        "# --- from round 5 on) - flagship, one streaming path, one dedup path.\n"
    )
    out.extend(blocks[n] for n in canaries)
    out.append(
        f"\n# --- Parts 2-4: the r{current} rotating window "
        f"({len(in_window)} slots) —\n"
        f"# --- due-for-refresh queries first, then oldest-cohort fill\n"
        f"# --- (ordering computed by scripts/rotate_window.py {current}).\n"
    )
    out.extend(blocks[n] for n in in_window)
    out.append("\n" + WINDOW_MARKER + "\n")
    out.append(
        f"# --- Below the marker: oldest cohort first, so the r{current + 1}\n"
        f"# --- front is contiguous at the window marker.\n"
    )
    out.extend(blocks[n] for n in below)
    return "".join(out).rstrip("\n") + "\n"


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] in {"-h", "--help"}:
        print(__doc__)
        return 2
    explicit_round = bool(args and not args[0].startswith("--"))
    if explicit_round:
        current = int(args[0])
        args = args[1:]
    else:
        # same default as scripts/certification_age.py: the round after
        # the newest CORRECTNESS artifact.
        current = newest_round() + 1
    mode = args[0] if args else "--check"

    text = open(QUERIES_PY).read()
    header, blocks, order = parse_blocks(text)

    if not explicit_round and mode == "--check":
        # Round-aware check (see module docstring): the live order is
        # legitimate in two states of the round cycle, and a no-arg
        # --check (round_close, CI) must pass in both.
        matched = match_live_order(order)
        if matched is not None:
            print(f"rotation: file order is the computed r{matched} "
                  f"rotation ({len(order)} registrations)")
            return 0

    try:
        new_order = compute_rotation(
            order, latest_green_rounds(upto=current - 1), current
        )
    except RotationUnsatisfiable as exc:
        print(f"rotate_window: FAIL ({exc})")
        return 1

    if order == new_order:
        print(f"rotation for r{current}: file order already correct "
              f"({len(order)} registrations)")
        return 0
    first_diff = next(
        i for i, (a, b) in enumerate(zip(order, new_order)) if a != b
    )
    print(f"rotation for r{current}: order differs from registration "
          f"#{first_diff} ({order[first_diff]} vs {new_order[first_diff]})")
    if mode == "--check":
        print("rotate_window: FAIL (--check mode; run with --write to apply,"
              " then update the module docstring pre-commit prose)")
        return 1
    if mode != "--write":
        print(f"unknown mode {mode!r}")
        return 2
    open(QUERIES_PY, "w").write(render(header, blocks, new_order, current))
    print(f"rewrote {QUERIES_PY}; REMEMBER to update the module docstring "
          f"(round numbers + the pre-committed r{current + 1} front) and "
          f"re-run scripts/certification_age.py {current}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
