"""One-command round-close gate (VERDICT r7 #2 made artifact hygiene a
named, thrice-missed task — this makes it mechanical).

Runs, in order, and exits non-zero on the FIRST failure:

1. the full pytest suite (skippable with ``--skip-tests`` when it
   already ran this session);
2. ``scripts/certification_age.py`` — the rotation invariant;
3. a git-hygiene check: no round artifact (``CORRECTNESS_r*.json``,
   ``BENCH_r*.json``, ``bench_full.json``, ``BASELINE_BENCH.json``)
   may be untracked or modified-unstaged, and the working tree should
   be clean of source changes.

It does NOT run bench.py itself (a bench run belongs to a quiet host
and its artifact then needs committing, which is exactly what step 3
checks) — run ``python bench.py`` first, commit, then close.

On driver-post-close emissions (VERDICT r9 #1 / r10 #2 asked this
gate to exempt them): as of round 10 the DRIVER commits its own
round artifacts (``CORRECTNESS_r{N}.json`` / ``BENCH_r{N}.json``,
e.g. commit 58b1964), so by the time this gate runs inside a round
the only uncommitted artifacts git can show are the BUILDER's own —
exactly what step 3 must fail on.  No exemption is needed or added:
an exemption keyed on "newer than the last committed round" would
excuse precisely the builder's freshest (and most forgettable)
output.  The r10 violation scenario — a whole round with zero
builder turns leaving the PREVIOUS round's driver artifacts
untracked — is unreachable by any in-round gate and is now closed at
the source by the driver's own commit.

Usage::

    python scripts/round_close.py [--skip-tests]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts._artifacts import is_artifact_line  # noqa: E402


def main() -> int:
    if "--skip-tests" not in sys.argv[1:]:
        print("== pytest ==", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q"], cwd=REPO
        )
        if r.returncode:
            print("round_close: FAIL (pytest)")
            return r.returncode

    print("== certification age ==", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "certification_age.py")],
        cwd=REPO,
    )
    if r.returncode:
        print("round_close: FAIL (rotation invariant)")
        return r.returncode

    print("== rotation order ==", flush=True)
    # The registration order must BE a rotation the policy computes —
    # catches a botched hand rotation at close time instead of as a
    # next-round invariant violation (the window arithmetic has zero
    # slack at 170 registered).  The no-arg --check is ROUND-AWARE
    # (ADVICE r14): it accepts the order for either the round in
    # flight (rotation freshly applied) or the round the newest
    # CORRECTNESS artifact certified, so closing round N no longer
    # demands round N+1's rotation be applied early.
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "rotate_window.py"),
         "--check"],
        cwd=REPO,
    )
    if r.returncode:
        print("round_close: FAIL (registration order is not the computed "
              "rotation — run scripts/rotate_window.py --write)")
        return r.returncode

    print("== git hygiene ==", flush=True)
    # A failed git invocation must FAIL the gate, not read as a clean
    # tree — an index.lock or missing git with empty stdout would
    # otherwise print OK over an untracked artifact (the exact
    # failure mode this gate exists to catch).
    try:
        r = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO, capture_output=True, text=True, timeout=30,
        )
    except Exception as exc:
        print(f"round_close: FAIL (git status did not run: {exc})")
        return 1
    if r.returncode:
        print(r.stderr.strip())
        print(f"round_close: FAIL (git status exited {r.returncode})")
        return 1
    artifacts, other = [], []
    for line in r.stdout.splitlines():
        (artifacts if is_artifact_line(line) else other).append(line)
    for line in artifacts:
        print(f"  UNCOMMITTED ARTIFACT: {line}")
    for line in other:
        print(f"  dirty: {line}")
    if artifacts:
        print("round_close: FAIL (commit the round artifacts)")
        return 1
    if other:
        print("round_close: WARN (non-artifact changes uncommitted)")
    print("round_close: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
