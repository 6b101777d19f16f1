"""Diff two bench_full.json artifacts (or BASELINE_BENCH.json).

Usage: python scripts/bench_compare.py OLD.json NEW.json [threshold]

Prints per-query ratios beyond ``threshold`` (default 1.5×, either
direction), queries present on only one side, and the total delta.
Exit code 1 if any slowdown exceeds 2× — the same gate bench.py applies
against BASELINE_BENCH.json, usable standalone in a round workflow:

    python bench.py && python scripts/bench_compare.py \
        BASELINE_BENCH.json bench_full.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _timings(data: dict) -> dict[str, float]:
    return {k: v for k, v in data.get("queries", {}).items() if v is not None}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_data, new_data = _load(sys.argv[1]), _load(sys.argv[2])
    old, new = _timings(old_data), _timings(new_data)
    # Justified-trade comments may live on either artifact (usually the
    # baseline); print them next to any flagged ratio.
    comments = {**old_data.get("comments", {}), **new_data.get("comments", {})}
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    both = sorted(set(old) & set(new))
    moved = []
    for name in both:
        if old[name] <= 0:
            continue
        ratio = new[name] / old[name]
        if ratio >= threshold or ratio <= 1 / threshold:
            moved.append((ratio, name))
    moved.sort(reverse=True)
    for ratio, name in moved:
        tag = "SLOWER" if ratio > 1 else "faster"
        note = f"  [{comments[name]}]" if name in comments else ""
        print(f"{ratio:6.2f}x {tag:7s} {name}: {old[name]} -> {new[name]}{note}")

    for name in sorted(set(new) - set(old)):
        print(f"   new          {name}: {new[name]}")
    for name in sorted(set(old) - set(new)):
        print(f"   gone         {name}: {old[name]}")

    t_old = sum(old[n] for n in both)
    t_new = sum(new[n] for n in both)
    print(
        f"total over {len(both)} shared queries: {t_old:.1f}s -> {t_new:.1f}s "
        f"({t_new / t_old:.2f}x)" if both else "no shared queries"
    )
    regressions = [n for r, n in moved if r > 2.0]
    if regressions:
        print(f"REGRESSION GATE (>2x): {regressions}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
