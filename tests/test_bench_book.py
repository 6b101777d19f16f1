"""Forced-failure unit tests of the bench loop's bookkeeping (no Spark
needed — BenchBook is pure Python).  Invariants under test:

- a query with ANY successful timing is never reported as errored,
  whether the failure happened in pass 1 or pass 2;
- pass 2 retries pass-1 failures (ordered last, after slowest-first);
- statuses distinguish ok / error / not_run.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest
from hypothesis import given as hyp_given
from hypothesis import settings as hyp_settings
from hypothesis import strategies as hyp_st

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
# Only the module-level code above main() runs on exec; it imports the
# registry module but does not start a SparkSession.
_spec.loader.exec_module(bench)


def test_pass1_failure_pass2_success_is_ok():
    b = bench.BenchBook()
    b.failure("q", "Boom: transient")
    b.success("q", 1.5)  # pass-2 retry succeeded
    timed, errors, statuses = b.finalize(["q"])
    assert timed == {"q": 1.5}
    assert errors == {}
    assert statuses == {"q": "ok"}


def test_pass1_success_pass2_failure_keeps_timing():
    b = bench.BenchBook()
    b.success("q", 2.0)
    b.failure("q", "Boom: flaky second rep")
    timed, errors, statuses = b.finalize(["q"])
    assert timed == {"q": 2.0}  # pass-1 timing survives
    assert errors == {}  # a successful timing exists → not an error
    assert statuses == {"q": "ok"}


def test_min_of_passes_is_recorded():
    b = bench.BenchBook()
    b.success("q", 3.0)
    b.success("q", 1.25)
    timed, _, _ = b.finalize(["q"])
    assert timed == {"q": 1.25}


def test_double_failure_is_error_and_unattempted_is_not_run():
    b = bench.BenchBook()
    b.failure("bad", "Boom 1")
    b.failure("bad", "Boom 2")
    b.success("good", 0.5)
    timed, errors, statuses = b.finalize(["bad", "good", "cut"])
    assert timed == {"good": 0.5}
    assert set(errors) == {"bad"} and errors["bad"].startswith("Boom 2")
    assert statuses == {"bad": "error", "good": "ok", "cut": "not_run"}


def test_retry_order_slowest_first_errors_last():
    # No baseline → full timing counts as recoverable → slowest first.
    b = bench.BenchBook()
    qs = {"fast": 1, "slow": 2, "err": 3, "mid": 4}
    b.success("fast", 0.1)
    b.success("slow", 5.0)
    b.success("mid", 1.0)
    b.failure("err", "Boom")
    order = [name for name, _ in b.retry_order(qs)]
    assert order == ["slow", "mid", "fast", "err"]


def test_retry_order_targets_largest_recovery_vs_baseline():
    # "floor" is slow but already at its baseline (nothing to win);
    # "inflated" is mid-pack but 4x its baseline (3s recoverable);
    # "new" has no baseline entry → full timing recoverable.
    b = bench.BenchBook()
    qs = {"floor": 1, "inflated": 2, "new": 3}
    b.success("floor", 8.0)
    b.success("inflated", 4.0)
    b.success("new", 2.0)
    baseline = {"floor": 8.0, "inflated": 1.0}
    order = [name for name, _ in b.retry_order(qs, baseline)]
    assert order == ["inflated", "new", "floor"]


def test_retry_order_flag_risk_outranks_recovery():
    # The second r15 clean run's failure mode: a 0.24s-floor query
    # reading 2.8x cold offers tiny absolute recovery, so recovery
    # ordering starved it of a retry and the cold artifact reached the
    # gate as a false regression.  At-risk entries (raw ratio >=
    # RAW_WATCH_RATIO) must lead pass 2 regardless of recovery
    # seconds, worst ratio first; sub-threshold queries keep the
    # recovery ordering.
    b = bench.BenchBook()
    qs = {"tiny_hot": 1, "big_recovery": 2, "tiny_hotter": 3, "near": 4}
    b.success("tiny_hot", 0.6)        # 2.5x its 0.24 floor, 0.36s rec
    b.success("tiny_hotter", 0.9)     # 3.0x its 0.30 floor, 0.60s rec
    b.success("big_recovery", 9.0)    # 1.5x its 6.0 floor, 3.0s rec
    b.success("near", 0.45)           # 1.87x its 0.24 floor — under line
    baseline = {"tiny_hot": 0.24, "tiny_hotter": 0.30,
                "big_recovery": 6.0, "near": 0.24}
    order = [name for name, _ in b.retry_order(qs, baseline)]
    assert order == ["tiny_hotter", "tiny_hot", "big_recovery", "near"]


def test_retry_order_risk_threshold_is_the_watch_line():
    # The tier boundary must BE bench.RAW_WATCH_RATIO (the constant
    # classify_regressions gates on), so retry targeting can never
    # drift from the flag pipeline it protects.
    b = bench.BenchBook()
    qs = {"at_line": 1, "big": 2}
    b.success("at_line", 0.24 * bench.RAW_WATCH_RATIO)  # exactly at it
    b.success("big", 9.0)
    baseline = {"at_line": 0.24, "big": 6.0}
    order = [name for name, _ in b.retry_order(qs, baseline)]
    assert order == ["at_line", "big"]


# --- classify_regressions: hard gate vs report-only watch band ----------

_BASE = {
    "queries": {"fast_q": 1.0, "slow_q": 1.0, "fine_q": 1.0, "absent_q": None},
    "comments": {"slow_q": "known cold-start heavy"},
    "host_cal_ref": 0.2,
}


def test_gate_uncalibrated_host_flags_at_raw_2x():
    timed = {"fast_q": 2.5, "fine_q": 1.9}
    reg, watch = bench.classify_regressions(timed, _BASE, None, None)
    assert set(reg) == {"fast_q"}
    assert watch == {}
    assert reg["fast_q"]["raw_ratio"] == 2.5
    assert reg["fast_q"]["host_factor"] == 1.0


def test_gate_slow_host_excuses_into_watch_not_silence():
    # Host 1.5x slower than the recording host: the hard gate widens
    # to 3x, but a 2.5x raw entry must still surface — in watch.
    timed = {"fast_q": 2.5, "slow_q": 3.5, "fine_q": 1.9}
    reg, watch = bench.classify_regressions(timed, _BASE, 0.3, None)
    assert set(reg) == {"slow_q"}  # 3.5 > 3.0 — flagged even calibrated
    assert set(watch) == {"fast_q"}  # 2.0 < 2.5 <= 3.0 — excused, visible
    assert watch["fast_q"]["host_factor"] == 1.5
    assert reg["slow_q"]["comment"] == "known cold-start heavy"


def test_gate_factor_clamped_to_2x_and_fast_host_never_tightens():
    # A 10x-slower host clamps at factor 2 (gate 4x)...
    reg, watch = bench.classify_regressions({"fast_q": 4.1}, _BASE, 2.0, None)
    assert set(reg) == {"fast_q"} and not watch
    # ...and a 2x-faster host clamps at factor 1 (gate stays 2x).
    reg, watch = bench.classify_regressions({"fast_q": 1.99}, _BASE, 0.1, None)
    assert not reg and not watch


def test_gate_io_factor_annotated_only_when_baseline_has_ref():
    timed = {"fast_q": 2.5}
    _, watch = bench.classify_regressions(timed, _BASE, 0.3, 5.0)
    assert "io_factor" not in watch["fast_q"]  # no io_cal_ref yet
    base_io = {**_BASE, "io_cal_ref": 2.0}
    _, watch = bench.classify_regressions(timed, base_io, 0.3, 5.0)
    assert watch["fast_q"]["io_factor"] == 2.0  # clamped from 2.5


def test_gate_clamp_against_reanchored_floors():
    """VERDICT r13 #3: the r13 re-anchor replaced the inflated
    ensemble floor with reference-speed minima, so the clamp
    arithmetic must be validated against the REAL book, not just the
    synthetic _BASE.  Simulate host weather by scaling every recorded
    floor and host_cal together by k:

    - k within the documented 2x swing -> an EMPTY board (the
      calibrated gate absorbs it; watch does not flood);
    - k beyond the swing (2.5x) -> the hard gate still stays silent
      (clamped factor 2 widens it to 4x raw) but EVERY query floods
      the report-only watch band, each entry carrying host_factor 2.0
      as the explanation — flooding-with-annotation is the designed
      behavior there, not a gate failure;
    - a genuine regression (one query at 5x on a mildly loud host)
      trips the hard gate regardless of weather.
    """
    with open(os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "BASELINE_BENCH.json")) as fh:
        book = json.load(fh)
    floors = {n: v for n, v in book["queries"].items() if v}
    ref = book["host_cal_ref"]
    assert floors and ref

    for k in (1.3, 1.9):
        timed = {n: v * k for n, v in floors.items()}
        reg, watch = bench.classify_regressions(timed, book, ref * k, None)
        assert not reg and not watch, (k, len(reg), len(watch))

    timed = {n: v * 2.5 for n, v in floors.items()}
    reg, watch = bench.classify_regressions(timed, book, ref * 2.5, None)
    assert not reg
    assert len(watch) == len(floors)  # floods, but report-only...
    assert all(e["host_factor"] == 2.0 for e in watch.values())  # ...annotated

    victim = next(iter(sorted(floors)))
    timed = {n: v * 1.5 for n, v in floors.items()}
    timed[victim] = floors[victim] * 5.0
    reg, watch = bench.classify_regressions(timed, book, ref * 1.5, None)
    assert victim in reg  # 5x > 2x * clamp(1.5): weather can't excuse it
    assert not watch


def test_gate_ignores_absent_and_falsy_baselines():
    # absent_q has a None baseline; unknown_q has no entry at all.
    reg, watch = bench.classify_regressions(
        {"absent_q": 99.0, "unknown_q": 99.0}, _BASE, None, None
    )
    assert not reg and not watch


# --- certification_age: pure invariant logic -----------------------------

_ca_spec = importlib.util.spec_from_file_location(
    "certification_age",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts",
        "certification_age.py",
    ),
)
ca = importlib.util.module_from_spec(_ca_spec)
sys.modules.setdefault("certification_age", ca)
_ca_spec.loader.exec_module(ca)


def test_green_row_requires_every_dimension():
    assert ca.green_row({"rows_match": True})  # schema/hash keys absent: ok
    assert ca.green_row({"rows_match": True, "schema_match": True, "hash_match": True})
    assert not ca.green_row({"rows_match": False})
    assert not ca.green_row({"rows_match": True, "hash_match": False})
    assert not ca.green_row({"rows_match": True, "schema_match": False})
    assert not ca.green_row({"rows_match": True, "err": "boom"})
    assert not ca.green_row("ok")  # non-dict row


def test_classify_violation_boundaries():
    names = ["in_new", "fresh", "out_never", "out_at_max", "out_over_max"]
    green = {"out_at_max": 4, "out_over_max": 3, "fresh": 7}
    rows, never, stale, violations = ca.classify(
        names, green, current=8, max_age=4, window_size=2
    )
    # never-certified IN window is fine; OUT of window violates.
    assert [r[0] for r in never] == ["out_never"]
    # age == max_age out-of-window is overflow (front next round)...
    assert "out_at_max" in [r[0] for r in stale]
    # ...but only age > max_age (and never) are violations.
    assert sorted(r[0] for r in violations) == ["out_never", "out_over_max"]


def _simulate_rotation(n: int, rounds: range, window: int = 50, canaries: int = 3):
    """Run the repo's rotation policy (pinned canaries + oldest-first
    backlog fill; the driver certifies the window each round) and
    return (worst re-certification age seen, any classify violation).
    """
    names = [f"q{i:03d}" for i in range(n)]
    start = rounds.start
    latest = {nm: start - 1 for nm in names[:window]}
    for i, nm in enumerate(names[window:]):
        latest[nm] = start - 2 - (i % 3)
    worst_age, violated = 0, False
    for rnd in rounds:
        backlog = sorted(
            (nm for nm in names if nm not in names[:canaries]),
            key=lambda nm: latest.get(nm, -1),
        )
        order = names[:canaries] + backlog
        _, _, _, violations = ca.classify(
            order, latest, current=rnd, max_age=4, window_size=window
        )
        violated = violated or bool(violations)
        for nm in order[:window]:
            worst_age = max(worst_age, rnd - latest[nm])
            latest[nm] = rnd
    return worst_age, violated


def test_rotation_cycle_sustains_max_age_four():
    """Simulate the repo's actual rotation policy over 8 rounds.  At
    the CURRENT size (153) the STRONG freshness property holds: every
    query is re-certified within MAX_AGE=4 rounds and classify() never
    flags a violation (the r7 verdict proved MAX_AGE=3 arithmetically
    unsatisfiable at this size).  One query past the growth ceiling
    (3 + 4*47 = 191), the strong property must break — the oldest
    query only re-certifies at age 5.  (classify()'s EXIT invariant is
    deliberately weaker — in-window staleness never violates — so a
    perfect rotation keeps the script green right up to the point the
    window can no longer absorb the overflow.)"""
    worst, violated = _simulate_rotation(153, range(8, 16))
    assert worst <= 4 and not violated, (worst, violated)
    worst_over, _ = _simulate_rotation(192, range(8, 24))
    assert worst_over > 4, worst_over


def test_real_policy_forward_satisfiable_from_committed_state():
    """Drive the MECHANIZED policy (scripts/rotate_window.py — the one
    --write actually applies, unlike the ad-hoc model above) forward
    20 rounds from the repo's ACTUAL committed state: the live
    registration order plus the real CORRECTNESS history.  Every
    round must compute without RotationUnsatisfiable, produce an
    order classify() never flags, remain a fixed point of its own
    recomputation (the property the round-aware --check relies on),
    and re-certify every query within MAX_AGE.  The rotation
    arithmetic is zero-slack at 170 registered, so any drift in the
    committed state that would wedge a FUTURE round fails here,
    this round."""
    text = open(rw.QUERIES_PY).read()
    _, _, order = rw.parse_blocks(text)
    latest = rw.latest_green_rounds()
    start = rw.newest_round() + 1
    worst_age = 0
    for rnd in range(start, start + 20):
        order = rw.compute_rotation(order, latest, rnd)  # must not raise
        # fixed point: recomputing with the rotated order as prior
        # returns it unchanged (match_live_order's acceptance basis)
        assert rw.compute_rotation(order, latest, rnd) == order
        _, _, _, violations = ca.classify(order, latest, current=rnd)
        assert not violations, (rnd, violations[:3])
        for nm in order[:rw.WINDOW]:
            if nm in latest:
                worst_age = max(worst_age, rnd - latest[nm])
            latest[nm] = rnd
    assert worst_age <= rw.MAX_AGE + 1, worst_age


@hyp_given(
    hyp_st.integers(4, 191).flatmap(
        lambda n: hyp_st.tuples(
            hyp_st.just(n),
            hyp_st.lists(
                # -1 encodes never-certified; 0..5 an age entering the
                # first simulated round (5 = already past MAX_AGE).
                hyp_st.integers(-1, 5), min_size=n - 3, max_size=n - 3
            ),
        )
    )
)
@hyp_settings(max_examples=60, deadline=None)
def test_policy_random_states_never_silently_violate(case):
    """Safety property of the mechanized policy over RANDOM
    certification states (real constants: window 50 / max_age 4):
    compute_rotation either (a) raises RotationUnsatisfiable, and only
    when the due set genuinely exceeds the 47 slots — a doomed state
    refused loudly, never truncated — or (b) returns a canary-pinned
    permutation of the registry that classify() finds violation-free,
    and continues to do so for every subsequent round once the window
    is certified.  Deterministic tests cover the committed state and
    the steady-state cycle; this covers the state space between."""
    n, raw_ages = case
    start = 10
    canaries = ["c0", "c1", "c2"]
    names = canaries + [f"q{i:03d}" for i in range(n - 3)]
    latest = {nm: start - 1 for nm in canaries}
    for nm, a in zip(names[3:], raw_ages):
        if a >= 0:
            latest[nm] = start - a
    order = list(names)
    for rnd in range(start, start + 8):
        try:
            order = rw.compute_rotation(
                order, latest, rnd, canaries=canaries
            )
        except rw.RotationUnsatisfiable:
            due = [
                nm for nm in order[3:]
                if nm not in latest or rnd - latest[nm] >= 4
            ]
            # Refusal must be genuine (a doomed state — e.g. a
            # same-age cohort wider than the 47 fill slots — can
            # surface after several successful rounds, so refusal is
            # legal at ANY round; what is never legal is refusing
            # when the due set actually fits).
            assert len(due) > 47, (rnd, len(due))
            return
        assert order[:3] == canaries
        assert sorted(order) == sorted(names)
        _, _, _, violations = ca.classify(
            order, latest, current=rnd, max_age=4, window_size=50
        )
        assert not violations, (rnd, violations[:3])
        for nm in order[:50]:
            latest[nm] = rnd


def test_permanent_canaries_lead_the_registry():
    """The three permanent canaries (flagship, one streaming path, one
    dedup path) must be the first three registrations EVERY round — a
    rotation edit that drops them out of the driver window would let a
    loader/session regression hide for a full round."""
    from myfitnesspaw_spark.plans import registry
    import myfitnesspaw_spark.plans.queries  # noqa: F401

    names = list(registry.queries())
    assert names[:3] == [
        "progress_report",
        "streaming_hourly_rollup",
        "dedup_clusters",
    ]


def test_registry_growth_freeze_bound():
    """GROWTH FREEZE (VERDICT r11 #3): MAX_AGE=4 with 47 effective
    slots/round is satisfiable only up to 3 + 4*47 = 191 registered
    queries (conservative recert-every-4-rounds schedule; the exact
    invariant would allow 238 but keeps no slack for a lost round).
    Registry growth past the bound must be a TEST failure decided by
    editing this bound alongside the rotation constants, never a
    surprise certification violation three rounds later."""
    from myfitnesspaw_spark.plans import registry
    import myfitnesspaw_spark.plans.queries  # noqa: F401  (populates registry)

    ceiling = 3 + ca.MAX_AGE * (ca.WINDOW - 3)
    assert ceiling == 191
    n = len(list(registry.queries()))
    assert n <= ceiling, (
        f"registry has {n} queries, past the {ceiling} rotation ceiling: "
        "raise MAX_AGE or retire queries before registering more"
    )


# --- shared round-artifact matcher ---------------------------------------

_art_spec = importlib.util.spec_from_file_location(
    "_artifacts",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts", "_artifacts.py"
    ),
)
art = importlib.util.module_from_spec(_art_spec)
_art_spec.loader.exec_module(art)


def test_artifact_matcher_covers_renames_and_quotes():
    assert art.is_artifact_line("?? BENCH_r08.json")
    assert art.is_artifact_line(" M bench_full.json")
    assert art.is_artifact_line("M  BASELINE_BENCH.json")
    # A renamed-but-uncommitted artifact matches on EITHER side.
    assert art.is_artifact_line("R  BENCH_r8.json -> BENCH_r8_final.json")
    assert art.is_artifact_line("R  notes.txt -> CORRECTNESS_r09.json")
    # Quoted path (git quotes special characters).
    assert art.is_artifact_line('?? "bench_full.json"')
    # Non-artifacts do not match; $-anchored so suffixed names don't.
    assert not art.is_artifact_line("?? scripts/round_close.py")
    assert not art.is_artifact_line(" M bench_full.json.bak")
    assert not art.is_artifact_line("?? myBENCH_notes.md")


def test_compact_bench_line_fits_driver_tail_capture():
    """The driver records only the LAST ~2000 bytes of bench.py output;
    the compact summary line must stay under that budget at the
    WORST CASE the current registry can produce: the 20
    longest-named queries, maximal float widths, 3-digit counts.
    (The r4 truncation bug was the full dict crossing the budget as
    queries were added — this pins the slowest-20 form instead.)"""
    import json

    from myfitnesspaw_spark.plans import registry

    names = sorted(registry.queries(), key=len, reverse=True)[:20]
    worst = {n: 999.999 for n in names}
    line = json.dumps(
        {
            "metric": "total_query_sec",
            "value": 99999.999,
            "unit": "sec",
            "queries": worst,
            "n_queries": 999,
            "n_timed": 999,
            "n_errors": 999,
            "n_regressions": 999,
            "n_watch": 999,
            "sf": 0.1,
            "host_cal_sec": 99.999,
            "io_cal_sec": 99.999,
            "full": "bench_full.json",
        }
    )
    assert len(line) < 1900, (len(line), "compact bench line over budget")


# --- rotate_window: mechanical rotation policy ---------------------------

_rw_spec = importlib.util.spec_from_file_location(
    "rotate_window",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts",
        "rotate_window.py",
    ),
)
rw = importlib.util.module_from_spec(_rw_spec)
sys.modules.setdefault("rotate_window", rw)
_rw_spec.loader.exec_module(rw)


def test_compute_rotation_policy():
    """The pure ordering policy scripts/rotate_window.py mechanizes:
    canaries pinned, due set (age >= MAX_AGE or never certified)
    fronts the window in prior order, oldest-first fill, below-marker
    remainder oldest-cohort-first so the next front is contiguous."""
    canaries = ["c1", "c2", "c3"]
    # 3 canaries + 9 rotating names across three cohorts, window 7
    # (4 rotating slots), max_age 2.
    order = canaries + [f"a{i}" for i in range(3)] + [
        f"b{i}" for i in range(3)
    ] + [f"n{i}" for i in range(3)]
    latest = {n: 8 for n in canaries}
    latest.update({f"a{i}": 6 for i in range(3)})  # age 2 -> due
    latest.update({f"b{i}": 7 for i in range(3)})  # age 1 -> fill pool
    # n* certified this very round (age 0): rotate last.
    latest.update({f"n{i}": 8 for i in range(3)})

    got = rw.compute_rotation(
        order, latest, current=8, canaries=canaries, max_age=2, window=7
    )
    # due a* front the window (prior order), oldest fresh b0 fills the
    # 4th slot, then below-marker: b1 b2 (age 1) before n* (age 0).
    assert got == canaries + ["a0", "a1", "a2", "b0", "b1", "b2",
                              "n0", "n1", "n2"]

    # A never-certified query is infinitely old: it must front the due
    # set's cohort ordering (prior order among the due).
    latest2 = dict(latest)
    del latest2["a1"]
    got2 = rw.compute_rotation(
        order, latest2, current=8, canaries=canaries, max_age=2, window=7
    )
    assert got2[:7] == canaries + ["a0", "a1", "a2", "b0"]

    # Overfull due set is a clean, typed failure — the invariant is
    # already lost, not silently truncated.
    latest3 = {n: 8 for n in canaries}
    latest3.update({n: 1 for n in order[3:]})  # everything age 7
    with pytest.raises(rw.RotationUnsatisfiable):
        rw.compute_rotation(
            order, latest3, current=8, canaries=canaries, max_age=2, window=7
        )


def test_match_live_order_accepts_both_cycle_states(monkeypatch):
    """Synthetic coverage of BOTH acceptance branches of
    ``match_live_order`` — the live test below only ever exercises
    whichever state the repo happens to be in, so a refactor breaking
    one branch would go unnoticed until the round cycle reaches it.

    Cycle states, for newest CORRECTNESS artifact = round 8:
    (a) rotation for r9 freshly applied (between rotation and the
        next driver run) -> matched round 9;
    (b) order still the r8 rotation, recomputed from the artifacts
        that existed at ITS apply time (rounds <= 7 — the newest
        artifact must be excluded or the due set collapses and the
        recomputation diverges) -> matched round 8;
    (c) anything else -> None."""
    canaries = ["c1", "c2", "c3"]
    order = canaries + [f"a{i}" for i in range(3)] + [
        f"b{i}" for i in range(3)
    ] + [f"n{i}" for i in range(3)]

    # Per-round green history (max_age 2, window 9 -> 6 rotating
    # slots): a* certified r5 only, b* r7, n* r6 AND r8, canaries
    # every round.  At r8 apply time (artifacts <= 7) the due set is
    # a* (age 3) + n* (latest 6, age 2) = 6 = slots, below = b*; at
    # r9 (artifacts <= 8) it is a* (age 4) + b* (age 2), below = n*.
    # The two rotations therefore differ, so acceptance of each is a
    # real branch, not a coincidence.
    history = {n: [5, 6, 7, 8] for n in canaries}
    history.update({f"a{i}": [5] for i in range(3)})
    history.update({f"b{i}": [7] for i in range(3)})
    history.update({f"n{i}": [6, 8] for i in range(3)})

    def fake_latest(upto=None):
        return {
            n: max(r for r in rounds if upto is None or r <= upto)
            for n, rounds in history.items()
            if any(upto is None or r <= upto for r in rounds)
        }

    monkeypatch.setattr(rw, "newest_round", lambda: 8)
    monkeypatch.setattr(rw, "latest_green_rounds", fake_latest)
    monkeypatch.setattr(rw, "CANARIES", canaries)
    monkeypatch.setattr(rw, "MAX_AGE", 2)
    monkeypatch.setattr(rw, "WINDOW", 9)

    r9_order = rw.compute_rotation(
        order, fake_latest(upto=8), 9, canaries=canaries, max_age=2,
        window=9,
    )
    r8_order = rw.compute_rotation(
        order, fake_latest(upto=7), 8, canaries=canaries, max_age=2,
        window=9,
    )
    assert r8_order != r9_order  # the test is vacuous if they agree

    assert rw.match_live_order(r9_order) == 9   # state (a)
    assert rw.match_live_order(r8_order) == 8   # state (b)
    garbled = canaries + list(reversed(order[3:]))
    assert garbled not in (r8_order, r9_order)
    assert rw.match_live_order(garbled) is None  # state (c)


def test_live_registry_order_is_the_computed_rotation():
    """The committed plans/queries.py order must BE a rotation the
    policy computes — a botched hand rotation fails here, this round,
    instead of as a next-round invariant violation.  ROUND-AWARE
    (VERDICT r14 #1): the live order is legitimate both freshly
    rotated for the round in flight (newest CORRECTNESS round + 1)
    AND between the driver dropping CORRECTNESS_rN and the r{N+1}
    rotation (the order the newest artifact certified, recomputed
    from the artifacts that existed at its rotation time) — the
    strict next-round-only form was red at every judging point by
    construction.  Also re-checks the parse: blocks round-trip to
    exactly the registry's registration order."""
    from myfitnesspaw_spark.plans import registry

    text = open(rw.QUERIES_PY).read()
    _, blocks, order = rw.parse_blocks(text)
    assert order == list(registry.queries())
    assert set(blocks) == set(order)

    matched = rw.match_live_order(order)
    assert matched is not None, (
        "live registry order matches neither the freshly-applied "
        f"r{rw.newest_round() + 1} rotation nor the r{rw.newest_round()} "
        "order the newest artifact certified — run "
        "scripts/rotate_window.py <round> --write"
    )


def test_rotate_window_render_roundtrip():
    """--write safety: rendering a new order and re-parsing must give
    back exactly that order with every registration block intact, the
    window marker at the 50-boundary, and an import-clean module
    (compile check) — proven here so the first real --write (r15)
    cannot silently drop or duplicate a registration."""
    text = open(rw.QUERIES_PY).read()
    header, blocks, order = rw.parse_blocks(text)

    # a deliberately different (reversed rotating section) order
    new_order = order[:3] + list(reversed(order[3:]))
    rendered = rw.render(header, blocks, new_order, current=99)

    h2, blocks2, order2 = rw.parse_blocks(rendered)
    assert order2 == new_order
    assert blocks2 == {n: blocks[n] for n in order}
    assert h2 == header
    # marker sits between registration #50 and #51
    before_marker = rendered.split(rw.WINDOW_MARKER)[0]
    assert before_marker.count('register("') == 50
    compile(rendered, rw.QUERIES_PY, "exec")


# --- warm_probe: steady-state guard ---------------------------------------

_wp_spec = importlib.util.spec_from_file_location(
    "warm_probe",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts",
        "warm_probe.py",
    ),
)
wp = importlib.util.module_from_spec(_wp_spec)
sys.modules.setdefault("warm_probe", wp)
_wp_spec.loader.exec_module(wp)


def test_monotone_falling_flags_converging_runs_only():
    """The r19 steady-state rule, widened per ADVICE r19: a probe
    whose best is its FINAL, still-improving rep has not converged and
    that best must not feed the floor-quality re-anchor bar — whether
    the series is fully monotone (the forward_fill_gauge incident) or
    had an early tie/rebound with a tail still falling into a last-rep
    strict minimum.  A flattened tail, an interior minimum, or a
    plateau is steady; zero/one rep can never certify steady state."""
    # the r19 incident: every rep beat the previous one
    assert wp.monotone_falling([1.092, 0.941, 0.822, 0.701, 0.583])
    # ADVICE r19: early tie, tail still falling into a last-rep min
    assert wp.monotone_falling([1.0, 1.0, 0.8, 0.6])
    # early rebound, but the last rep still beats every earlier one
    assert wp.monotone_falling([1.0, 0.8, 0.9, 0.7])
    # flattened tail: last rep did not improve -> steady
    assert not wp.monotone_falling([1.092, 0.941, 0.822, 0.583, 0.583])
    # last rep ties an EARLIER minimum -> the best reproduced, steady
    assert not wp.monotone_falling([1.0, 0.6, 0.8, 0.6])
    # rebound mid-run -> steady enough (min is interior, not last)
    assert not wp.monotone_falling([1.0, 0.6, 0.7, 0.65])
    # plateau -> steady
    assert not wp.monotone_falling([0.5, 0.5, 0.5])
    # degenerate rep counts cannot certify steady state
    assert wp.monotone_falling([0.5])
    assert wp.monotone_falling([])


def test_cold_position_advisory_fires_only_on_starved_pass2():
    """The r18 discard rule, artifact-side: a run with timed queries
    but zero pass-2 warm retries is all cold-position and must say so;
    a run with even one retry, or a run that timed nothing, must not
    carry the advisory."""
    assert bench.cold_position_advisory(0, 170) is not None
    assert "cold-position" in bench.cold_position_advisory(0, 1)
    assert bench.cold_position_advisory(1, 170) is None
    assert bench.cold_position_advisory(33, 170) is None
    # nothing timed -> nothing to discard; the errors dict tells that story
    assert bench.cold_position_advisory(0, 0) is None
