"""Forced-failure unit tests of the bench loop's bookkeeping (no Spark
needed — BenchBook is pure Python).  Invariants under test:

- a query with ANY successful timing is never reported as errored,
  whether the failure happened in pass 1 or pass 2;
- pass 2 retries pass-1 failures (ordered last, after slowest-first);
- statuses distinguish ok / error / not_run.
"""

from __future__ import annotations

import importlib.util
import os
import sys

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
