"""Every registered named query must match its DuckDB oracle —
the same check the driver runs at sf0.01 (here at the test sf)."""

from __future__ import annotations

import pytest

from myfitnesspaw_spark.plans import registry
from tests.conftest import assert_matches_oracle

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    oracle = _ORACLES.get(name)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
    else:
        assert_matches_oracle(df, duck, oracle)
