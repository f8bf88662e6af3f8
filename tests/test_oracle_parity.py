"""Driver-mirror: every registered query with an oracle must match DuckDB at
sf0.01 (row count + schema + order-insensitive values). Parametrized over the
registry so newly-registered operators are covered automatically."""

from __future__ import annotations

import pytest

from bfs_etl_sep2025_spark import registry
from tests.conftest import assert_parity

SPECS = [s for s in registry.all_specs().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, duck, spec):
    assert_parity(spark, duck, spec)


NO_ORACLE = [s for s in registry.all_specs().values() if s.oracle is None]


@pytest.mark.parametrize("spec", NO_ORACLE, ids=[s.name for s in NO_ORACLE])
def test_rows_only(spark, spec):
    """Weaker check for non-SQL-expressible ops: runs and yields a stable schema."""
    df = spec.fn(spark, "/root/testdata/sf0.01")
    assert df.columns, f"{spec.name}: no columns"
    assert df.count() >= 0
