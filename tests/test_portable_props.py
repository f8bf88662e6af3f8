"""Property tests for the cross-engine determinism kernel
(functions/portable.py): the DECIMAL-accumulate-then-cast contract must be
(a) exactly the mathematically correct double, and (b) invariant to
partitioning/order — the property every oracled aggregate leans on."""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bfs_etl_sep2025_spark.functions.portable import (
    exact_sum,
    sql_exact_sum,
)

# 2-decimal fixture-like monetary values, mixed signs, wide magnitude
cents = st.integers(min_value=-10_000_000, max_value=10_000_000)
batches = st.lists(cents, min_size=1, max_size=200)


@given(batches)
@settings(max_examples=200, deadline=None)
def test_duckdb_exact_sum_is_true_decimal_sum(vals):
    """sql_exact_sum == the exact rational sum, rounded once to double —
    for any inputs, any order (DuckDB side of the contract)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(c / 100.0,) for c in vals])
    got = con.execute(f"SELECT {sql_exact_sum('x', 2)} FROM t").fetchone()[0]
    # the double c/100.0 rounds to the rational closest to c/100; DECIMAL(,2)
    # re-quantizes it back to EXACTLY c/100 cents, so the true sum is exact
    want = float(sum(Fraction(c, 100) for c in vals))
    assert got == want


@given(batches)
@settings(max_examples=200, deadline=None)
def test_duckdb_exact_sum_order_invariant(vals):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(c / 100.0,) for c in vals])
    a = con.execute(f"SELECT {sql_exact_sum('x', 2)} FROM t").fetchone()[0]
    b = con.execute(
        f"SELECT {sql_exact_sum('x', 2)} FROM (SELECT x FROM t ORDER BY random())"
    ).fetchone()[0]
    assert a == b


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_spark_exact_sum_partition_invariant(spark, parts):
    """The Spark side: identical bits at ANY parallelism (the 100 TB
    property), and equal to the independent DuckDB/rational result."""
    import pyspark.sql.functions as F

    vals = [((-1) ** i) * (i * i % 9_999_873) for i in range(5_000)]
    df = spark.createDataFrame(
        [(c / 100.0,) for c in vals], "x double"
    ).repartition(parts)
    got = df.agg(exact_sum(F.col("x"), 2).alias("s")).collect()[0]["s"]
    want = float(sum(Fraction(c, 100) for c in vals))
    assert got == want


@given(batches)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_and_duckdb_exact_sums_agree(spark, vals):
    """End-to-end cross-engine bit agreement on random inputs — the exact
    invariant the driver's hash gate enforces on every aggregate."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(c / 100.0,) for c in vals], "x double")
    s = df.agg(exact_sum(F.col("x"), 2).alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(c / 100.0,) for c in vals])
    d = con.execute(f"SELECT {sql_exact_sum('x', 2)} FROM t").fetchone()[0]
    assert s == d


def test_decimal_requantization_assumption():
    """Documented premise: a 2-decimal monetary value that survived the
    double round-trip re-quantizes to the intended cents exactly (the
    double is within 2^-53 relative, far inside the 0.005 quantum)."""
    for c in [1, -1, 3, 1999999999, -123456789]:
        x = c / 100.0
        assert Decimal(x).quantize(Decimal("0.01")) == Decimal(c) / 100
