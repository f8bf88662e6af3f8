"""Cross-engine-deterministic expressions.

The correctness gate hash-compares Spark results against a DuckDB oracle, so
every emitted value must be *bitwise* reproducible in both engines:

- Row-level double arithmetic (``a * (1 - b)``) IS bitwise identical across
  engines (same IEEE-754 ops in the same order) — emit it raw, never round it
  (the engines' ``round()`` functions disagree at half-way boundaries).
- Aggregate sums over doubles are NOT reproducible (summation order differs
  per engine / per partitioning — at 100 TB even between two Spark runs).
  Fix: sum exactly in DECIMAL (associative, order-independent), then cast the
  single exact result to DOUBLE. Identical in any engine at any parallelism.
- Averages: exact decimal sum cast to double, divided by the count — one
  double division of two identical values.

``scale`` must exceed the true decimal precision of the summand: fixture
monetary columns carry 2 decimal digits, so a product of two of them has <= 4
and of three has <= 6; the double's ~1e-13 relative error then never reaches
a rounding boundary at scale+2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DECIMAL precision for exact accumulation: wide enough for a 100 TB sum of
#: monetary values (10^15 rows * 10^6 magnitude needs 21 integer digits).
_PRECISION = 30


def exact_sum(col: Column, scale: int = 4) -> Column:
    """Order-independent sum of a double column, emitted as DOUBLE."""
    return F.sum(col.cast(f"decimal({_PRECISION},{scale})")).cast("double")


def exact_avg(col: Column, scale: int = 4) -> Column:
    """Order-independent mean of a double column, emitted as DOUBLE."""
    return exact_sum(col, scale) / F.count(col)


def sql_exact_sum(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`exact_sum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"


def sql_exact_avg(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`exact_avg`."""
    return f"{sql_exact_sum(expr, scale)} / count({expr})"
