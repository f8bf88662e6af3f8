"""Smoke: the driver-contract entry() returns >0 rows on sf0.001."""

from __future__ import annotations

import importlib


def test_entry_smoke(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_shape(spark):
    mod = importlib.import_module("__spark_entry__")
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries keys"
    assert len(q) > 0
