"""Logical-date templating — must reproduce the reference's filename
derivation byte-for-byte."""

from __future__ import annotations

from datetime import datetime

import pytest

from bfs_etl_sep2025_spark.plans.templating import build_context, render, render_any

# The exact template string from /root/reference/dags/s3_data_copy_test.py:34
REF_TEMPLATE = "product_order_trans_{{ ds[5:7] + ds[8:10] + ds[0:4] }}.csv"


@pytest.mark.parametrize(
    ("logical", "expected"),
    [
        (datetime(2022, 7, 13, 7, 0), "product_order_trans_07132022.csv"),
        (datetime(2022, 7, 16, 7, 0), "product_order_trans_07162022.csv"),
        (datetime(2024, 12, 1, 0, 0), "product_order_trans_12012024.csv"),
    ],
)
def test_reference_filename_template(logical, expected):
    assert render(REF_TEMPLATE, build_context(logical)) == expected


def test_context_variables():
    ctx = build_context(datetime(2022, 7, 13, 7, 30))
    assert ctx["ds"] == "2022-07-13"
    assert ctx["ds_nodash"] == "20220713"
    assert ctx["ts"].startswith("2022-07-13T07:30")


def test_render_nested_structures():
    ctx = build_context(datetime(2022, 7, 13))
    out = render_any({"files": ["a_{{ ds_nodash }}.csv"], "n": 3}, ctx)
    assert out == {"files": ["a_20220713.csv"], "n": 3}


def test_no_builtins_escape():
    with pytest.raises(ValueError):
        render("{{ __import__('os').getcwd() }}", build_context(datetime(2022, 1, 1)))


def test_plain_string_passthrough():
    assert render("no templates here", build_context(datetime(2022, 1, 1))) == (
        "no templates here"
    )
