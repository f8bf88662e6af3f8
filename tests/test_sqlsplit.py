"""Statement splitter edge cases + a hypothesis round-trip property."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bfs_etl_sep2025_spark.plans.sqlsplit import split_statements


def test_simple_split():
    assert split_statements("a; b; c") == ["a", "b", "c"]


def test_reference_multi_statement_shape():
    """The reference builds 'insert...; insert...; ...' by join
    (dags/dev_db_test.py:26)."""
    sql = "; ".join(
        f"INSERT INTO dev_test (name, id) VALUES ('name', {i})" for i in range(3)
    )
    out = split_statements(sql)
    assert len(out) == 3
    assert out[2].endswith("VALUES ('name', 2)")


def test_semicolon_in_string_literal():
    out = split_statements("INSERT INTO t VALUES ('a;b'); SELECT 1")
    assert out == ["INSERT INTO t VALUES ('a;b')", "SELECT 1"]


def test_semicolon_in_double_quotes_and_backticks():
    assert split_statements('SELECT ";" AS x; SELECT 2') == ['SELECT ";" AS x', "SELECT 2"]
    assert split_statements("SELECT `a;b`; SELECT 2") == ["SELECT `a;b`", "SELECT 2"]


def test_escaped_quote_inside_literal():
    out = split_statements(r"SELECT 'it\'s; fine'; SELECT 2")
    assert out == [r"SELECT 'it\'s; fine'", "SELECT 2"]


def test_doubled_quote_escape():
    out = split_statements("SELECT 'it''s; fine'; SELECT 2")
    assert out == ["SELECT 'it''s; fine'", "SELECT 2"]


def test_line_comment():
    out = split_statements("SELECT 1 -- trailing; not a split\n; SELECT 2")
    assert len(out) == 2
    assert out[1] == "SELECT 2"


def test_block_comment():
    out = split_statements("SELECT 1 /* ; */; SELECT 2")
    assert out == ["SELECT 1 /* ; */", "SELECT 2"]


def test_trailing_semicolon_and_blanks():
    assert split_statements("SELECT 1; ;\n  ;") == ["SELECT 1"]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters=";'\"`-/\\", blacklist_categories=("Cs",)
            ),
            min_size=1,
        ).map(str.strip).filter(bool),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(stmts):
    """Joining quote-free statements with ';' then splitting recovers them."""
    assert split_statements("; ".join(stmts)) == stmts
