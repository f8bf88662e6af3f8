"""Property-based checks on the COPY-INTO option map (SURVEY §5.2: the
multi-valued NULL_IF gap is the subtle one — first sentinel becomes Spark's
nullValue, the rest must ALL survive into the post-read map)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bfs_etl_sep2025_spark.sources import map_file_format

sentinel = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters=","),
    min_size=1,
    max_size=8,
)


@given(st.lists(sentinel, min_size=1, max_size=6, unique=True), st.booleans())
@settings(max_examples=200, deadline=None)
def test_null_if_partition_is_lossless(sentinels, empty_as_null):
    """Every sentinel lands exactly once: first -> reader nullValue, rest ->
    post-map; empty_field_as_null appends '' exactly once."""
    reader, post = map_file_format(
        {"null_if": sentinels, "empty_field_as_null": empty_as_null}
    )
    reconstructed = [reader["nullValue"], *post]
    expected = sentinels + ([""] if empty_as_null else [])
    assert reconstructed == expected


@given(st.sampled_from([",", "|", ";", "\t"]), st.sampled_from(["'", '"']))
@settings(max_examples=20, deadline=None)
def test_delimiter_and_quote_pass_through(delim, quote):
    reader, _ = map_file_format(
        {"field_delimiter": delim, "field_optionally_enclosed_by": quote}
    )
    assert reader["sep"] == delim
    assert reader["quote"] == quote


def test_skip_header_bounds():
    import pytest

    assert map_file_format({"skip_header": 0})[0].get("header") is False
    assert map_file_format({"skip_header": 1})[0]["header"] is True
    with pytest.raises(ValueError):
        map_file_format({"skip_header": 2})
