"""Property tests for the REPL's literal/statement parsing (pure Python —
no SparkSession)."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from mysql_streamer_spark.repl import (
    ReplError,
    _eq_terms,
    _parse_literal,
    _split_top_level,
)


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_integer_literals_roundtrip(n):
    assert _parse_literal(str(n)) == n


@given(st.text(alphabet=st.characters(blacklist_characters="\x00"), max_size=40))
def test_string_literals_roundtrip_with_quote_escaping(s):
    encoded = "'" + s.replace("'", "''") + "'"
    assert _parse_literal(encoded) == s


def test_null_and_floats():
    assert _parse_literal("NULL") is None
    assert _parse_literal("null") is None
    assert _parse_literal("3.25") == 3.25
    assert _parse_literal("-0.5") == -0.5
    with pytest.raises(ReplError):
        _parse_literal("DEFAULT")


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters=",()'\x00"),
            min_size=1,
            max_size=10,
        ).filter(lambda s: s.strip()),
        min_size=1,
        max_size=8,
    )
)
def test_split_top_level_splits_plain_lists(parts):
    joined = ",".join(parts)
    assert _split_top_level(joined) == [p.strip() for p in parts]


def test_split_top_level_respects_strings_and_parens():
    assert _split_top_level("(1, 'a,b'), (2, 'c')") == ["(1, 'a,b')", "(2, 'c')"]
    assert _split_top_level("a;'x;y';b", sep=";") == ["a", "'x;y'", "b"]
    # '' escape keeps the string open across the would-be delimiter
    assert _split_top_level("'it''s, fine', 2") == ["'it''s, fine'", "2"]


def test_assignments_allow_commas_inside_strings():
    from mysql_streamer_spark.repl import _assignments

    assert _assignments("v = 'a,b', n = 2") == {"v": "a,b", "n": 2}
    assert _assignments("v = 'it''s, ok'") == {"v": "it's, ok"}


def test_eq_terms_conjunctions():
    assert _eq_terms("a = 1 AND b = 'x'") == {"a": 1, "b": "x"}
    with pytest.raises(ReplError):
        _eq_terms("a > 1")


def test_eq_terms_reject_null_comparison():
    # MySQL `col = NULL` matches no rows; the REPL refuses rather than
    # silently diverging into IS NULL semantics (ADVICE r7)
    with pytest.raises(ReplError, match="NULL"):
        _eq_terms("a = 1 AND c = NULL")
    with pytest.raises(ReplError, match="NULL"):
        _eq_terms("c = null")
