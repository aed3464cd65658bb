"""Q2 token-matcher DSL (schema/token_matcher.py): the reference's
Optional/Compound/Any matching semantics, and the differential gate
pinning it against the regex/enum parser."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_streamer_spark.schema.ddl_parser import StatementKind, parse_statement
from mysql_streamer_spark.schema.token_matcher import (
    Any,
    Compound,
    Optional,
    TokenMatcher,
    classify_with_matchers,
    tokenize,
)


# --- tokenizer ---------------------------------------------------------


def test_tokenizer_strips_comments_and_keeps_quoted_units():
    toks = tokenize("CREATE /* hint */ TABLE `weird name` (a INT) -- tail\n")
    assert toks[:3] == ["CREATE", "TABLE", "`weird name`"]


def test_tokenizer_keeps_quote_delimiters_so_keywords_cannot_leak():
    # a table literally named "table" must not satisfy the TABLE keyword
    assert tokenize("DROP `table`")[1] == "`table`"
    m = TokenMatcher(tokenize("DROP `table`"))
    assert not m.matches("drop", "table")


def test_tokenizer_splits_punctuation():
    assert tokenize("yelp.business") == ["yelp", ".", "business"]


# --- matcher engine (sql_handler.py:94-213 semantics) -------------------


def test_plain_match_consumes_one_token_case_insensitive():
    m = TokenMatcher(["CREATE", "TABLE"])
    assert m.matches("create") and m.peek() == "TABLE"


def test_alternatives_list_matches_any():
    assert TokenMatcher(["SCHEMA"]).matches(["database", "schema"])
    assert not TokenMatcher(["INDEX"]).matches(["database", "schema"])


def test_optional_succeeds_without_consuming_on_miss():
    m = TokenMatcher(["TABLE", "t"])
    assert m.matches(Optional(["temporary"]), "table")
    assert m.peek() == "t"


def test_optional_consumes_on_hit():
    m = TokenMatcher(["TEMPORARY", "TABLE", "t"])
    assert m.matches(Optional(["temporary"]), "table")
    assert m.peek() == "t"


def test_compound_requires_the_exact_sequence():
    m = TokenMatcher(["IF", "NOT", "EXISTS", "t"])
    assert m.matches(Compound(["if", "not", "exists"]))
    assert m.peek() == "t"
    assert not TokenMatcher(["IF", "EXISTS"]).matches(
        Compound(["if", "not", "exists"])
    )


def test_optional_compound_misses_cleanly():
    m = TokenMatcher(["business"])
    assert m.matches(Optional([Compound(["if", "exists"])]))
    assert m.peek() == "business"


def test_any_matches_whatever_comes_next():
    m = TokenMatcher(["yelp", ".", "business"])
    assert m.matches(Compound([Any(), ".", Any()]))
    assert not m.has_next()


def test_has_matches_restores_the_cursor():
    m = TokenMatcher(["IF", "EXISTS", "t"])
    assert m.has_matches(Compound(["if", "exists"]))
    assert m.peek() == "IF"


# --- classification parity ----------------------------------------------


def test_both_engines_agree_on_the_full_matrix():
    from mysql_streamer_spark.queries.schema_registry import _statement_matrix

    for sql, expected in _statement_matrix():
        dsl = classify_with_matchers(sql)
        parsed = parse_statement(sql).kind
        assert dsl.name == expected, f"DSL {dsl} != declared {expected}: {sql}"
        assert parsed.name == expected, f"parser {parsed} != {expected}: {sql}"


def test_degenerate_database_statements_differ_by_design():
    """The reference classifies a bare operand-less database statement by
    keywords alone (DatabaseStatementBase has no identifier step,
    sql_handler.py:403-427); the parser stays strict because registry
    replay needs the operand. Both behaviors are pinned."""
    for sql, ref_kind in (
        ("DROP DATABASE IF EXISTS", StatementKind.DROP_DATABASE),
        ("CREATE DATABASE IF NOT EXISTS", StatementKind.CREATE_DATABASE),
        ("ALTER SCHEMA", StatementKind.ALTER_DATABASE),
    ):
        assert classify_with_matchers(sql) is ref_kind
        assert parse_statement(sql).kind is StatementKind.UNSUPPORTED


def test_trailing_punctuation_degenerates_agree():
    """A trailing ';' (or a bare column list) is not an operand: both
    engines must call the statement unsupported, and both must still
    accept the well-formed ';'-terminated forms."""
    for sql in ("DROP TABLE IF EXISTS;", "CREATE TABLE IF NOT EXISTS;",
                "CREATE TABLE (a INT)"):
        assert classify_with_matchers(sql) is StatementKind.UNSUPPORTED
        assert parse_statement(sql).kind is StatementKind.UNSUPPORTED
    for sql, kind in (
        ("DROP TABLE business;", StatementKind.DROP_TABLE),
        ("DROP TABLE IF EXISTS `business`;", StatementKind.DROP_TABLE),
        ("CREATE TABLE t (a INT);", StatementKind.CREATE_TABLE),
    ):
        assert classify_with_matchers(sql) is kind
        assert parse_statement(sql).kind is kind


_IDENTS = st.sampled_from(
    ["business", "`business`", "`yelp`.`business`", "yelp.business", "`weird ``q`"]
)


@settings(max_examples=200, deadline=None)
@given(
    tmp=st.sampled_from(["", "TEMPORARY "]),
    ine=st.sampled_from(["", "IF NOT EXISTS "]),
    tbl=_IDENTS,
    tail=st.sampled_from(["(a INT)", "LIKE other", "(a INT, b VARCHAR(3))"]),
)
def test_property_create_table_grid(tmp, ine, tbl, tail):
    sql = f"CREATE {tmp}TABLE {ine}{tbl} {tail}"
    assert classify_with_matchers(sql) is StatementKind.CREATE_TABLE
    assert parse_statement(sql).kind is StatementKind.CREATE_TABLE


@settings(max_examples=200, deadline=None)
@given(
    oo=st.sampled_from(["", "ONLINE ", "OFFLINE "]),
    ig=st.sampled_from(["", "IGNORE "]),
    tbl=_IDENTS,
    op=st.sampled_from(
        ["DROP c", "ENGINE=INNODB", "ADD c INT", "RENAME TO d",
         "CONVERT TO CHARACTER SET utf8"]
    ),
)
def test_property_alter_table_grid(oo, ig, tbl, op):
    sql = f"ALTER {oo}{ig}TABLE {tbl} {op}"
    assert classify_with_matchers(sql) is StatementKind.ALTER_TABLE
    assert parse_statement(sql).kind is StatementKind.ALTER_TABLE


@settings(max_examples=100, deadline=None)
@given(
    kw=st.sampled_from(
        ["SELECT 1", "INSERT INTO t VALUES (1)", "BEGIN", "FLUSH TABLES",
         "LOCK TABLES t WRITE", "XA START 'x'", "SAVEPOINT sp"]
    )
)
def test_property_non_ddl_is_unsupported_in_both(kw):
    assert classify_with_matchers(kw) is StatementKind.UNSUPPORTED
    assert parse_statement(kw).kind is StatementKind.UNSUPPORTED
