"""Property-based DDL parser tests (hypothesis): the parser consumes
arbitrary replicated query events in production, so its contract is
total — classify-or-UNSUPPORTED, never an exception — and identifier
extraction must round-trip any legal identifier, including the quoting
edge cases the reference's corpus stresses
(tests/components/sql_handler_test.py:83-131)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_streamer_spark.schema.ddl_parser import (
    StatementKind,
    parse_statement,
    unquote,
)

# identifiers: MySQL allows nearly anything inside backticks; bare ones are
# word-ish. Exclude backticks from bare, exercise escaping inside quoted.
_bare = st.from_regex(r"[A-Za-z_][A-Za-z0-9_$]{0,29}", fullmatch=True)
_quoted_inner = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    min_size=1,
    max_size=20,
).filter(lambda s: s.strip() and not s.isspace())


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parser_is_total(sql):
    p = parse_statement(sql)
    assert p.kind in StatementKind


@given(_bare, _bare)
@settings(max_examples=100, deadline=None)
def test_create_table_identifier_roundtrip_bare(db, table):
    p = parse_statement(f"CREATE TABLE {db}.{table} (id int)")
    assert p.kind is StatementKind.CREATE_TABLE
    assert (p.database, p.table) == (db, table)


@given(_quoted_inner, _quoted_inner)
@settings(max_examples=100, deadline=None)
def test_create_table_identifier_roundtrip_quoted(db, table):
    qdb = "`" + db.replace("`", "``") + "`"
    qtbl = "`" + table.replace("`", "``") + "`"
    p = parse_statement(f"CREATE TABLE {qdb}.{qtbl} (id int)")
    assert p.kind is StatementKind.CREATE_TABLE
    assert (p.database, p.table) == (db, table)


@given(_bare, _bare, _bare)
@settings(max_examples=100, deadline=None)
def test_alter_rename_never_loses_identity(db, old, new):
    p = parse_statement(f"ALTER TABLE {db}.{old} RENAME TO {new}",
                        default_database=db)
    assert p.is_rename
    assert p.renames == ((f"{db}.{old}", f"{db}.{new}"),)


@given(_quoted_inner)
@settings(max_examples=100, deadline=None)
def test_unquote_roundtrip(ident):
    quoted = "`" + ident.replace("`", "``") + "`"
    assert unquote(quoted) == ident
