"""Token-matcher DSL statement classifier (reference Q2).

The reference classifies replicated queries by running a tiny matcher
DSL over sqlparse tokens: ``Optional`` (consume if present), a plain
list (consume one token equal to any alternative, case-insensitive),
``Compound`` (consume an exact consecutive sequence), ``Any`` (consume
whatever comes next) — first statement class whose matcher list
succeeds wins, with Unsupported as the catch-all
(replication_handler/components/sql_handler.py:94-213, 331-462).

This repo's PRIMARY classifier is the regex/enum parser in
``schema/ddl_parser.py`` (a real parser also extracts columns, which the
DSL never could). The DSL engine here is the reference's exact matching
semantics re-expressed over a quote-and-comment-aware tokenizer, kept as
a SECOND, independently-derived classification engine: the differential
gate (tests + the ``schema_registry_statement_matrix`` oracle query)
runs every statement through both engines and pins them equal — the
same differential pattern that pins the Avro codec to Apache Avro Java.
A classification bug now needs the same wrong answer from two unrelated
grammars before it can ship.
"""

from __future__ import annotations

import re

from mysql_streamer_spark.schema.ddl_parser import StatementKind


class Optional(list):
    """Consume the alternatives if the next token matches; succeed
    either way (sql_handler.py:204)."""


class Compound(list):
    """Consume this exact consecutive token sequence (sql_handler.py:208)."""


class Any(list):
    """Match whatever token comes next (sql_handler.py:211)."""


#: One token: backtick/quote-delimited identifier or string (with doubled
#: delimiters inside), an identifier/keyword/number word (MySQL's unquoted
#: identifier charset), or a single punctuation character.
_TOKEN_RE = re.compile(
    r"`(?:[^`]|``)*`"
    r"|\"(?:[^\"]|\"\")*\""
    r"|'(?:[^']|'')*'"
    r"|[0-9a-zA-Z$_-￿]+"
    r"|[^\s]",
    re.UNICODE,
)

_COMMENT_RE = re.compile(
    r"/\*.*?\*/"  # block comments (incl. MySQL version hints)
    r"|--(?:\s[^\n]*)?(?=\n|$)"  # -- needs trailing space per MySQL
    r"|#[^\n]*",
    re.DOTALL,
)


def tokenize(sql: str) -> list[str]:
    """Comment-stripped token stream. Quoted regions survive as single
    tokens (a backticked table named ``create`` must never match the
    CREATE keyword — delimiters are kept so keyword comparison fails)."""
    return _TOKEN_RE.findall(_COMMENT_RE.sub(" ", sql))


class TokenMatcher:
    """The reference's matcher engine over a string token stream
    (sql_handler.py:94-213): ``matches`` consumes, ``has_matches``
    restores the cursor, Optional/Compound/Any as above."""

    def __init__(self, tokens: list[str]):
        self.tokens = tokens
        self.index = 0

    def matches(self, *args) -> bool:
        for match in args:
            if not self._match(self._listify(match)):
                return False
        return True

    def has_matches(self, *args) -> bool:
        current = self.index
        ok = self.matches(*args)
        self.index = current
        return ok

    def _listify(self, match):
        return match if isinstance(match, list) else [match]

    def _match(self, match_vals) -> bool:
        if isinstance(match_vals, Optional):
            self._required_match(match_vals)
            return True
        return self._required_match(match_vals)

    def _required_match(self, match_vals) -> bool:
        if isinstance(match_vals, Compound):
            return self._compound_match(match_vals)
        for match_val in match_vals:
            if isinstance(match_val, Compound):
                return self._compound_match(match_val)
            if self.has_next() and self._token_matches(self.peek(), [match_val]):
                self.pop()
                return True
        return False

    def _compound_match(self, compound) -> bool:
        if not self.has_next(len(compound)):
            return False
        window = self.tokens[self.index : self.index + len(compound)]
        if all(
            self._token_matches(tok, self._listify(part))
            for tok, part in zip(window, compound)
        ):
            self.index += len(compound)
            return True
        return False

    def _token_matches(self, token: str, match_vals) -> bool:
        if isinstance(match_vals, Any) or any(
            isinstance(v, Any) for v in match_vals
        ):
            return True
        up = token.upper()
        return any(up == v.upper() for v in match_vals)

    def peek(self) -> str:
        return self.tokens[self.index]

    def pop(self) -> str:
        tok = self.peek()
        self.index += 1
        return tok

    def has_next(self, length: int = 1) -> bool:
        return (self.index + length - 1) < len(self.tokens)

    def get_remaining_tokens(self) -> list[str]:
        return self.tokens[self.index :]


#: The reference's statement classes in ITS match order (first wins;
#: sql_handler.py:39-51,331-462). Each entry: (kind, matcher list,
#: requires-next) — the table statements additionally require an
#: identifier to follow (CreateTable/DropTable raise Incompatible when
#: nothing follows the keywords; sql_handler.py:338-360,392-400).
STATEMENT_MATCHERS: list[tuple[StatementKind, list, bool]] = [
    (
        StatementKind.CREATE_TABLE,
        ["create", Optional(["temporary"]), "table",
         Optional([Compound(["if", "not", "exists"])])],
        True,
    ),
    (
        StatementKind.ALTER_TABLE,
        ["alter", Optional(["online", "offline"]), Optional(["ignore"]),
         "table"],
        True,
    ),
    (
        StatementKind.DROP_TABLE,
        ["drop", Optional(["temporary"]), "table",
         Optional([Compound(["if", "exists"])])],
        True,
    ),
    (StatementKind.CREATE_DATABASE, ["create", ["database", "schema"]], False),
    (StatementKind.ALTER_DATABASE, ["alter", ["database", "schema"]], False),
    (StatementKind.DROP_DATABASE, ["drop", ["database", "schema"]], False),
    (
        StatementKind.CREATE_INDEX,
        ["create", Optional(["online", "offline"]),
         Optional(["unique", "fulltext", "spatial"]), "index"],
        False,
    ),
    (
        StatementKind.DROP_INDEX,
        ["drop", Optional(["online", "offline"]), "index",
         Optional(["online", "offline"])],
        False,
    ),
    (StatementKind.RENAME_TABLE, ["rename", "table"], False),
]


_OPERAND_RE = re.compile("^[`\"'0-9a-zA-Z$_\u0080-\uffff]")


def _is_operand(token: str) -> bool:
    """Identifier-shaped: quoted or starting with an identifier char.
    Trailing punctuation (``;``, a stray paren) is NOT an operand — the
    reference feeds the popped token to its identifier parser, which
    rejects punctuation; folding that rejection into requires-next keeps
    the two engines agreeing on degenerate trailing-punctuation forms
    like ``DROP TABLE IF EXISTS;``."""
    return bool(_OPERAND_RE.match(token))


def classify_with_matchers(sql: str) -> StatementKind:
    """First-match-wins DSL classification (the reference's
    mysql_statement_factory loop, sql_handler.py:32-57)."""
    tokens = tokenize(sql)
    for kind, matchers, requires_next in STATEMENT_MATCHERS:
        m = TokenMatcher(tokens)
        if m.matches(*matchers) and (
            not requires_next or (m.has_next() and _is_operand(m.peek()))
        ):
            return kind
    return StatementKind.UNSUPPORTED
