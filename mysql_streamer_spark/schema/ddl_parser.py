"""MySQL DDL statement classifier + identifier/column parser.

Re-expresses the reference's sql_handler (Q1-Q4, SURVEY.md §2.6): classify a
replicated query into {CreateTable, AlterTable, DropTable, CreateDatabase,
AlterDatabase, DropDatabase, CreateIndex, DropIndex, RenameTable,
Unsupported}, extract the (database-)qualified table identity, detect
renames, and — beyond the reference, which delegated schema derivation to a
shadow MySQL — parse column definitions so the registry can evolve Spark
StructTypes directly (no tracker DB needed).

Grammar coverage mirrors the reference's test corpus
(tests/components/sql_handler_test.py:83-248): ONLINE/OFFLINE/IGNORE/
TEMPORARY modifiers, IF [NOT] EXISTS, backtick-quoted + unicode identifiers
(including escaped ``` `` ``` inside), `db`.`table` qualification, and noise
tails (ENGINE=, ROW_FORMAT=, AUTO_INCREMENT=, CONVERT TO CHARACTER SET ...)
that must not confuse identifier extraction.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field


class StatementKind(enum.Enum):
    CREATE_TABLE = "create_table"
    ALTER_TABLE = "alter_table"
    DROP_TABLE = "drop_table"
    CREATE_DATABASE = "create_database"
    ALTER_DATABASE = "alter_database"
    DROP_DATABASE = "drop_database"
    CREATE_INDEX = "create_index"
    DROP_INDEX = "drop_index"
    RENAME_TABLE = "rename_table"
    UNSUPPORTED = "unsupported"

    @property
    def is_schema_relevant(self) -> bool:
        """Statements the pipeline must act on (others are ignored —
        reference sql_handler.py:52-57)."""
        return self not in (StatementKind.UNSUPPORTED,)

    @property
    def is_rename(self) -> bool:
        return self is StatementKind.RENAME_TABLE


@dataclass(frozen=True)
class ColumnDef:
    name: str
    type_str: str
    nullable: bool = True
    #: the DEFAULT clause's literal, verbatim ("0", "0.00", "'x'", "NULL",
    #: "CURRENT_TIMESTAMP"); None when the column declares no default
    default_str: str | None = None


@dataclass(frozen=True)
class AlterOp:
    """One clause of an ALTER TABLE: op in {add, drop, modify, change,
    rename}; ``column``/``new_column``/``type_str`` as applicable.
    ``position`` carries MySQL's column-placement clause: None (append /
    keep place), "FIRST", or ("AFTER", column)."""

    op: str
    column: str | None = None
    new_column: str | None = None
    type_str: str | None = None
    default_str: str | None = None
    position: str | tuple[str, str] | None = None
    #: NOT NULL absent from the (quote-masked) clause -> nullable
    nullable: bool = True


@dataclass(frozen=True)
class ParsedStatement:
    kind: StatementKind
    database: str | None = None
    table: str | None = None
    #: rename target(s): list of (old, new) fully-resolved table names
    renames: tuple[tuple[str, str], ...] = ()
    columns: tuple[ColumnDef, ...] = ()
    alter_ops: tuple[AlterOp, ...] = ()
    if_exists: bool = False
    if_not_exists: bool = False
    raw: str = ""

    @property
    def is_rename(self) -> bool:
        return self.kind is StatementKind.RENAME_TABLE or any(
            op.op == "rename" for op in self.alter_ops
        )


# identifier: `quoted` (with `` escapes) or bare word
_IDENT = r"(?:`(?:[^`]|``)+`|[^\s`'\".,();=]+)"
_QUALIFIED = rf"(?P<q1>{_IDENT})(?:\s*\.\s*(?P<q2>{_IDENT}))?"

_WS = r"\s+"
_MODIFIERS = r"(?:(?:ONLINE|OFFLINE|IGNORE|TEMPORARY)\s+)*"

_HEAD_RES: list[tuple[StatementKind, re.Pattern]] = [
    (
        StatementKind.CREATE_TABLE,
        re.compile(
            rf"^CREATE\s+{_MODIFIERS}TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
            rf"(?!IF\s+NOT\s+EXISTS\s*$){_QUALIFIED}",
            re.IGNORECASE,
        ),
    ),
    (
        StatementKind.ALTER_TABLE,
        re.compile(rf"^ALTER\s+{_MODIFIERS}TABLE\s+{_QUALIFIED}", re.IGNORECASE),
    ),
    (
        StatementKind.DROP_TABLE,
        # the lookahead rejects the DEGENERATE bare "DROP TABLE IF EXISTS"
        # (no operand): without it IF matches as the table identifier
        re.compile(
            rf"^DROP\s+{_MODIFIERS}TABLE\s+(?P<ie>IF\s+EXISTS\s+)?"
            rf"(?!IF\s+EXISTS\s*$){_QUALIFIED}",
            re.IGNORECASE,
        ),
    ),
    (
        StatementKind.CREATE_DATABASE,
        re.compile(
            rf"^CREATE\s+(?:DATABASE|SCHEMA)\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
            rf"(?!IF\s+NOT\s+EXISTS\s*$)(?P<q1>{_IDENT})",
            re.IGNORECASE,
        ),
    ),
    (
        StatementKind.ALTER_DATABASE,
        re.compile(rf"^ALTER\s+(?:DATABASE|SCHEMA)\s+(?P<q1>{_IDENT})", re.IGNORECASE),
    ),
    (
        StatementKind.DROP_DATABASE,
        re.compile(
            rf"^DROP\s+(?:DATABASE|SCHEMA)\s+(?P<ie>IF\s+EXISTS\s+)?"
            rf"(?!IF\s+EXISTS\s*$)(?P<q1>{_IDENT})",
            re.IGNORECASE,
        ),
    ),
    (
        StatementKind.CREATE_INDEX,
        re.compile(
            rf"^CREATE\s+{_MODIFIERS}(?:UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?INDEX\s+{_IDENT}"
            rf"(?:\s+USING\s+\w+)?\s+ON\s+{_QUALIFIED}",
            re.IGNORECASE,
        ),
    ),
    (
        StatementKind.DROP_INDEX,
        # ONLINE|OFFLINE is valid on either side of INDEX (5.5 puts it
        # before, 5.6 after — reference sql_handler.py:442-448 accepts both)
        re.compile(
            rf"^DROP\s+{_MODIFIERS}INDEX\s+(?:(?:ONLINE|OFFLINE)\s+)?{_IDENT}"
            rf"\s+ON\s+{_QUALIFIED}",
            re.IGNORECASE,
        ),
    ),
    (
        StatementKind.RENAME_TABLE,
        re.compile(r"^RENAME\s+TABLE\s+", re.IGNORECASE),
    ),
]

_RENAME_PAIR_RE = re.compile(
    rf"(?P<a1>{_IDENT})(?:\s*\.\s*(?P<a2>{_IDENT}))?\s+TO\s+"
    rf"(?P<b1>{_IDENT})(?:\s*\.\s*(?P<b2>{_IDENT}))?",
    re.IGNORECASE,
)

#: ``RENAME INDEX a TO b`` (5.7) / ``RENAME COLUMN a TO b`` (8.0) are NOT
#: table renames — the lookahead keeps the keyword from being captured as
#: the new table name.
_NOT_RENAME_OBJECT = r"(?!(?:INDEX|COLUMN|KEY)\b)"

_ALTER_RENAME_RE = re.compile(
    rf"\bRENAME\s+(?:(?:TO|AS)\s+)?{_NOT_RENAME_OBJECT}(?P<r1>{_IDENT})(?:\s*\.\s*(?P<r2>{_IDENT}))?",
    re.IGNORECASE,
)


def unquote(ident: str) -> str:
    ident = ident.strip()
    if ident.startswith("`") and ident.endswith("`"):
        return ident[1:-1].replace("``", "`")
    return ident


def _strip_comments(sql: str) -> str:
    """Remove /*..*/, -- and # comments — but ONLY outside quoted regions:
    a '#' or '--' inside a backtick identifier (or string literal) is part
    of the identifier, and a regex-based strip silently truncates the
    statement there (found by the hypothesis identifier-roundtrip test)."""
    out: list[str] = []
    i, n = 0, len(sql)
    quote: str | None = None
    while i < n:
        ch = sql[i]
        if quote:
            out.append(ch)
            if ch == quote:
                if quote == "`" and i + 1 < n and sql[i + 1] == "`":
                    out.append("`")  # escaped backtick stays inside
                    i += 2
                    continue
                quote = None
            i += 1
            continue
        if ch in ("`", "'", '"'):
            quote = ch
            out.append(ch)
            i += 1
            continue
        if sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
            continue
        if ch == "#" or sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j
            out.append(" ")
            continue
        out.append(ch)
        i += 1
    return "".join(out).strip().rstrip(";").strip()


def _split_top_level_commas(body: str) -> list[str]:
    parts, depth, cur, in_quote = [], 0, [], None
    for ch in body:
        if in_quote:
            cur.append(ch)
            if ch == in_quote:
                in_quote = None
            continue
        if ch in ("`", "'", '"'):
            in_quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


_NON_COLUMN_PREFIX = re.compile(
    r"^(?:PRIMARY\s+KEY|UNIQUE(?:\s+KEY|\s+INDEX)?|KEY|INDEX|CONSTRAINT|"
    r"FOREIGN\s+KEY|FULLTEXT|SPATIAL|CHECK)\b",
    re.IGNORECASE,
)

_COLUMN_DEF_RE = re.compile(
    rf"^(?P<name>{_IDENT})\s+(?P<type>[a-zA-Z]+"
    rf"(?:\s+(?:precision|char|varchar|varying)\b)?"  # DOUBLE PRECISION / NATIONAL CHAR / NATIONAL VARCHAR / CHARACTER VARYING
    rf"(?:\s*\([^)]*\))?"
    rf"(?:\s+(?:signed|unsigned))?(?:\s+zerofill)?)",
    re.IGNORECASE,
)


#: the DEFAULT keyword, searched over the QUOTE-MASKED clause so a literal
#: "DEFAULT" inside a COMMENT '…' string never counts
_DEFAULT_KW_RE = re.compile(r"\bDEFAULT\s+", re.IGNORECASE)
#: the literal after it: quoted string (with '' escapes) or one bare token
#: (number, NULL, CURRENT_TIMESTAMP, b'…'-style constants) — matched
#: against the ORIGINAL text so quoted default values survive intact
_DEFAULT_LIT_RE = re.compile(r"'(?:[^']|'')*'|[^\s,]+")

#: column placement inside ADD/MODIFY/CHANGE clauses (MySQL reorder syntax).
#: Searched anywhere in the quote-masked attribute tail AFTER the column
#: type (not anchored at $): MySQL tolerates trailing attribute clauses
#: like ``AFTER id COMMENT 'x'`` and the placement must still register.
_POSITION_RE = re.compile(
    rf"\b(?:(?P<first>FIRST)\b|AFTER\s+(?P<after>{_IDENT}))", re.IGNORECASE
)


def _mask_quoted(s: str) -> str:
    """Blank the CONTENTS of quoted strings — single-quoted AND
    double-quoted (MySQL's default sql_mode treats both as string
    literals; identifiers here are backticked or bare), doubled-quote
    escapes included — preserving length and quote positions, so keyword
    searches never match inside literals (COMMENT 'uses DEFAULT 5',
    COMMENT "insert AFTER id")."""
    out = []
    quote: str | None = None  # the active quote char, if inside a literal
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if quote is not None:
            if c == quote:
                if i + 1 < n and s[i + 1] == quote:  # escaped quote
                    out.append("  ")
                    i += 2
                    continue
                quote = None
                out.append(c)
            else:
                out.append(" ")
        else:
            if c in ("'", '"'):
                quote = c
            out.append(c)
        i += 1
    return "".join(out)


def _parse_default(entry: str) -> str | None:
    m = _DEFAULT_KW_RE.search(_mask_quoted(entry))
    if not m:
        return None
    lit = _DEFAULT_LIT_RE.match(entry, m.end())
    return lit.group(0) if lit else None


def _parse_position(clause: str, start: int = 0) -> str | tuple[str, str] | None:
    """``start`` should point past the column type so a column literally
    named ``first``/``after`` never reads as a placement token."""
    m = _POSITION_RE.search(_mask_quoted(clause), start)
    if not m:
        return None
    if m.group("first"):
        return "FIRST"
    return ("AFTER", unquote(m.group("after")))


def _parse_column_def(entry: str) -> ColumnDef | None:
    if _NON_COLUMN_PREFIX.match(entry):
        return None
    m = _COLUMN_DEF_RE.match(entry)
    if not m:
        return None
    nullable = not re.search(r"\bNOT\s+NULL\b", entry, re.IGNORECASE)
    return ColumnDef(
        unquote(m.group("name")),
        m.group("type").strip(),
        nullable,
        default_str=_parse_default(entry),
    )


def _extract_create_columns(sql: str) -> tuple[ColumnDef, ...]:
    start = sql.find("(")
    if start < 0:
        return ()
    depth = 0
    for i in range(start, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                body = sql[start + 1 : i]
                cols = [_parse_column_def(e) for e in _split_top_level_commas(body)]
                return tuple(c for c in cols if c)
    return ()


_ALTER_OP_RES = [
    (
        "add",
        re.compile(
            rf"^ADD\s+(?:COLUMN\s+)?(?:\(\s*)?(?P<col>{_IDENT})\s+(?P<type>[a-zA-Z]+(?:\s*\([^)]*\))?"
            rf"(?:\s+unsigned)?(?:\s+zerofill)?)",
            re.IGNORECASE,
        ),
    ),
    (
        "change",
        re.compile(
            rf"^CHANGE\s+(?:COLUMN\s+)?(?P<col>{_IDENT})\s+(?P<new>{_IDENT})\s+"
            rf"(?P<type>[a-zA-Z]+(?:\s*\([^)]*\))?(?:\s+unsigned)?(?:\s+zerofill)?)",
            re.IGNORECASE,
        ),
    ),
    (
        "modify",
        re.compile(
            rf"^MODIFY\s+(?:COLUMN\s+)?(?P<col>{_IDENT})\s+(?P<type>[a-zA-Z]+(?:\s*\([^)]*\))?"
            rf"(?:\s+unsigned)?(?:\s+zerofill)?)",
            re.IGNORECASE,
        ),
    ),
    ("drop", re.compile(rf"^DROP\s+(?:COLUMN\s+)?(?P<col>{_IDENT})\s*$", re.IGNORECASE)),
    (
        "rename_column",
        re.compile(
            rf"^RENAME\s+COLUMN\s+(?P<col>{_IDENT})\s+TO\s+(?P<new>{_IDENT})",
            re.IGNORECASE,
        ),
    ),
    # schema-neutral, but must be recognized so it isn't taken for a table rename
    (
        "rename_index",
        re.compile(
            rf"^RENAME\s+(?:INDEX|KEY)\s+(?P<col>{_IDENT})\s+TO\s+(?P<new>{_IDENT})",
            re.IGNORECASE,
        ),
    ),
    (
        "rename",
        re.compile(
            rf"^RENAME\s+(?:(?:TO|AS)\s+)?(?!(?:INDEX|COLUMN|KEY)\b)(?P<col>{_IDENT})",
            re.IGNORECASE,
        ),
    ),
]


def _parse_alter_ops(tail: str) -> tuple[AlterOp, ...]:
    ops = []
    for clause in _split_top_level_commas(tail):
        for op_name, rx in _ALTER_OP_RES:
            m = rx.match(clause)
            if not m:
                continue
            gd = m.groupdict()
            has_coldef = op_name in ("add", "modify", "change")
            ops.append(
                AlterOp(
                    op=op_name,
                    column=unquote(gd["col"]) if gd.get("col") else None,
                    new_column=unquote(gd["new"]) if gd.get("new") else None,
                    type_str=gd.get("type"),
                    default_str=_parse_default(clause) if has_coldef else None,
                    position=_parse_position(clause, m.end()) if has_coldef else None,
                    nullable=not (
                        has_coldef
                        and re.search(
                            r"\bNOT\s+NULL\b", _mask_quoted(clause), re.IGNORECASE
                        )
                    ),
                )
            )
            break
    return tuple(ops)


def parse_statement(sql: str, default_database: str | None = None) -> ParsedStatement:
    """Classify one replicated query and extract its identifiers.

    Unknown statements classify as UNSUPPORTED and are dropped by the
    pipeline (F4) — never an exception, matching the reference's
    fail-open-by-ignoring behavior (sql_handler.py:458-462)."""
    cleaned = _strip_comments(sql)
    for kind, rx in _HEAD_RES:
        m = rx.match(cleaned)
        if not m:
            continue
        gd = m.groupdict()
        if kind is StatementKind.RENAME_TABLE:
            renames = []
            tail = cleaned[m.end():]
            for pm in _RENAME_PAIR_RE.finditer(tail):
                old_db = unquote(pm.group("a1")) if pm.group("a2") else default_database
                old_tbl = unquote(pm.group("a2") or pm.group("a1"))
                new_db = unquote(pm.group("b1")) if pm.group("b2") else default_database
                new_tbl = unquote(pm.group("b2") or pm.group("b1"))
                renames.append((f"{old_db}.{old_tbl}", f"{new_db}.{new_tbl}"))
            return ParsedStatement(kind=kind, renames=tuple(renames), raw=sql)

        if gd.get("q2"):
            database, table = unquote(gd["q1"]), unquote(gd["q2"])
        else:
            database, table = default_database, unquote(gd["q1"])

        if kind in (
            StatementKind.CREATE_DATABASE,
            StatementKind.ALTER_DATABASE,
            StatementKind.DROP_DATABASE,
        ):
            return ParsedStatement(
                kind=kind,
                database=unquote(gd["q1"]),
                if_exists=bool(gd.get("ie")),
                if_not_exists=bool(gd.get("ine")),
                raw=sql,
            )

        columns: tuple[ColumnDef, ...] = ()
        alter_ops: tuple[AlterOp, ...] = ()
        renames: tuple[tuple[str, str], ...] = ()
        if kind is StatementKind.CREATE_TABLE:
            columns = _extract_create_columns(cleaned[m.end():])
        elif kind is StatementKind.ALTER_TABLE:
            alter_ops = _parse_alter_ops(cleaned[m.end():].strip())
            rn = next((op for op in alter_ops if op.op == "rename"), None)
            if rn is not None:
                am = _ALTER_RENAME_RE.search(cleaned[m.end():])
                if am:
                    new_db = unquote(am.group("r1")) if am.group("r2") else database
                    new_tbl = unquote(am.group("r2") or am.group("r1"))
                    renames = ((f"{database}.{table}", f"{new_db}.{new_tbl}"),)

        return ParsedStatement(
            kind=kind,
            database=database,
            table=table,
            columns=columns,
            alter_ops=alter_ops,
            renames=renames,
            if_exists=bool(gd.get("ie")),
            if_not_exists=bool(gd.get("ine")),
            raw=sql,
        )
    return ParsedStatement(kind=StatementKind.UNSUPPORTED, raw=sql)
