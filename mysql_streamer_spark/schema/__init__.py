"""Schema control plane: MySQL DDL classification, type mapping, and the
versioned schema registry (SURVEY.md §2.6, §1.2, T1-T3)."""

from mysql_streamer_spark.schema.ddl_parser import (
    StatementKind,
    ParsedStatement,
    parse_statement,
)
from mysql_streamer_spark.schema.mysql_types import mysql_type_to_spark
from mysql_streamer_spark.schema.registry import SchemaRegistry, SchemaEntry

__all__ = [
    "StatementKind",
    "ParsedStatement",
    "parse_statement",
    "mysql_type_to_spark",
    "SchemaRegistry",
    "SchemaEntry",
]
