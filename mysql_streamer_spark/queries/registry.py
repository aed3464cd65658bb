"""QuerySpec: one implemented operator = one Spark callable + one oracle."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    #: DuckDB SQL over the pre-registered views (region nation customer
    #: supplier part orders lineitem events documents embeddings); None for
    #: genuinely non-SQL-expressible ops (driver then does a rows-only check).
    oracle: str | None = None


def collect(modules) -> list[QuerySpec]:
    specs: list[QuerySpec] = []
    seen: set[str] = set()
    for m in modules:
        for spec in m.SPECS:
            if spec.name in seen:
                raise ValueError(f"duplicate query name {spec.name!r}")
            seen.add(spec.name)
            specs.append(spec)
    return specs
