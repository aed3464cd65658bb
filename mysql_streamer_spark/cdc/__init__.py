"""CDC data plane: source adaptation, filters, envelope, changelog.

Mirrors the reference's DML hot path (SURVEY.md §2.1-§2.5):

    binlog source -> event-type filter -> row explode -> schema/table filter
      -> payload extraction + type transforms -> envelope (+transaction id)
      -> sink

re-expressed as declarative DataFrame transforms so Catalyst handles
pushdown, pruning and codegen.
"""

from mysql_streamer_spark.cdc.source import events_as_cdc, CDC_EVENT_COLUMNS
from mysql_streamer_spark.cdc.filters import (
    DEFAULT_SCHEMA_BLACKLIST,
    filter_blacklisted_schemas,
    filter_table_whitelist,
    split_heartbeats,
)
from mysql_streamer_spark.cdc.envelope import (
    reroute_refresh_tables,
    with_transaction_id,
    with_schema_ids,
    build_envelope,
)
from mysql_streamer_spark.cdc.changelog import changelog_projection

__all__ = [
    "events_as_cdc",
    "CDC_EVENT_COLUMNS",
    "DEFAULT_SCHEMA_BLACKLIST",
    "filter_blacklisted_schemas",
    "filter_table_whitelist",
    "split_heartbeats",
    "reroute_refresh_tables",
    "with_transaction_id",
    "with_schema_ids",
    "build_envelope",
    "changelog_projection",
]
