"""Property tests for the retract-stream MV algebra
(queries/cdc.py: incremental_daily_deltas + fold_incremental_mv):

1. against a pure-Python model of the retract semantics (signed
   integer-cent deltas, cumulative per table in day order), on random
   envelope streams;
2. the algebraic-merge contract: splitting the stream into ARBITRARY
   chunks, computing per-chunk delta partials and folding them, must
   equal the one-pass answer exactly — the property the streaming twin
   (four micro-batches) is one instance of, here tested at random split
   points.

Spark-per-example is expensive, so examples are few but each stream is
adversarial: colliding pks, repeated days, negative/zero values, and
update rows with extreme previous values.
"""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

_BASE = datetime.datetime(2024, 1, 1)

_event = st.tuples(
    st.sampled_from(["db_0", "db_1"]),          # database_name
    st.sampled_from(["clicks", "orders"]),      # table_name
    st.integers(min_value=0, max_value=4),      # day offset
    st.sampled_from(["create", "update", "delete"]),
    st.floats(
        min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
    ),                                           # payload_val
    st.floats(
        min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
    ),                                           # before_val (updates)
)

_streams = st.lists(_event, min_size=1, max_size=40)


def _frame(spark, events):
    rows = [
        (
            db,
            tbl,
            _BASE + datetime.timedelta(days=day, hours=1),
            mt,
            val,
            prev if mt == "update" else None,
        )
        for db, tbl, day, mt, val, prev in events
    ]
    return spark.createDataFrame(
        rows,
        "database_name string, table_name string, timestamp timestamp, "
        "message_type string, payload_val double, previous_payload_val double",
    )


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


def _model(events):
    """Pure-Python retract semantics -> {(db, tbl, day): (counts..., mv)}."""
    daily = defaultdict(lambda: [0, 0, 0, 0, 0])  # c, u, d, delta_c, rows
    for db, tbl, day, mt, val, prev in events:
        cell = daily[(db, tbl, day)]
        if mt == "create":
            cell[0] += 1
            cell[3] += _cents(val)
            cell[4] += 1
        elif mt == "update":
            cell[1] += 1
            cell[3] += _cents(val) - _cents(prev)
        else:
            cell[2] += 1
            cell[3] -= _cents(val)
            cell[4] -= 1
    out = {}
    cum = defaultdict(lambda: [0, 0])  # (db, tbl) -> [sum_c, rows]
    for (db, tbl, day) in sorted(daily):
        c, u, d, delta_c, rows = daily[(db, tbl, day)]
        cum[(db, tbl)][0] += delta_c
        cum[(db, tbl)][1] += rows
        out[(db, tbl, day)] = (
            c, u, d, delta_c, rows, cum[(db, tbl)][0], cum[(db, tbl)][1]
        )
    return out


def _collect_mv(df):
    got = {}
    for r in df.collect():
        day = (r.day.date() - _BASE.date()).days
        got[(r.database_name, r.table_name, day)] = (
            r.n_creates,
            r.n_updates,
            r.n_deletes,
            round(r.delta_sum * 100),
            r.row_delta,
            round(r.mv_sum * 100),
            r.mv_rows,
        )
    return got


@given(_streams)
@settings(max_examples=15, deadline=None)
def test_incremental_mv_matches_python_model(spark, events):
    from mysql_streamer_spark.queries.cdc import (
        fold_incremental_mv,
        incremental_daily_deltas,
    )

    got = _collect_mv(fold_incremental_mv(incremental_daily_deltas(_frame(spark, events))))
    assert got == _model(events)


@given(_streams, st.data())
@settings(max_examples=10, deadline=None)
def test_partial_fold_equals_one_pass(spark, events, data):
    """Random chunking: per-chunk partials folded == one-pass MV."""
    from mysql_streamer_spark.queries.cdc import (
        fold_incremental_mv,
        incremental_daily_deltas,
    )

    cut = data.draw(st.integers(min_value=0, max_value=len(events)))
    chunks = [events[:cut], events[cut:]]
    partials = [
        incremental_daily_deltas(_frame(spark, ch)) for ch in chunks if ch
    ]
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    via_chunks = _collect_mv(fold_incremental_mv(merged))
    one_pass = _collect_mv(
        fold_incremental_mv(incremental_daily_deltas(_frame(spark, events)))
    )
    assert via_chunks == one_pass


# ---------------------------------------------------------------------------
# skew.latest_by_key — the aggregate the latest-state / point-in-time /
# footprint family rides — property-tested against the window form
# ---------------------------------------------------------------------------

_kv = st.tuples(
    st.integers(min_value=0, max_value=6),      # key (collisions likely)
    st.integers(min_value=0, max_value=10_000), # order (uniqueness enforced below)
    st.text(alphabet="abcdef", min_size=0, max_size=4),
)


@given(st.lists(_kv, min_size=1, max_size=50))
@settings(max_examples=15, deadline=None)
def test_latest_by_key_equals_window_form(spark, rows):
    """max_by(struct(order, payload), order) per key must equal the
    row_number()-over-desc-order window — on random keys with heavy
    collisions. Order values are de-duplicated per key first (the
    documented precondition: order_col unique per key)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mysql_streamer_spark.skew import latest_by_key

    seen: set[tuple[int, int]] = set()
    uniq = []
    for k, o, v in rows:
        if (k, o) in seen:
            continue
        seen.add((k, o))
        uniq.append((k, o, v))
    df = spark.createDataFrame(uniq, "k long, ord long, payload string")
    via_agg = {
        (r.k): (r.ord, r.payload)
        for r in latest_by_key(
            df, keys=["k"], order_col="ord", payload_cols=["payload"]
        ).collect()
    }
    w = Window.partitionBy("k").orderBy(F.col("ord").desc())
    via_window = {
        r.k: (r.ord, r.payload)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert via_agg == via_window
