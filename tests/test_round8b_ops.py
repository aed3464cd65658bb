"""Round-8 second-wave operators: Zipf rank-frequency head, model-score
calibration, incremental aggregate maintenance, and registry column
lifetimes — Python-recomputation invariants on top of the DuckDB oracle
gate (the oracle checks values; these check the CLAIMED semantics)."""

from __future__ import annotations


def test_zipf_head_is_ranked_and_cumulative(spark, sf_dir):
    from mysql_streamer_spark.queries.textops import ZIPF_TOP_K, q_text_zipf_fit

    rows = sorted(
        q_text_zipf_fit(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    assert 0 < len(rows) <= ZIPF_TOP_K
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # frequency is non-increasing with rank, and rank_freq is exactly
    # rank * frequency (the Zipf invariant column)
    for prev, cur in zip(rows, rows[1:]):
        assert prev.n_occurrences >= cur.n_occurrences
    for r in rows:
        assert r.rank_freq == r.rank * r.n_occurrences
    # cumulative share is the running sum of share and never exceeds 1
    cum = 0.0
    for r in rows:
        cum += r.share
        assert abs(r.cum_share - cum) < 1e-9
    assert rows[-1].cum_share <= 1.0 + 1e-9


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    """Every document lands in exactly one bin; the per-bin rule-pass
    total equals the corpus-wide rule gate recomputed directly."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark import text as tx
    from mysql_streamer_spark.queries.pipeline import (
        _rule_cols,
        q_pipeline_quality_calibration,
    )
    from mysql_streamer_spark.tables import load_table

    cal = q_pipeline_quality_calibration(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tx.tokens_col("text")
    )
    n_docs = docs.count()
    rule_pass = None
    for col in _rule_cols().values():
        rule_pass = col if rule_pass is None else (rule_pass & col)
    n_pass = docs.filter(rule_pass).count()

    assert sum(r.n_docs for r in cal) == n_docs
    assert sum(r.n_rule_pass for r in cal) == n_pass
    for r in cal:
        assert 0 <= r.n_rule_pass <= r.n_docs
        assert abs(r.rule_pass_rate - r.n_rule_pass / r.n_docs) < 1e-12
        # mean token weight is bounded by the weight range, so bins are too
        assert -2 * tx.MODEL_WEIGHT_CENTER <= r.score_bin
        assert r.score_bin <= 2 * tx.MODEL_WEIGHT_CENTER


def test_incremental_agg_running_view_matches_replayed_deltas(spark, sf_dir):
    """The maintained view columns are EXACTLY the running sums of the
    emitted daily deltas (per table, in day order), and the row delta is
    creates - deletes — the retract-stream algebra recomputed in Python."""
    from collections import defaultdict

    from mysql_streamer_spark.queries.cdc import q_cdc_incremental_agg

    rows = q_cdc_incremental_agg(spark, sf_dir).collect()
    assert rows
    by_table = defaultdict(list)
    for r in rows:
        assert r.row_delta == r.n_creates - r.n_deletes
        by_table[(r.database_name, r.table_name)].append(r)
    for series in by_table.values():
        series.sort(key=lambda r: r.day)
        run_sum, run_rows = 0.0, 0
        for r in series:
            run_sum = round(run_sum + r.delta_sum, 2)
            run_rows += r.row_delta
            assert abs(r.mv_sum - run_sum) < 1e-9, (r, run_sum)
            assert r.mv_rows == run_rows


def test_streaming_incremental_agg_equals_batch(spark, sf_dir):
    """Four micro-batch delta partials folded together must equal the
    one-pass batch materialized view exactly — the algebraic-merge
    contract the streaming MV maintenance relies on."""
    from mysql_streamer_spark.queries.cdc import q_cdc_incremental_agg
    from mysql_streamer_spark.queries.streaming_q import (
        q_streaming_incremental_agg,
    )

    key = lambda r: (r.database_name, r.table_name, r.day)  # noqa: E731
    batch = sorted(q_cdc_incremental_agg(spark, sf_dir).collect(), key=key)
    stream = sorted(
        q_streaming_incremental_agg(spark, sf_dir).collect(), key=key
    )
    assert [r.asDict() for r in stream] == [r.asDict() for r in batch]


def test_multimodal_exact_dedup_accounting(spark, sf_dir):
    """Byte and copy accounting recomputed from the raw blobs: unique +
    duplicate copies partition the blob count, and dedup'd bytes equal the
    sum of one blob size per distinct payload."""
    from collections import defaultdict

    from mysql_streamer_spark.multimodal import with_media_blob
    from mysql_streamer_spark.queries.multimodal import (
        q_multimodal_exact_dedup,
    )
    from mysql_streamer_spark.tables import load_table

    blobs = with_media_blob(load_table(spark, sf_dir, "documents")).collect()
    uniq: dict[str, dict[bytes, int]] = defaultdict(lambda: defaultdict(int))
    for r in blobs:
        uniq[r.media_type][bytes(r.payload)] += 1
    got = {r.media_type: r for r in q_multimodal_exact_dedup(spark, sf_dir).collect()}
    assert set(got) == set(uniq)
    for mt, counts in uniq.items():
        r = got[mt]
        assert r.n_blobs == sum(counts.values())
        assert r.n_unique == len(counts)
        assert r.n_dup_copies == r.n_blobs - r.n_unique
        assert r.bytes_unique == sum(len(p) for p in counts)
        assert r.bytes_total == sum(len(p) * n for p, n in counts.items())


def test_outlier_audit_matches_numpy_recomputation(spark, sf_dir):
    """The top-K centroid distances recomputed in numpy over the same
    quantization must match exactly (integer math end to end)."""
    import numpy as np

    from mysql_streamer_spark.queries.similarity import (
        OUTLIER_TOP_K,
        q_sim_outlier_audit,
    )
    from mysql_streamer_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").collect()
    qv = {
        r.vec_id: np.floor(
            np.array(r.embedding, dtype=np.float64) * 1_000_000
        ).astype(np.int64)
        for r in emb
    }
    mat = np.stack(list(qv.values()))
    cent = np.floor_divide(mat.sum(axis=0), len(qv))
    dist = {vid: int(((v - cent) ** 2).sum()) for vid, v in qv.items()}
    expected = sorted(dist.items(), key=lambda kv: (-kv[1], kv[0]))[
        :OUTLIER_TOP_K
    ]
    got = q_sim_outlier_audit(spark, sf_dir).collect()
    assert [(r.vec_id, r.dist_sq) for r in got] == expected


def test_forgotten_footprint_accounting(spark, sf_dir):
    """Subject-key accounting recomputed from the raw envelope: live +
    erased partition the subject keys, and liveness is exactly 'latest
    change by txn_order is not a delete'."""
    from collections import defaultdict

    from mysql_streamer_spark.cdc.pipeline import envelope_pipeline
    from mysql_streamer_spark.queries.cdc import (
        FORGET_MODULUS,
        FORGET_RESIDUE,
        q_cdc_forgotten_footprint,
    )

    env = envelope_pipeline(spark, sf_dir).collect()
    last: dict[tuple, tuple[int, str]] = {}
    msgs: dict[tuple[str, str], int] = defaultdict(int)
    for r in env:
        if r.pk % FORGET_MODULUS != FORGET_RESIDUE:
            continue
        msgs[(r.database_name, r.table_name)] += 1
        key = (r.database_name, r.table_name, r.pk)
        if key not in last or r.txn_order > last[key][0]:
            last[key] = (r.txn_order, r.message_type)
    keys: dict[tuple[str, str], set] = defaultdict(set)
    live: dict[tuple[str, str], int] = defaultdict(int)
    for (db, tbl, pk), (_, mt) in last.items():
        keys[(db, tbl)].add(pk)
        if mt != "delete":
            live[(db, tbl)] += 1
    got = {
        (r.database_name, r.table_name): r
        for r in q_cdc_forgotten_footprint(spark, sf_dir).collect()
    }
    assert set(got) == set(msgs)
    for tbl, r in got.items():
        assert r.n_messages == msgs[tbl]
        assert r.n_subject_keys == len(keys[tbl])
        assert r.n_live_keys == live[tbl]
        assert r.n_erased_keys == r.n_subject_keys - r.n_live_keys


def test_decontaminate_sweep_monotone_and_consistent(spark, sf_dir):
    """Flagged mass is non-increasing in n (an (n+1)-gram overlap implies
    an n-gram overlap), and the n = SHINGLE_K row equals the registered
    decontaminate operator's flagged-doc count."""
    from mysql_streamer_spark import text as tx
    from mysql_streamer_spark.queries.pipeline import (
        q_pipeline_decontaminate,
        q_pipeline_decontaminate_sweep,
    )

    rows = {
        r.ngram_n: r
        for r in q_pipeline_decontaminate_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == {2, 3, 4}
    assert (
        rows[2].n_flagged_docs
        >= rows[3].n_flagged_docs
        >= rows[4].n_flagged_docs
    )
    base_count = q_pipeline_decontaminate(spark, sf_dir).count()
    assert rows[tx.SHINGLE_K].n_flagged_docs == base_count


def test_state_diff_agrees_with_replayed_states(spark, sf_dir):
    """added/deleted/changed/unchanged counts recomputed in Python from
    the two point-in-time states the diff composes."""
    from collections import Counter

    from mysql_streamer_spark.cdc.envelope import TXN_FILE_SHIFT
    from mysql_streamer_spark.queries.cdc import (
        STATE_DIFF_FROM_FILE,
        STATE_DIFF_TO_FILE,
        point_in_time_state,
        q_cdc_state_diff,
    )

    a = {
        (r.database_name, r.table_name, r.pk): r.payload_val
        for r in point_in_time_state(
            spark, sf_dir, STATE_DIFF_FROM_FILE * TXN_FILE_SHIFT
        ).collect()
    }
    b = {
        (r.database_name, r.table_name, r.pk): r.payload_val
        for r in point_in_time_state(
            spark, sf_dir, STATE_DIFF_TO_FILE * TXN_FILE_SHIFT
        ).collect()
    }
    expected: Counter = Counter()
    for key in set(a) | set(b):
        db, tbl, _ = key
        if key not in a:
            kind = "added"
        elif key not in b:
            kind = "deleted"
        elif a[key] != b[key]:
            kind = "changed"
        else:
            kind = "unchanged"
        expected[(db, tbl, kind)] += 1
    got = {
        (r.database_name, r.table_name, r.change_kind): r.n_keys
        for r in q_cdc_state_diff(spark, sf_dir).collect()
    }
    assert got == dict(expected)


def test_column_stats_match_direct_aggregates(spark, sf_dir):
    """NDV / null / min / max recomputed per column straight off the
    loaded table."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.queries.analytics import (
        _COLUMN_STATS_COLS,
        q_analytics_column_stats,
    )
    from mysql_streamer_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n_rows = li.count()
    got = {
        r.column_name: r
        for r in q_analytics_column_stats(spark, sf_dir).collect()
    }
    assert set(got) == {c for c, _ in _COLUMN_STATS_COLS}
    for col, is_num in _COLUMN_STATS_COLS:
        r = got[col]
        assert r.n_rows == n_rows
        assert r.n_distinct == li.select(col).distinct().count()
        assert r.n_nulls == li.filter(F.col(col).isNull()).count()
        if is_num:
            mn, mx = li.agg(F.min(col), F.max(col)).first()
            assert r.min_num == float(mn) and r.max_num == float(mx)
        else:
            assert r.min_num is None and r.max_num is None


def test_message_size_profile_buckets_are_consistent(spark, sf_dir):
    """Bucket index is exactly the bit length of the message size (bucket
    b holds sizes in [2^(b-1), 2^b - 1]), totals partition the message
    count of the wire envelope, and bucket_bytes respects the per-bucket
    size bounds."""
    from mysql_streamer_spark.queries.cdc import (
        q_cdc_message_size_profile,
        q_cdc_wire_envelope,
    )

    rows = q_cdc_message_size_profile(spark, sf_dir).collect()
    assert rows
    n_wire = q_cdc_wire_envelope(spark, sf_dir).count()
    assert sum(r.n_messages for r in rows) == n_wire
    for r in rows:
        lo, hi = 2 ** (r.size_bucket - 1), 2**r.size_bucket - 1
        assert lo <= r.max_bytes <= hi
        assert r.n_messages * lo <= r.bucket_bytes <= r.n_messages * hi


def test_forgotten_apply_consistent_with_footprint(spark, sf_dir):
    """The apply form's erased-row count per table equals the footprint's
    live subject keys; erased rows carry no payload and a 32-hex token;
    untouched rows keep their raw pk."""
    from collections import Counter

    from mysql_streamer_spark.queries.cdc import (
        q_cdc_forgotten_apply,
        q_cdc_forgotten_footprint,
    )

    applied = q_cdc_forgotten_apply(spark, sf_dir).collect()
    erased = Counter()
    for r in applied:
        if r.is_erased:
            erased[(r.database_name, r.table_name)] += 1
            assert r.payload_val is None and r.payload_k is None
            assert len(r.pk_token) == 32 and not r.pk_token.isdigit()
        else:
            assert r.pk_token.lstrip("-").isdigit()
    fp = {
        (r.database_name, r.table_name): r.n_live_keys
        for r in q_cdc_forgotten_footprint(spark, sf_dir).collect()
    }
    for tbl, n_live in fp.items():
        assert erased.get(tbl, 0) == n_live


def test_column_lifetimes_agree_with_registry_api(spark, sf_dir):
    """is_live / version spans recomputed straight from the registry's
    Python history API must match the DataFrame derivation."""
    from mysql_streamer_spark.queries.schema_registry import (
        q_schema_registry_column_lifetimes,
    )
    from mysql_streamer_spark.schema.bootstrap import bootstrap_registry

    got = {
        (r.database, r.table, r.column_name): r
        for r in q_schema_registry_column_lifetimes(spark, sf_dir).collect()
    }
    reg = bootstrap_registry()
    expected: dict[tuple[str, str, str], dict] = {}
    for db, table in reg.tables():
        history = reg.history(db, table)
        latest_version = history[-1].version
        for e in history:
            for f in e.struct.fields:
                rec = expected.setdefault(
                    (db, table, f.name),
                    {"versions": [], "types": set()},
                )
                rec["versions"].append(e.version)
                rec["types"].add(f.dataType.simpleString())
                rec["latest"] = latest_version
    assert set(got) == set(expected)
    for key, rec in expected.items():
        r = got[key]
        vs = rec["versions"]
        assert r.first_version == min(vs)
        assert r.last_version == max(vs)
        assert r.n_versions_present == len(vs)
        assert r.n_types == len(rec["types"])
        assert r.is_live == (max(vs) == rec["latest"])
        assert r.was_readded == (len(vs) < max(vs) - min(vs) + 1)
