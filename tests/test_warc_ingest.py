"""WARC connector (connectors/warc.py) + round-10 ingest queries.

The codec-test contract the PNG/WAV/AVI readers follow, applied to the
crawl-ingest container: encode . parse == id for arbitrary payload bytes,
unknown record types are length-walked and skipped, and torn containers
fail loudly instead of resynchronizing.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mysql_streamer_spark.connectors.warc import (
    warc_parse,
    warc_record,
    warc_write,
)


def _resp(i: int, payload: bytes) -> dict:
    return dict(
        record_type="response",
        record_id=f"<urn:doc:{i}>",
        date="2026-01-01T00:00:00Z",
        target_uri=f"http://src{i % 3}.example.com/doc/{i}",
        content_type="text/plain",
        payload=payload,
    )


@settings(max_examples=50, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=300), min_size=0, max_size=8
    )
)
def test_warc_roundtrip_property(payloads):
    """encode . parse == id for arbitrary payload bytes — including
    payloads that CONTAIN header-lookalike text, CRLFs, and the record
    terminator itself (Content-Length framing must never scan payload)."""
    records = [_resp(i, p) for i, p in enumerate(payloads)]
    got = warc_parse(warc_write(records))
    assert len(got) == len(records)
    for i, (rec, p) in enumerate(zip(got, payloads)):
        assert rec["payload"] == p
        assert rec["headers"]["WARC-Record-ID"] == f"<urn:doc:{i}>"
        assert rec["headers"]["Content-Length"] == str(len(p))
        assert rec["record_len"] == len(warc_record(**_resp(i, p)))


def test_warc_terminator_bytes_inside_payload():
    """The nastiest framing case spelled out: a payload that is exactly
    CRLF CRLF must not terminate the record early."""
    p = b"\r\n\r\n"
    got = warc_parse(warc_write([_resp(0, p)]))
    assert got[0]["payload"] == p


def test_warc_unknown_type_skip():
    """metadata/request records are length-walked and skipped when a type
    filter is given — and the skip consumes exactly the right span (the
    NEXT record still parses)."""
    blob = warc_write(
        [
            _resp(1, b"keep me"),
            dict(
                record_type="metadata",
                record_id="<urn:meta:1>",
                date="2026-01-01T00:00:00Z",
                content_type="application/warc-fields",
                payload=b"via: crawler/1",
            ),
            _resp(2, b"me too"),
        ]
    )
    got = warc_parse(blob, types=("response",))
    assert [r["payload"] for r in got] == [b"keep me", b"me too"]
    assert len(warc_parse(blob)) == 3  # no filter keeps all


def test_warc_parse_fails_loudly():
    """Torn containers raise ValueError with the failing offset — bad
    version line, truncated payload, missing terminator, garbled
    Content-Length. No silent resync."""
    good = warc_write([_resp(0, b"abcdef")])
    with pytest.raises(ValueError, match="bad version"):
        warc_parse(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="version"):
        warc_parse(b"WARC")
    with pytest.raises(ValueError, match="truncated"):
        warc_parse(good[:-6])
    with pytest.raises(ValueError, match="terminator"):
        warc_parse(good[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="Content-Length"):
        warc_parse(good.replace(b"Content-Length: 6", b"Content-Length: x"))
    # a record missing Content-Length entirely
    torn = good.replace(b"Content-Length: 6\r\n", b"")
    with pytest.raises(ValueError):
        warc_parse(torn)


def test_warc_lying_content_length_fails():
    """A container whose Content-Length overruns the blob is corrupt —
    the walk must not read past the end or clamp."""
    bad = warc_write([_resp(0, b"abcdef")]).replace(
        b"Content-Length: 6", b"Content-Length: 60"
    )
    with pytest.raises(ValueError):
        warc_parse(bad)


def test_warc_11_version_accepted():
    blob = warc_write([_resp(0, b"x")]).replace(b"WARC/1.0", b"WARC/1.1")
    assert warc_parse(blob)[0]["payload"] == b"x"


# ---------------------------------------------------------------------------
# URL canonicalization — rule-level unit checks against hand-computed
# canonical forms (the registered query's oracle is closed-form; this
# pins individual rules so a failure names the broken rule)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,canonical",
    [
        # scheme+host case, default port, fragment
        (
            "HTTP://SRC1.Example.COM:80/page/7#s2",
            "http://src1.example.com/page/7",
        ),
        # trailing slash trim
        ("http://src2.example.com/page/9/", "http://src2.example.com/page/9"),
        # utm_* dropped, survivors sorted
        (
            "http://src3.example.com/page/1?utm_source=feed&b=2&a=1",
            "http://src3.example.com/page/1?a=1&b=2",
        ),
        # only-utm query collapses to no query at all
        (
            "http://src4.example.com/page/2?utm_source=feed",
            "http://src4.example.com/page/2",
        ),
        # non-default port is KEPT (only the scheme default is stripped)
        (
            "http://src5.example.com:8080/page/3",
            "http://src5.example.com:8080/page/3",
        ),
    ],
)
def test_url_canonicalization_rules(spark, raw, canonical):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(raw,)], "raw_url string")
    got = (
        df.withColumn(
            "kept_params",
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.split(
                            F.coalesce(
                                F.expr("parse_url(raw_url, 'QUERY')"),
                                F.lit(""),
                            ),
                            "&",
                        ),
                        lambda p: (p != "") & ~p.startswith("utm_"),
                    )
                ),
                "&",
            ),
        )
        .select(
            F.concat(
                F.lower(F.expr("parse_url(raw_url, 'PROTOCOL')")),
                F.lit("://"),
                F.regexp_replace(
                    F.lower(F.expr("parse_url(raw_url, 'AUTHORITY')")),
                    ":80$",
                    "",
                ),
                F.regexp_replace(
                    F.expr("parse_url(raw_url, 'PATH')"), "/$", ""
                ),
                F.when(
                    F.col("kept_params") != "",
                    F.concat(F.lit("?"), F.col("kept_params")),
                ).otherwise(F.lit("")),
            ).alias("canonical_url")
        )
        .collect()[0][0]
    )
    assert got == canonical


def test_robots_longest_match_and_allow_tie(spark):
    """RFC 9309 precedence pinned at the expression level: longest
    matching prefix decides, and at EQUAL length Allow beats Disallow
    (the registered fixture never ties, so the tie rule is pinned here).
    The max(struct(plen, allow, ...)) argmax encodes both: plen first,
    then allow=true > false."""
    from pyspark.sql import functions as F

    rules = spark.createDataFrame(
        [
            ("h", "", True, 0),
            ("h", "/a", False, 2),
            ("h", "/a", True, 2),  # same-length Allow: must win the tie
            ("h", "/a/b", False, 4),  # longer Disallow: must win under /a/b
        ],
        "host string, prefix string, allow boolean, plen int",
    )
    urls = spark.createDataFrame(
        [("h", "/a/x"), ("h", "/a/b/c"), ("h", "/z")],
        "host string, path string",
    )
    got = {
        r["path"]: r["m"]["allow"]
        for r in urls.join(rules, "host")
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("path")
        .agg(F.max(F.struct("plen", "allow", "prefix")).alias("m"))
        .collect()
    }
    assert got == {"/a/x": True, "/a/b/c": False, "/z": True}


def test_warc_file_sink_source_roundtrip(spark, tmp_path):
    """Distributed file sink -> binaryFile source: every response comes
    back (metadata skipped under the type filter, present without it),
    payload bytes intact, across multiple partitions/files."""
    from mysql_streamer_spark.connectors.warc import (
        warc_read_files,
        warc_write_files,
    )

    docs = spark.createDataFrame(
        [(i, f"src{i % 2}", f"text body {i}") for i in range(10)],
        "doc_id long, source string, text string",
    ).repartition(3)
    out = str(tmp_path / "warcs")
    warc_write_files(docs, out, "2026-01-01T00:00:00Z")

    kept = warc_read_files(spark, out, types=("response",)).collect()
    assert len(kept) == 10
    got = {
        int(r["record_id"][9:-1]): bytes(r["payload"]).decode() for r in kept
    }
    assert got == {i: f"text body {i}" for i in range(10)}
    # without the filter the metadata records are present too
    assert warc_read_files(spark, out).count() == 20


def _drop_docs(spark, out, ids):
    from mysql_streamer_spark.connectors.warc import warc_write_files

    docs = spark.createDataFrame(
        [(i, f"src{i % 2}", f"text body {i}") for i in ids],
        "doc_id long, source string, text string",
    ).coalesce(1)
    warc_write_files(docs, out, "2026-01-01T00:00:00Z")


def test_warc_stream_resumes_from_checkpoint(spark, tmp_path):
    """availableNow drain, new containers drop, second drain with the
    SAME checkpoint: only the new files are read (no duplicates), the
    union is complete — the offset manifest is doing its job."""
    from pyspark.sql import functions as F

    from mysql_streamer_spark.connectors.warc import register_warc_source

    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register_warc_source(spark)

    def drain():
        recs = (
            spark.readStream.format("warc_files")
            .option("path", drop)
            .option("types", "response")
            .load()
            .select(
                F.regexp_extract("record_id", r"<urn:doc:(\d+)>", 1)
                .cast("long")
                .alias("doc_id")
            )
        )

        def write_batch(df, batch_id):
            df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

        q = (
            recs.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _drop_docs(spark, drop, range(0, 4))
    drain()
    got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == set(range(0, 4))

    _drop_docs(spark, drop, range(4, 7))
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 7  # no re-reads of committed containers
    assert {r["doc_id"] for r in rows} == set(range(0, 7))


def test_warc_stream_rejects_non_append_mutation(spark, tmp_path):
    """Removing a committed container between drains must fail loudly
    (manifest-extension guard), not silently remap offsets."""
    import os

    from mysql_streamer_spark.connectors.warc import register_warc_source

    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register_warc_source(spark)

    def drain():
        recs = (
            spark.readStream.format("warc_files")
            .option("path", drop)
            .load()
        )

        def write_batch(df, batch_id):
            df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

        q = (
            recs.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _drop_docs(spark, drop, range(0, 3))
    drain()
    victim = sorted(
        f for f in os.listdir(drop) if f.endswith(".warc")
    )[0]
    os.remove(os.path.join(drop, victim))
    _drop_docs(spark, drop, range(3, 4))
    import pytest as _pytest

    with _pytest.raises(Exception, match="non-append-only"):
        drain()


def test_warc_batch_datasource_reads_files(spark, tmp_path):
    """The batch form of format('warc_files'): file-parallel listing,
    type filter honored."""
    from mysql_streamer_spark.connectors.warc import register_warc_source

    drop = str(tmp_path / "drop")
    _drop_docs(spark, drop, range(0, 6))
    register_warc_source(spark)
    df = (
        spark.read.format("warc_files")
        .option("path", drop)
        .option("types", "response")
        .load()
    )
    assert df.count() == 6
    assert (
        spark.read.format("warc_files").option("path", drop).load().count()
        == 12
    )


def test_http_response_roundtrip_and_loud_failures():
    from mysql_streamer_spark.connectors.warc import (
        http_response_bytes,
        http_response_parse,
    )

    body = b"hello \r\n\r\n world"  # separator bytes INSIDE the body
    raw = http_response_bytes(
        200, body, [("Content-Type", "text/plain"), ("X-A", "b: c")]
    )
    got = http_response_parse(raw)
    assert got["status"] == 200
    assert got["body"] == body
    assert got["headers"]["Content-Length"] == str(len(body))
    assert got["headers"]["X-A"] == "b: c"  # first colon splits

    import pytest as _pytest

    with _pytest.raises(ValueError, match="separator"):
        http_response_parse(b"HTTP/1.1 200 OK\r\nContent-Length: 0")
    with _pytest.raises(ValueError, match="status"):
        http_response_parse(b"not http at all\r\n\r\n")
    with _pytest.raises(ValueError, match="status"):
        http_response_parse(b"HTTP/1.1 abc OK\r\n\r\n")


def test_robots_parser_group_model():
    """RFC 9309 group semantics: multi-agent groups, specific-beats-*,
    decoy groups skipped, comments/unknown directives tolerated, empty
    Disallow contributes nothing, groupless rules ignored, UA line after
    rules starts a new group."""
    from mysql_streamer_spark.robots import parse_robots

    txt = (
        "Disallow: /orphan\n"  # groupless: ignored
        "User-agent: other-bot\n"
        "Disallow: /\n"
        "User-agent: mss-crawler  # trailing comment\n"
        "User-agent: backup-bot\n"
        "Crawl-delay: 5\n"
        "Disallow: /a\n"
        "Allow: /a/b\n"
        "Disallow:\n"  # empty: no rule
        "User-agent: *\n"
        "Disallow: /everything\n"
    )
    assert parse_robots(txt, "MSS-Crawler") == [
        ("", True),
        ("/a", False),
        ("/a/b", True),
    ]
    # the co-listed agent gets the same group
    assert parse_robots(txt, "backup-bot")[1:] == [("/a", False), ("/a/b", True)]
    # an unknown agent falls back to '*'
    assert parse_robots(txt, "stranger") == [("", True), ("/everything", False)]
    # the decoy group is chosen only by its own agent
    assert parse_robots(txt, "other-bot") == [("", True), ("/", False)]
    # empty file: crawl anything
    assert parse_robots("", "mss-crawler") == [("", True)]
    # no matching group and no '*': crawl anything
    assert parse_robots("User-agent: x\nDisallow: /\n", "y") == [("", True)]
