"""Multimodal queries: typed-metadata projection over binary payloads
(oracle-checked — the blob plumbing itself) and Arrow-batched feature
extraction (rows-only check: the fake-decode math lives in Python, which
DuckDB cannot mirror; its correctness is pinned by unit tests instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_streamer_spark.multimodal import extract_features, with_media_blob
from mysql_streamer_spark.queries.registry import QuerySpec
from mysql_streamer_spark.tables import load_table


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata: byte length of the opaque payload plus a
    source-level checksum — all JVM-side over BinaryType."""
    blobs = with_media_blob(load_table(spark, sf_dir, "documents"))
    return blobs.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("text").alias("checksum"),
    )


_METADATA_ORACLE = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS media_type,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS checksum
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path (deterministic fake decoder). The oracle
    recomputes the byte statistics in SQL (payload bytes are the text's
    ascii codes), so the Arrow-batched PYTHON path is value-checked
    end-to-end against an independent engine."""
    from mysql_streamer_spark.tables import spread

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    return extract_features(blobs)


def _features_oracle() -> str:
    from mysql_streamer_spark.multimodal import N_HIST_BINS

    # fake_decoder: video samples every 2nd byte; hist bin = code*BINS//256
    hist_bins = ", ".join(
        f"len(list_filter(codes, c -> c * {N_HIST_BINS} // 256 = {b}))"
        for b in range(N_HIST_BINS)
    )
    return f"""
WITH blobs AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image'
         WHEN doc_id % 3 = 1 THEN 'audio'
         ELSE 'video' END AS media_type,
    text
  FROM documents
), decoded AS (
  SELECT doc_id, media_type,
    octet_length(encode(text)) AS n_bytes,
    list_transform(
      generate_series(1, length(text),
                      CASE WHEN media_type = 'video' THEN 2 ELSE 1 END),
      i -> ascii(substring(text, i, 1))) AS codes
  FROM blobs
)
SELECT doc_id, media_type, n_bytes,
  CAST(list_sum(codes) AS DOUBLE) / len(codes) AS mean_byte,
  [{hist_bins}] AS byte_hist
FROM decoded
"""


SPECS = [
    QuerySpec("multimodal_metadata", q_multimodal_metadata, _METADATA_ORACLE),
    QuerySpec("multimodal_features", q_multimodal_features, _features_oracle()),
]
