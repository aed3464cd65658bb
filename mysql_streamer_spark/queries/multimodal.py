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
    feats = extract_features(blobs)
    # histogram joined to a string for the gate: the driver's pandas
    # canonicalizer cannot sort/hash list cells (the operator itself keeps
    # the typed array<bigint> column)
    return feats.withColumn(
        "byte_hist",
        F.array_join(F.transform("byte_hist", lambda x: x.cast("string")), ","),
    )


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
  array_to_string([{hist_bins}], ',') AS byte_hist
FROM decoded
"""


def q_multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL-codec decode path, end-to-end: every document's bytes are
    encoded into a genuine PNG (zlib IDAT, CRC-verified chunks — the
    in-repo pure-Python writer, W3C PNG spec) in one Arrow-batched stage,
    then DECODED back through ``real_image_decoder`` — PIL where
    installed, the pure PNG reader otherwise — and pixel statistics are
    hash-matched against the source bytes computed independently in SQL.
    A match proves the full encode -> compress -> chunk -> CRC -> decode
    -> unfilter loop lossless; any codec corruption fails the CRC or the
    stats. This closes the 'decode is stubbed' gap for the one image
    format a container without media libraries can still decode for real.

    Scale shape: two map-only Arrow stages (encode, decode) over the
    documents partitioning — no shuffle, no collect; the pixel loop is
    the documented per-blob Python cost of the decode family."""
    import pandas as pd

    from mysql_streamer_spark.multimodal import png_encode, real_image_decoder
    from mysql_streamer_spark.tables import spread

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                data = t.encode("utf-8")
                payloads.append(png_encode(len(data), 1, data, channels=1))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": ["image"] * len(pdf),
                    "payload": payloads,
                }
            )

    blobs = docs.mapInPandas(
        encode, "doc_id long, media_type string, payload binary"
    )
    feats = extract_features(blobs, decoder=real_image_decoder)
    # n_pixels re-derived from the histogram total (the PNG byte size is
    # zlib-dependent, deliberately not part of the checked surface)
    return feats.select(
        "doc_id",
        F.aggregate(
            "byte_hist", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_pixels"),
        F.col("mean_byte").alias("mean_pixel"),
        F.array_join(
            F.transform("byte_hist", lambda x: x.cast("string")), ","
        ).alias("pixel_hist"),
    )


def _real_decode_oracle() -> str:
    from mysql_streamer_spark.multimodal import N_HIST_BINS

    hist_bins = ", ".join(
        f"len(list_filter(codes, c -> c * {N_HIST_BINS} // 256 = {b}))"
        for b in range(N_HIST_BINS)
    )
    return f"""
WITH decoded AS (
  SELECT doc_id,
    list_transform(generate_series(1, length(text), 1),
                   i -> ascii(substring(text, i, 1))) AS codes
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
  CAST(len(codes) AS BIGINT) AS n_pixels,
  CAST(list_sum(codes) AS DOUBLE) / len(codes) AS mean_pixel,
  array_to_string([{hist_bins}], ',') AS pixel_hist
FROM decoded
"""


def _wav_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's UTF-8 bytes encoded into a GENUINE RIFF-PCM WAV
    (byte value == 16-bit sample value) in one Arrow-batched stage — the
    audio twin of the PNG encode stage in q_multimodal_real_decode."""
    import pandas as pd

    from mysql_streamer_spark.multimodal import wav_encode
    from mysql_streamer_spark.tables import spread

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )

    def encode(batches):
        for pdf in batches:
            payloads = [
                wav_encode(list(t.encode("utf-8"))) for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": ["audio"] * len(pdf),
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(
        encode, "doc_id long, media_type string, payload binary"
    )


def q_multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio-codec path, end-to-end: document bytes become 16-bit
    PCM samples inside a genuine RIFF/WAVE container (in-repo pure-Python
    writer, public RIFF spec), then decode back through the chunk-walking
    WAV reader (multimodal.wav_decode via real_media_decoder), and the
    SAMPLE statistics hash-match the source bytes recomputed in SQL — the
    same lossless-roundtrip proof the PNG codec got in round 9, closing
    the 'audio decode is stubbed' gap. Unlike PNG (zlib-dependent), the
    WAV container size is a closed form, so ``payload_bytes`` = 44 + 2n
    is part of the checked surface.

    Scale shape: two map-only Arrow stages (encode, decode) over the
    documents partitioning — no shuffle, no collect."""
    from mysql_streamer_spark.multimodal import real_media_decoder

    feats = extract_features(_wav_blobs(spark, sf_dir), decoder=real_media_decoder)
    return feats.select(
        "doc_id",
        F.aggregate(
            "byte_hist", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_samples"),
        F.col("n_bytes").cast("long").alias("payload_bytes"),
        F.col("mean_byte").alias("mean_sample"),
        F.array_join(
            F.transform("byte_hist", lambda x: x.cast("string")), ","
        ).alias("sample_hist"),
    )


def _wav_roundtrip_oracle() -> str:
    from mysql_streamer_spark.multimodal import N_HIST_BINS

    hist_bins = ", ".join(
        f"len(list_filter(codes, c -> c * {N_HIST_BINS} // 256 = {b}))"
        for b in range(N_HIST_BINS)
    )
    return f"""
WITH decoded AS (
  SELECT doc_id,
    list_transform(generate_series(1, length(text), 1),
                   i -> ascii(substring(text, i, 1))) AS codes
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
  CAST(len(codes) AS BIGINT) AS n_samples,
  CAST(44 + 2 * len(codes) AS BIGINT) AS payload_bytes,
  CAST(list_sum(codes) AS DOUBLE) / len(codes) AS mean_sample,
  array_to_string([{hist_bins}], ',') AS sample_hist
FROM decoded
"""


def q_multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The energy/peak meter over GENUINELY DECODED PCM: each WAV payload
    is decoded inside the Arrow kernel (chunk walk, fmt validation,
    16-bit LE unpack) and the meter windows the decoded samples — where
    multimodal_audio_energy meters the raw byte stream, this one proves
    the meter math on the other side of a real codec. The oracle
    recomputes every window's sum and max from the source bytes, so a
    hash match pins encode -> container -> decode -> meter end-to-end.

    Scale shape: encode + decode+meter are two map-only Arrow stages over
    the documents partitioning; windows per clip are bounded
    (MAX_WINDOWS), so output stays O(docs)."""
    import numpy as np
    import pandas as pd

    from mysql_streamer_spark.multimodal import (
        ENERGY_SCHEMA,
        MAX_WINDOWS,
        WINDOW_BYTES,
        wav_decode,
    )

    def meter(batches):
        for pdf in batches:
            out: dict[str, list[int]] = {
                "doc_id": [], "window_idx": [], "energy": [], "peak": []
            }
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.array(
                    wav_decode(bytes(pl))["samples"], dtype=np.int64
                )
                n_win = min(len(samples) // WINDOW_BYTES, MAX_WINDOWS)
                if n_win == 0:
                    continue
                w = samples[: n_win * WINDOW_BYTES].reshape(n_win, WINDOW_BYTES)
                out["doc_id"].extend([int(doc_id)] * n_win)
                out["window_idx"].extend(range(n_win))
                out["energy"].extend(w.sum(axis=1).tolist())
                out["peak"].extend(w.max(axis=1).tolist())
            yield pd.DataFrame(out)

    blobs = _wav_blobs(spark, sf_dir)
    return blobs.select("doc_id", "payload").mapInPandas(meter, ENERGY_SCHEMA)


def _wav_energy_oracle() -> str:
    from mysql_streamer_spark.multimodal import MAX_WINDOWS, WINDOW_BYTES

    return f"""
WITH audio AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n
  FROM documents WHERE length(text) > 0
), wins AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           least(CAST(n // {WINDOW_BYTES} AS BIGINT), {MAX_WINDOWS}) - 1))
           AS window_idx
  FROM audio
  WHERE n >= {WINDOW_BYTES}
)
SELECT doc_id, window_idx,
  CAST(list_sum(list_transform(generate_series(1, {WINDOW_BYTES}),
       i -> ascii(substr(text, CAST(window_idx * {WINDOW_BYTES} AS INT) + i, 1))))
    AS BIGINT) AS energy,
  CAST(list_max(list_transform(generate_series(1, {WINDOW_BYTES}),
       i -> ascii(substr(text, CAST(window_idx * {WINDOW_BYTES} AS INT) + i, 1))))
    AS BIGINT) AS peak
FROM wins
"""


#: synthesized-clip geometry: 7x6 grayscale frames (42 px; width 7 keeps
#: the DIB row padding path hot — 21 BGR bytes pad to 24), capped frames
AVI_W, AVI_H, AVI_MAX_FRAMES = 7, 6, 12


def _avi_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every long-enough document's UTF-8 bytes tiled into GENUINE
    RIFF-AVI clips of 24-bit BI_RGB DIB frames (byte value == gray pixel)
    in one Arrow-batched stage — the video twin of _wav_blobs."""
    import pandas as pd

    from mysql_streamer_spark.multimodal import avi_encode
    from mysql_streamer_spark.tables import spread

    px = AVI_W * AVI_H
    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "text")
        .filter(F.octet_length("text") >= px)
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                n = min(len(raw) // px, AVI_MAX_FRAMES)
                frames = [raw[i * px : (i + 1) * px] for i in range(n)]
                payloads.append(avi_encode(frames, AVI_W, AVI_H))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": ["video"] * len(pdf),
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(
        encode, "doc_id long, media_type string, payload binary"
    )


def q_multimodal_avi_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL video-codec path, end-to-end: document bytes become
    grayscale frames inside a genuine RIFF-AVI container of uncompressed
    24-bit BI_RGB DIBs (in-repo pure-Python writer, public MS RIFF/AVI
    spec — bottom-up rows, 4-byte row padding, nested LIST walk), then
    decode back through multimodal.avi_decode via real_media_decoder,
    and the PIXEL statistics hash-match the source bytes recomputed in
    SQL — the roundtrip proof PNG got in r9 and WAV earlier in r10,
    closing the last 'decode is stubbed' media family. The container
    size is a closed form (AVI_HEADER_BYTES + n*(8 + row_bytes*h)), so
    ``payload_bytes`` is part of the checked surface.

    Scale shape: two map-only Arrow stages (encode, decode) over the
    documents partitioning — no shuffle, no collect."""
    from mysql_streamer_spark.multimodal import real_media_decoder

    feats = extract_features(_avi_blobs(spark, sf_dir), decoder=real_media_decoder)
    return feats.select(
        "doc_id",
        F.aggregate(
            "byte_hist", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("n_pixels"),
        F.col("n_bytes").cast("long").alias("payload_bytes"),
        F.col("mean_byte").alias("mean_pixel"),
        F.array_join(
            F.transform("byte_hist", lambda x: x.cast("string")), ","
        ).alias("pixel_hist"),
    )


def _avi_roundtrip_oracle() -> str:
    from mysql_streamer_spark.multimodal import (
        AVI_HEADER_BYTES,
        N_HIST_BINS,
        _avi_row_bytes,
    )

    px = AVI_W * AVI_H
    per_frame = 8 + _avi_row_bytes(AVI_W) * AVI_H
    hist_bins = ", ".join(
        f"len(list_filter(codes, c -> c * {N_HIST_BINS} // 256 = {b}))"
        for b in range(N_HIST_BINS)
    )
    return f"""
WITH clips AS (
  SELECT doc_id, text,
         least(octet_length(encode(text)) // {px}, {AVI_MAX_FRAMES}) AS n
  FROM documents WHERE octet_length(encode(text)) >= {px}
), decoded AS (
  SELECT doc_id, n,
    list_transform(generate_series(1, CAST(n * {px} AS INT), 1),
                   i -> ascii(substring(text, i, 1))) AS codes
  FROM clips
)
SELECT doc_id,
  CAST(n * {px} AS BIGINT) AS n_pixels,
  CAST({AVI_HEADER_BYTES} + n * {per_frame} AS BIGINT) AS payload_bytes,
  CAST(list_sum(codes) AS DOUBLE) / (n * {px}) AS mean_pixel,
  array_to_string([{hist_bins}], ',') AS pixel_hist
FROM decoded
"""


def q_multimodal_avi_framestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame statistics over GENUINELY DECODED video: each AVI payload
    is decoded inside the Arrow kernel (nested LIST walk, BI_RGB
    validation, bottom-up de-padding) and every frame reports its pixel
    sum and peak — where multimodal_frame_sample samples the raw byte
    stream, this one proves the frame math on the other side of a real
    container. The oracle recomputes every frame window from the source
    bytes, pinning encode -> container -> decode -> per-frame reduce.

    Scale shape: encode + decode are two map-only Arrow stages over the
    documents partitioning; frames per clip are bounded
    (AVI_MAX_FRAMES), so output stays O(docs)."""
    import numpy as np
    import pandas as pd

    from mysql_streamer_spark.multimodal import avi_decode

    def framestats(batches):
        for pdf in batches:
            out: dict[str, list[int]] = {
                "doc_id": [], "frame_idx": [], "pix_sum": [], "pix_max": []
            }
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in enumerate(avi_decode(bytes(pl))["frames"]):
                    arr = np.frombuffer(frame, dtype=np.uint8)
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["pix_sum"].append(int(arr.sum()))
                    out["pix_max"].append(int(arr.max()))
            yield pd.DataFrame(out)

    return _avi_blobs(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        framestats,
        "doc_id long, frame_idx long, pix_sum long, pix_max long",
    )


def _avi_framestats_oracle() -> str:
    px = AVI_W * AVI_H
    return f"""
WITH clips AS (
  SELECT doc_id, text,
         least(octet_length(encode(text)) // {px}, {AVI_MAX_FRAMES}) AS n
  FROM documents WHERE octet_length(encode(text)) >= {px}
), frames AS (
  SELECT doc_id, text,
         unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS frame_idx
  FROM clips
)
SELECT doc_id, frame_idx,
  CAST(list_sum(list_transform(generate_series(1, {px}),
       i -> ascii(substr(text, CAST(frame_idx * {px} AS INT) + i, 1))))
    AS BIGINT) AS pix_sum,
  CAST(list_max(list_transform(generate_series(1, {px}),
       i -> ascii(substr(text, CAST(frame_idx * {px} AS INT) + i, 1))))
    AS BIGINT) AS pix_max
FROM frames
"""


def q_multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable-store audit over the binary payloads: exact
    byte-level dedup by sha2-256 content key, reported per media type —
    blob count, unique-content count, duplicate copies, and exact byte
    totals before/after dedup (the storage-savings number a media lake
    dedup pass is judged by; the byte-level complement to
    ``multimodal_phash_dedup``'s perceptual tier).

    Scale shape: ONE hash aggregate on (media_type, sha2(payload)) — the
    64-hex content key is all that shuffles, never the blob bytes — then
    a second aggregate to the 3-row media-type report. sha2 is JVM-side
    whole-stage codegen; at 100 TB this runs at scan bandwidth. The
    oracle groups by the decoded text itself (payload is its UTF-8), so
    the two engines agree without comparing hash implementations."""
    blobs = with_media_blob(load_table(spark, sf_dir, "documents"))
    per_key = blobs.groupBy(
        "media_type", F.sha2("payload", 256).alias("content_key")
    ).agg(
        F.count("*").alias("n_copies"),
        F.min(F.octet_length("payload")).cast("long").alias("blob_bytes"),
    )
    return (
        per_key.groupBy("media_type")
        .agg(
            F.sum("n_copies").alias("n_blobs"),
            F.count("*").alias("n_unique"),
            (F.sum("n_copies") - F.count("*")).alias("n_dup_copies"),
            F.sum(F.col("blob_bytes") * F.col("n_copies")).alias("bytes_total"),
            F.sum("blob_bytes").alias("bytes_unique"),
        )
        .select(
            "media_type",
            "n_blobs",
            "n_unique",
            "n_dup_copies",
            "bytes_total",
            "bytes_unique",
            (
                F.col("bytes_unique").cast("double")
                / F.col("bytes_total").cast("double")
            ).alias("unique_byte_share"),
        )
    )


_EXACT_DEDUP_ORACLE = """
WITH blobs AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image'
         WHEN doc_id % 3 = 1 THEN 'audio'
         ELSE 'video' END AS media_type,
    text,
    octet_length(encode(text)) AS blob_bytes
  FROM documents
), per_key AS (
  SELECT media_type, text,
    CAST(count(*) AS BIGINT) AS n_copies,
    CAST(min(blob_bytes) AS BIGINT) AS blob_bytes
  FROM blobs GROUP BY 1, 2
)
SELECT media_type,
  CAST(sum(n_copies) AS BIGINT) AS n_blobs,
  CAST(count(*) AS BIGINT) AS n_unique,
  CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dup_copies,
  CAST(sum(blob_bytes * n_copies) AS BIGINT) AS bytes_total,
  CAST(sum(blob_bytes) AS BIGINT) AS bytes_unique,
  CAST(sum(blob_bytes) AS DOUBLE) / CAST(sum(blob_bytes * n_copies) AS DOUBLE)
    AS unique_byte_share
FROM per_key
GROUP BY media_type
"""


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (multimodal.sample_frames): every 64th-byte
    32-byte window per video blob with its md5 frame key — the Arrow
    fan-out path (one input row -> N frame rows inside the Python stage),
    oracle-checked against a pure-SQL byte recomputation."""
    from mysql_streamer_spark.multimodal import sample_frames
    from mysql_streamer_spark.tables import spread

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    return sample_frames(blobs)


def _frames_oracle() -> str:
    from mysql_streamer_spark.multimodal import FRAME_BYTES, FRAME_STRIDE

    frame = f"substring(text, start1, {FRAME_BYTES})"
    return f"""
WITH video AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
), frames AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text), {FRAME_STRIDE})) AS start1
  FROM video
)
SELECT doc_id,
       CAST((start1 - 1) / {FRAME_STRIDE} AS BIGINT) AS frame_idx,
       CAST(start1 - 1 AS BIGINT) AS frame_offset,
       CAST(length({frame}) AS BIGINT) AS n_frame_bytes,
       md5({frame}) AS frame_hash,
       CAST(list_sum(list_transform(string_split_regex({frame}, ''),
                                    c -> ascii(c))) AS DOUBLE)
         / length({frame}) AS mean_byte
FROM frames
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize/downsample stage (brief: decode / feature-extract /
    resize / frame-sample): fixed-bucket box-filter thumbnails over image
    payloads via mapInPandas. The oracle recomputes the bucket means, the
    thumbnail bytes, and their md5 entirely in SQL, so the Python resize
    path is value-checked end-to-end including the hash of the resized
    artifact."""
    from mysql_streamer_spark.multimodal import resize_thumbnails
    from mysql_streamer_spark.tables import spread

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    return resize_thumbnails(blobs)


def _thumb_bucket_vals_sql(cast: str) -> str:
    """The ONE SQL reconstruction of the fake-decoder box filter (pixel i
    = floor mean of its byte range) — every oracle that needs the
    thumbnail derives it from here so the kernel and its SQL mirror can
    only change together."""
    from mysql_streamer_spark.multimodal import THUMB_PIXELS

    return ", ".join(
        f"""CAST(list_sum(list_transform(generate_series(
              {i} * n // {THUMB_PIXELS} + 1, ({i} + 1) * n // {THUMB_PIXELS}),
              j -> ascii(substring(text, j, 1))))
            // greatest(1, ({i} + 1) * n // {THUMB_PIXELS} - {i} * n // {THUMB_PIXELS})
            AS {cast})"""
        for i in range(THUMB_PIXELS)
    )


def _ahash_hashed_ctes() -> str:
    """img -> buckets -> hashed CTE chain reconstructing the integer
    aHash in SQL; shared by every phash oracle."""
    from mysql_streamer_spark.multimodal import THUMB_PIXELS

    bits = " + ".join(
        f"CASE WHEN thumb[{i + 1}] * {THUMB_PIXELS} > total THEN {1 << i} ELSE 0 END"
        for i in range(THUMB_PIXELS)
    )
    return f"""
WITH img AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 0
), buckets AS (
  SELECT doc_id, [{_thumb_bucket_vals_sql("BIGINT")}] AS thumb FROM img
), hashed AS (
  SELECT doc_id, CAST({bits} AS BIGINT) AS phash
  FROM (SELECT doc_id, thumb, list_sum(thumb) AS total FROM buckets)
)"""


def _resize_oracle() -> str:
    from mysql_streamer_spark.multimodal import THUMB_PIXELS

    return f"""
WITH img AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents WHERE doc_id % 3 = 0
), buckets AS (
  SELECT doc_id, n, [{_thumb_bucket_vals_sql("INT")}] AS thumb
  FROM img
)
SELECT doc_id,
       CAST(n AS INT) AS n_bytes,
       md5(list_reduce(list_transform(thumb, v -> chr(v)), (a, b) -> a || b))
         AS thumb_hash,
       CAST(list_sum(thumb) AS DOUBLE) / {THUMB_PIXELS} AS thumb_mean
FROM buckets
"""


def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed energy/peak meter over the 'audio' byte streams via the
    Arrow/numpy kernel (multimodal.audio_energy). The oracle recomputes
    every window's integer byte-sum and max in SQL from the same text
    bytes (ascii == byte value for this corpus), value-checking the
    vectorized PYTHON path end-to-end like the other Arrow kernels."""
    from mysql_streamer_spark.multimodal import audio_energy
    from mysql_streamer_spark.tables import spread

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    return audio_energy(blobs)


def _audio_energy_oracle() -> str:
    from mysql_streamer_spark.multimodal import MAX_WINDOWS, WINDOW_BYTES

    return f"""
WITH audio AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 1
), wins AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           least(CAST(n // {WINDOW_BYTES} AS BIGINT), {MAX_WINDOWS}) - 1))
           AS window_idx
  FROM audio
  WHERE n >= {WINDOW_BYTES}
)
SELECT doc_id, window_idx,
  CAST(list_sum(list_transform(generate_series(1, {WINDOW_BYTES}),
       i -> ascii(substr(text, CAST(window_idx * {WINDOW_BYTES} AS INT) + i, 1))))
    AS BIGINT) AS energy,
  CAST(list_max(list_transform(generate_series(1, {WINDOW_BYTES}),
       i -> ascii(substr(text, CAST(window_idx * {WINDOW_BYTES} AS INT) + i, 1))))
    AS BIGINT) AS peak
FROM wins
"""


def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via perceptual hash: every image's integer aHash
    (multimodal.phash_images, Arrow-batched) plus how many images share
    it — the multimodal twin of the text dedup family. At 100 TB the
    shuffle carries ONE long per image (the hash), never pixels; the
    oracle rebuilds thumbnail, bit threshold, and hash in pure SQL, so
    the Python kernel is value-checked bit-for-bit."""
    from mysql_streamer_spark.multimodal import phash_images
    from mysql_streamer_spark.tables import spread
    from pyspark.sql import Window

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    ph = phash_images(blobs)
    return ph.select(
        "doc_id",
        "phash",
        F.count("*").over(Window.partitionBy("phash")).alias("n_same_hash"),
    )


def _phash_oracle() -> str:
    return f"""{_ahash_hashed_ctes()}
SELECT doc_id, phash,
       count(*) OVER (PARTITION BY phash) AS n_same_hash
FROM hashed
"""


# ---------------------------------------------------------------------------
# shot-boundary detection over sampled video frames
# ---------------------------------------------------------------------------

#: mean-byte jump between consecutive sampled frames that counts as a cut
SHOT_THRESHOLD = 3.0


def q_multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot/scene segmentation signal per video: consecutive sampled
    frames whose mean-byte statistic jumps by more than SHOT_THRESHOLD
    mark a cut; the per-video shot count is what a video curation
    pipeline uses to drop static screen-recordings (0 cuts) and
    strobe/noise clips (cuts everywhere). Runs on the SAME Arrow-batched
    frame-sample stage as ``multimodal_frame_sample`` — the lag compares
    a per-frame scalar, so the window shuffles (doc_id, idx, mean) rows,
    never frame bytes; partitioned by video, skew-free.

    The deterministic fake decode stands in for a real codec (not in
    this container); the plumbing — fan-out stage, per-video ordered
    window, boundary aggregate — is the production shape."""
    from pyspark.sql import Window

    from mysql_streamer_spark.multimodal import sample_frames
    from mysql_streamer_spark.tables import spread

    frames = sample_frames(
        with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    ).select("doc_id", "frame_idx", "mean_byte")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    flagged = frames.withColumn(
        "jump", F.abs(F.col("mean_byte") - F.lag("mean_byte").over(w))
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        # a 1-frame video has only a null jump: its cut count is 0, not null
        F.coalesce(
            F.sum((F.col("jump") > SHOT_THRESHOLD).cast("long")), F.lit(0)
        ).alias("n_cuts"),
        F.max(F.col("jump")).alias("max_jump"),
    )


def _shot_oracle() -> str:
    from mysql_streamer_spark.multimodal import FRAME_BYTES, FRAME_STRIDE

    frame = f"substring(text, start1, {FRAME_BYTES})"
    return f"""
WITH video AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
), frames AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text), {FRAME_STRIDE})) AS start1
  FROM video
), stats AS (
  SELECT doc_id,
         CAST((start1 - 1) / {FRAME_STRIDE} AS BIGINT) AS frame_idx,
         CAST(list_sum(list_transform(string_split_regex({frame}, ''),
                                      c -> ascii(c))) AS DOUBLE)
           / length({frame}) AS mean_byte
  FROM frames
), flagged AS (
  SELECT doc_id,
         abs(mean_byte - lag(mean_byte) OVER (
           PARTITION BY doc_id ORDER BY frame_idx)) AS jump
  FROM stats
)
SELECT doc_id, count(*) AS n_frames,
       CAST(sum(CASE WHEN jump > {SHOT_THRESHOLD} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_cuts,
       max(jump) AS max_jump
FROM flagged GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# banded Hamming near-dup over perceptual hashes
# ---------------------------------------------------------------------------

#: Hamming radius for image near-duplicates
PHASH_HAM_T = 3
#: band layout over the 16-bit aHash: 4 bands x 4 bits. Pigeonhole: two
#: hashes within Hamming distance 3 differ in at most 3 of the 4 bands,
#: so they MUST agree on at least one band — the band join has exact
#: recall at this radius, not probabilistic recall.
PHASH_BANDS = 4
PHASH_BAND_BITS = 4


def q_multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate PAIRS by perceptual-hash Hamming distance —
    the crop/noise-robust tier above ``multimodal_phash_dedup``'s exact
    hash equality. Banding (split the hash into PHASH_BANDS bit slices,
    candidates meet on any equal band) turns the all-pairs Hamming
    search into an equi-join, and at radius PHASH_HAM_T the pigeonhole
    bound makes recall EXACT. Verification is one ``bit_count(xor)`` per
    candidate pair — both JVM-side intrinsics.

    Scale shape: hashes come from the Arrow-batched Python kernel (one
    long per image leaves the stage, never pixels), the band explode is
    map-only (PHASH_BANDS rows per image), candidates meet in an
    equi-join on (band, value), and only (id, hash) pairs shuffle. The
    stub's 16-bit hash gives 2^4 buckets per band; a production 64-bit
    phash with 8-bit bands has 256 buckets per band and the identical
    plan. The text-LSH family's mega-bucket guard applies unchanged if a
    degenerate band value ever gets hot."""
    from mysql_streamer_spark.multimodal import phash_images
    from mysql_streamer_spark.tables import spread

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    ph = phash_images(blobs).select("doc_id", "phash")
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
        ).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(
            f"shiftright(phash, band * {PHASH_BAND_BITS})"
            f" % {1 << PHASH_BAND_BITS}"
        ),
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("pa"),
        "band",
        "band_val",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("pb"),
        "band",
        "band_val",
    )
    pairs = (
        left.join(right, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(pa ^ pb)"))
        .filter(F.col("hamming") <= PHASH_HAM_T)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "hamming",
        (F.col("hamming") == 0).alias("exact_hash_dup"),
    )


def _phash_neardup_oracle() -> str:
    band_ids = ", ".join(str(b) for b in range(PHASH_BANDS))
    return f"""{_ahash_hashed_ctes()}, bands AS (
  SELECT doc_id, phash, band,
         (phash >> (band * {PHASH_BAND_BITS})) % {1 << PHASH_BAND_BITS}
           AS band_val
  FROM hashed CROSS JOIN (SELECT unnest([{band_ids}]) AS band) b
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.phash AS pa, b.phash AS pb
  FROM bands a JOIN bands b USING (band, band_val)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(pa, pb)) AS INT) AS hamming,
       bit_count(xor(pa, pb)) = 0 AS exact_hash_dup
FROM pairs
WHERE bit_count(xor(pa, pb)) <= {PHASH_HAM_T}
"""


# ---------------------------------------------------------------------------
# image near-dup clusters (apply form over the phash pair graph)
# ---------------------------------------------------------------------------

def q_multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY form of image near-dup: connected components over the
    banded phash Hamming pairs collapse re-encode/crop chains into
    clusters with a canonical keeper (minimum doc_id) — what a curation
    run actually writes out, vs ``multimodal_phash_neardup``'s pair
    list. Components reuse the proven min-label propagation of the text
    dedup tier (``dedup.connected_components``: per-round
    localCheckpoint, driver union-find only under the bounded-edge cap).
    Output is every clustered image with its keeper and cluster size —
    the full assignment vector, hash-checked per node.

    Scale shape: hashes are one long per image out of the Arrow kernel;
    banding bounds candidate pairs exactly as in the pair query; CC
    rounds = cluster diameter (re-upload chains are shallow).
    Reference scope note: no multimodal surface in the CDC reference —
    SURVEY.md §7 phase-5 multimodal extension."""
    from mysql_streamer_spark.queries.dedup import connected_components

    pairs = q_multimodal_phash_neardup(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    labels = connected_components(pairs)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return labels.join(sizes, "label").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("keeper"),
        "cluster_size",
        (F.col("doc_id") == F.col("label")).alias("is_keeper"),
    )


def _phash_clusters_oracle() -> str:
    """Clone-regime-proof formulation: documents with IDENTICAL hashes are
    trivially one cluster (Hamming 0, every band equal), so the recursive
    transitive closure only needs to run over DISTINCT hash values — the
    value graph is invariant under document cloning, which is exactly what
    the k-fold materializer does. The doc-level form blew up quadratically
    in the clone factor at the k=10 fold (SCALE.md round 13c); this one
    checks the identical assignment with a closure whose size tracks
    distinct content, and the expansion back to documents is one join."""
    band_ids = ", ".join(str(b) for b in range(PHASH_BANDS))
    hashed = _ahash_hashed_ctes().replace("WITH img", "WITH RECURSIVE img", 1)
    # hashed_m: DuckDB inlines plain CTEs, so the 4 references below would
    # recompute the per-document hash kernel 4x at big folds — materialize
    # it once (measured ~4x oracle wall at the k=10 fold without this)
    return f"""{hashed}, hashed_m AS MATERIALIZED (
  SELECT doc_id, phash FROM hashed
), vals AS (
  SELECT DISTINCT phash FROM hashed_m
), vbands AS (
  SELECT phash, band,
         (phash >> (band * {PHASH_BAND_BITS})) % {1 << PHASH_BAND_BITS}
           AS band_val
  FROM vals CROSS JOIN (SELECT unnest([{band_ids}]) AS band) b
), vpairs AS (
  SELECT DISTINCT a.phash AS pa, b.phash AS pb
  FROM vbands a JOIN vbands b USING (band, band_val)
  WHERE a.phash < b.phash
    AND bit_count(xor(a.phash, b.phash)) <= {PHASH_HAM_T}
), vsym AS (
  SELECT pa, pb FROM vpairs
  UNION ALL SELECT pb, pa FROM vpairs
), vreach(v, label) AS (
  SELECT pa, pa FROM vsym
  UNION
  SELECT vsym.pa, vreach.label
  FROM vsym JOIN vreach ON vsym.pb = vreach.v
  WHERE vreach.label < vsym.pa
), vlab AS (
  SELECT v, min(label) AS vcomp FROM vreach GROUP BY 1
), dup_vals AS (
  SELECT phash FROM hashed_m GROUP BY 1 HAVING count(*) >= 2
), members AS (
  -- clustered docs: hash connected to another hash, OR hash shared by >=2
  -- docs (Hamming-0 pairs the doc-level form generated within the value)
  SELECT h.doc_id, coalesce(vlab.vcomp, h.phash) AS comp
  FROM hashed_m h
  LEFT JOIN vlab ON vlab.v = h.phash
  WHERE vlab.v IS NOT NULL
     OR h.phash IN (SELECT phash FROM dup_vals)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(doc_id) OVER (PARTITION BY comp) AS BIGINT) AS keeper,
       CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS cluster_size,
       doc_id = min(doc_id) OVER (PARTITION BY comp) AS is_keeper
FROM members
"""


# ---------------------------------------------------------------------------
# energy-gated activity segmentation over audio windows (VAD-style)
# ---------------------------------------------------------------------------

#: window energy above which a window counts as "active" (the corpus's
#: median window energy — a fixed constant so both engines agree; a real
#: deployment would calibrate it per codec/gain the same way)
VAD_ENERGY_T = 3022


def q_multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-gated activity segmentation over the audio window meter —
    the voice-activity-detection shape speech curation runs to split
    long recordings into trainable utterances and to drop silence: runs
    of consecutive above-threshold windows collapse to one segment with
    its exact span and energy mass. Segmentation is the classic
    gaps-and-islands form: island key = window_idx - rank among the
    doc's active windows — pure integer arithmetic on the existing
    Arrow-kernel meter output.

    Scale shape: the meter is the proven map-only Arrow kernel (bytes
    never leave the Python stage); the islands window partitions on
    doc_id (never unpartitioned) and the segment fold is one map-side
    hash aggregate on (doc_id, island). Output rows = number of
    segments, bounded by MAX_WINDOWS per doc.
    Reference scope note: no multimodal surface in the CDC reference —
    SURVEY.md §7 phase-5 multimodal extension."""
    from mysql_streamer_spark.multimodal import audio_energy
    from mysql_streamer_spark.tables import spread
    from pyspark.sql import Window

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    active = audio_energy(blobs).filter(F.col("energy") > VAD_ENERGY_T)
    w = Window.partitionBy("doc_id").orderBy("window_idx")
    seg = active.withColumn(
        "island", F.col("window_idx") - F.row_number().over(w)
    )
    return (
        seg.groupBy("doc_id", "island")
        .agg(
            F.min("window_idx").cast("long").alias("seg_start"),
            F.max("window_idx").cast("long").alias("seg_end"),
            F.count("*").cast("long").alias("n_windows"),
            F.sum("energy").cast("long").alias("seg_energy"),
            F.max("peak").cast("long").alias("seg_peak"),
        )
        .select(
            "doc_id",
            "seg_start",
            "seg_end",
            "n_windows",
            "seg_energy",
            "seg_peak",
        )
    )


def _audio_segments_oracle() -> str:
    from mysql_streamer_spark.multimodal import MAX_WINDOWS, WINDOW_BYTES

    return f"""
WITH audio AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 1
), wins AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           least(CAST(n // {WINDOW_BYTES} AS BIGINT), {MAX_WINDOWS}) - 1))
           AS window_idx
  FROM audio
  WHERE n >= {WINDOW_BYTES}
), meter AS (
  SELECT doc_id, window_idx,
    CAST(list_sum(list_transform(generate_series(1, {WINDOW_BYTES}),
         i -> ascii(substr(text, CAST(window_idx * {WINDOW_BYTES} AS INT) + i, 1))))
      AS BIGINT) AS energy,
    CAST(list_max(list_transform(generate_series(1, {WINDOW_BYTES}),
         i -> ascii(substr(text, CAST(window_idx * {WINDOW_BYTES} AS INT) + i, 1))))
      AS BIGINT) AS peak
  FROM wins
), active AS (
  SELECT doc_id, window_idx, energy, peak,
         window_idx - row_number() OVER (
           PARTITION BY doc_id ORDER BY window_idx) AS island
  FROM meter WHERE energy > {VAD_ENERGY_T}
)
SELECT doc_id,
       CAST(min(window_idx) AS BIGINT) AS seg_start,
       CAST(max(window_idx) AS BIGINT) AS seg_end,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(energy) AS BIGINT) AS seg_energy,
       CAST(max(peak) AS BIGINT) AS seg_peak
FROM active GROUP BY doc_id, island
"""


# ---------------------------------------------------------------------------
# video-level near-dup via frame-hash set Jaccard
# ---------------------------------------------------------------------------

#: document frequency cap on frame hashes (production analog: black/intro
#: frames shared by thousands of videos must not generate candidate pairs)
VIDEO_FRAME_DF_CAP = 100
#: frame-set Jaccard at or above which two videos count as near-dups
VIDEO_JACCARD_T = 0.5


def q_multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs by sampled-frame-set Jaccard — the
    video twin of the text n-gram dedup tier: two videos sharing >=
    ``VIDEO_JACCARD_T`` of their sampled frame hashes (re-encodes,
    re-uploads, trims) collapse to one candidate pair. Frames come from
    the REAL Arrow fan-out kernel (``multimodal.sample_frames``); from
    there the plan is the proven inverted-index shape of
    ``dedup_jaccard_ngram`` on (doc_id, frame_hash) postings: DF-capped
    per-frame id lists, in-group pair expansion, count = exact
    intersection, union from per-video set sizes. Only (id, hash)
    postings shuffle — pixels never leave the Python stage.

    Scale shape: candidate volume is bounded by the DF cap exactly as in
    the text family; a hot frame (black/intro) is excluded from pairing
    rather than exploding it. The pair/dim join strategy adapts via the
    same footer-count hint as the text dedup tier.
    Reference scope note: no multimodal surface in the CDC reference —
    SURVEY.md §7 phase-5 multimodal extension."""
    from mysql_streamer_spark.multimodal import sample_frames
    from mysql_streamer_spark.queries.dedup import (
        _docs_dim_hint,
        ngram_jaccard_pairs,
    )
    from mysql_streamer_spark.tables import spread

    blobs = with_media_blob(spread(load_table(spark, sf_dir, "documents")))
    ssets = (
        sample_frames(blobs)
        .groupBy("doc_id")
        .agg(F.collect_set("frame_hash").alias("sset"))
    )
    return ngram_jaccard_pairs(
        ssets,
        threshold=VIDEO_JACCARD_T,
        pre_shingled=True,
        dim_hint=_docs_dim_hint(sf_dir),
        df_cap=VIDEO_FRAME_DF_CAP,
    )


def _video_neardup_oracle() -> str:
    from mysql_streamer_spark.multimodal import FRAME_BYTES, FRAME_STRIDE

    frame = f"substring(text, start1, {FRAME_BYTES})"
    return f"""
WITH video AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
), frames AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text), {FRAME_STRIDE})) AS start1
  FROM video
), posting AS (
  SELECT DISTINCT doc_id, md5({frame}) AS shingle FROM frames
), rare AS (
  SELECT shingle FROM posting GROUP BY shingle
  HAVING count(*) <= {VIDEO_FRAME_DF_CAP}
), p AS (
  SELECT posting.doc_id, posting.shingle FROM posting
  JOIN rare USING (shingle)
), sz AS (
  SELECT doc_id, count(*) AS set_sz FROM p GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  CAST(n_inter AS DOUBLE)
    / CAST(sa.set_sz + sb.set_sz - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sz sa ON inter.doc_a = sa.doc_id
JOIN sz sb ON inter.doc_b = sb.doc_id
WHERE CAST(n_inter AS DOUBLE)
    / CAST(sa.set_sz + sb.set_sz - n_inter AS DOUBLE)
    >= {VIDEO_JACCARD_T}
"""


SPECS = [
    QuerySpec(
        "multimodal_video_neardup",
        q_multimodal_video_neardup,
        _video_neardup_oracle(),
    ),
    QuerySpec(
        "multimodal_audio_segments",
        q_multimodal_audio_segments,
        _audio_segments_oracle(),
    ),
    QuerySpec(
        "multimodal_phash_clusters",
        q_multimodal_phash_clusters,
        _phash_clusters_oracle(),
    ),
    QuerySpec(
        "multimodal_audio_energy", q_multimodal_audio_energy, _audio_energy_oracle()
    ),
    QuerySpec(
        "multimodal_wav_roundtrip",
        q_multimodal_wav_roundtrip,
        _wav_roundtrip_oracle(),
    ),
    QuerySpec(
        "multimodal_wav_energy", q_multimodal_wav_energy, _wav_energy_oracle()
    ),
    QuerySpec(
        "multimodal_avi_roundtrip",
        q_multimodal_avi_roundtrip,
        _avi_roundtrip_oracle(),
    ),
    QuerySpec(
        "multimodal_avi_framestats",
        q_multimodal_avi_framestats,
        _avi_framestats_oracle(),
    ),
    QuerySpec(
        "multimodal_phash_neardup",
        q_multimodal_phash_neardup,
        _phash_neardup_oracle(),
    ),
    QuerySpec(
        "multimodal_shot_boundaries", q_multimodal_shot_boundaries, _shot_oracle()
    ),
    QuerySpec("multimodal_phash_dedup", q_multimodal_phash_dedup, _phash_oracle()),
    QuerySpec(
        "multimodal_exact_dedup", q_multimodal_exact_dedup, _EXACT_DEDUP_ORACLE
    ),
    QuerySpec("multimodal_resize", q_multimodal_resize, _resize_oracle()),
    QuerySpec("multimodal_metadata", q_multimodal_metadata, _METADATA_ORACLE),
    QuerySpec("multimodal_features", q_multimodal_features, _features_oracle()),
    QuerySpec(
        "multimodal_real_decode", q_multimodal_real_decode, _real_decode_oracle()
    ),
    QuerySpec("multimodal_frame_sample", q_multimodal_frame_sample, _frames_oracle()),
]
