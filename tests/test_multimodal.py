"""Multimodal plumbing tests: Arrow batch path vs driver-side expectation,
per-modality branching, and the real-decoder stub contract."""

from __future__ import annotations

import pytest

from mysql_streamer_spark.multimodal import (
    MEDIA_TYPES,
    extract_features,
    fake_decoder,
    real_image_decoder,
    with_media_blob,
)
from mysql_streamer_spark.tables import load_table


def test_features_match_driver_side_decode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    blobs = with_media_blob(docs)
    got = {r.doc_id: r for r in extract_features(blobs).collect()}
    for row in blobs.collect():
        expected = fake_decoder(row.media_type, bytes(row.payload))
        g = got[row.doc_id]
        assert g.n_bytes == expected["n_bytes"]
        assert abs(g.mean_byte - expected["mean_byte"]) < 1e-12
        assert list(g.byte_hist) == expected["byte_hist"]
        assert g.media_type in MEDIA_TYPES


def test_video_branch_samples_frames():
    full = fake_decoder("image", b"abcdef")
    sampled = fake_decoder("video", b"abcdef")
    assert full["n_bytes"] == sampled["n_bytes"] == 6
    assert sum(sampled["byte_hist"]) == 3  # every 2nd byte
    assert sum(full["byte_hist"]) == 6


def test_real_decoder_is_an_explicit_stub():
    with pytest.raises(NotImplementedError, match="decoder"):
        real_image_decoder("image", b"\x89PNG")


def test_feature_extraction_is_map_only(spark, sf_dir):
    blobs = with_media_blob(load_table(spark, sf_dir, "documents"))
    plan = extract_features(blobs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "decode path must not shuffle"
    assert "MapInPandas" in plan
