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


def test_real_decoder_contract():
    """Images decode FOR REAL (pure PNG reader / PIL); audio and video
    codecs are genuinely absent and stay explicit stubs; a malformed
    image payload fails loudly rather than yielding garbage features."""
    with pytest.raises(NotImplementedError, match="codec"):
        real_image_decoder("audio", b"\x89PNG")
    with pytest.raises(NotImplementedError, match="codec"):
        real_image_decoder("video", b"\x89PNG")
    with pytest.raises(ValueError, match="signature"):
        real_image_decoder("image", b"\x89PNG")  # truncated signature


def test_feature_extraction_is_map_only(spark, sf_dir):
    blobs = with_media_blob(load_table(spark, sf_dir, "documents"))
    plan = extract_features(blobs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "decode path must not shuffle"
    assert "MapInPandas" in plan


# ---------------------------------------------------------------------------
# real PNG codec (pure-Python, W3C spec) + guarded PIL parity
# ---------------------------------------------------------------------------


def test_png_roundtrip_gray_and_rgb():
    from mysql_streamer_spark.multimodal import png_decode, png_encode

    gray = bytes(range(64)) * 4  # 16x16 grayscale
    w, h, c, px = png_decode(png_encode(16, 16, gray, channels=1))
    assert (w, h, c, px) == (16, 16, 1, gray)

    rgb = bytes((i * 7) % 256 for i in range(5 * 4 * 3))
    w, h, c, px = png_decode(png_encode(5, 4, rgb, channels=3))
    assert (w, h, c, px) == (5, 4, 3, rgb)


def test_png_decode_unfilters_all_filter_types():
    """Hand-built IDAT exercising Sub/Up/Average/Paeth — the branches the
    in-repo encoder (filter 0 only) never emits but PIL-written files use."""
    import struct
    import zlib

    from mysql_streamer_spark.multimodal import (
        PNG_SIGNATURE,
        _png_chunk,
        png_decode,
    )

    width, height = 4, 5
    expected = [
        bytes([10, 20, 30, 40]),  # filter 0: literal
        bytes([5, 15, 35, 75]),   # filter 1 (Sub): deltas 5,10,20,40
        bytes([7, 25, 36, 90]),   # filter 2 (Up): prior + deltas
        bytes([10, 20, 40, 80]),  # filter 3 (Average)
        bytes([12, 24, 48, 96]),  # filter 4 (Paeth)
    ]
    raw = bytearray()
    raw += b"\x00" + expected[0]
    raw += b"\x01" + bytes([5, 10, 20, 40])
    # Up: x = raw + prior
    raw += b"\x02" + bytes(
        (e - p) & 0xFF for e, p in zip(expected[2], expected[1])
    )
    # Average: x = raw + (left + up)//2
    line3 = bytearray()
    left = 0
    for i in range(width):
        v = (expected[3][i] - (left + expected[2][i]) // 2) & 0xFF
        line3.append(v)
        left = expected[3][i]
    raw += b"\x03" + bytes(line3)
    # Paeth: x = raw + paeth(left, up, upleft)
    from mysql_streamer_spark.multimodal import _paeth

    line4 = bytearray()
    for i in range(width):
        a = expected[4][i - 1] if i else 0
        b = expected[3][i]
        c = expected[3][i - 1] if i else 0
        line4.append((expected[4][i] - _paeth(a, b, c)) & 0xFF)
    raw += b"\x04" + bytes(line4)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    payload = (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    w, h, c, px = png_decode(payload)
    assert (w, h, c) == (width, height, 1)
    assert px == b"".join(expected)


def test_png_decode_rejects_corruption():
    import pytest

    from mysql_streamer_spark.multimodal import png_decode, png_encode

    good = png_encode(8, 2, bytes(16), channels=1)
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC|signature|IDAT"):
        png_decode(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JUNK" + good[4:])


def test_real_image_decoder_pixel_stats():
    from mysql_streamer_spark.multimodal import (
        N_HIST_BINS,
        png_encode,
        real_image_decoder,
    )

    pixels = bytes([0, 64, 128, 255])
    feats = real_image_decoder("image", png_encode(4, 1, pixels, channels=1))
    assert feats["mean_byte"] == sum(pixels) / 4
    assert sum(feats["byte_hist"]) == 4
    assert len(feats["byte_hist"]) == N_HIST_BINS
    import pytest

    with pytest.raises(NotImplementedError, match="audio"):
        real_image_decoder("audio", b"\x00")


def test_png_pil_parity():
    """Where Pillow exists: our encoder's files open in PIL byte-for-byte,
    and PIL-written PNGs (with PIL's own filter choices) decode identically
    through the pure reader. Skips where PIL is absent."""
    import pytest

    from mysql_streamer_spark.multimodal import (
        pil_available,
        png_decode,
        png_encode,
    )

    if not pil_available():
        pytest.skip("Pillow not installed in this environment")
    import io

    import PIL.Image

    pixels = bytes((i * 13) % 256 for i in range(32 * 8))
    ours = png_encode(32, 8, pixels, channels=1)
    img = PIL.Image.open(io.BytesIO(ours))
    assert img.size == (32, 8) and img.tobytes() == pixels

    buf = io.BytesIO()
    PIL.Image.frombytes("L", (32, 8), pixels).save(buf, format="PNG")
    w, h, c, px = png_decode(buf.getvalue())
    assert (w, h, c, px) == (32, 8, 1, pixels)


# ---------------------------------------------------------------------------
# property tests: PNG codec roundtrip over arbitrary pixel buffers
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=20),
    channels=st.sampled_from([1, 3]),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, channels, data):
    """encode . decode == id for every dimension/channel combination and
    arbitrary pixel content (zlib level, chunking and filter handling must
    never lose a byte)."""
    from mysql_streamer_spark.multimodal import png_decode, png_encode

    n = w * h * channels
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=n,
                max_size=n,
            )
        )
    )
    got = png_decode(png_encode(w, h, pixels, channels=channels))
    assert got == (w, h, channels, pixels)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=8),
    flip_at=st.integers(min_value=8, max_value=10_000),
)
def test_png_corruption_never_decodes_silently(w, h, flip_at):
    """Flipping ANY single byte after the signature either raises or (for
    flips inside the pixel data that zlib+CRC would catch) never returns a
    wrong-but-plausible buffer: CRC verification makes silent corruption
    impossible."""
    from mysql_streamer_spark.multimodal import png_decode, png_encode

    pixels = bytes((i * 31) % 256 for i in range(w * h))
    good = png_encode(w, h, pixels, channels=1)
    idx = 8 + (flip_at % (len(good) - 8))
    bad = bytearray(good)
    bad[idx] ^= 0xFF
    try:
        out = png_decode(bytes(bad))
    except Exception:
        return  # failed loudly — the required behavior
    # a decode that SUCCEEDS on a corrupted payload is a silent-corruption
    # bug unless it somehow reproduced the original exactly (no ignored
    # byte regions exist in the minimal writer, so this should be
    # unreachable — but wrong pixels must fail the test, not pass it)
    assert out == (w, h, 1, pixels), (
        f"flip at byte {idx} decoded silently to different pixels"
    )


# ---------------------------------------------------------------------------
# property tests: WAV (RIFF PCM) codec — the round-10 audio twin of the
# PNG codec above
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
    data=st.data(),
)
def test_wav_roundtrip_property(channels, rate, data):
    """encode . decode == id for arbitrary 16-bit sample content across
    mono/stereo and common rates; the container metadata round-trips."""
    from mysql_streamer_spark.multimodal import wav_decode, wav_encode

    n_frames = data.draw(st.integers(min_value=0, max_value=200))
    samples = data.draw(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=n_frames * channels,
            max_size=n_frames * channels,
        )
    )
    got = wav_decode(wav_encode(samples, sample_rate=rate, channels=channels))
    assert got == {
        "sample_rate": rate,
        "channels": channels,
        "bits": 16,
        "samples": samples,
    }


def test_wav_decode_walks_extra_chunks_and_pad_bytes():
    """A spec-conformant reader must skip unknown chunks (LIST/INFO) and
    honor the odd-size pad byte — real-world WAVs carry both."""
    import struct

    from mysql_streamer_spark.multimodal import wav_decode, wav_encode

    good = wav_encode([1, -2, 300], sample_rate=8_000)
    # splice an odd-sized LIST chunk (with pad byte) between WAVE and fmt
    info = b"INFOodd"  # 7 bytes -> needs a pad byte
    extra = b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
    body = good[12:]
    payload = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    got = wav_decode(payload)
    assert got["samples"] == [1, -2, 300]
    assert got["sample_rate"] == 8_000


def test_wav_decode_fails_loudly():
    """Torn containers raise ValueError; non-PCM encodings raise
    NotImplementedError (the honest external-codec boundary)."""
    import struct

    import pytest as _pytest

    from mysql_streamer_spark.multimodal import wav_decode, wav_encode

    with _pytest.raises(ValueError):
        wav_decode(b"RIFF\x00\x00\x00\x00JUNK")
    with _pytest.raises(ValueError):
        wav_decode(b"not audio at all")
    good = bytearray(wav_encode([5, 6, 7]))
    # truncate mid-data: the data chunk overruns the container
    with _pytest.raises(ValueError):
        wav_decode(bytes(good[:-3]))
    # rewrite format tag to 3 (IEEE float) -> NotImplementedError
    fmt_at = bytes(good).find(b"fmt ") + 8
    struct.pack_into("<H", good, fmt_at, 3)
    with _pytest.raises(NotImplementedError):
        wav_decode(bytes(good))


def test_real_audio_decoder_sample_stats():
    """real_audio_decoder reports stats over DECODED samples: mean and
    histogram of byte-valued samples match a hand computation."""
    from mysql_streamer_spark.multimodal import (
        real_audio_decoder,
        real_media_decoder,
        wav_encode,
    )

    samples = [0, 63, 64, 127, 128, 191, 192, 255]
    payload = wav_encode(samples)
    got = real_audio_decoder("audio", payload)
    assert got["n_bytes"] == len(payload) == 44 + 2 * len(samples)
    assert got["mean_byte"] == sum(samples) / len(samples)
    assert got["byte_hist"] == [2, 2, 2, 2]
    # the dispatcher routes audio here; a WAV payload routed as video hits
    # the AVI decoder and fails loudly as not-an-AVI (container mismatch is
    # a data error, not a missing-codec boundary)
    assert real_media_decoder("audio", payload) == got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        real_media_decoder("video", payload)


# ---------------------------------------------------------------------------
# property tests: AVI (RIFF, uncompressed 24-bit BI_RGB DIB) codec — the
# round-10 video twin closing the last stubbed media family
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=9),
    height=st.integers(min_value=1, max_value=7),
    fps=st.sampled_from([1, 10, 25]),
    data=st.data(),
)
def test_avi_roundtrip_property(width, height, fps, data):
    """encode . decode == id for arbitrary grayscale frame content across
    widths that exercise every row-padding remainder (3w mod 4)."""
    from mysql_streamer_spark.multimodal import avi_decode, avi_encode

    n_frames = data.draw(st.integers(min_value=0, max_value=6))
    frames = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=width * height,
                    max_size=width * height,
                )
            )
        )
        for _ in range(n_frames)
    ]
    got = avi_decode(avi_encode(frames, width, height, fps=fps))
    assert got["width"] == width and got["height"] == height
    assert got["fps"] == fps
    assert got["n_frames"] == n_frames
    assert got["frames"] == frames


def test_avi_container_size_is_closed_form():
    from mysql_streamer_spark.multimodal import (
        AVI_HEADER_BYTES,
        _avi_row_bytes,
        avi_encode,
    )

    for w, h, n in ((7, 6, 4), (8, 5, 1), (1, 1, 0), (9, 3, 12)):
        frames = [bytes(range(w * h % 256)) * 0 + bytes([7] * (w * h)) for _ in range(n)]
        payload = avi_encode(frames, w, h)
        assert len(payload) == AVI_HEADER_BYTES + n * (8 + _avi_row_bytes(w) * h)


def test_avi_decode_skips_unknown_chunks_and_pad_bytes():
    """A spec-conformant reader must skip unknown chunks (JUNK is ubiquitous
    in real AVIs) and honor the odd-size pad byte."""
    import struct

    from mysql_streamer_spark.multimodal import avi_decode, avi_encode

    frames = [bytes((i * 17 + j) % 256 for j in range(7 * 6)) for i in range(3)]
    good = avi_encode(frames, 7, 6)
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # odd + pad
    hdrl_end = 12 + 12 + 64 + 12 + 64 + 48
    spliced = good[:hdrl_end] + junk + good[hdrl_end:]
    payload = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert avi_decode(payload)["frames"] == frames


def test_avi_decode_fails_loudly():
    """Torn containers and frame-count mismatches raise ValueError;
    compressed codecs and non-24-bit DIBs raise NotImplementedError."""
    import struct

    import pytest as _pytest

    from mysql_streamer_spark.multimodal import avi_decode, avi_encode

    with _pytest.raises(ValueError):
        avi_decode(b"not video at all")
    with _pytest.raises(ValueError):
        avi_decode(b"RIFF\x10\x00\x00\x00WAVEdata")
    good = bytearray(avi_encode([bytes([1] * 42)], 7, 6))
    with _pytest.raises(ValueError):  # truncated mid-frame
        avi_decode(bytes(good[:-5]))
    # biCompression -> MJPG: honest external-codec boundary
    mjpg = bytearray(good)
    strf_at = bytes(good).find(b"strf") + 8
    struct.pack_into("<I", mjpg, strf_at + 16, 0x47504A4D)
    with _pytest.raises(NotImplementedError):
        avi_decode(bytes(mjpg))
    # declared frame count disagreeing with movi contents
    lying = bytearray(good)
    avih_at = bytes(good).find(b"avih") + 8
    struct.pack_into("<I", lying, avih_at + 16, 9)
    with _pytest.raises(ValueError):
        avi_decode(bytes(lying))


def test_real_video_decoder_pixel_stats():
    """real_video_decoder reports the shared stats contract over DECODED
    grayscale pixels across all frames."""
    from mysql_streamer_spark.multimodal import (
        avi_encode,
        real_media_decoder,
        real_video_decoder,
    )

    f0 = bytes([0] * 21 + [255] * 21)
    f1 = bytes([64] * 42)
    payload = avi_encode([f0, f1], 7, 6)
    got = real_video_decoder("video", payload)
    pixels = list(f0) + list(f1)
    assert got["n_bytes"] == len(payload)
    assert got["mean_byte"] == sum(pixels) / len(pixels)
    assert got["byte_hist"] == [21, 42, 0, 21]
    assert real_media_decoder("video", payload) == got
