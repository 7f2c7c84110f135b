"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, and frame sampling (decode stub policy in
functions/multimodal.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from flat_file_social_media_database_engine_spark.functions import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    from flat_file_social_media_database_engine_spark.sources.catalog import read_table

    return M.synthesize_media_from_documents(read_table(spark, SF, "documents"))


def test_media_schema_and_metadata_typing(media):
    # name/type parity (nullability differs: literal-derived columns
    # come out non-nullable, which is strictly stronger)
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields
    ]
    rows = media.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["media_type"], []).append(r)
    assert set(by_type) == {"image", "audio", "video"}
    assert all(r["sample_rate"] == 16_000 for r in by_type["audio"])
    assert all(r["sample_rate"] is None for r in by_type["image"])
    assert all(r["n_frames"] >= 2 for r in by_type["video"])
    assert all(r["n_frames"] == 1 for r in by_type["image"])


def test_fake_decode_features_match_numpy(spark, media):
    decoded = {r["media_id"]: r for r in M.decode_media(media).collect()}
    payloads = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert set(decoded) == set(payloads)
    mid, payload = next(iter(sorted(payloads.items())))
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=M.FEATURE_DIM, range=(0, 256))
    want = (hist / arr.size).astype(np.float32)
    got = np.array(decoded[mid]["features"], dtype=np.float32)
    assert np.array_equal(got, want)
    assert decoded[mid]["n_bytes"] == len(payload)
    assert decoded[mid]["decoder"] == "fake-histogram-v1"
    # feature vectors are normalized histograms
    assert abs(sum(decoded[mid]["features"]) - 1.0) < 1e-3


def test_features_feed_similarity_shape(spark, media):
    out = M.extract_features(media)
    assert [f.name for f in out.schema.fields] == ["media_id", "features"]
    row = out.first()
    assert len(row["features"]) == M.FEATURE_DIM


def test_frame_sampling_is_column_math(media):
    frames = M.sample_frames(media, every_k=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_index"])
    n_frames = {r["media_id"]: r["n_frames"] for r in media.collect()
                if r["media_type"] == "video"}
    assert set(by_media) == set(n_frames)
    for mid, idxs in by_media.items():
        assert idxs == list(range(0, n_frames[mid], 2))


def test_resize_media_aspect_clamp_and_passthrough(spark):
    """Aspect preserved on non-square frames, no upscale of small
    media, audio untouched, stride math matches the metadata scale."""
    rows = [
        (1, "image", b"0123456789abcdef", 64, 32, 1, None),  # 2:1 still
        (2, "image", b"tiny", 8, 8, 1, None),                # below max_side
        (3, "audio", b"pcm-bytes", None, None, 1, 16000),    # passthrough
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in M.resize_media(media, max_side=16).collect()}

    big = out[1]  # scale 16/64 = 0.25 -> 16x8, stride 4
    assert (big["width"], big["height"]) == (16, 8)
    assert bytes(big["content"]) == b"0123456789abcdef"[::4]

    small = out[2]  # scale clamped at 1.0 — no upscale, bytes intact
    assert (small["width"], small["height"]) == (8, 8)
    assert bytes(small["content"]) == b"tiny"

    audio = out[3]  # no pixel grid: untouched
    assert audio["width"] is None and audio["height"] is None
    assert bytes(audio["content"]) == b"pcm-bytes"
    assert audio["resizer"] == "fake-stride-v1"


def test_wav_encode_is_readable_by_stdlib_wave():
    """Golden check with an INDEPENDENT reader: Python's stdlib `wave`
    module must accept our writer's output and report the same
    parameters our parser extracts — writer and parser can't share a
    bug with a third implementation in the loop."""
    import io
    import wave as stdlib_wave

    for data in (b"", b"x", b"hello world", bytes(range(256)) * 7):
        payload = M.wav_encode(data, sample_rate=16_000)
        with stdlib_wave.open(io.BytesIO(payload)) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == 16_000
            assert w.getnframes() == (len(data) + 1) // 2
            frames = w.readframes(w.getnframes())
        parsed = M.wav_parse_header(payload)
        assert parsed["sample_rate"] == 16_000
        assert parsed["n_channels"] == 1
        assert parsed["bits_per_sample"] == 16
        assert parsed["n_samples"] == (len(data) + 1) // 2
        assert parsed["data"] == frames


def test_wav_parse_rejects_malformed():
    for bad in (b"", b"RIFFxxxx", b"not a wav at all" * 4,
                M.wav_encode(b"ok")[:40]):
        with pytest.raises(ValueError):
            M.wav_parse_header(bad)


def test_audio_decode_is_real_wav_path(spark, media):
    """Fixture audio rows must round-trip: real WAV container out of
    synthesis, struct-parsed metadata out of decode, and features
    computed over the decoded int16 samples (not the raw bytes)."""
    decoded = {r["media_id"]: r for r in M.decode_media(media).collect()}
    payloads = {r["media_id"]: bytes(r["content"]) for r in media.collect()
                if r["media_type"] == "audio"}
    assert payloads, "fixture has no audio rows?"
    for mid, payload in payloads.items():
        d = decoded[mid]
        assert d["decoder"] == "wav-pcm-v1"
        assert payload[:4] == b"RIFF"
        assert d["sample_rate"] == 16_000
        assert d["n_channels"] == 1 and d["bits_per_sample"] == 16
        assert d["n_bytes"] == len(payload)
        data = payload[44:]
        assert d["n_samples"] == len(data) // 2
        samples = np.frombuffer(data, dtype="<i2")
        hist, _ = np.histogram(samples, bins=M.FEATURE_DIM,
                               range=(-32768, 32768))
        want = (hist / samples.size).astype(np.float32)
        assert np.array_equal(np.array(d["features"], dtype=np.float32), want)
    # image rows keep the labeled fake
    img = next(r for r in decoded.values() if r["media_type"] == "image")
    assert img["decoder"] == "fake-histogram-v1"
    assert img["sample_rate"] is None
