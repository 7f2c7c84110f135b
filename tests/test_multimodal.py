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
