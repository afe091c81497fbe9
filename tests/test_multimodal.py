"""Multimodal column plumbing: real header round-trips, frame sampling,
deterministic features (operators/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from s3_access_logs_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"document body number {i} " * (1 + i % 5)) for i in range(30)],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def assets(spark, docs):
    df = MM.synthesize_assets(docs)
    df.persist()
    yield df
    df.unpersist()


def test_synthesize_modalities(assets):
    counts = {r["modality"]: r["count"] for r in
              assets.groupBy("modality").count().collect()}
    assert counts == {"image": 10, "audio": 10, "video": 10}


def test_decode_metadata_roundtrip(assets):
    rows = {r.asset_id: r for r in MM.decode_metadata(assets).collect()}
    for doc_id, r in rows.items():
        m = doc_id % 3
        if m == 0:
            w, h = MM.image_params(doc_id)
            assert (r.meta.format, r.meta.width, r.meta.height) == ("png", w, h)
            assert r.meta.channels == 3 and r.meta.sample_rate is None
        elif m == 1:
            sr, dur = MM.audio_params(doc_id)
            assert (r.meta.format, r.meta.sample_rate) == ("wav", sr)
            assert r.meta.duration_ms == dur  # exact: sr is a multiple of 1000
        else:
            nf, w, h = MM.video_params(doc_id)
            assert (r.meta.format, r.meta.n_frames, r.meta.width) == ("mvid", nf, w)


def test_decode_unknown_format_yields_nulls(spark):
    junk = spark.createDataFrame(
        [(1, "image", bytearray(b"not a container at all"))], MM.ASSET_TYPE
    )
    r = MM.decode_metadata(junk).collect()[0]
    assert r.meta.format is None and r.meta.width is None


def test_sample_frames_bytes(assets):
    frames = MM.sample_frames(assets, stride=2).collect()
    by_asset: dict[int, list] = {}
    for f in frames:
        by_asset.setdefault(f.asset_id, []).append(f)
    for asset_id, fs in by_asset.items():
        nf, _, _ = MM.video_params(asset_id)
        assert len(fs) == (nf + 1) // 2
        for f in fs:
            assert f.frame_idx % 2 == 0
            expect = bytes((f.frame_idx * 31 + j * 7) % 256
                           for j in range(MM.MVID_FRAME_SIZE))
            assert bytes(f.frame_payload) == expect


def test_resize_rewrites_header_only_for_images(assets):
    out = {r.asset_id: r for r in MM.resize_images(assets, 64, 48).collect()}
    decoded = {r.asset_id: r for r in
               MM.decode_metadata(MM.resize_images(assets, 64, 48)).collect()}
    for asset_id, r in out.items():
        if asset_id % 3 == 0:
            assert (decoded[asset_id].meta.width,
                    decoded[asset_id].meta.height) == (64, 48)
        else:
            assert r.modality in ("audio", "video")  # passthrough


def test_features_deterministic_unit_norm(assets):
    a = {r.asset_id: r.features for r in MM.extract_features(assets, dim=8).collect()}
    b = {r.asset_id: r.features for r in MM.extract_features(assets, dim=8).collect()}
    assert a == b
    for v in a.values():
        assert len(v) == 8
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_decode_pixels_is_explicit_stub(assets):
    with pytest.raises(NotImplementedError):
        MM.decode_pixels(assets)
