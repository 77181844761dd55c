"""Multimodal binary-column plumbing: schema, batch shape, deterministic fake
decode; the real decoder is explicitly stubbed (no PIL in this container)."""

import pytest
from pyspark.sql import functions as F

from data_integration_celery_spark import catalog
from data_integration_celery_spark.operators import multimodal


def test_media_table_schema(spark, sf_dir):
    media = multimodal.to_media_table(catalog.load(spark, "documents", sf_dir))
    assert dict(media.dtypes)["content"] == "binary"
    row = media.first()
    assert row["modality"] == "image" and row["source_uri"].startswith("synthetic://")


def test_feature_extraction_deterministic(spark, sf_dir):
    media = multimodal.to_media_table(catalog.load(spark, "documents", sf_dir))
    a = {r["media_id"]: (r["content_crc"], r["width"], r["height"], r["phash"])
         for r in multimodal.extract_image_features(media).collect()}
    b = {r["media_id"]: (r["content_crc"], r["width"], r["height"], r["phash"])
         for r in multimodal.extract_image_features(media).collect()}
    assert a == b and len(a) == media.count()
    w, h = next(iter(a.values()))[1:3]
    assert 64 <= w < 256 and 64 <= h < 256


def test_n_bytes_matches_doc_length(spark, sf_dir):
    docs = catalog.load(spark, "documents", sf_dir)
    media = multimodal.to_media_table(docs)
    feats = multimodal.extract_image_features(media)
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    bad = joined.where(F.col("n_bytes") != F.length("text")).count()
    assert bad == 0  # ascii corpus: utf-8 bytes == chars


def test_real_decode_is_stubbed(spark, sf_dir):
    media = multimodal.to_media_table(catalog.load(spark, "documents", sf_dir))
    with pytest.raises(NotImplementedError):
        multimodal.extract_image_features(media, fake=False)


def test_frame_sample_plan(spark, sf_dir):
    media = multimodal.to_media_table(catalog.load(spark, "documents", sf_dir)).limit(3)
    plan = multimodal.frame_sample_plan(media, every_n_seconds=5,
                                        assumed_duration_s=60)
    per = plan.groupBy("media_id").count().collect()
    assert all(r["count"] == 12 for r in per) and len(per) == 3


def test_audio_features_deterministic_shape(spark):
    from data_integration_celery_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(1, "aaa"), (2, "bbbb")],
                                 "doc_id long, text string")
    media = mm.to_media_table(docs)
    rows = {r["media_id"]: r for r in mm.extract_audio_features(media).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["duration_s"] >= 1
        assert r["sample_rate"] in (8000, 16000, 44100, 48000)
        assert r["n_channels"] in (1, 2)
    again = {r["media_id"]: tuple(r)
             for r in mm.extract_audio_features(media).collect()}
    assert again == {k: tuple(v) for k, v in rows.items()}
    assert rows[1]["n_bytes"] == 3 and rows[2]["n_bytes"] == 4


def test_resize_respects_max_dim_and_aspect(spark):
    from data_integration_celery_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(i, f"payload {i}") for i in range(20)],
                                 "doc_id long, text string")
    media = mm.to_media_table(docs)
    orig = {r["media_id"]: (r["width"], r["height"])
            for r in mm.extract_image_features(media).collect()}
    rs = {r["media_id"]: r for r in mm.resize_images(media, max_dim=100).collect()}
    for mid, r in rs.items():
        w0, h0 = orig[mid]
        assert max(r["width"], r["height"]) <= 100
        # aspect preserved within integer floor
        if w0 >= h0:
            assert r["width"] >= r["height"]
        else:
            assert r["height"] >= r["width"]
        assert r["content"] is not None


def test_real_kernels_are_explicit_stubs(spark):
    import pytest

    from data_integration_celery_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = mm.to_media_table(docs)
    with pytest.raises(NotImplementedError):
        mm.extract_audio_features(media, fake=False)
    with pytest.raises(NotImplementedError):
        mm.resize_images(media, fake=False)


def test_video_frame_extract_deterministic_and_complete(spark):
    """extract_video_frames: one row per ceil(duration/step) offsets, stable
    across runs and partitionings, per-frame fingerprints distinct."""
    from data_integration_celery_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(i, f"video payload {i}") for i in range(12)],
                                 "doc_id long, text string")
    media = mm.to_media_table(docs)
    step = 7
    a = sorted(map(tuple, mm.extract_video_frames(media, step).collect()))
    b = sorted(map(tuple,
                   mm.extract_video_frames(media.repartition(5), step).collect()))
    assert a == b and a
    rows = mm.extract_video_frames(media, step).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    for vid, frames in by_vid.items():
        d = frames[0]["duration_s"]
        expected = list(range(0, d, step))
        assert sorted(f["frame_offset_s"] for f in frames) == expected
        assert all(f["duration_s"] == d for f in frames)
        # per-frame fingerprints are distinct (offset enters the hash)
        assert len({f["frame_phash"] for f in frames}) == len(frames)


def test_video_real_kernel_is_explicit_stub(spark):
    import pytest

    from data_integration_celery_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        mm.extract_video_frames(mm.to_media_table(docs), fake=False)
