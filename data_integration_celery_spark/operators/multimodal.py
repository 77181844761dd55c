"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` column plus typed metadata
(modality, mime, width/height/duration, source uri). Decode / feature-extract
/ resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
heavy bytes never leave the executor and batches amortise Python transfer.

The decode kernels themselves are STUBS in this container (no PIL/ffmpeg):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (seeded by the content hash) produces
plausible metadata — so the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is fully real and tested.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("mime", StringType()),
    StructField("content", BinaryType()),
    StructField("source_uri", StringType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("content_crc", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("phash", StringType()),
])


def to_media_table(docs: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "text") -> DataFrame:
    """Adapter: synthesize a media table from the documents corpus (UTF-8
    bytes as payload) so the binary-column path is exercisable on testdata."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(payload_col), "UTF-8").alias("content"),
        F.concat(F.lit("synthetic://doc/"), F.col(id_col)).alias("source_uri"))


def _fake_decode(content: bytes) -> tuple[int, int, str]:
    """Deterministic fake image decode: dims + phash derived from content
    hash. Replaced by PIL/libvips in a real deployment — same signature."""
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height, h[:8].hex()


def extract_image_features(media: DataFrame, fake: bool = True,
                           batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow streams batches of (media_id, content); the worker never
    materialises the whole partition. At 100 TB: repartition upstream so a
    partition holds O(100 MB) of media, and let AQE coalesce the output.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/libvips — not in this container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(c) for c in pdf["content"]],
                "content_crc": [zlib.crc32(c) for c in pdf["content"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "phash": [d[2] for d in dims],
            })

    return (media.select("media_id", "content")
                 # NULL payloads cannot be decoded: hashlib/zlib/len
                 # on None raise inside the Arrow kernel and one such
                 # row among billions would abort the whole stage
                 .where(F.col("content").isNotNull())
                 .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("duration_s", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("loudness_proxy", IntegerType()),
])


def extract_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Audio twin of ``extract_image_features`` — same Arrow-batched
    mapInPandas shape; the decode kernel (ffmpeg/soundfile) is the injectable
    stub (deterministic content-hash fake here), the Spark plumbing is real.
    """
    if not fake:
        raise NotImplementedError(
            "real audio decode requires ffmpeg/soundfile — not in this container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.sha256(c).digest()
                rows.append((mid, len(c), 1 + h[2] % 300,
                             (8000, 16000, 44100, 48000)[h[3] % 4],
                             1 + h[4] % 2, h[5]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "duration_s", "sample_rate",
                "n_channels", "loudness_proxy"])

    return (media.select("media_id", "content")
                 # NULL payloads cannot be decoded: hashlib/zlib/len
                 # on None raise inside the Arrow kernel and one such
                 # row among billions would abort the whole stage
                 .where(F.col("content").isNotNull())
                 .mapInPandas(run, AUDIO_FEATURES_SCHEMA))


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def resize_images(media: DataFrame, max_dim: int = 256,
                  fake: bool = True) -> DataFrame:
    """binary→binary resize stage: the shape every multimodal pipeline needs
    (normalise resolution before feature extraction / training).

    mapInPandas keeps bytes executor-local; output dims scale the fake-decoded
    dims to fit ``max_dim`` preserving aspect (integer floor, min 1). The
    pixel kernel is the stub; with PIL present only ``_resize_bytes`` changes.
    """
    if not fake:
        raise NotImplementedError(
            "real image resize requires PIL/libvips — not in this container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                w, h, _ = _fake_decode(c)
                scale = min(1.0, max_dim / max(w, h))
                rows.append((mid, c, max(1, int(w * scale)),
                             max(1, int(h * scale))))
            yield pd.DataFrame(rows, columns=["media_id", "content",
                                              "width", "height"])

    return (media.select("media_id", "content")
                 # NULL payloads cannot be decoded: hashlib/zlib/len
                 # on None raise inside the Arrow kernel and one such
                 # row among billions would abort the whole stage
                 .where(F.col("content").isNotNull())
                 .mapInPandas(run, RESIZED_SCHEMA))


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5,
                      assumed_duration_s: int = 60) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, frame_ts).

    The plan is pure DataFrame ops (sequence+explode); the actual frame
    decode would be a mapInPandas stage keyed by this plan. Duration comes
    from metadata in a real pipeline; here a fixed assumption keeps the plan
    deterministic. Executable form: ``extract_video_frames``.
    """
    return media.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0), F.lit(assumed_duration_s - 1), F.lit(every_n_seconds))
        ).alias("frame_offset_s"))


VIDEO_FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_offset_s", IntegerType()),
    StructField("duration_s", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("frame_phash", StringType()),
])


def extract_video_frames(media: DataFrame, every_n_seconds: int = 5,
                         fake: bool = True) -> DataFrame:
    """Executable video frame-sampling: binary video → one row per sampled
    frame, via the same Arrow-batched mapInPandas contract as image/audio.

    Per video the kernel reads the container metadata (duration, dims) and
    decodes one frame every ``every_n_seconds``; output fans out 1→N rows
    inside the same mapInPandas pass, so frame extraction is a single
    map-only stage — no join back to a sampling plan, no shuffle, and bytes
    never leave the executor. At 100 TB: repartition upstream so a partition
    holds O(100 MB) of video; the fan-out multiplies rows, not bytes (frames
    here carry fingerprints; a real pipeline would emit JPEG bytes and
    should budget partition sizes for the decoded payload instead).

    The decode kernel is the injectable stub: the deterministic fake derives
    duration/dims from the content hash (audio/image conventions) and each
    frame's fingerprint from sha256(content || '#' || offset) — so the whole
    1→N plumbing is oracle-matched end to end. With ffmpeg present only the
    per-video kernel body changes.
    """
    if not fake:
        raise NotImplementedError(
            "real video decode requires ffmpeg — not in this container")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.sha256(c).digest()
                width, height = 64 + h[0] % 192, 64 + h[1] % 192
                duration = 1 + h[2] % 300
                for off in range(0, duration, every_n_seconds):
                    fp = hashlib.sha256(
                        c + b"#" + str(off).encode()).hexdigest()[:16]
                    rows.append((mid, off, duration, width, height, fp))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_offset_s", "duration_s", "width",
                "height", "frame_phash"])

    return (media.select("media_id", "content")
                 # NULL payloads cannot be decoded: hashlib/zlib/len
                 # on None raise inside the Arrow kernel and one such
                 # row among billions would abort the whole stage
                 .where(F.col("content").isNotNull())
                 .mapInPandas(run, VIDEO_FRAMES_SCHEMA))
