"""Multimodal (image/audio/video) column handling (task-brief north star).

Design: media is an opaque ``binary`` column plus a typed metadata struct —
the schema a 100 TB training-data lake actually uses (content-addressed blob
+ sidecar metadata). All heavy per-item work (decode, feature extraction,
resize, frame sampling) runs as Arrow-batched ``mapInPandas`` UDFs so bytes
move JVM→Python once per batch and the Python side is vectorizable.

The decode step itself is STUBBED: this environment has no image/audio
codecs (no PIL/ffmpeg), so ``decode_media`` raises ``NotImplementedError``
for real codecs and a clearly-marked deterministic fake backend
(``backend="fake"``) treats the raw bytes as the decoded sample buffer.
Everything Spark-side — schema, batch shape, UDF signatures, partition
behavior — is real and tested; swapping in a real codec touches only
``_decode_bytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

#: media row = content blob + typed metadata (shape a lakehouse would use)
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),    # image | audio | video
    StructField("content", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("sample_rate", IntegerType()),
])

#: frame-count rail for sample_frames: far above any real container's
#: frame count, small enough that one corrupt metadata row cannot fan a
#: worker out into billions of empty frames
MAX_FRAMES = 1 << 20

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sum_bytes", LongType()),
    StructField("max_byte", LongType()),
    StructField("mean_byte", LongType()),   # floor mean — integral, oracle-exact
])


def synthesize_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Deterministic fake media rows from the documents fixture: content is
    ``unhex(md5(text))`` (16 bytes), metadata derived from doc_id. Stands in
    for a real blob column; oracle-reproducible by construction."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.unhex(F.md5("text")).alias("content"),
        (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        (F.col("doc_id") % 24 + 1).cast("int").alias("n_frames"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )


def _decode_bytes(content: bytes, media_type: str, backend: str) -> np.ndarray:
    """Decode a media blob to a sample/pixel array.

    backend="fake": deterministic stand-in — the raw bytes ARE the samples.
    backend="pil"/"ffmpeg": real codecs, not installed in this environment.
    """
    if content is None:
        # a NULL content cell (the schema is nullable) must decode to an
        # empty buffer, not TypeError the whole stage from inside the
        # Python worker — task retries would fail identically
        return np.frombuffer(b"", dtype=np.uint8)
    if backend == "fake":
        return np.frombuffer(content, dtype=np.uint8)
    raise NotImplementedError(
        f"real {media_type} decode needs codec backend {backend!r}; "
        "this environment ships none — use backend='fake' (deterministic) "
        "or install PIL/torchaudio/ffmpeg and extend _decode_bytes"
    )


def extract_features(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Per-item byte-level features via mapInPandas (decode → reduce)."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [_decode_bytes(None if c is None else bytes(c), t, backend)
                    for c, t in zip(pdf["content"], pdf["media_type"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "n_bytes": [len(a) for a in arrs],
                "sum_bytes": [int(a.sum()) for a in arrs],
                "max_byte": [int(a.max()) if len(a) else 0 for a in arrs],
                "mean_byte": [int(a.sum()) // max(len(a), 1) for a in arrs],
            })

    return media.mapInPandas(body, FEATURE_SCHEMA)


def resize_media(media: DataFrame, target: int, backend: str = "fake") -> DataFrame:
    """'Resize' each item to ``target`` samples (stride subsample of the
    decoded buffer; a real image backend would interpolate)."""
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
    ])

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c, t in zip(pdf["media_id"], pdf["content"], pdf["media_type"]):
                a = _decode_bytes(None if c is None else bytes(c), t, backend)
                if len(a) == 0:
                    # empty buffer: linspace would emit index 0 and a[idx]
                    # raise IndexError inside the worker, failing the whole
                    # stage (extract_features guards the same case)
                    rows.append((int(mid), b"\x00" * target, target))
                    continue
                idx = np.linspace(0, len(a) - 1, num=target).astype(int)
                rows.append((int(mid), a[idx].tobytes(), target))
            yield pd.DataFrame(rows, columns=["media_id", "content", "width"])

    return media.mapInPandas(body, out_schema)


def sample_frames(media: DataFrame, every: int = 4, backend: str = "fake") -> DataFrame:
    """Frame sampling: one output row per kept frame (video → frame rows).

    Frames are equal-size slices of the decoded buffer (n_frames from
    metadata); a real backend would demux. One-to-many via mapInPandas.
    """
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ])

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c, t, nf in zip(pdf["media_id"], pdf["content"],
                                     pdf["media_type"], pdf["n_frames"]):
                a = _decode_bytes(None if c is None else bytes(c), t, backend)
                # null n_frames arrives as NaN/NA through Arrow->pandas.
                # The MAX_FRAMES rail (mirrored in the mm2 oracle) bounds
                # corrupt metadata: one hostile row claiming n_frames=2^31
                # would otherwise loop this worker billions of times
                # emitting empty tail frames (the one-bad-record
                # job-killer class, metadata edition). Short buffers keep
                # their documented empty-tail-frame semantics below it.
                nf = 1 if pd.isna(nf) else min(max(int(nf), 1), MAX_FRAMES)
                size = max(len(a) // nf, 1)
                for f in range(0, nf, every):
                    rows.append((int(mid), f, a[f * size:(f + 1) * size].tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return media.mapInPandas(body, out_schema)
