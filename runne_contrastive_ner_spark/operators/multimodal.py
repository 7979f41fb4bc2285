"""Multimodal columns: opaque ``binary`` payloads with typed metadata, and
the decode / feature-extract / frame-sample plumbing a training-data
pipeline needs at 100 TB.

The real decoders (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is a clearly-marked deterministic stand-in
(``_fake_decode_features``) — but everything Spark-side is real and tested:
the binary column, the typed metadata struct, the ``mapInPandas`` iterator
UDF with Arrow batches, the per-frame ``posexplode``, and the schemas.
Swapping in a real decoder is a one-function change (``decoder=`` seam;
passing ``decoder="real"`` raises NotImplementedError until the codec libs
exist in the image).

Payloads here are synthesized deterministically from the driver-provided
``documents`` table (utf-8 bytes of the text — no external data), which also
lets the DuckDB oracle verify the full plumbing value-for-value: feature i
of a payload equals ``ascii(char i) / 255`` of the source text.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import load

N_FEATURES = 8
FRAME_BYTES = 16
MAX_FRAMES = 4

MEDIA_SCHEMA_NOTE = (
    "media(doc_id long, kind string, payload binary,"
    " meta struct<width int, height int, duration_ms int, codec string>)"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media rows: payload = utf-8 bytes of text; metadata
    derived arithmetically from doc_id (deterministic, no external data)."""
    docs = load(spark, sf_dir, "documents")
    # parallelism floor for the downstream pandas-UDF decode: a small parquet
    # arrives as one split (no-op at production scale, see mentions.py)
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target, F.col("doc_id"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("doc_id") % 9000 + 1000).cast("int").alias("duration_ms"),
        F.element_at(
            F.array(F.lit("png"), F.lit("opus"), F.lit("h264")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("codec"),
    )
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode_features(payload: bytes, n: int = N_FEATURES) -> list[float]:
    """DECODE STUB: deterministic stand-in for image/audio decoding — the
    first ``n`` payload bytes scaled to [0, 1]. A real deployment replaces
    this with PIL/torchaudio decoding of the same bytes."""
    arr = np.frombuffer(payload[:n], dtype=np.uint8).astype(np.float64)
    if arr.size < n:
        arr = np.pad(arr, (0, n - arr.size))
    return (arr / 255.0).round(6).tolist()


def media_features(media: DataFrame, decoder: str = "stub") -> DataFrame:
    """Batch feature extraction over binary payloads: Arrow-batched
    mapInPandas, one decoder call per row inside a vectorized batch loop."""
    if decoder != "stub":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in this"
            " environment; use decoder='stub'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(
        run, schema="doc_id long, kind string, n_bytes long, features array<double>"
    )


def video_frame_sample(media: DataFrame) -> DataFrame:
    """Frame sampling for video payloads: fixed-stride byte windows stand in
    for decoded frames (posexplode over the frame index; per-frame checksum
    = sum of frame bytes mod 256). The Spark shape — filter by kind, explode
    frames, per-frame scalar — is exactly the real pipeline's."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(MAX_FRAMES, max(1, len(payload) // FRAME_BYTES))
                for i in range(n_frames):
                    chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(len(chunk))
                    rows["checksum"].append(int(sum(chunk) % 256))
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "video")
        .select("doc_id", "payload")
        .mapInPandas(
            run,
            schema="doc_id long, frame_idx int, frame_bytes int, checksum int",
        )
    )
