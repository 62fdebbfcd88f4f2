"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

BASELINE.json extension goals.  The Spark-side plumbing — schema, Arrow batch
shape, partition-preserving mapInPandas, frame-sampling explode — is real and
tested; the actual media decode is STUBBED (this environment has no
PIL/ffmpeg): ``decode_media`` raises NotImplementedError unless given a
decoder, and ``fake_decoder`` provides a deterministic header-parse used by
tests.  Swapping in a real decoder changes one callable, no plan shape.

Design for 100 TB of media:
  - blobs never leave the executor; metadata extraction reads only the first
    bytes of each payload inside an Arrow batch;
  - mapInPandas streams batches (no collect, no per-row Python calls);
  - frame sampling is a JVM-side ``explode(sequence(...))`` — the blob column
    is carried by reference within the task, not duplicated through a shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),       # image | audio | video
    StructField("mime_type", StringType()),
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("n_bytes", LongType()),
    StructField("source_uri", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha1_prefix", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
])


def synthesize_media_from_documents(docs: DataFrame,
                                    id_col: str = "doc_id",
                                    text_col: str = "text") -> DataFrame:
    """Deterministic media fixture: encode each document's text as the blob
    with a tiny fake header carrying width/height/frames (JVM-side encode)."""
    t = F.col(text_col)

    # md5-derived header fields (not xxhash64) so any ANSI-SQL engine can
    # reproduce the fixture byte-for-byte (the DuckDB oracle does)
    def _h(col, mod):
        return F.pmod(F.conv(F.substring(F.md5(col), 1, 4), 16, 10)
                      .cast("int"), F.lit(mod))
    header = F.concat(
        F.lpad(_h(t, 640).cast("string"), 4, "0"),
        F.lpad(_h(F.concat(t, F.lit("h")), 480).cast("string"), 4, "0"),
        F.lpad(_h(F.concat(t, F.lit("f")), 32).cast("string"), 4, "0"))
    payload = F.encode(F.concat(header, t), "UTF-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        modality.alias("modality"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("source_uri"))


def fake_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for PIL/ffmpeg: parse the 12-byte fake header."""
    head = payload[:12].decode("utf-8", errors="replace")
    return {
        "width": int(head[0:4]) + 1,
        "height": int(head[4:8]) + 1,
        "n_frames": int(head[8:12]) + 1,
    }


def real_decoder(payload: bytes) -> dict:  # pragma: no cover
    """The real decode path — intentionally stubbed (no media libs in this
    environment).  Plug in PIL.Image.open / av.open here."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg; pass decoder=fake_decoder for the "
        "deterministic test path")


def extract_features(media: DataFrame,
                     decoder: Optional[Callable[[bytes], dict]] = None) -> DataFrame:
    """Metadata + shallow features per blob via Arrow-batched mapInPandas
    (decode / feature-extract stage).  Partition-preserving: no shuffle."""
    dec = decoder or real_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column zip, not iterrows — pandas row views cost ~10× per row
            for mid, mod, payload in zip(pdf["media_id"], pdf["modality"],
                                         pdf["payload"]):
                payload = bytes(payload)
                meta = dec(payload)
                rows.append({
                    "media_id": mid,
                    "modality": mod,
                    "n_bytes": len(payload),
                    "sha1_prefix": hashlib.sha1(payload).hexdigest()[:12],
                    "width": meta.get("width"),
                    "height": meta.get("height"),
                    "n_frames": meta.get("n_frames"),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4,
                  n_frames_col: str = "n_frames") -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index —
    JVM-side explode(sequence), blob carried within the task."""
    return (media
            .withColumn("frame_index",
                        F.explode(F.sequence(F.lit(0),
                                             F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                                             F.lit(every_n)))))


def resize_stub(features: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stage: computes output geometry (aspect-preserving letterbox)
    JVM-side; actual pixel resampling lives behind the decoder stub."""
    scale = F.least(F.lit(target_w) / F.col("width"),
                    F.lit(target_h) / F.col("height"))
    return (features
            .withColumn("resized_w", (F.col("width") * scale).cast("int"))
            .withColumn("resized_h", (F.col("height") * scale).cast("int")))
