"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode kernel is STUBBED (``decode_image`` raises NotImplementedError; the
pipeline uses ``fake_decode`` — a deterministic header parse). Everything
around the stub is real Spark plumbing: binary column schema, Arrow-batched
``mapInPandas`` with bounded batch sizes, partition-preserving shape, and a
metadata projection that never materializes the payload twice.

At 100 TB the payload column dominates I/O: the metadata extraction reads
ONLY (id, payload) with column pruning, emits fixed-width metadata, and the
payload is never shuffled (no groupBy on binary)."""

from __future__ import annotations

import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F

BLOB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
])

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("checksum", T.LongType(), True),
])


def synth_blobs(docs: DataFrame) -> DataFrame:
    """Deterministic fake payloads derived from doc_id: a 16-byte header
    (magic, width, height, n_frames) + filler. Pure Catalyst + one
    mapInPandas for the byte packing."""
    base = docs.select("doc_id",
                       (F.col("doc_id") % 3).alias("mt_idx"))

    def pack(batches):
        for pdf in batches:
            rows = []
            for doc_id, mt_idx in zip(pdf["doc_id"], pdf["mt_idx"]):
                did = int(doc_id)
                w = 16 + (did * 7) % 1024
                h = 16 + (did * 13) % 768
                frames = 1 if mt_idx == 0 else 1 + (did % 120)
                header = struct.pack("<4sIII", b"FAKE", w, h, frames)
                filler = (did.to_bytes(8, "little") * 8)
                rows.append({
                    "doc_id": did,
                    "media_type": ["image", "audio", "video"][int(mt_idx)],
                    "payload": header + filler,
                })
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return base.mapInPandas(pack, schema=BLOB_SCHEMA)


def decode_image(payload: bytes):
    """Real image decode — requires PIL/libjpeg, absent in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; production deployments plug a real decoder into "
        "extract_metadata()'s kernel")


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: parse the synthetic 16-byte header."""
    if payload is None or len(payload) < 16:
        return (0, 0, 0)
    magic, w, h, frames = struct.unpack("<4sIII", payload[:16])
    if magic != b"FAKE":
        return (0, 0, 0)
    return (w, h, frames)


def extract_metadata(blobs: DataFrame, decoder=fake_decode) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column. The decoder
    kernel is pluggable; batches stay bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                           pdf["payload"]):
                w, h, fr = decoder(payload)
                out.append({
                    "doc_id": int(doc_id), "media_type": mt,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "width": w, "height": h, "n_frames": fr,
                    "checksum": zlib.crc32(payload) if payload is not None else 0,
                })
            yield pd.DataFrame(out, columns=[f.name for f in META_SCHEMA.fields])

    return blobs.mapInPandas(run, schema=META_SCHEMA)


def frame_sample_plan(meta: DataFrame, every_n: int = 30) -> DataFrame:
    """Which frames to sample per video — pure Catalyst arithmetic over the
    metadata (the heavy decode would consume this plan)."""
    return (meta.filter(F.col("media_type") == "video")
            .select("doc_id", "n_frames",
                    F.sequence(F.lit(0), F.col("n_frames") - 1,
                               F.lit(every_n)).alias("sample_frames")))
