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
    """Full PIXEL decode — requires PIL/libjpeg, absent in this container.
    Header-level metadata for PNG/GIF/WAV needs no library: see
    ``decode_header`` below, the default kernel."""
    raise NotImplementedError(
        "pixel decode requires an imaging library not present in this "
        "environment; production deployments plug a real decoder into "
        "extract_metadata()'s kernel")


def decode_png(payload: bytes) -> tuple[int, int, int] | None:
    """PNG: 8-byte signature, then the IHDR chunk (4-byte length + 'IHDR'),
    width/height big-endian u32 at fixed offsets 16/20. Single-frame (APNG
    frame counting would need the acTL chunk walk — out of scope)."""
    if len(payload) < 24 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return (w, h, 1)


def decode_gif(payload: bytes) -> tuple[int, int, int] | None:
    """GIF87a/89a: logical-screen width/height little-endian u16 at offsets
    6/8; frame count from a bounded block walk — every sub-block is
    length-prefixed, so skipping needs no LZW decode. A truncated stream
    returns the frames counted so far (decoder never throws)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (packed & 0x07))
    frames = 0

    def skip_subblocks(p: int) -> int:
        while p < len(payload) and payload[p] != 0:
            p += 1 + payload[p]
        return p + 1

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > len(payload):
                break
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            pos = skip_subblocks(pos + 1)  # LZW min-code byte + data
        else:
            break  # corrupt stream: stop, report what was counted
    return (w, h, frames)


def decode_wav(payload: bytes) -> tuple[int, int, int] | None:
    """RIFF/WAVE: walk the chunk list for 'fmt ' (channels u16 @+2, sample
    rate u32 @+4, block align u16 @+12) and 'data' (byte length). Metadata
    mapping for the shared (width, height, n_frames) columns: width =
    sample rate, height = channels, n_frames = sample frames
    (data bytes / block align)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    rate = channels = align = 0
    data_len = 0
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            channels, rate = struct.unpack("<HI", body[2:8])
            (align,) = struct.unpack("<H", body[12:14])
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    frames = data_len // align if align else 0
    return (rate, channels, frames)


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: parse the synthetic 16-byte header."""
    if payload is None or len(payload) < 16:
        return (0, 0, 0)
    magic, w, h, frames = struct.unpack("<4sIII", payload[:16])
    if magic != b"FAKE":
        return (0, 0, 0)
    return (w, h, frames)


def decode_header(payload: bytes) -> tuple[int, int, int]:
    """Default metadata kernel: REAL fixed-offset header parses for PNG /
    GIF / WAV (no external library involved), falling through to the
    synthetic FAKE header so the oracle-checked synthetic corpus keeps the
    same answers. Unrecognized/short payloads -> (0, 0, 0), never an
    exception (a 100 TB corpus always contains corrupt blobs; a throwing
    kernel would fail the whole task)."""
    if payload is None:
        return (0, 0, 0)
    for sniff in (decode_png, decode_gif, decode_wav):
        try:
            out = sniff(payload)
        except (struct.error, IndexError):
            out = None
        if out is not None:
            return out
    return fake_decode(payload)


def extract_metadata(blobs: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column. The decoder
    kernel is pluggable (default: ``decode_header`` — real PNG/GIF/WAV
    header parses + the synthetic-header fallback); batches stay bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    if decoder is None:
        decoder = decode_header

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
