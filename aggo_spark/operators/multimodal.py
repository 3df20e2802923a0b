"""Multimodal (image/audio/video) column plumbing.

Policy: media travels as opaque ``binary`` columns + typed metadata structs;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the one
place Python is the right tool — per-byte work on blobs, not relational
logic). Batch shape, schema evolution, and partitioning are real and tested.
The codec is a pluggable ``bytes -> dict`` function: ``pil_decode`` (real
PIL metadata + average-hash) when PIL is importable, else a clearly-marked
deterministic fake so plumbing tests are exact in codec-less containers.

At 100 TB: mapInPandas is a narrow transformation — no shuffle; throughput
scales with executors × Arrow batch size. Keep blobs out of shuffle keys;
extract features first, then drop the binary column before any wide op.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary",
    "decode_image_metadata",
    "fake_decode",
    "pil_decode",
    "frame_sample_plan",
]

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def attach_binary(df: DataFrame, source_col: str, out_col: str = "content") -> DataFrame:
    """Treat an existing column's bytes as the media payload (test shim:
    the synthetic tables carry no real blobs, so we cast text → binary)."""
    return df.withColumn(out_col, F.col(source_col).cast("binary"))


_META_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("phash", T.StringType()),
]


def fake_decode(b: bytes) -> dict | None:
    """DETERMINISTIC FAKE decode (this container has no codecs): every
    derived value is a pure function of the bytes, so tests and oracles
    are stable."""
    digest = hashlib.md5(b).hexdigest()
    return {
        "byte_len": len(b),
        "format": ["jpeg", "png", "webp"][len(b) % 3],
        "width": 64 + (len(b) % 1024),
        "height": 64 + (int(digest[:4], 16) % 1024),
        "phash": digest[:16],
    }


def pil_decode(b: bytes) -> dict | None:
    """Real codec branch: PIL metadata + 8×8 average-hash perceptual hash.
    Undecodable blobs → None (null meta row), mirroring the reference's
    skip-bad-media behavior."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(b)) as im:
            width, height = im.size
            fmt = (im.format or "unknown").lower()
            gray = im.convert("L").resize((8, 8))
            px = list(gray.getdata())
    except Exception:
        return None
    avg = sum(px) / len(px)
    bits = 0
    for p in px:
        bits = (bits << 1) | (1 if p >= avg else 0)
    return {
        "byte_len": len(b),
        "format": fmt,
        "width": int(width),
        "height": int(height),
        "phash": f"{bits:016x}",
    }


def decode_image_metadata(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "img_meta",
    decoder=None,
) -> DataFrame:
    """Decode image metadata from a binary column via Arrow-batched
    mapInPandas.

    ``decoder`` is the plug-in point: any ``bytes -> dict|None`` with the
    _META_FIELDS keys. Default: ``pil_decode`` when PIL is importable,
    else the deterministic ``fake_decode``. The chosen function is
    serialized into the task closure, so the decision is made driver-side
    and the Spark plumbing (schema, Arrow batching, narrow no-shuffle
    plan) is identical for every decoder.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StructType(_META_FIELDS))]
    )
    decode_one = decoder or (pil_decode if HAVE_PIL else fake_decode)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                None if blob is None else decode_one(bytes(blob))
                for blob in pdf[content_col]
            ]
            pdf = pdf.copy()
            pdf[out_col] = metas
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    n_frames: int = 4,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (doc, frame_idx) with
    a deterministic byte-offset window per frame — the relational scaffold a
    real decoder plugs into. Pure columnar explode; no Python."""
    total = F.length(F.col(content_col)).cast("long")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.floor(total * i / F.lit(n_frames)).cast("long").alias("byte_offset"),
            F.floor(total / F.lit(n_frames)).cast("long").alias("byte_len"),
        ),
    )
    return (
        df.select(F.col(id_col), total.alias("total_bytes"), F.explode(frames).alias("f"))
        .select(id_col, "total_bytes", "f.frame_idx", "f.byte_offset", "f.byte_len")
    )
