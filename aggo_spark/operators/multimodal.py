"""Multimodal (image/audio/video) column plumbing.

Policy: media travels as opaque ``binary`` columns + typed metadata structs;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the one
place Python is the right tool — per-byte work on blobs, not relational
logic). Batch shape, schema evolution, and partitioning are real and tested;
the *actual* codec call is stubbed because no image/audio library ships in
this container — the stub is deterministic so plumbing tests are exact.

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

__all__ = ["attach_binary", "decode_image_metadata", "frame_sample_plan"]

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


def decode_image_metadata(
    df: DataFrame, content_col: str = "content", out_col: str = "img_meta"
) -> DataFrame:
    """Decode image metadata from a binary column via Arrow-batched
    mapInPandas.

    Without PIL (this container) a clearly-marked DETERMINISTIC FAKE stands
    in for the codec: every derived value is a pure function of the bytes,
    so tests and oracles are stable. With PIL installed the same plumbing
    calls the real decoder.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StructType(_META_FIELDS))]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf[content_col]:
                if blob is None:
                    metas.append(None)
                    continue
                b = bytes(blob)
                if HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError(
                        "real decode path: wire PIL.Image.open(io.BytesIO(b)) here"
                    )
                # DETERMINISTIC FAKE decode (container has no codecs):
                digest = hashlib.md5(b).hexdigest()
                metas.append(
                    {
                        "byte_len": len(b),
                        "format": ["jpeg", "png", "webp"][len(b) % 3],
                        "width": 64 + (len(b) % 1024),
                        "height": 64 + (int(digest[:4], 16) % 1024),
                        "phash": digest[:16],
                    }
                )
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
