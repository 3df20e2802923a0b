"""Packed binary token shards — the training-data "last mile" sink.

After curation and tokenization, LLM training pipelines consume flat
binary shards of token ids (the GPT-2/Megatron ``.bin`` + index
layout), not parquet rows. This module writes and reads that layout
Spark-first:

- :func:`build_token_vocab` — deterministic (token, id, count) table:
  ids assigned by (count DESC, token ASC), so two runs over the same
  corpus produce the same mapping (one bounded aggregate; the vocab is
  vocabulary-sized, the ``train_bpe`` collect convention).
- :func:`tokens_to_ids` — Arrow-batched token→id mapping with the
  vocab dict in the task closure (the DSIR broadcast-weights shape;
  ~50k entries is a ~1 MB closure). Unknown tokens take ``unk_id`` or
  make the row NULL (quarantine) when no ``unk_id`` is given.
- :func:`write_token_shards` — docs → fixed-budget shards split at
  document boundaries. Shard assignment is a DISTRIBUTED prefix sum
  (the ``pack_chunks`` two-level idiom: per-partition partials over a
  range-partitioned doc order + a bounded per-partition offset
  collect), so no global single-partition window appears anywhere;
  each shard's bytes are written by the executor that holds it, and
  the function returns the (shard, doc_id, offset, n_tokens) index it
  also persists as parquet next to the shards.
- :func:`read_token_shards` — index + shard bytes → (doc_id, ids),
  slicing on executors via the index offsets.

Determinism: shard membership and intra-shard order follow the doc-id
order exactly; two writes of the same input produce byte-identical
shards. Local-filesystem writes cover this environment; on a real
cluster the same shape targets HDFS/S3 through the usual filesystem
client at the two marked call sites (the ``read_warc_indexed``
convention).

Scale posture: one narrow pass for sizes, one bounded (#partitions)
driver collect for offsets, one shuffle on the shard id to co-locate
each shard's docs, zero driver materialization of token data.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "build_token_vocab",
    "tokens_to_ids",
    "write_token_shards",
    "read_token_shards",
    "pack_token_sequences",
]


def build_token_vocab(
    df: DataFrame,
    tokens_col: str = "bpe_tokens",
    min_count: int = 1,
    reserved: tuple = (),
) -> DataFrame:
    """(token, id, count) with ids dense from ``len(reserved)`` in
    (count DESC, token ASC) order — deterministic across runs.
    ``reserved`` names special tokens (e.g. ``("<eos>", "<unk>")``)
    that take ids 0..k-1 regardless of corpus frequency."""
    from pyspark.sql import Window

    counts = (df.select(F.explode(tokens_col).alias("token"))
              .groupBy("token").agg(F.count("*").alias("count"))
              .filter(F.col("count") >= min_count)
              .filter(~F.col("token").isin(*reserved)
                      if reserved else F.lit(True)))
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    base = len(reserved)
    ranked = counts.withColumn(
        "id", (F.row_number().over(w) - 1 + base).cast("int"))
    if reserved:
        spark = df.sparkSession
        res = spark.createDataFrame(
            [(t, i, 0) for i, t in enumerate(reserved)],
            "token string, id int, count long")
        ranked = res.unionByName(ranked.select("token", "id", "count"))
    return ranked.select("token", "id", "count")


def tokens_to_ids(
    df: DataFrame,
    vocab: dict,
    tokens_col: str = "bpe_tokens",
    out_col: str = "token_ids",
    unk_id: int | None = None,
) -> DataFrame:
    """Append ``out_col``: int array of ids under ``vocab`` (a
    driver-held {token: id} dict shipped in the task closure).
    Unknown tokens map to ``unk_id``; with ``unk_id=None`` a document
    containing any unknown token gets a NULL id array (quarantine —
    the front-door convention)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()))])

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids_out = []
            for toks in pdf[tokens_col]:
                if toks is None:
                    ids_out.append(None)
                    continue
                ids = []
                ok = True
                for t in toks:
                    i = vocab.get(t, unk_id)
                    if i is None:
                        ok = False
                        break
                    ids.append(i)
                ids_out.append(ids if ok else None)
            pdf = pdf.copy()
            pdf[out_col] = ids_out
            yield pdf

    import pandas as pd  # noqa: F401 (annotation import for workers)

    return df.mapInPandas(kernel, out_schema)


_META_NAME = "_meta.json"
_INDEX_DIR = "_index.parquet"


def write_token_shards(
    df: DataFrame,
    path: str,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    shard_tokens: int = 1 << 22,
    eos_id: int | None = None,
    dtype: str | None = None,
) -> DataFrame:
    """Write ``(id_col, ids_col)`` rows as packed binary shards under
    ``path``: ``shard-NNNNN.bin`` files of little-endian token ids
    (each doc followed by ``eos_id`` when given), plus a parquet index
    (shard, doc_id, offset, n_tokens — offsets in TOKENS, eos
    included in the stream but not in n_tokens) and a JSON meta
    (dtype, eos_id, shard_tokens). Returns the index DataFrame.

    Sharding: docs are taken in ``id_col`` order; a doc starts in
    shard ``floor(global_token_offset / shard_tokens)`` — shards split
    at document boundaries, so each may overrun the budget by at most
    one document. NULL id arrays (quarantined docs) are dropped.
    ``dtype`` defaults to uint16 when every id fits, else uint32 (one
    bounded aggregate decides; explicit uint16 with an oversized id
    raises rather than truncating)."""
    import numpy as np

    d = (df.select(F.col(id_col).alias("__id"),
                   F.col(ids_col).alias("__ids"))
         .filter(F.col("__ids").isNotNull()))
    per_doc = 1 if eos_id is not None else 0
    d = d.withColumn("__n", F.size("__ids") + F.lit(per_doc))

    stats = d.agg(F.max(F.array_max("__ids")).alias("mx"),
                  F.min(F.array_min("__ids")).alias("mn")).collect()[0]
    mx = stats["mx"] if stats["mx"] is not None else 0
    mn = stats["mn"] if stats["mn"] is not None else 0
    hi = max(mx, eos_id or 0)
    if mn < 0:
        raise ValueError("write_token_shards: negative token id")
    if dtype is None:
        dtype = "uint16" if hi < (1 << 16) else "uint32"
    elif dtype == "uint16" and hi >= (1 << 16):
        raise ValueError(
            f"write_token_shards: id {hi} does not fit dtype=uint16")
    if dtype not in ("uint16", "uint32"):
        raise ValueError(f"unsupported dtype {dtype!r}")

    # ---- two-level prefix sum over the doc-id order -----------------------
    spark = df.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
                  // 2, 1)
    ranged = (d.repartitionByRange(n_parts, "__id")
               .sortWithinPartitions("__id")
               .withColumn("__pid", F.spark_partition_id()))
    ranged.persist()
    try:
        partials = {r["__pid"]: r["tot"] for r in
                    ranged.groupBy("__pid").agg(
                        F.sum("__n").alias("tot")).collect()}
        offsets = {}
        running = 0
        for pid in sorted(partials):
            offsets[pid] = running
            running += partials[pid]

        id_type = d.schema["__id"].dataType  # any orderable id type
        shard_schema = T.StructType([
            T.StructField("__id", id_type),
            T.StructField("__ids", T.ArrayType(T.IntegerType())),
            T.StructField("__shard", T.IntegerType()),
            T.StructField("__offset", T.LongType()),
            T.StructField("__n", T.IntegerType()),
        ])

        def assign(batches):
            import pandas as pd

            state = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values("__id")
                pid = int(pdf["__pid"].iloc[0])
                running_off = state.setdefault(pid, offsets[pid])
                shards, offs = [], []
                for n in pdf["__n"]:
                    shards.append(int(running_off // shard_tokens))
                    offs.append(running_off)
                    running_off += int(n)
                state[pid] = running_off
                yield pd.DataFrame({
                    "__id": pdf["__id"], "__ids": pdf["__ids"],
                    "__shard": shards, "__offset": offs,
                    "__n": pdf["__n"].astype("int32"),
                })

        assigned = ranged.mapInPandas(assign, shard_schema)

        # ---- co-locate shards and write -----------------------------------
        os.makedirs(path, exist_ok=True)
        np_dtype = np.uint16 if dtype == "uint16" else np.uint32
        idx_schema = T.StructType([
            T.StructField("shard", T.IntegerType()),
            T.StructField("doc_id", id_type),
            T.StructField("offset", T.LongType()),
            T.StructField("n_tokens", T.IntegerType()),
        ])

        def write_shard(key, pdf):
            import pandas as pd

            shard = int(key[0])
            pdf = pdf.sort_values("__id")
            stream = []
            rows = []
            for _, r in pdf.iterrows():
                ids = list(r["__ids"])
                rows.append((shard, r["__id"],
                             int(r["__offset"]), len(ids)))
                stream.extend(ids)
                if eos_id is not None:
                    stream.append(eos_id)
            arr = np.asarray(stream, dtype=np_dtype)
            # local-FS write; a cluster deployment swaps in the
            # HDFS/S3 client here (read_warc_indexed convention)
            tmp = os.path.join(path, f".shard-{shard:05d}.tmp")
            with open(tmp, "wb") as f:
                f.write(arr.tobytes())
            os.replace(tmp, os.path.join(path, f"shard-{shard:05d}.bin"))
            return pd.DataFrame(
                rows, columns=["shard", "doc_id", "offset", "n_tokens"])

        index = (assigned.groupBy("__shard")
                 .applyInPandas(write_shard, idx_schema))
        index = index.persist()
        index.count()  # materialize: every shard written
    finally:
        ranged.unpersist()

    (index.repartition(1).write.mode("overwrite")
     .parquet(os.path.join(path, _INDEX_DIR)))
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump({"dtype": dtype, "eos_id": eos_id,
                   "shard_tokens": shard_tokens}, f)
    index.unpersist()
    # serve the returned index from the just-written parquet: no
    # driver materialization, no recompute of the write stage
    return (df.sparkSession.read.parquet(os.path.join(path, _INDEX_DIR))
            .select("shard", "doc_id", "offset", "n_tokens"))


def read_token_shards(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, token_ids) from a :func:`write_token_shards` layout:
    the parquet index drives per-doc slicing of the shard bytes on
    executors (each task reads only its shard files)."""
    import numpy as np

    with open(os.path.join(path, _META_NAME)) as f:
        meta = json.load(f)
    np_dtype = np.uint16 if meta["dtype"] == "uint16" else np.uint32
    index = spark.read.parquet(os.path.join(path, _INDEX_DIR))
    shards_root = path

    from pyspark.sql import types as T2

    out_schema = T2.StructType([
        index.schema["doc_id"],
        T2.StructField("token_ids", T2.ArrayType(T2.IntegerType())),
    ])

    def slice_docs(key, pdf):
        import pandas as pd

        shard = int(key[0])
        fn = os.path.join(shards_root, f"shard-{shard:05d}.bin")
        arr = np.fromfile(fn, dtype=np_dtype)
        rows = []
        # offsets are GLOBAL token positions; the shard's own base is
        # its first doc's offset rounded down... no: a shard starts at
        # the first doc assigned to it, whose offset is the base
        pdf = pdf.sort_values("offset")
        base = int(pdf["offset"].iloc[0])
        for _, r in pdf.iterrows():
            s = int(r["offset"]) - base
            n = int(r["n_tokens"])
            ids = arr[s:s + n].astype("int64").tolist()
            rows.append((r["doc_id"], ids))
        return pd.DataFrame(rows, columns=["doc_id", "token_ids"])

    return index.groupBy("shard").applyInPandas(slice_docs, out_schema)

def pack_token_sequences(
    df: DataFrame,
    ctx_len: int,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    eos_id: int | None = None,
    drop_last: bool = True,
) -> DataFrame:
    """GPT-style sequence packing: concatenate all docs (in ``id_col``
    order, each followed by ``eos_id`` when given) into one virtual
    token stream and cut it into rows of EXACTLY ``ctx_len`` ids —
    documents split across sequence boundaries, the standard training
    layout. Returns ``(seq_no, token_ids)``.

    Shape: the same two-level prefix sum as :func:`write_token_shards`
    assigns each doc its global offset; each doc then emits its ≤
    ``n//ctx_len + 2`` sequence PIECES via a pure-Column transform
    (no per-token explode), and one shuffle on ``seq_no`` reassembles
    pieces in offset order. ``drop_last`` drops the trailing partial
    sequence (no padding is invented); with ``drop_last=False`` the
    final row may be shorter than ``ctx_len``. NULL id arrays are
    dropped (quarantine convention)."""
    d = (df.select(F.col(id_col).alias("__id"),
                   F.col(ids_col).alias("__ids"))
         .filter(F.col("__ids").isNotNull()))
    if eos_id is not None:
        d = d.withColumn(
            "__ids", F.concat("__ids", F.array(F.lit(eos_id))))
    d = d.withColumn("__n", F.size("__ids"))

    spark = df.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
                  // 2, 1)
    ranged = (d.repartitionByRange(n_parts, "__id")
               .sortWithinPartitions("__id")
               .withColumn("__pid", F.spark_partition_id()))
    ranged.persist()
    try:
        partials = {r["__pid"]: r["tot"] for r in
                    ranged.groupBy("__pid").agg(
                        F.sum("__n").alias("tot")).collect()}
        offsets = {}
        running = 0
        for pid in sorted(partials):
            offsets[pid] = running
            running += partials[pid]
        total = running

        off_schema = T.StructType([
            T.StructField("__ids", T.ArrayType(T.IntegerType())),
            T.StructField("__offset", T.LongType()),
            T.StructField("__n", T.IntegerType()),
        ])

        def assign(batches):
            import pandas as pd

            state = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values("__id")
                pid = int(pdf["__pid"].iloc[0])
                run = state.setdefault(pid, offsets[pid])
                offs = []
                for n in pdf["__n"]:
                    offs.append(run)
                    run += int(n)
                state[pid] = run
                yield pd.DataFrame({
                    "__ids": pdf["__ids"], "__offset": offs,
                    "__n": pdf["__n"].astype("int32")})

        with_off = ranged.mapInPandas(assign, off_schema)

        # pure-Column piece emission: piece k of a doc covers the
        # intersection of [offset, offset+n) with sequence
        # (offset//ctx + k)'s window
        first_seq = (F.col("__offset") / ctx_len).cast("long")
        n_pieces = ((F.col("__offset") + F.col("__n") - 1) / ctx_len) \
            .cast("long") - first_seq + 1
        pieces = with_off.filter(F.col("__n") > 0).select(
            F.explode(F.transform(
                F.sequence(F.lit(0), n_pieces - 1),
                lambda k: F.struct(
                    (first_seq + k).alias("seq_no"),
                    F.slice(
                        "__ids",
                        (F.greatest((first_seq + k) * ctx_len,
                                    F.col("__offset"))
                         - F.col("__offset") + 1).cast("int"),
                        (F.least((first_seq + k + 1) * ctx_len,
                                 F.col("__offset") + F.col("__n"))
                         - F.greatest((first_seq + k) * ctx_len,
                                      F.col("__offset"))).cast("int"),
                    ).alias("piece"),
                    F.greatest((first_seq + k) * ctx_len,
                               F.col("__offset")).alias("pos"),
                ))).alias("p"))
        seqs = (pieces
                .groupBy(F.col("p.seq_no").alias("seq_no"))
                .agg(F.flatten(
                    F.array_sort(
                        F.collect_list(F.struct("p.pos", "p.piece")))
                    .getField("piece")).alias("token_ids")))
        if drop_last and total % ctx_len:
            seqs = seqs.filter(
                F.col("seq_no") < total // ctx_len)
        out = seqs.select("seq_no", "token_ids")
        out = out.persist()
        out.count()
    finally:
        ranged.unpersist()
    return out
