"""Multimodal column plumbing (north-star extension, SURVEY.md §7
step 8).

Images/audio/video ride through the engine as opaque ``binary``
columns plus typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The decode
itself is STUBBED (no image/audio libs in this container — a real
deployment drops PIL/ffmpeg into ``_decode_stub``); everything
Spark-side — schema contract, batch shape, partitioning — is real and
tested.

Scale design:
- mapInPandas streams Arrow batches: memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``, not by partition
  size — essential when single binary payloads are MBs.
- repartition before heavy decode so work spreads over all executors
  even if the source files were few and large.
- metadata-only queries (sniff/length/group-by-format) never touch
  Python: byte slicing + lookups are built-in expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MAGIC_PREFIXES",
    "sniff_format",
    "attach_binary",
    "decode_features",
    "frame_sample",
    "resize_stub",
    "resize_buckets",
]

# (format, magic-byte hex prefix)
MAGIC_PREFIXES = [
    ("png", "89504e47"),
    ("jpeg", "ffd8ff"),
    ("gif", "474946"),
    ("riff", "52494646"),  # wav/avi/webp container
    ("pdf", "25504446"),
]


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: derive a deterministic binary payload column from
    a text column (stands in for real image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def sniff_format(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Metadata pass, JVM-only: payload length + magic-byte format
    sniff on the first bytes. No Python in the plan."""
    head = F.lower(F.hex(F.substring(F.col(bin_col), 1, 4)))
    fmt = F.lit("unknown")
    for name, prefix in reversed(MAGIC_PREFIXES):
        fmt = F.when(head.startswith(prefix.lower()[: 8]), name).otherwise(fmt)
    return df.withColumn("payload_len", F.length(bin_col)).withColumn("format", fmt)


# output contract of the decode stage
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_len", T.IntegerType()),
        T.StructField("n_chunks", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(payload: bytes, chunk: int = 64) -> tuple[int, float, list[float]]:
    """Deterministic fake decode: chunk the payload and emit per-chunk
    mean bytes as the 'feature'. A real deployment replaces this body
    with PIL/torchaudio/ffmpeg decode + model features; the signature
    and schema stay."""
    if payload is None or len(payload) == 0:
        return 0, 0.0, []
    chunks = [payload[i : i + chunk] for i in range(0, len(payload), chunk)]
    feats = [float(sum(c)) / len(c) for c in chunks]
    return len(chunks), float(sum(payload)) / len(payload), feats


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    target_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched decode stage. Each pandas batch maps payload ->
    (n_chunks, mean_byte, feature vector) under DECODE_SCHEMA."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))
    if target_partitions:
        src = src.repartition(target_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "payload_len": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
            }
            decoded = pdf["payload"].map(_decode_stub)
            out["n_chunks"] = decoded.map(lambda t: t[0]).astype("int32")
            out["mean_byte"] = decoded.map(lambda t: t[1])
            out["feature"] = decoded.map(lambda t: t[2])
            yield pd.DataFrame(out)

    return src.mapInPandas(run, DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hex", T.StringType()),
        T.StructField("frame_len", T.IntegerType()),
    ]
)


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 64,
    every_k: int = 3,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling: chop each binary payload into
    fixed-size frames and keep every k-th — the 1→N fan-out batch
    shape (one input row yields many output rows inside a single
    Arrow batch; a real deployment swaps the byte-slicing for ffmpeg
    keyframe extraction, the schema and fan-out stay). Frames are
    emitted hex-encoded so the stage is oracle-comparable."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hexes, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                for i in range(0, -(-len(b) // frame_bytes)):
                    if i % every_k:
                        continue
                    frame = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    hexes.append(frame.hex())
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hex": pd.Series(hexes, dtype="object"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return src.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.ArrayType(T.FloatType())),
    ]
)


def resize_stub(
    df: DataFrame,
    target: int = 16,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Resize stage: any-size payload → fixed-length float vector by
    bucketed byte averaging (nearest-rank buckets, deterministic). A
    real deployment replaces the body with PIL ``Image.resize`` /
    librosa resample; the fixed-width array contract is what the
    downstream (ANN index, feature store) depends on."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def one(payload) -> list[float]:
        if payload is None or len(payload) == 0:
            return [0.0] * target
        b = bytes(payload)
        n = len(b)
        out = []
        for t in range(target):
            lo, hi = t * n // target, max((t + 1) * n // target, t * n // target + 1)
            hi = min(hi, n)
            seg = b[lo:hi] if lo < n else b[n - 1 :]
            out.append(float(sum(seg)) / len(seg))
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "resized": pdf["payload"].map(one)}
            )

    return src.mapInPandas(run, RESIZE_SCHEMA)


RESIZE_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("bucket_len", T.IntegerType()),
        T.StructField("bucket_sum", T.LongType()),
        T.StructField("bucket_mean", T.DoubleType()),
    ]
)


def resize_buckets(
    df: DataFrame,
    target: int = 16,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Flat-schema spelling of the resize stage: one row per
    (doc, bucket) with the bucket's EXACT byte sum/length plus the
    mean. Same bucket boundaries as ``resize_stub`` (the array
    contract for pipeline consumers); this shape exists so the stage
    is value-hash comparable against a SQL oracle — sums are exact
    integers and the mean is one IEEE division both engines compute
    identically. Empty/null payloads yield no rows."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bks, lens, sums, means = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                b = bytes(payload)
                n = len(b)
                for t in range(target):
                    lo = t * n // target
                    hi = min(max((t + 1) * n // target, lo + 1), n)
                    seg = b[lo:hi] if lo < n else b[n - 1 :]
                    s = sum(seg)
                    ids.append(doc_id)
                    bks.append(t)
                    lens.append(len(seg))
                    sums.append(s)
                    means.append(float(s) / len(seg))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "bucket": pd.Series(bks, dtype="int32"),
                    "bucket_len": pd.Series(lens, dtype="int32"),
                    "bucket_sum": pd.Series(sums, dtype="int64"),
                    "bucket_mean": pd.Series(means, dtype="float64"),
                }
            )

    return src.mapInPandas(run, RESIZE_BUCKET_SCHEMA)
