"""C5 — multimodal columns: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Python.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (:func:`decode_image_real` raises
NotImplementedError; :func:`fake_decode_metadata` is the deterministic
stand-in) — but everything Spark-side is real and tested: the binary
column plumbing (parquet BinaryType round-trip), the typed metadata
struct, the ``mapInPandas`` batch shape, and the partitioning story.

Scale notes: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` small enough that one partition
of payloads fits executor memory; push *metadata-only* predicates
first (column pruning means the scan never materializes payload bytes
for filtered-out rows); decode via ``mapInPandas`` streams
Arrow batches so one task never holds its whole partition decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_binary_payload(df: DataFrame, src_col: str, id_col: str) -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata
    (the shape an image/audio table has: bytes + (kind, size) struct)."""
    payload = F.col(src_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_real(payload_bytes: bytes) -> dict:
    """The real decode hook — requires an image codec.

    STUB: no codec library ships in this container. Wire PIL/ffmpeg
    here in a real deployment; the Spark-side plumbing (batch shape,
    schema, partitioning) is identical either way.
    """
    raise NotImplementedError(
        "image/audio decoding requires a codec library not present in "
        "this environment; use fake_decode_metadata for plumbing tests"
    )


#: Output schema of the decode stage (same for real and fake decode).
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def fake_decode_metadata(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic decode stand-in via ``mapInPandas``: "dimensions"
    derived arithmetically from payload length, so an SQL oracle can
    verify the full Arrow round-trip batch-for-batch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (missing blob, failed fetch) degrades to
            # null metadata via pandas NULLABLE ints — .map(len) raised
            # TypeError and killed the whole task before (r11 review
            # catch; same policy in the other pandas stages).
            n = pdf["payload"].map(
                lambda b: len(b) if b is not None else None
            ).astype("Int64")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": n,
                    "width": (n % 640).astype("Int32"),
                    "height": ((n * 7) % 480).astype("Int32"),
                    "n_frames": (n % 30 + 1).astype("Int32"),
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(decode, DECODED_SCHEMA)


#: Output schema of the resize stage.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
    ]
)


def fake_resize(df: DataFrame, target_w: int = 224, id_col: str = "id") -> DataFrame:
    """Resize stage via ``mapInPandas`` — aspect-preserving to a target
    width with integer arithmetic (real codec stubbed like decode; the
    batch shape, schema, and the downstream-ML-standard 224-width
    contract are the real, tested parts)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("int64").clip(lower=1)
            h = pdf["height"].astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "new_width": pd.Series([target_w] * len(pdf)).astype("int32"),
                    "new_height": ((h * target_w) // w).astype("int32"),
                }
            )

    return df.mapInPandas(resize, RESIZED_SCHEMA)


#: Output schema of the frame-sampling stage (row-multiplying — UDTF-shaped).
FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
    ]
)


def frame_sample(df: DataFrame, every_n: int = 5, id_col: str = "id") -> DataFrame:
    """Frame-sampling stage via ``mapInPandas`` — one output row per
    every-``n``-th frame (0, n, 2n, ... < n_frames): the row-MULTIPLYING
    batch shape a video pipeline needs (mapInPandas yields more rows
    than it consumes, unlike a scalar pandas_udf)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for _id, n in zip(pdf[id_col], pdf["n_frames"].astype("int64")):
                for i in range(0, int(n), every_n):
                    ids.append(_id)
                    idxs.append(i)
            yield pd.DataFrame({"id": ids, "frame_idx": idxs}).astype(
                {"id": "int64", "frame_idx": "int32"}
            )

    return df.mapInPandas(sample, FRAMES_SCHEMA)


#: Output schema of the feature-extraction stage.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("features", T.ArrayType(T.IntegerType())),
    ]
)


def fake_feature_extract(df: DataFrame, n_bins: int = 8, id_col: str = "id") -> DataFrame:
    """Feature-extraction stage via ``mapInPandas``: an ``n_bins``-wide
    byte-value histogram per payload (the deterministic stand-in for an
    image-embedding model; the Arrow binary-column batch transfer and
    array-typed output are the real parts)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)  # degrade, don't TypeError
                    continue
                hist = [0] * n_bins
                for b in payload:
                    hist[b % n_bins] += 1
                feats.append(hist)
            yield pd.DataFrame({"id": pdf[id_col], "features": feats})

    return df.select(F.col(id_col), "payload").mapInPandas(extract, FEATURES_SCHEMA)


def energy_frames(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    frame_bytes: int = 64,
) -> DataFrame:
    """Per-frame energy of a binary payload: fixed ``frame_bytes``
    windows, energy = sum of byte values (numpy, vectorized) — the
    front half of voice-activity / scene-change detection: a decoded
    audio/image stream is segmented by thresholding per-frame energy.
    Real decoders plug in before this (samples instead of raw bytes —
    see decode_image_real's stub contract); the framing, Arrow batch
    shape, and everything downstream are the production path.

    Only FULL frames are emitted (a trailing partial frame would bias
    its energy low and flicker the threshold). Row-local per
    document — no shuffle; the segmentation that follows groups by
    (id, frame run), a high-cardinality key.
    """
    import numpy as np

    schema = f"{id_col} long, frame_idx long, energy long"

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            energies: list[int] = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue  # no payload -> no frames (like len < frame_bytes)
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = len(arr) // frame_bytes
                if n == 0:
                    continue
                e = (
                    arr[: n * frame_bytes]
                    .reshape(n, frame_bytes)
                    .sum(axis=1, dtype=np.int64)
                )
                ids.extend([int(i)] * n)
                idxs.extend(range(n))
                energies.extend(e.tolist())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "energy": energies}
            )

    return df.select(id_col, payload_col).mapInPandas(frames, schema)


def energy_segments(
    frames: DataFrame,
    id_col: str = "id",
    threshold: int = 0,
) -> DataFrame:
    """Contiguous runs of above-threshold frames per document.

    islands-by-delta on the frame index (frame_idx − row_number is
    constant within a run), windowed per document — the per-key twin
    of operators/sequences.py::sequence_islands, partitioned on the
    high-cardinality document id.
    """
    from pyspark.sql import Window as W

    active = frames.filter(F.col("energy") > threshold)
    w = W.partitionBy(id_col).orderBy("frame_idx")
    grp = (F.col("frame_idx") - F.row_number().over(w)).alias("_grp")
    return (
        active.withColumn("_grp", grp)
        .groupBy(id_col, "_grp")
        .agg(
            F.min("frame_idx").alias("seg_start"),
            F.max("frame_idx").alias("seg_end"),
            F.count("*").alias("n_frames"),
            F.sum("energy").alias("total_energy"),
        )
        .drop("_grp")
    )
