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
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": n,
                    "width": (n % 640).astype("int32"),
                    "height": ((n * 7) % 480).astype("int32"),
                    "n_frames": (n % 30 + 1).astype("int32"),
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(decode, DECODED_SCHEMA)
