"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real — schema, partition sizing, Arrow batch
shape via ``mapInPandas`` — while the codec step is stubbed behind
``NotImplementedError`` / a deterministic fake (image/audio libraries
are not in this container; wire Pillow/torchaudio/PyAV into
``_decode_image_bytes`` etc. in a real deployment).

Scale notes: binary payloads ride the scan; ``mapInPandas`` streams
Arrow record batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads; keep
``maxPartitionBytes`` modest (128 MB) when payload rows are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_binary_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Cheap scan-side metadata: byte length + md5 content id. Pure JVM
    expressions — no decode required."""
    return df.withColumn("payload_bytes", F.length(F.col(bin_col)).cast("long")).withColumn(
        "content_id", F.md5(F.col(bin_col))
    )


def _decode_image_bytes(raw: bytes) -> np.ndarray:
    """REAL IMPLEMENTATION REQUIRES an image codec (Pillow/opencv),
    not present in this container."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv; use fake_decode for tests"
    )


def fake_decode(raw: bytes, h: int = 8, w: int = 8, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decoder: expands md5(raw) into an (h,w,c)
    uint8 array. Lets the full pipeline (batching, schema, feature
    extraction shape) run and be tested without codecs."""
    seed = hashlib.md5(raw).digest()
    reps = (h * w * c) // len(seed) + 1
    buf = (seed * reps)[: h * w * c]
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)


def extract_image_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    decode=fake_decode,
) -> DataFrame:
    """Decode → per-channel mean/std features via mapInPandas.

    Output: (id, feat array<double> of 2*channels). Swap ``decode`` for
    a real codec in production; the Spark plumbing is identical.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feat", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for raw in pdf[bin_col]:
                img = decode(bytes(raw))
                per_c = img.reshape(-1, img.shape[-1]).astype(float)
                feats.append(
                    list(per_c.mean(axis=0)) + list(per_c.std(axis=0))
                )
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "feat": feats})

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    frame_idx_col: str = "frame_idx",
) -> DataFrame:
    """Frame sampling for video tables keyed (video_id, frame_idx,
    payload): keep every n-th frame. Pure filter — prunes before any
    decode, pushed to the scan."""
    return df.filter((F.col(frame_idx_col) % every_n) == 0)
