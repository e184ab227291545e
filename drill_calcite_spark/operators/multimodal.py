"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side plumbing (schema, batch shape, partitioning) is real and
tested; the actual media DECODE step is a clearly-marked stub — the
image/audio libraries are not in this container, so ``decode_stub``
computes a deterministic fake (byte histogram) with the same dataflow a
real decoder would have. Swap ``_decode_bytes`` for PIL/librosa in a real
deployment; nothing else changes.

Scale notes: payloads stay in executors end-to-end (no driver collect);
mapInPandas streams Arrow record batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload size —
repartition upstream so (batch rows × payload bytes) fits the executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 8

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, feat array<double>"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: a ``binary`` payload column plus typed
    metadata (format/width/height), all derived deterministically from the
    text so oracles can recompute them. In production this column comes
    straight from the lake (parquet BinaryType)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    h = F.md5(F.col(text_col))
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("fake/raw").alias("media_format"),
        (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") + 16).alias("width"),
        (F.conv(F.substring(h, 3, 2), 16, 10).cast("int") + 16).alias("height"),
    )


def _decode_bytes(payload: bytes) -> np.ndarray:
    """STUB decode — deterministic byte histogram (mod N_FEATURES), L1
    normalized. A real deployment replaces this body with e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))`` feature extraction;
    raise instead if silent fakes are unacceptable:
        raise NotImplementedError("media decoding not available")
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % N_FEATURES, minlength=N_FEATURES).astype("float64")
    total = hist.sum()
    return hist / total if total else hist


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.
    Input: (doc_id, payload, width, height, ...). Output: FEATURE_SCHEMA.
    Arrow-batched; one Python worker per input partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
                "feat": feats,
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)
