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


FRAME_BYTES = 64

FRAME_SCHEMA = "doc_id long, frame_idx long, frame_md5 string, frame_len long"


def frame_sample(df: DataFrame, *, stride: int = 3) -> DataFrame:
    """Frame sampling over a "video" payload: the binary column is treated
    as a sequence of FRAME_BYTES-sized frames; every ``stride``-th frame is
    emitted as its own row (uniform temporal subsampling — the standard
    video-pretraining reduction). Row EXPANSION inside mapInPandas: each
    Arrow batch of documents yields a larger batch of frames, but memory
    stays bounded because only sampled frames materialize.

    The frame content is emitted as md5 so the result is compact and
    engine-portable — the DuckDB oracle replays the identical slicing with
    substr+md5 (payloads here are UTF-8 of ASCII text, so byte and
    character offsets coincide)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, stride):
                    frame = b[fi * FRAME_BYTES:(fi + 1) * FRAME_BYTES]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    md5s.append(hashlib.md5(frame).hexdigest())
                    lens.append(len(frame))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_md5": pd.Series(md5s, dtype="object"),
                "frame_len": pd.Series(lens, dtype="int64"),
            })

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, resized_md5 string"


def resize_stub(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """STUB resize — nearest-neighbor stride sampling of the payload bytes
    onto an out_w×out_h grid (a real deployment decodes and resizes with
    PIL; the dataflow — binary in, fixed-size binary out, Arrow-batched —
    is identical). Deterministic, so tests pin the output."""

    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = out_w * out_h
                if len(b) == 0:
                    grid = np.zeros(n, dtype=np.uint8)
                else:
                    idx = (np.arange(n) * len(b)) // n
                    grid = b[idx]
                out.append(hashlib.md5(grid.tobytes()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "out_w": np.full(len(pdf), out_w, dtype="int32"),
                "out_h": np.full(len(pdf), out_h, dtype="int32"),
                "resized_md5": out,
            })

    return df.mapInPandas(run, RESIZE_SCHEMA)


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
