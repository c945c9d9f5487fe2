"""Multimodal-column operators (SURVEY.md §2.10).

Images/audio/video are opaque ``binary`` columns with typed metadata; the
heavy steps (decode, feature-extract, resize, frame-sample) run as
Arrow-batched Pandas UDFs via ``mapInPandas`` — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.

The actual media decode is STUBBED: the container has no image/audio
libraries. ``decode_image`` raises ``NotImplementedError`` unless PIL is
importable; ``byte_features`` / ``sample_frames`` below are deterministic
byte-level stand-ins whose outputs an SQL oracle can reproduce, so the
whole distributed path (binary column → Arrow batch → pandas → typed
output schema) is verified even without media libs.

Scale notes: mapInPandas streams Arrow record batches — one Python worker
per core, no per-row pickling. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; for ~MB-sized blobs set
it low (e.g. 64) to bound worker memory at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of featurize_blobs
FEATURES_SCHEMA = "doc_id bigint, n_bytes bigint, n_spaces bigint, byte_sum bigint"
#: output schema of sample_blob_frames
FRAMES_SCHEMA = "doc_id bigint, n_frames int, n_sampled int, first_frame_md5 string"

FRAME_BYTES = 256
FRAME_STRIDE = 4


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture the multimodal shape from the documents table: an opaque
    binary payload + typed metadata struct (what a real pipeline carries
    alongside decoded-at-read media).

    Contract (r12, found by the registry-wide NULL-probe sweep,
    ``tools/null_probe_sweep.py``): a NULL text has NO payload — the row
    is excluded at this seam, the multimodal analog of the vector
    family's ``emb_table`` guard (oracle twins filter
    ``text IS NOT NULL``). Before the guard, a NULL blob crashed every
    mapInPandas worker downstream (``len(None)``) — a single defective
    ingest row killing a whole media job at 100 TB.
    """
    blob = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("content_type"),
        F.octet_length(blob).alias("n_bytes"),
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .withColumn("blob", blob)
        .withColumn("media_meta", meta)
    )


def decode_image(blob: bytes):  # pragma: no cover - stub
    """Decode an image blob. STUB: requires PIL, absent in this container.

    Swap-in point for the real pipeline: ``Image.open(io.BytesIO(blob))``
    inside the same mapInPandas workers that run :func:`featurize_blobs`.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; use byte-level features in this environment"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(blob))


def featurize_blobs(df: DataFrame) -> DataFrame:
    """Deterministic byte-level feature extraction over the binary column
    via mapInPandas (the decode/fingerprint slot of a media pipeline)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len),
                    "n_spaces": blobs.map(lambda b: b.count(b" ")),
                    "byte_sum": blobs.map(lambda b: sum(b)),
                }
            )

    return df.select("doc_id", "blob").mapInPandas(extract, schema=FEATURES_SCHEMA)


#: output schema of resize_blobs
RESIZE_SCHEMA = "doc_id bigint, blob_resized binary, orig_bytes bigint, resized_bytes bigint"

RESIZE_STRIDE = 4


def resize_blobs(df: DataFrame, stride: int = RESIZE_STRIDE) -> DataFrame:
    """Resize analog over an opaque payload: keep every ``stride``-th byte
    (the downsample slot where a real pipeline calls PIL's ``Image.resize``
    inside the same worker). Returns the resized payload plus size
    metadata; content is deterministic (asserted in tests), sizes are
    SQL-reproducible."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["blob"].map(lambda b: b[::stride])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob_resized": resized,
                    "orig_bytes": pdf["blob"].map(len),
                    "resized_bytes": resized.map(len),
                }
            )

    return df.select("doc_id", "blob").mapInPandas(resize, schema=RESIZE_SCHEMA)


#: output schema of audio_features
AUDIO_SCHEMA = (
    "doc_id bigint, n_samples bigint, rms double, peak int, "
    "n_crossings bigint, n_silent_chunks int"
)
AUDIO_CHUNK = 128  # samples per VAD chunk
AUDIO_MIDLINE = 128  # zero-crossing midline for unsigned 8-bit "samples"
SILENCE_MAX = 48  # a chunk whose peak is below this is "silence"


def audio_features(df: DataFrame) -> DataFrame:
    """Audio-analysis analog over an opaque payload, treating bytes as
    unsigned 8-bit PCM: RMS loudness, peak amplitude, zero-crossing count
    (midline 128) and silent-chunk detection (the VAD slot — a real
    pipeline decodes with soundfile/librosa inside these same workers,
    see :func:`decode_image` for the stub pattern). Vectorized numpy over
    Arrow batches; every stat is SQL-reproducible."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                s = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
                if s.size == 0:
                    rows.append((doc_id, 0, None, None, 0, 0))
                    continue
                rms = float(np.sqrt((s * s).sum() / s.size))
                hi = s >= AUDIO_MIDLINE
                crossings = int((hi[1:] != hi[:-1]).sum())
                n_chunks = (s.size + AUDIO_CHUNK - 1) // AUDIO_CHUNK
                silent = sum(
                    1
                    for i in range(n_chunks)
                    if s[i * AUDIO_CHUNK : (i + 1) * AUDIO_CHUNK].max() < SILENCE_MAX
                )
                rows.append(
                    (doc_id, int(s.size), rms, int(s.max()), crossings, silent)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "rms", "peak",
                    "n_crossings", "n_silent_chunks",
                ],
            )

    return df.select("doc_id", "blob").mapInPandas(extract, schema=AUDIO_SCHEMA)


def sample_blob_frames(df: DataFrame) -> DataFrame:
    """Frame sampling over an opaque payload: split into FRAME_BYTES chunks,
    keep every FRAME_STRIDE-th (video keyframe-sampling analog)."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                frames = [
                    blob[i : i + FRAME_BYTES] for i in range(0, len(blob), FRAME_BYTES)
                ]
                sampled = frames[::FRAME_STRIDE]
                # hash the frame's canonical UPPERCASE-HEX rendering,
                # not the raw bytes: DuckDB 1.0 has no md5(BLOB), and a
                # frame boundary can split a multibyte codepoint, so the
                # oracle can only reconstruct the frame byte-exactly as
                # hex (md5(substr(hex(encode(text)), ...))). Byte-exact
                # for ANY payload — the r12 unicode sweep retired the
                # old ASCII-only char-slice oracle.
                rows.append(
                    (
                        doc_id,
                        len(frames),
                        len(sampled),
                        hashlib.md5(frames[0].hex().upper().encode())
                        .hexdigest() if frames else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_sampled", "first_frame_md5"]
            )

    return df.select("doc_id", "blob").mapInPandas(sample, schema=FRAMES_SCHEMA)
