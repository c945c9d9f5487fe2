"""Multimodal-column queries (SURVEY.md §2.10): binary payloads + typed
metadata, with the heavy steps as Arrow-batched Pandas UDFs. The oracles
recompute the deterministic byte-level features in SQL, proving the
mapInPandas path end-to-end.

Oracle byte semantics: numeric byte stats (``blob_features``,
``blob_audio_features``) decode ``hex(encode(text))`` into a true byte
list (``_BYTES_CTE``), so they are exact for ANY UTF-8 text including
empty and non-ASCII. The two md5-reconstruction oracles
(``blob_resize``, ``blob_frame_sample``) rebuild a *string* from char
slices, which equals the byte slice only for ASCII — that invariant is
asserted against the fixture by ``tests/test_multimodal.py``
(test_corpus_is_ascii_nonempty) rather than silently assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    RESIZE_STRIDE,
    attach_blob,
    featurize_blobs,
    sample_blob_frames,
)
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table


def q_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column + typed metadata struct (JVM-side only, no Python)."""
    docs = attach_blob(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.content_type").alias("content_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("blob").alias("blob_md5"),
    )


_BLOB_META_SQL = """
SELECT doc_id,
       'application/octet-stream' AS content_type,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS blob_md5  -- md5(VARCHAR) hashes the UTF-8 bytes:
                              -- byte-exact vs Spark md5(encode(text))
                              -- for ANY payload, not just ASCII
FROM documents
WHERE text IS NOT NULL  -- attach_blob's NULL-payload contract (r12)
"""


def q_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (the decode slot). Oracle recomputes
    the byte stats in SQL via codepoint arithmetic (ASCII ⇒ bytes==chars)."""
    docs = attach_blob(table(spark, sf_dir, "documents"))
    return featurize_blobs(docs)


# Decode hex(encode(text)) to a genuine byte list: exact for any UTF-8
# payload (multi-byte chars and empty strings included), unlike per-char
# unicode() codepoints which only coincide with bytes for ASCII.
_BYTES_CTE = """
  SELECT doc_id,
         list_transform(range(0, octet_length(encode(text))),
           i -> (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2+1, 1)) - 1) * 16
              + (strpos('0123456789ABCDEF', substr(hex(encode(text)), i*2+2, 1)) - 1)) AS s
  FROM documents
  WHERE text IS NOT NULL  -- attach_blob's NULL-payload contract (r12)
"""

_BLOB_FEATURES_SQL = f"""
WITH b AS ({_BYTES_CTE})
SELECT doc_id,
       CAST(len(s) AS BIGINT) AS n_bytes,
       CAST(len(list_filter(s, x -> x = 32)) AS BIGINT) AS n_spaces,
       CAST(COALESCE(list_sum(s), 0) AS BIGINT) AS byte_sum
FROM b
"""


def q_blob_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video keyframe analog) via mapInPandas."""
    docs = attach_blob(table(spark, sf_dir, "documents"))
    return sample_blob_frames(docs)


_FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       -- BYTE counts (octet_length), not char counts: multibyte UTF-8
       -- payloads have bytes != chars (r12 unicode sweep)
       CAST(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT)
         AS n_frames,
       CAST(CEIL(CEIL(octet_length(encode(text)) / {FRAME_BYTES}.0)
                 / {FRAME_STRIDE}.0) AS INT) AS n_sampled,
       -- md5 of the frame's UPPERCASE-HEX rendering: byte-exact for any
       -- payload even when the frame boundary splits a codepoint (no
       -- md5(BLOB) in DuckDB 1.0; hex() is uppercase in both engines)
       CASE WHEN octet_length(encode(text)) = 0 THEN NULL
            ELSE md5(substr(hex(encode(text)), 1, {FRAME_BYTES * 2}))
       END AS first_frame_md5
FROM documents
WHERE text IS NOT NULL  -- attach_blob's NULL-payload contract (r12)
"""


def q_blob_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (downsample) via mapInPandas: every RESIZE_STRIDE-th byte.
    The oracle recomputes the downsampled payload BYTE-wise from the hex
    rendering and must reproduce the md5 of the bytes Python actually
    emitted — the r12 unicode sweep retired the old char-slice oracle,
    which was only accidentally exact for ASCII payloads. The hashed
    canonical form is the payload's UPPERCASE hex (both engines' hex()),
    since DuckDB 1.0 has no md5(BLOB)."""
    from tfm_taxitrips_spark.functions.multimodal import resize_blobs

    docs = attach_blob(table(spark, sf_dir, "documents"))
    resized = resize_blobs(docs)
    return resized.select(
        "doc_id", "orig_bytes", "resized_bytes",
        F.md5(F.hex("blob_resized")).alias("resized_md5"),
    )


_BLOB_RESIZE_SQL = f"""
SELECT doc_id,
       -- BYTE counts and BYTE slices (octet/hex pairs), not chars:
       -- multibyte UTF-8 has bytes != chars, and a stride can land
       -- mid-codepoint — the hex-pair reconstruction is byte-exact for
       -- ANY payload (r12 unicode sweep)
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
       CAST(len(range(1, octet_length(encode(text)) + 1, {RESIZE_STRIDE}))
            AS BIGINT) AS resized_bytes,
       -- COALESCE: DuckDB's array_to_string([]) is NULL, not '' — an
       -- EMPTY payload must hash like md5(hex(b'')) = md5('')
       md5(COALESCE(array_to_string(list_transform(
             range(0, octet_length(encode(text)), {RESIZE_STRIDE}),
             i -> substr(hex(encode(text)), i*2 + 1, 2)), ''), ''))
         AS resized_md5
FROM documents
WHERE text IS NOT NULL  -- attach_blob's NULL-payload contract (r12)
"""


def q_blob_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-analysis analog (RMS / peak / zero crossings / silent chunks)
    via mapInPandas + numpy — the loudness/VAD slot of a speech pipeline."""
    from tfm_taxitrips_spark.functions.multimodal import audio_features

    docs = attach_blob(table(spark, sf_dir, "documents"))
    return audio_features(docs)


def _audio_sql() -> str:
    from tfm_taxitrips_spark.functions.multimodal import (
        AUDIO_CHUNK,
        AUDIO_MIDLINE,
        SILENCE_MAX,
    )

    return f"""
WITH b AS ({_BYTES_CTE})
SELECT doc_id,
       CAST(len(s) AS BIGINT) AS n_samples,
       CASE WHEN len(s) = 0 THEN NULL
            ELSE sqrt(list_sum(list_transform(s, x -> CAST(x*x AS BIGINT)))
                      / CAST(len(s) AS DOUBLE)) END AS rms,
       CAST(list_max(s) AS INT) AS peak,
       CAST(COALESCE(list_sum(list_transform(range(1, len(s)),
            i -> CASE WHEN (s[i] >= {AUDIO_MIDLINE}) != (s[i+1] >= {AUDIO_MIDLINE})
                      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_crossings,
       CAST(COALESCE(list_sum(list_transform(range(1, len(s) + 1, {AUDIO_CHUNK}),
            i -> CASE WHEN list_max(list_slice(s, i, i + {AUDIO_CHUNK} - 1))
                           < {SILENCE_MAX}
                      THEN 1 ELSE 0 END)), 0) AS INT) AS n_silent_chunks
FROM b
"""


_BLOB_AUDIO_SQL = _audio_sql()


QUERIES: dict[str, QuerySpec] = {
    "blob_audio_features": QuerySpec(q_blob_audio_features, _BLOB_AUDIO_SQL,
                                     tags=("multimodal", "audio")),
    "blob_metadata": QuerySpec(q_blob_metadata, _BLOB_META_SQL, tags=("multimodal",)),
    "blob_resize": QuerySpec(q_blob_resize, _BLOB_RESIZE_SQL, tags=("multimodal",)),
    "blob_features": QuerySpec(q_blob_features, _BLOB_FEATURES_SQL, tags=("multimodal",)),
    "blob_frame_sample": QuerySpec(q_blob_frame_sample, _FRAME_SAMPLE_SQL, tags=("multimodal",)),
}
