"""Multimodal plumbing unit tests: the decode stub contract and the
mapInPandas edge cases the oracle queries can't reach (empty blobs)."""

from __future__ import annotations

import pytest

from tfm_taxitrips_spark.functions.multimodal import (
    attach_blob,
    decode_image,
    featurize_blobs,
    sample_blob_frames,
)


def test_decode_image_is_stubbed():
    """No media libs in this environment: the decode slot must fail loudly,
    not silently fake an image."""
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


def test_empty_blob_edges(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "")], ["doc_id", "text"]
    )
    blobs = attach_blob(df)
    feats = {r.doc_id: r for r in featurize_blobs(blobs).collect()}
    assert feats[1].n_bytes == 11 and feats[1].n_spaces == 1
    assert feats[2].n_bytes == 0 and feats[2].byte_sum == 0
    frames = {r.doc_id: r for r in sample_blob_frames(blobs).collect()}
    assert frames[1].n_frames == 1 and frames[1].first_frame_md5 is not None
    assert frames[2].n_frames == 0 and frames[2].first_frame_md5 is None


def test_audio_features_known_values_and_empty_edge(spark):
    """Hand-computed stats on a tiny payload + the empty-blob edge the
    oracle can't reach (documents has no empty text at the graded SFs)."""
    import math

    from tfm_taxitrips_spark.functions.multimodal import audio_features

    # "aA A": bytes 97,65,32,65 → midline(128) never crossed; all < 128
    df = spark.createDataFrame([(1, "aA A"), (2, "")], ["doc_id", "text"])
    got = {r.doc_id: r for r in audio_features(attach_blob(df)).collect()}
    a = got[1]
    assert a.n_samples == 4
    assert a.peak == 97
    assert a.n_crossings == 0
    assert a.n_silent_chunks == 0  # chunk peak 97 >= SILENCE_MAX
    assert math.isclose(
        a.rms, math.sqrt((97**2 + 65**2 + 32**2 + 65**2) / 4), rel_tol=1e-12
    )
    e = got[2]
    assert (e.n_samples, e.rms, e.peak) == (0, None, None)
    assert (e.n_crossings, e.n_silent_chunks) == (0, 0)


def test_pandas_udf_cosine_agrees_with_fold(spark):
    """The Arrow pandas_udf cosine and the codegen fold cosine agree to
    1e-12 relative (different float association order, same math)."""
    from tfm_taxitrips_spark.functions.similarity import (
        as_double,
        cosine,
        cosine_pandas_udf,
    )
    from tfm_taxitrips_spark.sources.readers import table
    import pyspark.sql.functions as F

    emb = table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    pairs = emb.select(
        "vec_id",
        F.col("embedding").alias("a"),
        F.reverse("embedding").alias("b"),
    )
    udf_cos = cosine_pandas_udf()
    both = pairs.select(
        "vec_id",
        cosine(as_double("a"), as_double("b")).alias("fold"),
        udf_cos(as_double("a"), as_double("b")).alias("arrow"),
    ).collect()
    assert both, "no rows"
    for r in both:
        assert abs(r.fold - r.arrow) <= 1e-12 * max(1.0, abs(r.fold)), r


def test_corpus_is_ascii_nonempty(sf_smoke):
    """Pins the invariant the md5-reconstruction oracles (blob_resize,
    blob_frame_sample) rely on: those SQL oracles rebuild payloads from
    CHAR slices, which equal BYTE slices only when every document is pure
    ASCII and non-empty. The numeric-stat oracles (blob_features,
    blob_audio_features) decode true bytes via hex() and do NOT need this.
    If the fixture generator ever emits non-ASCII or empty text, this
    fails here instead of as a silent oracle hash-mismatch."""
    import duckdb

    conn = duckdb.connect()
    bad = conn.sql(
        f"""SELECT count(*) FROM '{sf_smoke}/documents.parquet'
            WHERE length(text) = 0
               OR octet_length(encode(text)) <> length(text)"""
    ).fetchone()[0]
    assert bad == 0
