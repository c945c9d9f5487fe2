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


def test_blob_hash_oracles_byte_exact_beyond_ascii(spark, tmp_path):
    """r12 unicode sweep: the old blob_resize / blob_frame_sample
    oracles rebuilt payloads from CHAR slices — only accidentally exact
    for pure-ASCII fixtures (an invariant this test used to pin). The
    oracles are now BYTE-exact (octet counts + uppercase-hex-pair
    reconstruction; the hashed canonical form is the payload's hex,
    since DuckDB 1.0 has no md5(BLOB)), so the contract holds for any
    UTF-8 payload: multibyte codepoints, codepoint-splitting frame/
    stride boundaries, and the empty payload."""
    import os

    import duckdb
    import pandas as pd

    from tfm_taxitrips_spark.queries.multimodal import QUERIES
    from tests.oracle import compare_result

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "text": pd.array(
                [
                    "plain ascii payload",
                    "straße 中文 处理 ТЕКСТ naïve φύση",   # multibyte
                    "中" * 100,                             # 3-byte chars,
                    "",                                     # stride splits them
                ],
                dtype="string"),
            "lang": "en",
            "source": "web",
        }
    )
    pdf["n_chars"] = pdf["text"].str.len().astype("Int64")
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{tmp_path}/documents.parquet'")
    try:
        for name in ("blob_resize", "blob_frame_sample"):
            spec = QUERIES[name]
            actual = spec.fn(spark, str(tmp_path)).toPandas()
            expected = conn.sql(spec.oracle).df()
            assert compare_result(
                actual.copy(), expected)["hash_match"], name
            assert len(actual) == 4, name
    finally:
        conn.close()
