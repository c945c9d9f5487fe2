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
