"""Multimodal plumbing: schemas, Arrow batch shapes, determinism of the
stub kernels, and composition with the similarity operators."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_skillbox_spark.operators.similarity import cosine_topk
from search_engine_skillbox_spark.sources.multimodal import (
    HAVE_PIL, decode_image_meta, extract_features, fake_media_df,
    sample_frames)


def test_media_decode_meta(spark):
    media = fake_media_df(spark, 50)
    meta = decode_image_meta(media).collect()
    assert len(meta) == 50
    for r in meta:
        assert 16 <= r["width"] < 512 and 16 <= r["height"] < 512
        assert r["n_bytes"] > 8 and r["mode"] == "RGB"
    # determinism across recomputation and partitioning
    meta2 = decode_image_meta(fake_media_df(spark, 50)).collect()
    assert sorted(map(tuple, meta)) == sorted(map(tuple, meta2))


def test_real_decode_gated(spark):
    if HAVE_PIL:
        pytest.skip("PIL present — stub gate not exercised")
    with pytest.raises(NotImplementedError):
        decode_image_meta(fake_media_df(spark, 2), fake_decode=False)


def test_features_feed_similarity(spark):
    media = fake_media_df(spark, 60)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        v = np.array(r["features"])
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    q = rows[0]["features"]
    top = cosine_topk(feats.withColumnRenamed("media_id", "vec_id")
                      .withColumnRenamed("features", "embedding"),
                      [float(x) for x in q], k=5).collect()
    assert top[0]["vec_id"] == rows[0]["media_id"]
    assert abs(top[0]["cos"] - 1.0) < 1e-5


def test_frame_sampling_shape(spark):
    media = fake_media_df(spark, 20)
    fr = sample_frames(media, every_n_bytes=256, max_frames=8)
    pdf = fr.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "offset_bytes",
                                "n_bytes"}
    assert (pdf.groupby("media_id")["frame_idx"].count() <= 8).all()
    assert (pdf["n_bytes"] > 0).all()
