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


def test_png_codec_roundtrip_all_filters_and_modes():
    """Pure-codec pin: encode cycles ALL five filter types (row % 5) and
    splits IDAT into multiple chunks; decode must reproduce every pixel
    byte for gray/RGB/RGBA across shapes that hit the edge geometry
    (1-pixel rows/columns, width < one filter cycle)."""
    from search_engine_skillbox_spark.sources.png import (
        SIGNATURE, decode_png, encode_png)
    rng = np.random.default_rng(11)
    for ct, ch, mode in [(0, 1, "L"), (2, 3, "RGB"), (6, 4, "RGBA")]:
        for (w, h) in [(1, 1), (1, 9), (17, 1), (16, 16), (31, 29)]:
            px = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
            data = encode_png(w, h, px, color_type=ct, idat_chunk_size=256)
            assert data[:8] == SIGNATURE
            gw, gh, gmode, out = decode_png(data)
            assert (gw, gh, gmode) == (w, h, mode)
            assert out == px


def test_png_codec_rejects_corruption():
    from search_engine_skillbox_spark.sources.png import (
        decode_png, encode_png)
    good = encode_png(4, 4, bytes(range(48)))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    bad = bytearray(good)
    bad[40] ^= 0x01  # flip one byte inside a chunk → CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # truncated IDAT stream
    with pytest.raises(ValueError):
        decode_png(good[: len(good) - 20])


def test_decode_image_meta_real_png_path(spark):
    """decode_image_meta must route PNG-signature buffers through the
    REAL vendored decoder: sha is the decoded-pixel checksum (verified
    here against the source pixels), mode comes from the color type,
    and FIMG stub rows coexist in the same batch."""
    from search_engine_skillbox_spark.sources.png import encode_png
    rng = np.random.default_rng(5)
    rows, want = [], {}
    for i in range(8):
        w, h = int(rng.integers(4, 40)), int(rng.integers(4, 40))
        px = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
        rows.append((i, "image", encode_png(w, h, px.tobytes()),
                     "image/png", f"https://img.test/{i}.png"))
        want[i] = (w, h, "RGB", int(px.sum(dtype=np.uint64)) % 2147483647)
    # one FIMG stub row in the same frame
    rows.append((99, "image", b"FIMG" + (7).to_bytes(2, "little")
                 + (9).to_bytes(2, "little") + b"payload",
                 "image/fake", "https://img.test/99.fimg"))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, data binary, mime string, "
              "source_url string")
    got = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    for i, (w, h, mode, sha) in want.items():
        r = got[i]
        assert (r["width"], r["height"], r["mode"], r["sha"]) == \
            (w, h, mode, sha)
    assert (got[99]["width"], got[99]["height"]) == (7, 9)


def test_extract_features_png_uses_decoded_pixels(spark):
    """For PNG media the histogram must be over DECODED pixels, not the
    compressed stream: a constant-color image yields a one-hot
    histogram, which the zlib bytes would never produce."""
    from search_engine_skillbox_spark.sources.png import encode_png
    px = np.full(20 * 10 * 3, 200, np.uint8)  # all bytes = 200
    media = spark.createDataFrame(
        [(1, "image", encode_png(20, 10, px.tobytes()), "image/png", "u")],
        "media_id long, kind string, data binary, mime string, "
        "source_url string")
    (row,) = extract_features(media, dim=16).collect()
    v = np.array(row["features"])
    assert v[12] == pytest.approx(1.0)  # 200 // 16 = bin 12
    assert np.abs(np.delete(v, 12)).max() == 0.0
