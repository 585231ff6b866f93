"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed through Arrow-batched
mapInPandas.

This container ships no decode libraries (PIL/ffmpeg absent). PNG
decode is REAL anyway: `sources/png.py` is a vendored pure-Python codec
(stdlib zlib + chunk parsing + the five filter reversals), and
`decode_image_meta` / `extract_features` route any `\x89PNG`-signature
buffer through it — actual inflate + unfilter of compressed bytes,
oracle-gated (`multimodal_png`). Other formats (JPEG, audio, video
keyframes) remain STUBS behind import-guards: when the real library is
missing they raise NotImplementedError unless `fake_decode=True`, in
which case a deterministic fake (FIMG header-derived metadata +
byte-histogram features) stands in. The SPARK-SIDE contract — schemas,
batch iteration, partition sizing, UDF signatures — is identical across
all three paths; swapping kernels for PIL/torchaudio later changes no
plan shape.

Scale notes: media bytes dominate row size → `spark.sql.files.
maxPartitionBytes` should be lowered (128 MB default means only ~100
rows per task at 1 MB/image, fine; at 100 MB videos use 1 row/batch via
maxRecordsPerBatch). Feature extraction emits small fixed-width vectors
— project early, never carry the binary past the extract stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # the real kernel, absent in this container
    from PIL import Image  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = ("media_id long, kind string, data binary, "
                "mime string, source_url string")

IMAGE_META_SCHEMA = ("media_id long, width int, height int, mode string, "
                     "n_bytes long, sha int")

FEATURES_SCHEMA = "media_id long, features array<float>"

FRAME_SCHEMA = "media_id long, frame_idx int, offset_bytes long, n_bytes long"


def fake_media_df(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: synthetic headers + payload bytes
    (a stand-in for a WARC-extracted image/audio column)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
                # 8-byte fake header: magic, width, height (u16 LE each)
                header = b"FIMG" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
                payload = rng.integers(0, 256, int(rng.integers(64, 2048)),
                                       dtype=np.uint8).tobytes()
                rows.append({"media_id": i,
                             "kind": "image",
                             "data": header + payload,
                             "mime": "image/fake",
                             "source_url": f"https://img.test/{i}.fimg"})
            yield pd.DataFrame(rows)
    return spark.range(0, n, 1, 4).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_header(data: bytes) -> tuple[int, int]:
    if not data[:4] == b"FIMG":
        raise ValueError("bad magic")
    return (int.from_bytes(data[4:6], "little"),
            int.from_bytes(data[6:8], "little"))


def decode_image_meta(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """binary → typed metadata. PNG buffers (by signature) ALWAYS take
    the vendored pure-Python decode path — inflate + unfilter
    (sources/png.py) — never PIL, so the pixel checksum is identical
    whatever the environment ships; HAVE_PIL only gates the non-PNG
    formats the vendored codec doesn't cover. The PNG `sha`
    is a checksum of the DECODED PIXELS (sum of samples mod 2^31−1), so
    a wrong unfilter flips the oracle hash. FIMG buffers keep the
    deterministic header stub; any other format raises unless
    fake_decode permits the stub contract."""
    if not fake_decode and not HAVE_PIL:
        raise NotImplementedError(
            "non-PNG image decode requires PIL — not available in this "
            "container; PNG decodes for real, pass fake_decode=True for "
            "the FIMG stub")

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import SIGNATURE, decode_png
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data)
                if b[:8] == SIGNATURE:
                    w, h, mode, px = decode_png(b)
                    # EXACT python-int math (int() before sum-mod):
                    # numpy u64 % python-int silently promotes to
                    # float64 and loses low bits — round-5 bug class
                    sha = int(np.frombuffer(px, np.uint8)
                              .sum(dtype=np.uint64)) % 2147483647
                else:
                    w, h = _decode_header(b)
                    mode = "RGB"
                    # header checksum: u64le(first 8 bytes) mod the
                    # Mersenne prime 2^31−1
                    sha = int.from_bytes(b[:8], "little") % 2147483647
                out.append({"media_id": int(mid), "width": w, "height": h,
                            "mode": mode, "n_bytes": len(b),
                            "sha": sha})
            yield pd.DataFrame(out)

    return media.select("media_id", "data").mapInPandas(meta, IMAGE_META_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16,
                     fake_decode: bool = True) -> DataFrame:
    """binary → fixed-width float features (normalized byte histogram —
    over REAL decoded pixels for PNG buffers, over the payload bytes
    for the FIMG stub; the production kernel would be a vision model).
    Output feeds similarity.cosine_topk / dedup.embedding_neardup_pairs."""
    if not fake_decode and not HAVE_PIL:
        raise NotImplementedError("real feature extraction unavailable")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import SIGNATURE, decode_png
        for pdf in batches:
            ids, vecs = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data)
                if b[:8] == SIGNATURE:
                    arr = np.frombuffer(decode_png(b)[3], np.uint8)
                else:
                    arr = np.frombuffer(b[8:], np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                v = hist.astype(np.float32)
                n = np.linalg.norm(v)
                ids.append(int(mid))
                vecs.append((v / n if n else v).tolist())
            yield pd.DataFrame({"media_id": ids, "features": vecs})

    return media.select("media_id", "data").mapInPandas(feats, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256,
                  max_frames: int = 8) -> DataFrame:
    """Video-style frame sampling stub: emit (frame_idx, byte offset)
    rows per media item — the real kernel would seek keyframes; the
    Spark shape (one input row → ≤ max_frames output rows) is what
    matters for partition sizing."""
    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                total = len(bytes(data))
                for fi in range(min(max_frames, max(1, total // every_n_bytes))):
                    rows.append({"media_id": int(mid), "frame_idx": fi,
                                 "offset_bytes": fi * every_n_bytes,
                                 "n_bytes": min(every_n_bytes,
                                                total - fi * every_n_bytes)})
            yield pd.DataFrame(rows)

    return media.select("media_id", "data").mapInPandas(frames, FRAME_SCHEMA)
