"""PNG decode throughput (VERDICT r6 #5): quantify the vendored
pure-Python codec (sources/png.py) on filter-cycling images — 2 of 5
rows use the sequential Average/Paeth unfilter loops, the codec's
honest worst spot — and, where PIL is importable, the same buffers
through PIL as the guarded fast path, so the crossover is auditable
instead of asserted.

No Spark: this measures the per-executor kernel (the mapInPandas batch
body). Writes BENCH/png_decode.json. Run: python bench/png_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from search_engine_skillbox_spark.sources.png import (  # noqa: E402
    decode_png, encode_png)


def make_png(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    # mid-frequency noise: realistic filter deltas (pure gradients make
    # Paeth rows nearly-zero and overstate zlib, not unfilter, cost)
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    return encode_png(w, h, px.tobytes(), color_type=2)


def bench_decoder(fn, bufs, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for b in bufs:
            fn(b)
        best = min(best, time.perf_counter() - t0)
    return best


def pil_decode(buf: bytes):
    import io

    from PIL import Image
    im = Image.open(io.BytesIO(buf))
    im.load()
    return np.asarray(im)


def main() -> None:
    shapes = {"thumb_128": (128, 128, 64), "photo_1024": (1024, 1024, 2)}
    report: dict = {"note": ("vendored codec: None/Sub/Up rows are "
                             "numpy-vectorized; Average/Paeth rows are "
                             "per-pixel Python (spec-sequential in x). "
                             "Encoder cycles filters row%5, so 40% of "
                             "rows hit the slow loops.")}
    for name, (w, h, n) in shapes.items():
        bufs = [make_png(w, h, seed) for seed in range(n)]
        mpix = w * h * n / 1e6
        sec = bench_decoder(decode_png, bufs)
        row = {"images": n, "mpix": round(mpix, 3),
               "pure_python_sec": round(sec, 3),
               "pure_python_mpix_per_sec": round(mpix / sec, 3),
               "pure_python_images_per_sec": round(n / sec, 2)}
        try:
            psec = bench_decoder(pil_decode, bufs)
            row["pil_sec"] = round(psec, 3)
            row["pil_mpix_per_sec"] = round(mpix / psec, 3)
            row["speedup_pil"] = round(sec / psec, 1)
        except ImportError:
            row["pil_sec"] = None  # container ships no PIL
        report[name] = row
        print(json.dumps({name: row}), flush=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "png_decode.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
