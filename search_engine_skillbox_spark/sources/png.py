"""Minimal pure-Python PNG codec (stdlib zlib + chunk parsing).

This container ships no image libraries (PIL/ffmpeg absent), but PNG
needs none: the format is zlib + per-row filters, both implementable
from the public spec (RFC 2083 / W3C PNG). Vendoring this lets
`sources.multimodal.decode_image_meta` exercise REAL bytes — actual
inflate + unfilter of a compressed stream — instead of the FIMG header
stub, and makes the result DuckDB-mirrorable: the gate generates pixels
from a closed-form formula, round-trips them through encode→decode, and
the oracle recomputes the decoded-pixel checksum from the formula alone
(a wrong unfilter or inflate breaks the hash).

Supported: 8-bit depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA),
non-interlaced, any mix of the five filter types, multi-chunk IDAT.
Rejected loudly: other depths/color types, interlacing, bad CRCs.

Scale shape: this runs INSIDE Arrow-batched mapInPandas kernels — one
Python decode per media row, no shuffle implications. Unfiltering is
numpy-vectorized for None/Up (whole row) and Sub (per-channel cumsum);
Average/Paeth are inherently sequential in x (each pixel needs the
already-decoded left neighbor) and loop per PIXEL over channel vectors
— measured ~3 s/megapixel on Paeth-heavy streams, fine for thumbnails
and gate images, slow for photo-scale corpora. PNG buffers ALWAYS go
through this codec (deterministic across environments — the gate's
pixel checksums must not depend on whether PIL happens to be
installed); multimodal.py's HAVE_PIL guard only gates the non-PNG
formats this codec doesn't cover. Swapping in PIL later
changes no plan shape (multimodal.py's import-guard admits it when
present) and is the right move where native decode is available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}          # color type → samples/pixel
_MODE = {0: "L", 2: "RGB", 6: "RGBA"}   # color type → PIL-style mode


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2, idat_chunk_size: int = 8192) -> bytes:
    """Encode raw row-major samples into a PNG. The filter type CYCLES
    row % 5 through None/Sub/Up/Average/Paeth so a decode round-trip
    exercises every unfilter branch, and IDAT is split at
    idat_chunk_size so multi-chunk reassembly is exercised too."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(f"expected {width * height * ch} bytes, "
                         f"got {len(pixels)}")
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width * ch)
    arr16 = arr.astype(np.int16)  # filter math is mod-256 on differences
    out = bytearray()
    prior = np.zeros(width * ch, np.int16)
    for y in range(height):
        row = arr16[y]
        left = np.zeros(width * ch, np.int16)
        left[ch:] = row[:-ch]
        ul = np.zeros(width * ch, np.int16)
        ul[ch:] = prior[:-ch]
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prior
        elif ft == 3:
            filt = row - (left + prior) // 2
        else:
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, ul))
            filt = row - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prior = row
    raw = zlib.compress(bytes(out), 6)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    png = bytearray(SIGNATURE)
    png.extend(_chunk(b"IHDR", ihdr))
    for i in range(0, len(raw), idat_chunk_size):
        png.extend(_chunk(b"IDAT", raw[i:i + idat_chunk_size]))
    png.extend(_chunk(b"IEND", b""))
    return bytes(png)


def decode_png(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode a PNG → (width, height, mode, raw row-major samples).
    Verifies chunk CRCs; raises ValueError on anything outside the
    supported subset (8-bit depth, color types 0/2/6, no interlace)."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or len(data) < pos + 12 + length:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS:
        raise ValueError(f"unsupported depth/color type {depth}/{ctype}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace")
    ch = _CHANNELS[ctype]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError(f"IDAT inflates to {len(raw)} bytes, "
                         f"expected {height * (stride + 1)}")
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    for y in range(height):
        ft, frow = rows[y, 0], rows[y, 1:]
        if ft == 0:
            cur = frow.copy()
        elif ft == 1:          # Sub: mod-256 addition is associative →
            # each channel lane is a cumsum & 0xFF, fully vectorized
            cur = (np.cumsum(frow.reshape(width, ch), axis=0,
                             dtype=np.uint32) & 0xFF
                   ).astype(np.uint8).reshape(stride)
        elif ft == 2:          # Up: fully vectorized (uint8 wraps)
            cur = frow + prior
        elif ft == 3:          # Average: sequential in x (needs the
            # decoded left pixel) — loop per pixel, vector over channels
            f2 = frow.reshape(width, ch).astype(np.int32)
            p2 = prior.reshape(width, ch).astype(np.int32)
            c2 = np.empty((width, ch), np.int32)
            left = np.zeros(ch, np.int32)
            for x in range(width):
                left = (f2[x] + (left + p2[x]) // 2) & 0xFF
                c2[x] = left
            cur = c2.astype(np.uint8).reshape(stride)
        elif ft == 4:          # Paeth: same sequential shape
            f2 = frow.reshape(width, ch).astype(np.int32)
            p2 = prior.reshape(width, ch).astype(np.int32)
            c2 = np.empty((width, ch), np.int32)
            a = np.zeros(ch, np.int32)   # decoded left pixel
            c = np.zeros(ch, np.int32)   # prior row's left pixel
            for x in range(width):
                b = p2[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                a = (f2[x] + pred) & 0xFF
                c2[x] = a
                c = b
            cur = c2.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad filter type {ft} on row {y}")
        out[y] = cur
        prior = cur
    return width, height, _MODE[ctype], out.tobytes()
