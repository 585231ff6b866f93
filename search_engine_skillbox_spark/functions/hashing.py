"""Driver-side XXH64 matching Spark's `F.xxhash64` (seed 42) bit-for-bit.

Lets the query planner compute a term's bucket  pmod(xxhash64(term), B)
without any Spark job — the blocks scan is then partition-pruned purely
from the query string (verified against F.xxhash64 in tests).

Implementation from the public xxHash spec (XXH64); for StringType
Spark hashes the UTF-8 bytes with seed 42.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + a * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + b * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + c * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + d * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M, 31) * _P1) & _M)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (k,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl(h ^ ((_rotl((k * _P2) & _M, 31) * _P1) & _M), 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ ((k * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str) -> int:
    """Signed-int64 value equal to Spark's xxhash64(string_col)."""
    v = xxh64(s.encode("utf-8"), 42)
    return v - (1 << 64) if v >= (1 << 63) else v


def term_bucket(term: str, n_buckets: int) -> int:
    """pmod(xxhash64(term), n_buckets) — Spark's pmod of the signed value."""
    return spark_xxhash64_str(term) % n_buckets


def spark_xxhash64_long(v: int) -> int:
    """Signed-int64 value equal to Spark's xxhash64(bigint_col): XXH64 of
    the value's 8-byte little-endian representation, seed 42."""
    import struct
    h = xxh64(struct.pack("<q", v), 42)
    return h - (1 << 64) if h >= (1 << 63) else h


def doc_bucket(doc_id: int, n_buckets: int) -> int:
    """pmod(xxhash64(doc_id), n_buckets) — driver-side twin of the doc
    partition key, so point operations prune without a Spark job."""
    return spark_xxhash64_long(doc_id) % n_buckets


def spark_xxhash64_long_np(vals):
    """Vectorized twin of spark_xxhash64_long over an int64 numpy array
    (XXH64 of an 8-byte input reduces to one lane + avalanche — every
    step is expressible in uint64 numpy). Equality with the scalar
    version is pinned in tests; used by the serving tier to compute
    gen-0 salts for thousands of candidate docs per site query."""
    import numpy as np
    u64 = np.uint64
    with np.errstate(over="ignore"):
        k = np.asarray(vals, np.int64).view(np.uint64)
        P1, P2, P3, P4, P5 = (u64(_P1), u64(_P2), u64(_P3), u64(_P4),
                              u64(_P5))

        def rotl(x, r):
            return (x << u64(r)) | (x >> u64(64 - r))

        h = u64(42) + P5 + u64(8)  # seed + P5 + len(8 bytes)
        h = rotl(h ^ (rotl(k * P2, 31) * P1), 27) * P1 + P4
        h ^= h >> u64(33)
        h *= P2
        h ^= h >> u64(29)
        h *= P3
        h ^= h >> u64(32)
        return h.view(np.int64)


# --- cross-engine deterministic column hashes -----------------------------
# Oracle parity (DuckDB) needs a hash computable identically in both
# engines. md5 is the shared primitive: h60 = first 15 hex digits as int
# (60 bits, always positive, fits BIGINT); h32 = first 8 hex digits
# (for products that must stay within int64 under Spark ANSI mode).
# Spark:  conv(substr(md5(c),1,k),16,10)::long      (JVM built-ins)
# DuckDB: ('0x' || substr(md5(c),1,k))::BIGINT

def h60(col):
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h32(col):
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


H60_SQL = "('0x' || substr(md5({c}), 1, 15))::BIGINT"
H32_SQL = "('0x' || substr(md5({c}), 1, 8))::BIGINT"
