"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (its only dedup is the (site,path) upsert,
utils/PageIndexingUtils.java:73-111) but first-class for a 100 TB web
corpus. All variants are pure DataFrame ops with deterministic
md5-derived hashing (functions/hashing.py) so a DuckDB oracle can
reproduce them bit-for-bit.

Scale notes:
  * exact: one groupBy on the FULL 128-bit md5 of the content —
    map-side combine, min(doc_id) keeper; no text shuffled (hash
    only). 128 bits because a 60-bit key yields ~10⁵ birthday
    false-merges at 10¹² docs; md5 collisions at 10¹² are ~10⁻¹⁴.
  * shingles: explode(k-gram) is linear in corpus tokens; distinct
    per doc before any join; super-frequent (boilerplate) shingles
    are droppable via max_shingle_df — the skew cap production
    pipelines apply; drops are counted and logged, never silent.
  * MinHash+LSH: m permutation-free hashes (a_i·h+b_i mod p) folded
    into b bands; candidate pairs only from shared band buckets —
    the all-pairs O(n²) never materializes. Band buckets with huge
    membership (boilerplate) explode quadratically → max_bucket
    drops them (logged).
  * SimHash: 64 weighted-bit sums per doc via one explode+groupBy;
    pairs by banded equality on 16-bit chunks (exact for hamming ≤ 3
    by pigeonhole over 4 chunks), verified with bit_count(xor);
    same max_bucket guard on chunk buckets.
  * embedding cosine: block by LSH-free label/IVF bucketing in
    similarity.py; the sandbox-size all-pairs variant here keeps the
    oracle simple.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.textprep import tokens

MERSENNE31 = (1 << 31) - 1

log = logging.getLogger(__name__)


def exact_duplicates(docs: DataFrame, doc_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(text_hash, keeper, n_dups): groups of byte-identical texts,
    keyed by the full 128-bit md5 (hex). keeper = min doc_id (the row
    a dedup pass would retain)."""
    return (docs.select(F.col(doc_col).alias("doc_id"),
                        F.md5(F.col(text_col)).alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keeper"),
                 F.count(F.lit(1)).alias("n_dups"))
            .filter(F.col("n_dups") > 1))


def dedup_keep_first(docs: DataFrame, doc_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup: retain min-doc_id row per distinct text (keeps all
    original columns; one hash shuffle, text itself never shuffled)."""
    keep = (docs.select(F.col(doc_col).alias("__id"),
                        F.md5(F.col(text_col)).alias("__h"))
            .groupBy("__h").agg(F.min("__id").alias("__id")))
    return docs.join(keep.select("__id"),
                     docs[doc_col] == F.col("__id"), "left_semi")


def _drop_big_buckets(rows: DataFrame, keys: list[str], max_bucket: int,
                      what: str) -> DataFrame:
    """Remove rows of buckets with more than max_bucket members — the
    boilerplate-skew guard (a bucket of b members emits O(b²) candidate
    pairs). The dropped-bucket count is logged, never silent — from the
    SAME aggregation pass the anti-join consumes: `over` (only the few
    skewed buckets — tiny by construction) is persisted, the logging
    count() materializes it, and the join's build side reuses the cache
    instead of recomputing the full groupBy (the round-2 version ran
    the bucket-size aggregation twice per dedup call).

    (An Observation would fold the count into the caller's job with
    zero extra actions, but the result feeds a self-join — the observed
    subtree then appears twice in one plan and the metric never fires.)
    """
    sizes = rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    over = sizes.filter(F.col("__n") > max_bucket).persist()
    n_over = over.count()
    if n_over:
        log.warning("dedup: dropped %d %s bucket(s) larger than %d members",
                    n_over, what, max_bucket)
    # localCheckpoint (eager) materializes the tiny key set so the cache
    # can be released NOW — the lazy anti-join the caller gets no longer
    # references `over`, so nothing leaks a persisted frame per call
    # (checkpoint blocks are GC-managed with the returned plan).
    over_keys = over.select(*keys).localCheckpoint()
    over.unpersist()
    return rows.join(over_keys, keys, "left_anti")


def _shingle_arr(t: F.Column, k: int) -> F.Column:
    """k-token shingle array over a token-array column (NOT deduped —
    callers that need per-doc distinctness apply array_distinct). Docs
    with < k tokens yield their full token join as one shingle (so
    short docs still participate). Pure higher-order functions: stays
    a projection, never forces an explode."""
    return (F.when(F.size(t) < k, F.array(F.concat_ws(" ", t)))
            .otherwise(F.transform(
                F.sequence(F.lit(0), F.size(t) - k),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)))))


def shingles(docs: DataFrame, k: int = 3, doc_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct k-token shingles per doc (tokens via
    the engine tokenizer T2). Docs with < k tokens yield their full
    token join as one shingle (so short docs still participate)."""
    toks = docs.select(F.col(doc_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("t"))
    toks = toks.filter(F.size("t") > 0)
    # dedup is PER DOC, so array_distinct before the explode does it
    # map-side — a global .distinct() here was a full shuffle of the
    # exploded corpus (the most expensive stage of every shingle
    # consumer: all four dedup ops and decontaminate)
    return toks.select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_arr(F.col("t"), k)))
        .alias("shingle"))


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.5,
                        doc_col: str = "doc_id", text_col: str = "text",
                        max_shingle_df: int | None = None) -> DataFrame:
    """(doc1, doc2, jaccard) for pairs with k-shingle Jaccard ≥ threshold.

    Join on shingle → co-occurrence counts → |A∩B| / (|A|+|B|−|A∩B|).
    The shingle join is the scalable formulation (pairs only materialize
    for docs sharing ≥1 shingle). max_shingle_df drops super-frequent
    (boilerplate) shingles BEFORE sizes and the join — a shingle shared
    by b docs emits O(b²) pair rows, the 100 TB skew killer. Jaccard is
    then computed over the capped shingle universe on both engine and
    oracle sides; drops are logged.
    """
    sh = shingles(docs, k, doc_col, text_col)
    if max_shingle_df is not None:
        sh = _drop_big_buckets(sh, ["shingle"], max_shingle_df, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc1"),
                      F.col("b.doc_id").alias("doc2"))
             .agg(F.count(F.lit(1)).alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("doc_id", "doc1")
                 .withColumnRenamed("sz", "sz1"), "doc1")
           .join(sizes.withColumnRenamed("doc_id", "doc2")
                 .withColumnRenamed("sz", "sz2"), "doc2")
           .select("doc1", "doc2",
                   (F.col("inter")
                    / (F.col("sz1") + F.col("sz2") - F.col("inter")))
                   .alias("jaccard")))
    return out.filter(F.col("jaccard") >= threshold)


def _window_hash(th: F.Column, k: int, mult: int = 3) -> F.Column:
    """Array of k-token window hashes over a PRE-MODDED (< 2³¹−1)
    token-hash array: window i ↦ Σⱼ mult^(k−1−j)·th[i+j] mod (2³¹−1)
    — the polynomial rolling-hash family, pure integer arithmetic, no
    per-window string concat/md5. mult^(k−1)·2³¹ must stay < 2⁶³ for
    ANSI (mult=3 covers k ≤ 20). Docs shorter than k fold their whole
    token-hash array ((acc·mult + h) mod p, init 0 — equal to DuckDB's
    list_reduce first-element init because th values are already < p).
    """
    coefs = [mult ** (k - 1 - j) for j in range(k)]
    return (F.when(F.size(th) < k, F.array(
        F.aggregate(th, F.lit(0).cast("long"),
                    lambda acc, h: (acc * mult + h) % F.lit(MERSENNE31))))
            .otherwise(F.transform(
                F.sequence(F.lit(0), F.size(th) - k),
                lambda i: sum(
                    (F.element_at(th, i + j + 1) * F.lit(c)
                     for j, c in list(enumerate(coefs))[1:]),
                    F.element_at(th, i + 1) * F.lit(coefs[0]))
                % F.lit(MERSENNE31))))


def _minhash_sig_df(docs: DataFrame, m: int, k: int, doc_col: str,
                    text_col: str) -> DataFrame:
    """(doc_id, sig: array<long>[m]) — MinHash signatures as a ZERO-
    SHUFFLE projection. MinHash is per-doc embarrassingly parallel, so
    the round-2 formulation (explode shingles → groupBy(doc_id) agg m
    mins) shuffled the whole exploded shingle corpus for nothing — at
    100 TB that exchange IS the stage.

    Shingle identity is a polynomial rolling hash over PER-TOKEN
    hashes (h60 % p), not md5 of the concatenated shingle string: one
    md5 per token instead of one per window, and zero window-string
    allocation — profiled 73 s → 46 s per corpus pass at 1M docs
    (BENCH notes r7). The only md5 pass is the single `th` transform
    (Catalyst's CollapseProject keeps a non-cheap alias referenced m
    times un-inlined, verified via explain in
    tests/test_dedup.py::test_minhash_signatures_plan_has_no_exchange).

    min over the NON-distinct shingle multiset equals min over the
    distinct set, so no per-doc distinct is needed (values identical
    to the DuckDB oracle, which mirrors the same fold)."""
    toks = docs.select(F.col(doc_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("t"))
    toks = toks.filter(F.size("t") > 0)
    th = toks.select(
        "doc_id",
        F.transform(F.col("t"),
                    lambda x: h60(x) % F.lit(MERSENNE31)).alias("th"))
    hashed = th.select("doc_id", _window_hash(F.col("th"), k).alias("hs"))
    def _perm(i: int):
        # a dedicated unary-lambda factory: `lambda h, i=i: ...` would
        # be a BINARY lambda to PySpark's transform, which then feeds
        # the array index into i instead of the Python constant
        a, b = 2 * i + 1, 1000003 * i
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)

    mins = [F.array_min(F.transform(F.col("hs"), _perm(i))).alias(f"mh_{i}")
            for i in range(m)]
    return hashed.select("doc_id", F.array(*mins).alias("sig"))


def minhash_signatures(docs: DataFrame, m: int = 16, k: int = 3,
                       doc_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, mh_0..mh_{m-1}): MinHash over k-shingles with the
    permutation family  h_i(x) = (a_i·x + b_i) mod (2³¹−1) over the
    rolling window hash x (see _minhash_sig_df),
    a_i = 2i+1, b_i = 1000003·i  — products stay < 2⁴² (ANSI-safe).
    Zero-shuffle (see _minhash_sig_df)."""
    sig = _minhash_sig_df(docs, m, k, doc_col, text_col)
    return sig.select(
        "doc_id", *[F.element_at("sig", i + 1).alias(f"mh_{i}")
                    for i in range(m)])


def minhash_lsh_pairs(docs: DataFrame, m: int = 16, bands: int = 4,
                      k: int = 3, threshold: float = 0.5,
                      doc_col: str = "doc_id", text_col: str = "text",
                      max_bucket: int | None = None) -> DataFrame:
    """(doc1, doc2, est_sim): candidate near-dup pairs from LSH banding.

    m hashes folded into `bands` bands of m/bands rows; docs sharing any
    full band collide. est_sim = fraction of matching minhash components
    (unbiased Jaccard estimate); pairs kept at est_sim ≥ threshold.
    max_bucket drops band buckets with more members (boilerplate
    corpora put thousands of docs in one bucket → O(b²) candidates);
    drops are logged, never silent.
    """
    assert m % bands == 0
    r = m // bands
    # localCheckpoint (eager) materializes the signature projection
    # EXACTLY ONCE: the bucket-size logging pass and the main join run
    # as separate Spark jobs, and exchange reuse does not span jobs —
    # without this the tokenize+md5+fold pass ran once per job
    # (measured: the whole stage 2× the single-pass cost at 1M docs).
    # ~140 B/doc (doc_id + m longs); blocks are GC-managed with the
    # returned plan. TRADE-OFFS, stated plainly (ADVICE r7): (a) this
    # is EAGER — constructing the pairs PLAN runs the signature job
    # immediately; (b) lineage is truncated, so losing a cached block
    # mid-join aborts the job instead of recomputing (acceptable for a
    # single-app batch stage; persist()+count() would keep recompute at
    # the cost of the same memory). At true 10^12-doc scale neither
    # applies: the signature table becomes a persisted build artifact
    # (like build_ivf's centroids) and new shards join against it.
    sig = _minhash_sig_df(docs, m, k, doc_col, text_col).localCheckpoint()

    # carry the signature as ONE array column through the band explode
    # and the self-join (not m scalar columns — 1 struct vs 16 in every
    # exchange row), and compute est_sim with a zip_with fold instead
    # of m projected eq_i columns
    band_rows = sig.select(
        "doc_id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.concat_ws("_", *[F.element_at("sig", bi * r + j + 1)
                                        for j in range(r)]).alias("key"))
            for bi in range(bands)
        ])).alias("bk"))
    band_rows = band_rows.select("doc_id", "sig",
                                 F.col("bk.band").alias("band"),
                                 F.col("bk.key").alias("key"))
    if max_bucket is not None:
        band_rows = _drop_big_buckets(band_rows, ["band", "key"],
                                      max_bucket, "LSH band")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    matches = F.aggregate(
        F.zip_with(F.col("a.sig"), F.col("b.sig"),
                   lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, x: acc + x)
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"),
                    matches.alias("n_eq"))
            .distinct())
    est = cand.select(
        "doc1", "doc2",
        (F.col("n_eq") / F.lit(float(m))).alias("est_sim"))
    return est.filter(F.col("est_sim") >= threshold)


def simhash(docs: DataFrame, bits: int = 60, doc_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): tf-weighted SimHash over token h60 hashes.
    60 bits keeps the value positive in a signed BIGINT on both engines."""
    toks = docs.select(F.col(doc_col).alias("doc_id"),
                       F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("w"))
    tf = tf.withColumn("h", h60(F.col("term")))
    bit_sums = tf.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                     F.col("w")).otherwise(-F.col("w"))).alias(f"s_{i}")
        for i in range(bits)
    ])
    sim = bit_sums.select(
        "doc_id",
        sum((F.when(F.col(f"s_{i}") > 0, F.lit(1)).otherwise(F.lit(0))
             * F.lit(1 << i)).cast("long") for i in range(bits))
        .alias("simhash"))
    return sim


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, bits: int = 60,
                  doc_col: str = "doc_id", text_col: str = "text",
                  chunks: int = 4,
                  max_bucket: int | None = None) -> DataFrame:
    """(doc1, doc2, hamming): pairs within hamming distance.

    Exact banding: split the signature into `chunks` equal bit ranges —
    any pair with hamming ≤ chunks−1 shares at least one identical chunk
    (pigeonhole), so candidates come from chunk-equality joins, never
    all-pairs. Verified with bit_count(xor). max_bucket drops oversized
    chunk buckets (boilerplate skew; logged) — exactness then holds for
    pairs outside the dropped buckets."""
    assert bits % chunks == 0
    w = bits // chunks
    sig = simhash(docs, bits, doc_col, text_col)
    parts = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(ci).alias("chunk"),
                     F.shiftright(F.col("simhash"), ci * w)
                     .bitwiseAND(F.lit((1 << w) - 1)).alias("key"))
            for ci in range(chunks)
        ])).alias("ck"))
    parts = parts.select("doc_id", "simhash",
                         F.col("ck.chunk").alias("chunk"),
                         F.col("ck.key").alias("key"))
    if max_bucket is not None:
        parts = _drop_big_buckets(parts, ["chunk", "key"],
                                  max_bucket, "simhash chunk")
    a, b = parts.alias("a"), parts.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"),
                    F.col("a.simhash").alias("s1"),
                    F.col("b.simhash").alias("s2"))
            .distinct())
    out = cand.select(
        "doc1", "doc2",
        F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hamming"))
    return out.filter(F.col("hamming") <= max_hamming)


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """(id1, id2, cos): near-duplicate vectors by cosine ≥ threshold.

    Sandbox-size all-pairs via a self-join; the 100 TB path blocks pairs
    through IVF buckets first (similarity.ivf_neardup_pairs) so only
    same-cluster pairs are compared.
    """
    a = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    pairs = a.join(b, F.col("id1") < F.col("id2"))
    dot = F.aggregate(F.zip_with("v1", "v2", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    n1 = F.sqrt(F.aggregate(F.transform("v1", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(F.transform("v2", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    out = pairs.select("id1", "id2", (dot / (n1 * n2)).alias("cos"))
    return out.filter(F.col("cos") >= threshold)
