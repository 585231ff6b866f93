"""Training-data pipeline operators a 100 TB corpus build needs beyond
dedup/similarity: benchmark decontamination, deterministic sampling,
and PII redaction.

All three are pure DataFrame work (no Python in the hot path), exactly
reproducible in ANSI SQL for the DuckDB oracle, and written in their
scale-safe formulation:

  * decontaminate — benchmark n-gram overlap via a BROADCAST semi-join:
    benchmark suites are tiny next to the corpus (10^4-10^6 n-grams),
    so the corpus side never shuffles its text — one map-side join on
    the exploded n-grams plus a single per-doc aggregation.
  * sample_by_hash — reproducible Bernoulli sampling keyed on a stable
    column hash (NOT rand(): re-runs, retries, and multi-stage
    pipelines must agree on the kept set). Per-stratum rates rebalance
    skewed corpora (e.g. upsample a rare language) with zero shuffles —
    the predicate pushes into the scan.
  * pii_redact — regex scrub of emails/phone numbers with per-doc match
    counts; one projection, codegen'd end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

# contamination n-gram length: long enough that natural reuse is rare,
# short enough to catch paraphrase-free inclusion (industry-standard
# 8-13 token windows; e.g. GPT-3 used 13-gram, Llama 2 reports
# 8-token-window skip-gram checks)
DECONTAM_NGRAM = 8


def decontaminate(docs: DataFrame, bench: DataFrame,
                  n: int = DECONTAM_NGRAM,
                  doc_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, n_hits, n_ngrams, contamination) for every corpus doc
    sharing at least one n-token n-gram with the benchmark set.

    bench: (any id col, text) — held-out eval prompts/answers. The
    benchmark's distinct n-grams are BROADCAST (suites are tiny vs the
    corpus), so the plan is: corpus explode → map-side broadcast LEFT
    join → one groupBy(doc_id) computing hits and sizes together →
    filter(n_hits > 0). The corpus text never shuffles. Every doc's
    n-grams DO flow through the aggregation (zero-overlap docs are
    filtered after it, not before) — that is deliberate: map-side
    partial aggregation makes the pass cheap, and the alternative
    (inner join for hits + a second aggregation for sizes over
    semi-joined docs only) measured 7 exchanges vs 3. If a benchmark
    set ever grows past broadcast size, switch to that inner-join +
    semi-joined-sizes plan and shuffle the n-grams.
    contamination = fraction of the doc's distinct n-grams that appear
    in the benchmark (1.0 ⟺ the doc is a sub/superset of bench text at
    n-gram granularity)."""
    bench_ngrams = (shingles(bench, n, bench.columns[0], text_col)
                    .select("shingle").distinct()
                    .withColumn("_hit", F.lit(1)))
    doc_ngrams = shingles(docs, n, doc_col, text_col)
    # LEFT broadcast join + ONE groupBy computes both counts in a
    # single aggregation pass (a separate sizes/hits pair costs two
    # aggregations plus a doc_id join — 7 exchanges vs 3 measured)
    flagged = doc_ngrams.join(F.broadcast(bench_ngrams), "shingle",
                              "left")
    return (flagged.groupBy("doc_id")
            .agg(F.count("_hit").alias("n_hits"),
                 F.count(F.lit(1)).alias("n_ngrams"))
            .filter(F.col("n_hits") > 0)
            .select("doc_id", "n_hits", "n_ngrams",
                    (F.col("n_hits") / F.col("n_ngrams"))
                    .alias("contamination")))


# the uniform-hash domain for sampling decisions: 15 hex digits of md5
# (60 bits — safely inside BIGINT for the ANSI-strict engines on both
# sides of the oracle). md5, not xxhash64: DuckDB reproduces it
# verbatim, and sampling only needs uniformity + determinism.
_SAMPLE_DOMAIN = 1 << 60


def _uniform_hash(key_col: str) -> F.Column:
    return F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                              1, 15), 16, 10).cast("long")


def sample_by_hash(docs: DataFrame, rate: float,
                   key_col: str = "doc_id",
                   strata: dict[str, float] | None = None,
                   strata_col: str = "lang") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key-hash falls
    under rate·2^60. Reproducible across runs/retries/engines (the
    decision is a pure function of the key), unlike df.sample(), whose
    kept set depends on partitioning and seed plumbing.

    strata: optional {stratum_value: rate} overriding `rate` per value
    of strata_col — the standard rebalancing move (downsample the
    dominant language, keep 100% of a rare one). The filter is a
    column predicate: no shuffle, pushes into the scan.

    Thresholds are computed as exact INTEGERS driver-side (int(rate ·
    2^60)) so the kept set is bit-identical across engines — float
    column arithmetic rounds differently between Spark's truncating
    cast and DuckDB's rounding cast."""
    def _thresh(r: float) -> int:
        return min(_SAMPLE_DOMAIN, max(0, int(float(r) * _SAMPLE_DOMAIN)))
    h = _uniform_hash(key_col)
    if strata:
        t = F.lit(_thresh(rate))
        for val, sr in sorted(strata.items()):
            t = F.when(F.col(strata_col) == val,
                       F.lit(_thresh(sr))).otherwise(t)
    else:
        t = F.lit(_thresh(rate))
    return docs.filter(h < t)


# PII patterns shared verbatim by the Spark (Java regex) and DuckDB
# (RE2) engines — stick to the common subset: no backrefs, no
# lookaround (RE2 has neither, so "at least N digits" can't be a
# lookahead). Phone = three anchored shapes, each chosen so common
# non-PII numerics CANNOT match:
#   1. +-prefixed international runs (+1 555 0102, +7 (495) 123-45-67)
#   2. US-style parenthesized area code ((555) 010-1234)
#   3. bare 3-3-4 separated groups (555-010-1234)
# ISO dates (4-2-2), European dotted dates (2-2-4), prices, IPs
# (3-3-3-3 needs a 4th group; 192.168.1.1 has 1-digit groups), version
# strings, and plain order-id digit runs match none of the shapes.
# Residual false positives, disclosed: any 3-3-4 separated digit
# triple (some serial-number formats). Residual false negatives,
# disclosed: unseparated 10-digit locals ('5550101234') and
# international numbers missing their '+' — redacting bare digit runs
# was the round-5 over-redaction bug (ISO dates became [PHONE] and
# corrupted training text), and precision wins here.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = (r"\+\d[\d().\- ]{6,16}\d"
            r"|\(\d{3}\)[ .\-]?\d{3}[ .\-]\d{4}"
            r"|\d{3}[ .\-]\d{3}[ .\-]\d{4}")


def sessionize(events: DataFrame, gap_minutes: int = 240,
               user_col: str = "user_id",
               ts_col: str = "ts") -> DataFrame:
    """(user_id, session_idx, n_events, total_value, session_start,
    session_end): split each user's event stream into sessions at
    inactivity gaps > gap_minutes — the classic log-pipeline shape.

    Window functions end to end: lag(ts) over (user order by ts) marks
    session starts, a running sum numbers them, one aggregation rolls
    them up. ONE shuffle on user_id which every window and the final
    groupBy reuse (same key — Catalyst plans a single Exchange).
    Timestamps come back formatted so cross-engine value hashes are
    timezone-plumbing-proof.

    Skew caveat (inherent to per-user windowing, disclosed not hidden):
    one user's whole history lands in one task. A bot account with
    10^9 events needs a pre-filter (cap events per user, or route
    heavy hitters to the applyInPandasWithState streaming path, which
    holds only the open session in state)."""
    from pyspark.sql import Window
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    # parquet TIMESTAMP_NTZ refuses a direct →long cast under ANSI;
    # hop through TIMESTAMP (session tz) first — epoch arithmetic only
    # DIFFERENCES epochs, so the tz offset cancels
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    new_sess = F.when(epoch - F.lag(epoch).over(w) > gap, 1).otherwise(0)
    marked = events.withColumn("_new", new_sess).withColumn(
        "session_idx",
        (F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)) + 1)
        .cast("long"))
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (marked.groupBy(F.col(user_col).alias("user_id"),
                           "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"),
                 F.date_format(F.min(ts_col), fmt).alias("session_start"),
                 F.date_format(F.max(ts_col), fmt).alias("session_end")))


def pii_redact(docs: DataFrame, doc_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_phones): emails → [EMAIL],
    phone-like digit runs → [PHONE], with per-doc match counts for
    scrub-rate monitoring. Pure column expressions (regexp_count +
    regexp_replace), codegen'd — the 100 TB shape is a projection, no
    shuffle, no Python. Emails are counted and replaced BEFORE phones
    so a digit-bearing local-part is not double-counted."""
    c = F.col(text_col)
    n_emails = F.regexp_count(c, F.lit(EMAIL_RE))
    no_email = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    n_phones = F.regexp_count(no_email, F.lit(PHONE_RE))
    clean = F.regexp_replace(no_email, PHONE_RE, "[PHONE]")
    return docs.select(
        F.col(doc_col).alias("doc_id"),
        clean.alias("clean_text"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"))
