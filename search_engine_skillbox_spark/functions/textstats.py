"""Text-analysis column functions for training-data pipelines: language
ID, quality scoring, token counting, document fingerprinting.

All pure built-in column expressions (codegen'd, zero Python) and all
reproducible in ANSI SQL for the DuckDB oracle. Deterministic by
construction — no models, no randomness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import h32
from .textprep import tokens

# frequent-word cues per language (tiny, deterministic heuristic)
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it"]
RU_STOPWORDS = ["и", "в", "на", "не", "что", "с", "по", "это"]


def char_class_ratio(col: Column, pattern: str) -> Column:
    """Fraction of characters matching the regex char class."""
    c = F.col(col) if isinstance(col, str) else col
    kept = F.length(F.regexp_replace(c, pattern, ""))
    return F.when(F.length(c) > 0,
                  (F.length(c) - kept) / F.length(c)).otherwise(F.lit(0.0))


def lang_id(text_col: Column | str) -> Column:
    """Heuristic language ID: script ratio first (Cyrillic → ru), then
    stopword-token hits (en), else 'unknown'. Returns string."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    cyr = char_class_ratio(c, r"[Ѐ-ӿ]")
    en_hits = F.size(F.filter(
        tokens(c), lambda t: t.isin(*EN_STOPWORDS)))
    return (F.when(cyr > 0.3, F.lit("ru"))
            .when(en_hits >= 2, F.lit("en"))
            .when(cyr > 0.05, F.lit("mixed"))
            .otherwise(F.lit("unknown")))


def token_count_ws(text_col: Column | str) -> Column:
    """Whitespace token count (the cheap length signal)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))).cast("long")


def token_count_bpe_ish(text_col: Column | str) -> Column:
    """BPE-ish token estimate: count of letter-runs, digit-runs, and
    single non-space punctuation marks — the standard pre-tokenizer
    granularity (≈ GPT-style pre-tok splits)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    pieces = F.regexp_replace(c, r"(\p{L}+|\p{Nd}+|[^\p{L}\p{Nd}\s])", "")
    kept = F.length(F.regexp_replace(pieces, "", ""))
    return (F.length(pieces) - kept).cast("long")


def quality_score(text_col: Column | str) -> Column:
    """[0,1] quality heuristic: length band + alpha ratio + mean word len
    band — the usual cheap pre-filters of web-corpus pipelines
    (e.g. C4/Gopher rules), deterministic and SQL-expressible.

        0.4·min(1, n_ws_tokens/100)
      + 0.4·alpha_ratio
      + 0.2·(3 ≤ mean_word_len ≤ 12)
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = token_count_ws(c)
    alpha = char_class_ratio(c, r"[\p{L}]")
    mean_wl = F.when(n > 0, F.length(F.regexp_replace(c, r"\s+", "")) / n) \
        .otherwise(F.lit(0.0))
    len_band = F.least(F.lit(1.0), n / F.lit(100.0))
    wl_band = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(1.0)) \
        .otherwise(F.lit(0.0))
    return F.round(F.lit(0.4) * len_band + F.lit(0.4) * alpha
                   + F.lit(0.2) * wl_band, 6)


def doc_fingerprint(text_col: Column | str) -> Column:
    """Order-sensitive 63-bit fingerprint: Σ (pos+1)·h32(token) over the
    engine tokenizer's stream (no mod needed: 2³²·len²·… stays < 2⁶³ for
    docs ≤ ~10⁶ tokens; web pages are far below). Equal texts ⇒ equal
    fingerprints; reordered tokens ⇒ different (unlike a bag hash)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    fp = F.aggregate(
        F.zip_with(tokens(c),
                   F.sequence(F.lit(1), F.greatest(F.size(tokens(c)), F.lit(1))),
                   lambda t, i: h32(t) * i.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(F.size(tokens(c)) == 0, F.lit(0).cast("long")).otherwise(fp)


# Gopher quality-rule thresholds (Rae et al. 2021 §A1.1, as reproduced
# by the FineWeb/Dolma open pipelines) — the standard web-corpus
# document filter. All pure column expressions, ANSI-SQL-mirrorable.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality(text_col: Column | str) -> list[Column]:
    """The Gopher document-quality signals + the composite pass flag,
    as named columns: n_words (whitespace tokens), mean_word_len,
    symbol_ratio ('#'/'…'/'...' per word), alpha_word_frac (words
    containing ≥1 letter), stopword_hits (distinct matches from the
    en+ru cue lists), gopher_pass (the conjunction of the published
    thresholds). One projection, zero Python."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.trim(c), r"\s+")
    words = F.when(F.length(F.trim(c)) == 0,
                   F.array().cast("array<string>")).otherwise(words)
    n = F.size(words).cast("long")
    mean_wl = F.when(
        n > 0,
        F.aggregate(F.transform(words, F.length),
                    F.lit(0), lambda a, x: a + x).cast("double") / n
    ).otherwise(F.lit(0.0))
    n_sym = (F.size(F.split(c, "#", -1)) - 1
             + F.size(F.split(c, "…", -1)) - 1
             + F.size(F.split(c, r"\.\.\.", -1)) - 1).cast("long")
    sym_ratio = F.when(n > 0, n_sym.cast("double") / n).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
        .cast("double") / n
    ).otherwise(F.lit(0.0))
    toks = tokens(c)
    stop_hits = F.size(F.array_distinct(F.filter(
        toks, lambda t: t.isin(*(EN_STOPWORDS + RU_STOPWORDS))))) \
        .cast("long")
    gpass = ((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
             & (mean_wl >= GOPHER_MIN_MEAN_WL)
             & (mean_wl <= GOPHER_MAX_MEAN_WL)
             & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO)
             & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
             & (stop_hits >= GOPHER_MIN_STOPWORD_HITS))
    return [n.alias("n_words"),
            F.round(mean_wl, 6).alias("mean_word_len"),
            F.round(sym_ratio, 6).alias("symbol_ratio"),
            F.round(alpha_frac, 6).alias("alpha_word_frac"),
            stop_hits.alias("stopword_hits"),
            gpass.alias("gopher_pass")]
