"""Scorers: reference-compat TF-IDF and standard BM25 (SURVEY §2.5, §7.2.3).

Reference formula (compat mode), exactly:
    idf(t)   = ln((N + 1) / (df(t) + 1))          (SearchServiceImpl.java:133)
    score(p) = Σ_{t∈q ∧ t∈p} tf(p,t) · idf(t)     (OR semantics, :139-160)
    final score cast to float32 once per page      (:146)

Engine-default BM25 (k1=1.2, b=0.75):
    idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    tfnorm   = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score(p) = Σ idf(t) · tfnorm

Both are pure column expressions — whole-stage-codegen'd, no Python.
Compat mode is BM25's k1→∞, b=0 limit with the reference idf.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf_compat(df_col: Column, n_docs: int) -> Column:
    """ln((N+1)/(df+1)) — 0-df terms get ln(N+1), never negative/NaN."""
    return F.log((F.lit(float(n_docs + 1))) / (df_col + F.lit(1.0)))


def idf_bm25(df_col: Column, n_docs: int) -> Column:
    """ln(1 + (N−df+0.5)/(df+0.5)) — Lucene-style, always positive."""
    n = F.lit(float(n_docs))
    return F.log(F.lit(1.0) + (n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def idf_compat_py(df: int, n_docs: int) -> float:
    return math.log((n_docs + 1) / (df + 1))


def idf_bm25_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_weight_compat(tf_col: Column) -> Column:
    """Compat mode: raw tf (reference multiplies tf directly)."""
    return tf_col.cast("double")


def tf_weight_bm25(tf_col: Column, dl_col: Column, avgdl: float,
                   k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> Column:
    denom = tf_col + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col / F.lit(avgdl))
    return tf_col * F.lit(k1 + 1.0) / denom


def upper_bound_compat(max_tf: float, idf: float) -> float:
    """Block score upper bound for WAND pruning (compat): max_tf·idf."""
    return max_tf * idf


def upper_bound_bm25(max_tf: float, idf: float,
                     k1: float = K1_DEFAULT) -> float:
    """BM25 tfnorm is monotone in tf and ≤ (k1+1); with dl→minimal norm the
    bound max_tf·(k1+1)/(max_tf + k1·(1−b)) is safe for any dl ≥ 0 when we
    drop the dl term entirely (conservative)."""
    return idf * (max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - B_DEFAULT)))
