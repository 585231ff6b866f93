"""Driver contract for the spark-graft builder (PySpark target).

Engine: search_engine_skillbox_spark — PySpark-native inverted index +
BM25/TF-IDF search (see SURVEY.md). Each queries() entry is an operator
from SURVEY.md §2 (or a training-data-pipeline extension) run over the
driver-generated testdata tables; oracle_sql() carries the DuckDB-
equivalent ANSI SQL. Column names/types are aligned on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_skillbox_spark.functions.textprep import tokens
from search_engine_skillbox_spark.functions import urlutils as U
from search_engine_skillbox_spark.operators import build as B
from search_engine_skillbox_spark.operators import query as Q

# Fixed reference query for the search operators (terms from the testdata
# vocabulary; mixed frequencies).
QUERY_TERMS = ["spark", "join", "merge"]
TOPK = 10
K1, B_ = 1.2, 0.75


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------

def q_postings_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/S8: the relational inverted index (doc_id, term, tf)."""
    return B.postings_flat(_docs(spark, sf_dir))


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: per-term document frequency + collection frequency."""
    return B.term_stats(B.postings_flat(_docs(spark, sf_dir)))


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.doc_lengths(_docs(spark, sf_dir)).select(
        "doc_id", F.col("dl").cast("bigint").alias("dl"))


def q_corpus_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: N counts index-participating docs only."""
    p = B.postings_flat(_docs(spark, sf_dir))
    return p.agg(F.countDistinct("doc_id").alias("n_docs"))


def q_search_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+Q2+Q3: reference-compat scoring score=Σ tf·ln((N+1)/(df+1)),
    OR semantics, top-k by (score desc, doc_id asc). Score rounded to 4
    decimals BEFORE ordering so Spark/DuckDB agree on boundary ties."""
    docs = _docs(spark, sf_dir)
    p, t, _ = B.build_index_frames(docs)
    p = p.persist()
    n = B.corpus_size(p)
    scores = Q.candidate_scores(p, t, n, QUERY_TERMS, "compat")
    out = (scores.select("doc_id", F.round("score", 4).alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id")).limit(TOPK))
    return out


def q_search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-default BM25(k1=1.2, b=0.75), Lucene idf, same top-k rules."""
    docs = _docs(spark, sf_dir)
    p, t, dls = B.build_index_frames(docs)
    p = p.persist()
    n = B.corpus_size(p)
    part = dls.filter(F.col("dl") > 0)
    avgdl = part.agg(F.avg("dl")).first()[0]
    scores = Q.candidate_scores(p, t, n, QUERY_TERMS, "bm25",
                                doclens=part, avgdl=float(avgdl))
    return (scores.select("doc_id", F.round("score", 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(TOPK))


def q_search_tfidf_site(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: site-filtered search — df and N recomputed WITHIN the site,
    exactly like the reference's site-variant JPQL
    (IndexRepository.java:41-50)."""
    docs = _docs(spark, sf_dir).filter(F.col("source") == "src3")
    p, t, _ = B.build_index_frames(docs)
    p = p.persist()
    n = B.corpus_size(p)
    scores = Q.candidate_scores(p, t, n, QUERY_TERMS, "compat")
    return (scores.select("doc_id", F.round("score", 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(TOPK))


_QTERMS_SQL = "('" + "'), ('".join(QUERY_TERMS) + "')"

_SQL_TFIDF_SITE = f"""WITH
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^\\p{{L}}]+')) AS term
  FROM documents WHERE source = 'src3'
),
tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
postings AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM postings),
qdf AS (
  SELECT term, count(*) AS df FROM postings
  WHERE term IN (SELECT q FROM (VALUES {_QTERMS_SQL}) v(q)) GROUP BY term
),
scores AS (
  SELECT p.doc_id,
         sum(p.tf * ln((n.n_docs + 1.0) / (d.df + 1.0))) AS raw
  FROM postings p JOIN qdf d USING (term) CROSS JOIN n
  GROUP BY p.doc_id
)
SELECT doc_id, round(raw, 4) AS score
FROM scores
ORDER BY round(raw, 4) DESC, doc_id ASC
LIMIT {TOPK}"""


def q_site_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: dashboard statistics — pages + distinct terms per site(source)."""
    docs = _docs(spark, sf_dir)
    pages = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_pages"))
    terms = (docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
             .groupBy("source").agg(F.countDistinct("term").alias("n_terms")))
    return (pages.join(terms, "source", "left")
            .select("source", "n_pages",
                    F.coalesce(F.col("n_terms"), F.lit(0)).alias("n_terms")))


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4–S6: URL normalization / host / path / site-name column functions
    over deterministically synthesized messy URLs."""
    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".test/doc"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(
            F.concat(F.lit("/"), F.col("doc_id").cast("string"))),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    d = docs.select("doc_id", url.alias("url"))
    return d.select(
        "doc_id",
        U.normalize_url(F.col("url")).alias("url_norm"),
        U.url_host(F.col("url")).alias("host"),
        U.url_path(F.col("url")).alias("path"),
        U.site_name(F.col("url")).alias("site"),
    )


# --------------------------------------------------------------------------
# Oracle SQL (DuckDB dialect-compatible ANSI)
# --------------------------------------------------------------------------

_TOKS = """
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^\\p{L}]+')) AS term
  FROM documents
),
tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
postings AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
)
"""


_SQL_POSTINGS = f"WITH {_TOKS} SELECT doc_id, term, tf FROM postings"

_SQL_TERM_STATS = f"""WITH {_TOKS}
SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM postings GROUP BY term"""

_SQL_DOC_LENGTHS = f"""WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id)
SELECT d.doc_id, coalesce(l.dl, 0) AS dl
FROM documents d LEFT JOIN dl l USING (doc_id)"""

_SQL_CORPUS_SIZE = f"WITH {_TOKS} SELECT count(DISTINCT doc_id) AS n_docs FROM postings"

_SQL_TFIDF = f"""WITH {_TOKS},
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM postings),
qdf AS (
  SELECT term, count(*) AS df FROM postings
  WHERE term IN (SELECT q FROM (VALUES {_QTERMS_SQL}) v(q)) GROUP BY term
),
scores AS (
  SELECT p.doc_id,
         sum(p.tf * ln((n.n_docs + 1.0) / (d.df + 1.0))) AS raw
  FROM postings p JOIN qdf d USING (term) CROSS JOIN n
  GROUP BY p.doc_id
)
SELECT doc_id, round(raw, 4) AS score
FROM scores
ORDER BY round(raw, 4) DESC, doc_id ASC
LIMIT {TOPK}"""

_SQL_BM25 = f"""WITH {_TOKS},
dls AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
n AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dls),
qdf AS (
  SELECT term, count(*) AS df FROM postings
  WHERE term IN (SELECT q FROM (VALUES {_QTERMS_SQL}) v(q)) GROUP BY term
),
scores AS (
  SELECT p.doc_id,
         sum(ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5))
             * p.tf * ({K1} + 1.0)
             / (p.tf + {K1} * (1.0 - {B_} + {B_} * l.dl / n.avgdl))) AS raw
  FROM postings p
  JOIN qdf d USING (term)
  JOIN dls l USING (doc_id)
  CROSS JOIN n
  GROUP BY p.doc_id
)
SELECT doc_id, round(raw, 4) AS score
FROM scores
ORDER BY round(raw, 4) DESC, doc_id ASC
LIMIT {TOPK}"""

_SQL_SITE_STATS = f"""WITH {_TOKS},
pages AS (SELECT source, count(*) AS n_pages FROM documents GROUP BY source),
terms AS (
  SELECT d.source, count(DISTINCT t.term) AS n_terms
  FROM tok t JOIN documents d USING (doc_id) GROUP BY d.source
)
SELECT p.source, p.n_pages, coalesce(t.n_terms, 0) AS n_terms
FROM pages p LEFT JOIN terms t USING (source)"""

_SQL_URL_NORM = """
WITH urls AS (
  SELECT doc_id,
         'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
         || source || '.test/doc'
         || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '/' || CAST(doc_id AS VARCHAR) END
         || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents
),
hosts AS (
  SELECT doc_id, url,
         regexp_replace(regexp_extract(url, '^https?://([^/#?]+)', 1), '^www\\.', '') AS host,
         CASE WHEN length(regexp_replace(regexp_replace(url, '^https?://[^/#?]+', ''), '#.*$', '')) = 0
              THEN '/'
              ELSE regexp_replace(regexp_replace(url, '^https?://[^/#?]+', ''), '#.*$', '')
         END AS path
  FROM urls
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(url, '#.*$', ''), '^(https?://)www\\.', '\\1'), '/$', '') AS url_norm,
       host,
       path,
       upper(substr(split_part(host, '.', 1), 1, 1)) || substr(split_part(host, '.', 1), 2) AS site
FROM hosts
"""


# --------------------------------------------------------------------------
# Contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full index build + reference-compat scored search over the
    sf0.001 documents corpus."""
    return q_search_tfidf_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from search_engine_skillbox_spark.entry_queries import QUERIES
    return {
        "postings_flat": q_postings_flat,
        "term_stats": q_term_stats,
        "doc_lengths": q_doc_lengths,
        "corpus_size": q_corpus_size,
        "search_tfidf_topk": q_search_tfidf_topk,
        "search_tfidf_site": q_search_tfidf_site,
        "search_bm25_topk": q_search_bm25_topk,
        "site_statistics": q_site_statistics,
        "url_normalize": q_url_normalize,
        **QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    from search_engine_skillbox_spark.entry_queries import ORACLES
    return {
        "postings_flat": _SQL_POSTINGS,
        "term_stats": _SQL_TERM_STATS,
        "doc_lengths": _SQL_DOC_LENGTHS,
        "corpus_size": _SQL_CORPUS_SIZE,
        "search_tfidf_topk": _SQL_TFIDF,
        "search_tfidf_site": _SQL_TFIDF_SITE,
        "search_bm25_topk": _SQL_BM25,
        "site_statistics": _SQL_SITE_STATS,
        "url_normalize": _SQL_URL_NORM,
        **ORACLES,
    }
