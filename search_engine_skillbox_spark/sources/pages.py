"""Pages-table source adapter (S2/S7 equivalents, SURVEY §1.3).

Input per BASELINE.json input_hint: a table (url, warc_ts, html:binary,
text, lang). This module derives the engine's document identity and
site columns:

  url_norm — S4 normalization (utils/UrlUtils.java:16-34)
  host     — replaces the reference's site_id FK; partition/pruning key
  doc_id   — xxhash64(url_norm): stable 64-bit identity, computed
             JVM-side (no Python), collision-safe at 10^12 docs within
             birthday bounds the engine tolerates (dedup by url_norm
             first makes ids unique per distinct page)
  text     — filled from html via the Arrow UDF where null
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textprep import with_text
from ..functions.urlutils import normalize_url, url_host, url_path


def prepare_pages(raw: DataFrame, assume_unique: bool = False) -> DataFrame:
    """raw(url, warc_ts, html, text, lang) → + url_norm, host, path, doc_id.

    Upsert semantics of the reference's page sink (S7, unique (site,path),
    utils/PageIndexingUtils.java:73-111): if the same normalized url
    appears more than once, the latest warc_ts row wins — expressed as a
    max_by aggregation (one shuffle on url_norm), not a window sort.

    assume_unique=True skips that shuffle — the bulk-load fast path for
    inputs already unique by normalized url (an Iceberg snapshot table).
    The shuffle moves full html+text payloads, so skipping it when the
    precondition holds removes the widest exchange of the whole build.
    """
    p = raw.withColumn("url_norm", normalize_url(F.col("url")))
    if not assume_unique:
        # null warc_ts must not null out max_by — treat missing ts as epoch
        ts = F.coalesce(F.col("warc_ts"),
                        F.lit("1970-01-01 00:00:00").cast("timestamp"))
        p = (p.groupBy("url_norm")
             .agg(F.max_by(F.struct("url", "warc_ts", "html", "text", "lang"),
                           ts).alias("r"))
             .select("url_norm", "r.*"))
    p = with_text(p)
    return (p
            .withColumn("host", url_host(F.col("url_norm")))
            .withColumn("path", url_path(F.col("url_norm")))
            .withColumn("doc_id", F.xxhash64(F.col("url_norm"))))
