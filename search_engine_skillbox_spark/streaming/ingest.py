"""Structured Streaming ingest: continuous page arrival → incremental
index maintenance.

The reference is batch-only (bounded BFS crawl,
service/IndexingServiceImpl.java:297; SURVEY §1.3 "no streaming
component"), so this is an engine extension: a file-source stream of
Common-Crawl-style page parquet (same schema as the batch input) feeds
`foreachBatch(reindex_batch)` — each micro-batch appends generational
posting blocks, tombstones superseded docs, and maintains the
dictionaries exactly (operators/incremental.py).

foreachBatch (not a stateful sink) is the right shape here: the work is
a deterministic batch MERGE against an external store, and the
checkpointed batch-id gives end-to-end exactly-once on retries provided
the ingest is idempotent per batch — which generational appends make
true up to re-running the SAME batch (same gen reappends; tombstones
make the duplicate harmless only after the next gen — documented
limitation vs an Iceberg transactional sink).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.incremental import reindex_batch
from ..operators.index_store import IndexStore

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_pages(spark: SparkSession, store: IndexStore, input_dir: str,
                 checkpoint_dir: str, available_now: bool = True):
    """Start (and with available_now=True, run to completion) a stream
    that folds every page file in input_dir into the index."""
    src = (spark.readStream.schema(PAGES_SCHEMA)
           .option("maxFilesPerTrigger", 4)
           .parquet(input_dir))

    stats: list[dict] = []

    def _fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats.append(reindex_batch(spark, store, batch_df))

    q = (src.writeStream.foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=available_now)
         .start())
    if available_now:
        q.awaitTermination()
        return stats
    return q
