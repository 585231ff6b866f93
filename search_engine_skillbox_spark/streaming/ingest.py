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
the ingest is idempotent per batch. That idempotence is real: each
micro-batch carries idem_key = (stream checkpoint id, batch_id) into
reindex_batch, which commits the batch id in the same meta write as the
generation bump — a replayed committed batch is an exact no-op, and a
replay of a PARTIALLY applied batch skips lineage-DONE steps (no
double block appends / dictionary deltas; residual meta drift is
check_consistency/compact territory — see reindex_batch docstring).
"""

from __future__ import annotations

import os

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
    # stream identity = the FULL normalized checkpoint path: two streams
    # whose checkpoint dirs merely share a basename (".../jobA/checkpoint"
    # vs ".../jobB/checkpoint") must not collide in meta stream_progress —
    # a collision misclassifies the second stream's batches as committed
    # replays and silently drops them.
    stream_id = os.path.abspath(os.path.normpath(checkpoint_dir))

    def _fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats.append(reindex_batch(spark, store, batch_df,
                                   idem_key=(stream_id, int(batch_id))))

    q = (src.writeStream.foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=available_now)
         .start())
    if available_now:
        q.awaitTermination()
        return stats
    return q
