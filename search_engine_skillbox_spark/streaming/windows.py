"""Event-time windowed aggregation with watermarking — the Structured
Streaming late-data toolkit over the `events` table (event_id, ts,
user_id, event_type, value, props).

The reference has no event analytics at all (SURVEY §2.6: no window
functions, no streaming); this is an engine extension in the standard
Spark shape: one `F.window` tumbling-window aggregation expression
shared verbatim by the batch path (the DuckDB-oracle gate query) and
the streaming path (readStream + withWatermark), so stream ≡ batch is
a property of construction, pinned end-to-end in tests/test_streaming.

Scale shape: a windowed groupBy((window, event_type)) is ONE shuffle
whose key cardinality is (windows × types), not events; the watermark
bounds state to the open windows only — at 100 TB/day the state store
holds hours, not history.

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
    """The shared aggregation: tumbling WINDOW per event_type."""
    return (events
            .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"),
                 # exact distinct users per window — countDistinct is
                 # rejected on streaming aggregations, collect_set is
                 # not (state is bounded by the window's user set, and
                 # the watermark bounds the set of OPEN windows)
                 F.size(F.collect_set("user_id")).alias("n_users")))


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
                                output_mode: str = "complete",
                                watermark: str = WATERMARK):
    """Streaming form: file-source stream of event parquet →
    withWatermark(ts) → the SAME aggregation → in-memory sink,
    trigger availableNow (runs the backlog to completion and stops).

    output_mode:
      complete  re-emits every window each micro-batch — final table
                equals the batch answer over everything the watermark
                ADMITTED (the stream ≡ batch pin).
      append    emits a window once, when the watermark passes its
                end — the mode that demonstrates late-data DROP
                semantics (a row arriving > watermark behind the
                max event time never appears; test-pinned).

    Returns the terminated StreamingQuery; read results from the
    `query_name` in-memory table."""
    src = (spark.readStream.schema(EVENTS_SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(input_dir))
    agg = _present(_agg(src.withWatermark("ts", watermark)))
    q = (agg.writeStream.format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
