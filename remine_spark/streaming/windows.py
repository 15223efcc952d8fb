"""Watermarked event-time windows over an event stream.

The reference has no streaming operators; this supplies the standard
late-data-tolerant windowed aggregation a web-scale ingest pipeline pairs
with the batch KG build (e.g. crawl-rate monitoring per source).

Semantics: tumbling event-time windows with a watermark — events later than
the watermark horizon are dropped, finalized windows are emitted exactly
once in append mode. The shuffle key is (window, group) — time-bucketed and
uniform; state size is bounded by (horizon / window) × |groups|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(events: DataFrame,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          ts_col: str = "ts",
                          group_col: str = "event_type") -> DataFrame:
    """Per-(window, group) counts + value sum with late-data watermark.
    Works identically on a batch DataFrame (watermark is a no-op there) —
    one definition serves both paths, which the tests exploit."""
    # event-time must be session-tz TIMESTAMP (watermarks reject NTZ);
    # parquet sources often carry TIMESTAMP_NTZ — normalize here (UTC session)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            F.unix_timestamp(F.col("win.end")).alias("win_end"),
            group_col, "n_events", "sum_value",
        )
    )
