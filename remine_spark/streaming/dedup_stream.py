"""Streaming deduplication: exact-dup suppression on an incremental page
stream (the online complement of the batch dedup stack in
operators/dedup.py).

Design:
- The dedup key is a content fingerprint (md5 of the extracted text) —
  computed scan-side, so the stream stays Arrow/codegen end to end.
- ``dropDuplicates`` on the fingerprint keeps first-arrival wins across
  micro-batches AND relaunches: the seen-key set lives in the streaming
  state store, so a page whose text already flowed through any earlier
  batch is suppressed, exactly the semantics a crawl-ingest pipeline needs.
- Two state policies:
  * unbounded (default): state grows with distinct documents — right for
    bounded backfills and tests;
  * watermarked (``within=``): ``dropDuplicatesWithinWatermark`` on
    ``warc_ts`` bounds state to the watermark horizon — right for a
    perpetual crawl where re-crawls of the same url arrive within days,
    and the batch MinHash/cluster-resolution pass owns long-range dedup.

At 100 TB: state is hash-partitioned by fingerprint across executors
(uniform — md5), RocksDB state store keeps per-executor memory bounded;
the fingerprint is 16 bytes/doc, so even 10^12 docs is ~16 TB of state —
which is exactly why the watermarked mode + periodic batch re-dedup is the
production layout, mirroring every large crawl pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from remine_spark.streaming.ingest import stream_pages


def fingerprinted(pages: DataFrame) -> DataFrame:
    """pages + content fingerprint (md5 of text; scan-side expression)."""
    return pages.withColumn("fp", F.md5(F.coalesce("text", F.lit(""))))


def dedup_pages(pages: DataFrame, within: str | None = None) -> DataFrame:
    """First-arrival-wins exact dedup on the content fingerprint.

    ``within`` (e.g. ``"2 days"``) switches to watermark-bounded state via
    dropDuplicatesWithinWatermark on warc_ts."""
    fp = fingerprinted(pages)
    if within is not None:
        return (fp.withWatermark("warc_ts", within)
                .dropDuplicatesWithinWatermark(["fp"]))
    return fp.dropDuplicates(["fp"])


def run_dedup_stream(spark: SparkSession, input_dir: str, out_dir: str,
                     checkpoint_dir: str, within: str | None = None) -> None:
    """Drain all currently-available page files through the streaming dedup
    into a parquet sink, exactly once per file, then stop (availableNow —
    the scheduled-incremental-job trigger, same contract as run_ingest).
    Re-invocations resume the seen-fingerprint state from the checkpoint:
    duplicates of pages processed in ANY earlier run stay suppressed."""
    deduped = dedup_pages(stream_pages(spark, input_dir), within=within)
    q = (
        deduped.select("url", "warc_ts", "text", "lang", "fp")
        .writeStream
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
