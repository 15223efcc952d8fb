"""Incremental corpus ingest: file-source stream of `pages` parquet →
the batch pipeline's sentence stage → parquet/Iceberg sink.

Design:
- `readStream` file source tracks processed files in the checkpoint, so a
  relaunch (or a cron'd `Trigger.AvailableNow` run) processes only new page
  files — the streaming analog of the batch pipeline's resume contract.
- The transformation is literally `corpus.sentences_from_pages` — one code
  path for batch and streaming (Structured Streaming's core promise); the
  mapInPandas NLP pass is stateless per-row, so it is streaming-safe.
- `Trigger.AvailableNow` drains everything available then stops — the right
  mode for scheduled incremental jobs (vs a long-running cluster service,
  which would use the default micro-batch trigger with the same code).

At 100 TB: the file source scales by listing only new files (or use
`maxFilesPerTrigger` to bound micro-batch size); the sink would be an
Iceberg table with exactly-once append via the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from remine_spark.corpus import sentences_from_pages
from remine_spark.synth import PAGES_SCHEMA


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming scan of a directory of pages parquet files."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def run_ingest(spark: SparkSession, input_dir: str, out_dir: str,
               checkpoint_dir: str, lang: str = "en") -> None:
    """Drain all currently-available page files into the sentences sink,
    exactly once per file, then stop. Re-invoke any time; only new files
    are processed (state lives in checkpoint_dir)."""
    pages = stream_pages(spark, input_dir)
    sentences = sentences_from_pages(pages, lang=lang)
    q = (
        sentences.writeStream
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
