"""Structured Streaming layer tests: incremental ingest exactly-once,
watermarked windows vs batch equivalence, and the custom stateful operator."""

import os
import shutil

import pytest

from remine_spark import synth
from remine_spark.corpus import sentences_from_pages
from remine_spark.streaming import ingest, stateful, windows


@pytest.fixture()
def tmpdirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def _write_pages(spark, path, n, seed):
    synth.pages_df(spark, n, seed=seed, num_partitions=2).write.mode(
        "append").parquet(path)


def test_incremental_ingest_exactly_once(spark, tmpdirs):
    """New files are processed exactly once per run_ingest invocation;
    already-seen files are skipped on relaunch (checkpoint bookkeeping)."""
    _write_pages(spark, tmpdirs["in"], 30, seed=1)
    ingest.run_ingest(spark, tmpdirs["in"], tmpdirs["out"], tmpdirs["ckpt"])
    first = spark.read.parquet(tmpdirs["out"]).count()
    assert first > 0

    # batch equivalence: streaming output == batch stage on the same input
    batch = sentences_from_pages(
        spark.read.parquet(tmpdirs["in"])).count()
    assert first == batch

    # second drop of files: only the delta is appended
    _write_pages(spark, tmpdirs["in"], 20, seed=2)
    ingest.run_ingest(spark, tmpdirs["in"], tmpdirs["out"], tmpdirs["ckpt"])
    total = spark.read.parquet(tmpdirs["out"]).count()
    batch_total = sentences_from_pages(
        spark.read.parquet(tmpdirs["in"])).count()
    assert total == batch_total > first

    # idempotent relaunch with no new files
    ingest.run_ingest(spark, tmpdirs["in"], tmpdirs["out"], tmpdirs["ckpt"])
    assert spark.read.parquet(tmpdirs["out"]).count() == total


def test_windowed_counts_stream_matches_batch(spark, tmpdirs):
    """The windowed agg definition runs on both a stream and a batch frame
    and produces identical finalized windows under availableNow."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(tmpdirs["in"])

    stream = spark.readStream.schema(events.schema).parquet(tmpdirs["in"])
    q = (
        windows.windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", tmpdirs["out"])
        .option("checkpointLocation", tmpdirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.read.parquet(tmpdirs["out"]).collect()}

    want_df = windows.windowed_event_counts(events)
    want = {tuple(r) for r in want_df.collect()}
    # append-mode emits only watermark-finalized windows: a suffix of event
    # time may be withheld, but everything emitted must match batch exactly.
    assert got, "no finalized windows emitted"
    assert got <= want
    missing = want - got
    if missing:  # only the trailing horizon may be withheld
        horizon = max(r[0] for r in want) - 30 * 60
        assert all(r[0] >= horizon for r in missing)


def test_stateful_running_totals(spark, tmpdirs):
    """applyInPandasWithState carries state across micro-batches: feeding
    the same events in two batches yields cumulative totals."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    half = events.filter("event_id % 2 = 0")
    rest = events.filter("event_id % 2 = 1")
    half.write.mode("append").parquet(tmpdirs["in"])
    rest.write.mode("append").parquet(tmpdirs["in"])

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(tmpdirs["in"])
    )
    q = (
        stateful.running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .option("checkpointLocation", tmpdirs["ckpt"])
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # final update per key == batch groupBy on the full input
    updates = spark.sql("select * from totals").collect()
    final = {}
    for r in updates:  # later updates overwrite earlier ones per key
        cur = final.get(r.event_type)
        if cur is None or r.n_events >= cur[0]:
            final[r.event_type] = (r.n_events, r.sum_value)
    want = {
        r.event_type: (r.n, round(r.s, 4))
        for r in events.groupBy("event_type")
        .agg(__import__("pyspark").sql.functions.count("*").alias("n"),
             __import__("pyspark").sql.functions.sum("value").alias("s"))
        .collect()
    }
    got = {k: (n, round(s, 4)) for k, (n, s) in final.items()}
    assert got == want


def test_incremental_kg_update(spark, tmpdirs, tmp_path):
    """Batch-trained model + streaming foreachBatch: new pages produce
    triples equivalent to a batch run of the same extraction stages."""
    from pyspark.sql import functions as F

    from remine_spark import pipeline, tuples as tuples_mod
    from remine_spark.streaming import kg_update

    # 1. batch run trains + saves the model
    wd = str(tmp_path / "batch_wd")
    train_pages = synth.pages_df(spark, 80, seed=21, num_partitions=3)
    pipeline.run_pipeline(spark, train_pages, wd,
                          inner_iters=2, transe_epochs=2, resume=False)

    # 2. new pages arrive as files; stream them through the frozen model
    new_pages = synth.pages_df(spark, 40, seed=99, num_partitions=2)
    new_pages.write.mode("append").parquet(tmpdirs["in"])
    kg_update.run_incremental_kg(
        spark, tmpdirs["in"], tmpdirs["out"], tmpdirs["ckpt"], wd)
    got = spark.read.parquet(tmpdirs["out"])
    n1 = got.count()
    assert n1 > 0
    assert {"subj", "pred", "obj", "bucket", "epoch_id"} <= set(got.columns)

    # equivalence: same extraction on the same input in batch
    m = pipeline.load_model(wd)
    bc = spark.sparkContext.broadcast(m.payload())
    want = tuples_mod.tuples_df(
        sentences_from_pages(spark.read.parquet(tmpdirs["in"])), bc)
    assert n1 == want.count()

    # 3. relaunch with no new files → nothing appended
    kg_update.run_incremental_kg(
        spark, tmpdirs["in"], tmpdirs["out"], tmpdirs["ckpt"], wd)
    assert spark.read.parquet(tmpdirs["out"]).count() == n1


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """ADVICE r1: a replayed micro-batch (crash between write and streaming
    checkpoint commit) must REPLACE its epoch partition, not append dups."""
    from remine_spark.streaming import kg_update

    out_dir = str(tmp_path / "triples")
    df = spark.createDataFrame(
        [("u1", "a", "r", "b", 0, 0), ("u2", "c", "r", "d", 1, 0)],
        "url string, subj string, pred string, obj string, bucket int, "
        "epoch_id long")
    kg_update.write_epoch(df, out_dir)
    n1 = spark.read.parquet(out_dir).count()
    # replay the SAME epoch → replaced, not duplicated
    kg_update.write_epoch(df, out_dir)
    assert spark.read.parquet(out_dir).count() == n1
    # a NEW epoch appends without touching epoch 0
    df2 = df.withColumn("epoch_id", df.epoch_id + 1)
    kg_update.write_epoch(df2, out_dir)
    got = spark.read.parquet(out_dir)
    assert got.count() == n1 * 2
    assert got.filter("epoch_id = 0").count() == n1


def test_streaming_kg_update_catalog_entry(spark):
    """VERDICT r4 item 5: the streaming seam is registered under the
    driver's correctness gate (rows-only). The catalog callable must be
    self-contained — train/reuse the flagship model, stream a fixed page
    slice through the frozen model, return a stable scalar-column frame."""
    import __spark_entry__ as entry

    fn = entry.queries()["streaming_kg_update"]
    df = fn(spark, "/root/testdata/sf0.001")
    assert df.schema.simpleString() == (
        "struct<url:string,doc_id:bigint,sent_id:int,subj:string,"
        "pred:string,obj:string,epoch_id:int>")
    assert df.count() > 0
    # rows-only by design: a foreachBatch stream has no DuckDB oracle
    assert "streaming_kg_update" not in entry.oracle_sql()


def test_dedup_stream_first_arrival_wins_across_runs(spark, tmpdirs):
    """Streaming exact dedup: one row per distinct content fingerprint,
    with the seen-set carried across separate availableNow runs through
    the streaming checkpoint — a re-crawl of already-seen pages adds
    nothing."""
    from pyspark.sql import functions as F

    from remine_spark.streaming import dedup_stream

    _write_pages(spark, tmpdirs["in"], 30, seed=1)
    dedup_stream.run_dedup_stream(
        spark, tmpdirs["in"], tmpdirs["out"], tmpdirs["ckpt"])
    first = spark.read.parquet(tmpdirs["out"])
    n_first = first.count()
    assert n_first == first.select("fp").distinct().count() > 0

    # re-crawl: the exact same 30 pages again, plus 20 genuinely new ones
    _write_pages(spark, tmpdirs["in"], 30, seed=1)
    _write_pages(spark, tmpdirs["in"], 20, seed=2)
    dedup_stream.run_dedup_stream(
        spark, tmpdirs["in"], tmpdirs["out"], tmpdirs["ckpt"])
    out = spark.read.parquet(tmpdirs["out"])
    batch_distinct = (
        spark.read.parquet(tmpdirs["in"])
        .select(F.md5(F.coalesce("text", F.lit(""))).alias("fp"))
        .distinct().count())
    # every distinct text exactly once, none of the re-crawl re-emitted
    assert out.count() == out.select("fp").distinct().count() == batch_distinct
    assert out.count() > n_first

    # watermark-bounded variant: all events inside the horizon → same set
    wm_out, wm_ckpt = tmpdirs["out"] + "_wm", tmpdirs["ckpt"] + "_wm"
    dedup_stream.run_dedup_stream(
        spark, tmpdirs["in"], wm_out, wm_ckpt, within="365 days")
    wm = spark.read.parquet(wm_out)
    assert wm.select("fp").distinct().count() == batch_distinct
