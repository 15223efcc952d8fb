"""Stale-workdir resume guard: resuming checkpoints produced from
DIFFERENT input must fail loudly instead of silently returning the old
corpus's triples (observed failure mode with shared /tmp workdirs)."""

import pytest

from remine_spark import pipeline, synth


def test_mismatched_input_resume_refused(spark, tmp_path):
    a = str(tmp_path / "pages_a")
    b = str(tmp_path / "pages_b")
    synth.pages_df(spark, 40, seed=1, num_partitions=2).write.parquet(a)
    synth.pages_df(spark, 60, seed=2, num_partitions=3).write.parquet(b)
    wd = str(tmp_path / "wd")

    pipeline.run_pipeline(spark, spark.read.parquet(a), wd,
                          inner_iters=2, transe_epochs=2, resume=True)
    # same input resumes fine
    pipeline.run_pipeline(spark, spark.read.parquet(a), wd,
                          inner_iters=2, transe_epochs=2, resume=True)
    # different input must be refused
    with pytest.raises(ValueError, match="different input"):
        pipeline.run_pipeline(spark, spark.read.parquet(b), wd,
                              inner_iters=2, transe_epochs=2, resume=True)
    # resume=False recomputes and re-stamps
    out = pipeline.run_pipeline(spark, spark.read.parquet(b), wd,
                                inner_iters=2, transe_epochs=2, resume=False)
    assert out["triples"].count() > 0


def test_inmemory_input_mismatch_refused(spark, tmp_path):
    """In-memory inputs (inputFiles() == []) have no file identity; the
    guard must still catch a DIFFERENT in-memory corpus of the SAME
    schema (content probe: count + bit_xor of xxhash64(url))."""
    wd = str(tmp_path / "wd_mem")
    pages_a = synth.pages_df(spark, 40, seed=1, num_partitions=2)
    pages_b = synth.pages_df(spark, 40, seed=2, num_partitions=2)
    assert pages_a.inputFiles() == []

    pipeline.run_pipeline(spark, pages_a, wd,
                          inner_iters=2, transe_epochs=2, resume=True)
    # same in-memory corpus resumes fine
    pipeline.run_pipeline(spark, pages_a, wd,
                          inner_iters=2, transe_epochs=2, resume=True)
    # same schema, same row count, different content: must be refused
    with pytest.raises(ValueError, match="different input"):
        pipeline.run_pipeline(spark, pages_b, wd,
                              inner_iters=2, transe_epochs=2, resume=True)
