"""Degenerate inputs must not crash the pipeline: empty corpus, no-English
corpus, single tiny doc."""

from pyspark.sql import Row

from remine_spark import pipeline, synth


def _run(spark, pages, wd):
    return pipeline.run_pipeline(spark, pages, str(wd), inner_iters=1,
                                 transe_epochs=2, resume=False)


def test_empty_pages(spark, tmp_path):
    pages = spark.createDataFrame([], schema=synth.PAGES_SCHEMA)
    out = _run(spark, pages, tmp_path / "w1")
    assert out["triples"].count() == 0
    assert out["edges"].count() == 0


def test_no_english_pages(spark, tmp_path):
    pages = synth.pages_df(spark, 200, seed=42, num_partitions=3).filter(
        "lang <> 'en'")
    assert pages.count() > 0
    out = _run(spark, pages, tmp_path / "w2")
    assert out["triples"].count() == 0


def test_single_tiny_doc(spark, tmp_path):
    import datetime
    text = "acme acquired globex ."
    pages = spark.createDataFrame(
        [Row(url="u://1", warc_ts=datetime.datetime(2024, 1, 1),
             html=synth.render_html(text), text=text, lang="en")],
        schema=synth.PAGES_SCHEMA)
    out = _run(spark, pages, tmp_path / "w3")
    # sub-min-sup: no patterns, so no mentions/triples — but no crash
    assert out["triples"].count() >= 0
    assert out["sentences"].count() == 1
