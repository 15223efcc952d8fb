"""Scheme-aware workdir IO (ADVICE r1): a workdir with a URI scheme
(file:// here, standing in for s3a://hdfs://) must checkpoint, write
lineage + model JSON, and RESUME through the Hadoop FileSystem API —
os.path-based checks would silently recompute every stage."""

import os

from remine_spark import fsio, pipeline, synth

N_DOCS = 80


def test_fsio_roundtrip_via_hadoop(spark, tmp_path):
    p = "file://" + str(tmp_path / "sub" / "blob.json")
    assert fsio.is_remote(p)
    assert fsio.read_text(p) is None
    fsio.write_text_atomic(p, '{"a": 1}')
    assert fsio.exists(p)
    assert fsio.read_text(p) == '{"a": 1}'
    # atomic replace
    fsio.write_text_atomic(p, '{"a": 2}')
    assert fsio.read_text(p) == '{"a": 2}'
    # landed on the real filesystem, not a bogus './file:' dir
    assert (tmp_path / "sub" / "blob.json").exists()


def test_pipeline_resumes_on_uri_scheme_workdir(spark, tmp_path):
    wd = "file://" + str(tmp_path / "wd")
    pages = synth.pages_df(spark, N_DOCS, seed=3, num_partitions=3)
    out = pipeline.run_pipeline(spark, pages, wd, inner_iters=2,
                                transe_epochs=2, resume=True)
    before = set((r.url, r.subj, r.pred, r.obj)
                 for r in out["triples"].collect())
    assert before

    # artifacts written through the FS connector to the real location
    local_wd = tmp_path / "wd"
    assert (local_wd / "segmodel.json").exists()
    assert (local_wd / "transe_model.json").exists()
    assert (local_wd / "sentences" / "_SUCCESS").exists()
    assert any((local_wd / "lineage").iterdir())

    # resume run: checkpoints are detected (sentences not rewritten) and
    # the result is identical
    marker = (local_wd / "sentences" / "_SUCCESS").stat().st_mtime
    out2 = pipeline.run_pipeline(spark, pages, wd, inner_iters=2,
                                 transe_epochs=2, resume=True)
    after = set((r.url, r.subj, r.pred, r.obj)
                for r in out2["triples"].collect())
    assert after == before
    assert (local_wd / "sentences" / "_SUCCESS").stat().st_mtime == marker
