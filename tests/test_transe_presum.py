"""Distributed TransE gradient reduction (VERDICT r1 item 2): the
JVM-side groupBy(kind, idx) elementwise pre-sum must merge mergeable
partials exactly like a numpy sum, and training through the distributed
reduction must stay deterministic run-to-run."""

import numpy as np

from remine_spark import pipeline, synth, transe

N_DOCS = 120


def test_presum_matches_numpy_merge(spark):
    dim = 4
    rows = [
        ("e", 0, [1.0, 2.0, 0.0, -1.0]),
        ("e", 0, [0.5, -2.0, 3.0, 1.0]),
        ("e", 7, [1.0, 1.0, 1.0, 1.0]),
        ("r", 0, [9.0, 0.0, 0.0, 0.0]),
        ("e", 0, [0.25, 0.25, 0.25, 0.25]),
        ("r", 0, [-1.0, 1.0, -1.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, schema="kind string, idx long, g array<double>"
    ).repartition(3)  # force partials to land on different map tasks
    got = {(r.kind, r.idx): np.asarray(r.g)
           for r in transe.presum_grads(df).collect()}
    want = {}
    for k, i, g in rows:
        want[(k, i)] = want.get((k, i), np.zeros(dim)) + np.asarray(g)
    assert set(got) == set(want)
    for key in want:
        assert np.allclose(got[key], want[key])


def test_fit_deterministic_through_distributed_reduction(spark, tmp_path):
    pages = synth.pages_df(spark, N_DOCS, seed=42, num_partitions=4)
    out = pipeline.run_pipeline(spark, pages, str(tmp_path / "wd"),
                                inner_iters=2, transe_epochs=2, resume=False)
    tuples = out["tuples"]
    a = transe.fit(spark, tuples, dim=8, epochs=4)
    b = transe.fit(spark, tuples, dim=8, epochs=4)
    assert a.ent2id == b.ent2id and a.rel2id == b.rel2id
    assert np.array_equal(a.E, b.E) and np.array_equal(a.R, b.R)


def test_presum_dim_specialized_matches(spark):
    rows = [
        ("e", 0, [1.0, 2.0, 0.0, -1.0]),
        ("e", 0, [0.5, -2.0, 3.0, 1.0]),
        ("r", 3, [9.0, 0.0, -4.0, 0.0]),
        ("e", 0, [0.25, 0.25, 0.25, 0.25]),
    ]
    df = spark.createDataFrame(
        rows, schema="kind string, idx long, g array<double>").repartition(2)
    slow = {(r.kind, r.idx): tuple(r.g)
            for r in transe.presum_grads(df).collect()}
    fast = {(r.kind, r.idx): tuple(r.g)
            for r in transe.presum_grads(df, dim=4).collect()}
    assert slow == fast


def test_sharded_fit_bit_identical_to_broadcast(spark, tmp_path):
    """VERDICT r2 item 4: the parameter-sharded path (no vocab collect, no
    full-matrix broadcast in the epoch loop) must reproduce the broadcast
    path bit-for-bit — ids, init, gradients, updates, normalization."""
    pages = synth.pages_df(spark, N_DOCS, seed=42, num_partitions=4)
    out = pipeline.run_pipeline(spark, pages, str(tmp_path / "wd"),
                                inner_iters=2, transe_epochs=2, resume=False)
    tuples = out["tuples"]
    a = transe.fit(spark, tuples, dim=8, epochs=3, param_shard=False)
    b = transe.fit(spark, tuples, dim=8, epochs=3, param_shard=True)
    assert a.ent2id == b.ent2id and a.rel2id == b.rel2id
    assert np.array_equal(a.E, b.E), np.abs(a.E - b.E).max()
    assert np.array_equal(a.R, b.R)

    # join-assembled scoring matches the broadcast-model scoring
    sb = transe.score_and_rank(spark, tuples, a).select(
        "doc_id", "sent_id", "subj", "obj", "score")
    from remine_spark.operators.relational import _ordinal  # noqa: F401
    from pyspark.sql import functions as F
    edf = transe.edges_from_tuples(tuples)
    ent_ids = transe._ordinal_ids(
        edf.select(F.col("subj").alias("t"))
        .unionByName(edf.select(F.col("obj").alias("t"))), "t")
    rel_ids = transe._ordinal_ids(edf.select(F.col("rel").alias("t")), "t")
    params = spark.createDataFrame(
        [("e", i, [float(x) for x in a.E[i]]) for i in range(len(a.ent2id))]
        + [("r", j, [float(x) for x in a.R[j]]) for j in range(len(a.rel2id))],
        "kind string, idx long, vec array<double>")
    sp = transe.score_and_rank_params(spark, tuples, params,
                                      ent_ids, rel_ids).select(
        "doc_id", "sent_id", "subj", "obj", "score")
    joined = sb.withColumnRenamed("score", "s1").join(
        sp.withColumnRenamed("score", "s2"),
        ["doc_id", "sent_id", "subj", "obj"])
    assert joined.count() == sb.count()
    # null-safe comparison: a NULL score on either side must FAIL the
    # parity (plain <> evaluates to null on null operands and silently
    # passes); NaN <=> NaN is true under Spark's NaN-equality semantics,
    # so matching NaNs still pass.
    assert joined.filter("NOT (s1 <=> s2)").count() == 0
    assert joined.filter("s1 IS NULL OR s2 IS NULL").count() == 0


def test_pipeline_sharded_transe_smoke(spark, tmp_path):
    """VERDICT r3 item 5: a full run_pipeline with the parameter-sharded
    TransE path forced must emit the SAME ranked triples as the broadcast
    path — catches schema/plan drift between the two fit paths at the
    pipeline surface, not just the unit level."""
    pages = synth.pages_df(spark, N_DOCS, seed=42, num_partitions=4)
    a = pipeline.run_pipeline(spark, pages, str(tmp_path / "wd_bcast"),
                              inner_iters=2, transe_epochs=2, resume=False,
                              transe_param_shard=False)
    b = pipeline.run_pipeline(spark, pages, str(tmp_path / "wd_shard"),
                              inner_iters=2, transe_epochs=2, resume=False,
                              transe_param_shard=True)
    cols = ["url", "doc_id", "sent_id", "subj", "pred", "obj",
            "score", "rank"]
    ta = sorted(map(tuple, a["triples"].select(*cols).collect()))
    tb = sorted(map(tuple, b["triples"].select(*cols).collect()))
    assert ta == tb


def test_local_fast_path_bit_identical_to_distributed(spark, tmp_path,
                                                      monkeypatch):
    """Small edge tables train driver-local (no per-epoch Spark jobs);
    the result must be bit-identical to the distributed broadcast path —
    same kernel, exact integer-valued partial sums, so any divergence is
    a bug in the fast path's chunking or update application."""
    pages = synth.pages_df(spark, N_DOCS, seed=42, num_partitions=4)
    out = pipeline.run_pipeline(spark, pages, str(tmp_path / "wd"),
                                inner_iters=2, transe_epochs=2, resume=False)
    tuples = out["tuples"]
    a = transe.fit(spark, tuples, dim=8, epochs=4)  # local at this scale
    monkeypatch.setattr(transe, "LOCAL_EDGE_THRESHOLD", -1)
    b = transe.fit(spark, tuples, dim=8, epochs=4)  # distributed broadcast
    assert a.ent2id == b.ent2id and a.rel2id == b.rel2id
    assert np.array_equal(a.E, b.E), np.abs(a.E - b.E).max()
    assert np.array_equal(a.R, b.R)


def test_auto_dispatch_crosses_shard_threshold(spark, tmp_path, monkeypatch):
    """VERDICT r4 item 2: the param_shard=None AUTO dispatch itself —
    not a forced path — must route past-threshold edge tables to
    _fit_sharded. The threshold is monkeypatched DOWN so this corpus
    crosses it naturally; the dispatched result must equal the broadcast
    path bit-for-bit (same contract as the forced-path test)."""
    pages = synth.pages_df(spark, N_DOCS, seed=42, num_partitions=4)
    out = pipeline.run_pipeline(spark, pages, str(tmp_path / "wd"),
                                inner_iters=2, transe_epochs=2, resume=False)
    tuples = out["tuples"]
    n_edges = transe.edges_from_tuples(tuples).count()
    assert n_edges > 8  # the monkeypatched threshold must actually trip

    calls = []
    real = transe._fit_sharded

    def spy(*args, **kwargs):
        calls.append(True)
        return real(*args, **kwargs)

    monkeypatch.setattr(transe, "_fit_sharded", spy)
    monkeypatch.setattr(transe, "SHARD_EDGE_THRESHOLD", 8)
    auto = transe.fit(spark, tuples, dim=8, epochs=2)  # param_shard=None
    assert calls, "auto dispatch did not choose the sharded path"

    monkeypatch.setattr(transe, "SHARD_EDGE_THRESHOLD", 5_000_000)
    bcast = transe.fit(spark, tuples, dim=8, epochs=2, param_shard=False)
    assert auto.ent2id == bcast.ent2id and auto.rel2id == bcast.rel2id
    assert np.array_equal(auto.E, bcast.E)
    assert np.array_equal(auto.R, bcast.R)
