"""Physical-plan shape assertions for the r1-flagged scale-killers:
no cartesian products in the LSH-gated near-dup, no per-key cross-product
band join in a5, no single-partition global sort in s1."""

import pytest

from remine_spark.operators import relational, similarity

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_embedding_near_dup_no_cartesian(spark):
    plan = plan_of(similarity.embedding_near_dup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_a5_band_join_is_equi_join(spark):
    plan = plan_of(relational.a5_range_window_join(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join carries the bin as an equi-key (never user_id alone)
    assert "bin" in plan


def test_s1_zip_has_no_single_partition_sort(spark):
    plan = plan_of(relational.s1_zip_scan(spark, SF_DIR))
    assert "Exchange SinglePartition" not in plan
    # the ordinal's partition/rank fragment materializes via
    # localCheckpoint, so the final plan only shows the checkpointed scan;
    # assert the range-partition shape on the lazy fragment itself
    from remine_spark.catalog import table

    frag = plan_of(relational._ordinal_ranked(
        table(spark, SF_DIR, "documents").select("doc_id"), "doc_id"))
    assert "rangepartitioning" in frag.lower()
    assert "Exchange SinglePartition" not in frag


def test_ann_cosine_topk_partial_window_group_limit(spark):
    """The rank-filter must compile to a PARTIAL WindowGroupLimit below
    the exchange (Catalyst InferWindowGroupLimit): each map task forwards
    ≤ k rows per query, so the full candidate set never shuffles."""
    plan = plan_of(similarity.ann_cosine_topk(spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_lsh_pair_gen_runs_signature_plan_once(spark):
    """LSH pair generation must NOT self-join the band table: a self-join
    executes the whole scan+signature subtree on both sides (two corpus
    scans, two Arrow kernels). banding.bucket_pairs aggregates each bucket
    once, so exactly one signature pass appears in the plan."""
    from remine_spark.operators import dedup

    def simple_plan(df) -> str:
        # "simple" prints each physical node exactly once ("formatted"
        # repeats every node in its details section)
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple")

    plan = simple_plan(dedup.dedup_minhash_lsh(spark, SF_DIR))
    assert plan.count("ArrowEvalPython") == 1  # one minhash kernel
    assert plan.count("Scan parquet") == 1     # one documents scan

    plan = simple_plan(similarity.near_dup_candidates(spark, SF_DIR))
    assert plan.count("ArrowEvalPython") == 1  # one sign-bucket kernel

    plan = simple_plan(dedup.simhash_band_candidates(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1     # one simhash agg chain

    # two-phase verify: one signature pass (candidates) + one shingle
    # pass (melt-join-pivot verify) — never a per-side shingle join
    plan = simple_plan(dedup.dedup_minhash_jaccard(spark, SF_DIR))
    assert plan.count("ArrowEvalPython") == 1
    assert plan.count("Scan parquet") == 2


def test_graph_iterative_loops_bound_plan_depth(spark):
    """Lineage truncation (localCheckpoint every 5 rounds) keeps the
    analyzed-plan size roughly constant in the iteration count — without
    it each PageRank round nests the previous round's plan."""
    from remine_spark.operators import graph

    small = graph.kg_pagerank(spark, SF_DIR, iters=6)
    big = graph.kg_pagerank(spark, SF_DIR, iters=16)
    size_small = len(small._jdf.queryExecution().analyzed().toString())
    size_big = len(big._jdf.queryExecution().analyzed().toString())
    # 16 iters without truncation would be ~3x the 6-iter plan; with a
    # checkpoint every 5 rounds both tails hold ≤ 5 nested rounds
    assert size_big < 2 * size_small

    # connected components checkpoints every round (labels is referenced
    # twice per round — lazy caching doubled the plan per round, every
    # leaf a full corpus re-derivation: ~1360 scan nodes measured); the
    # returned plan must read only checkpoint leaves, zero parquet scans
    cc = graph.kg_connected_components(spark, SF_DIR)
    cc_plan = cc._sc._jvm.PythonSQLUtils.explainString(
        cc._jdf.queryExecution(), "simple")
    assert cc_plan.count("Scan parquet") == 0
    assert "ExistingRDD" in cc_plan
