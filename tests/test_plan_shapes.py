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
    assert "rangepartitioning" in plan.lower()
