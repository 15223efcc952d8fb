"""bucket_pairs must emit exactly the pairs a band-table self-join would:
same (id_a < id_b) pairs per bucket, payload carried per side, across
buckets of size 0/1/2/k and ids arriving in arbitrary order."""

import random

from pyspark.sql import functions as F

from remine_spark.operators.banding import bucket_pairs


def _reference_pairs(rows):
    # brute-force per-bucket ordered pairs (the self-join semantics)
    out = set()
    by_key = {}
    for key, i, payload in rows:
        by_key.setdefault(key, []).append((i, payload))
    for members in by_key.values():
        for a in members:
            for b in members:
                if a[0] < b[0]:
                    out.add((a[0], b[0], a[1], b[1]))
    return out


def test_bucket_pairs_matches_self_join_semantics(spark):
    rng = random.Random(7)
    rows = []
    ids = list(range(60))
    rng.shuffle(ids)
    for i in ids:
        # skewed bucket sizes: one fat bucket, several size-2, singletons
        key = rng.choice(["fat", "fat", "fat", f"k{rng.randrange(12)}"])
        rows.append((key, i, i * 10))
    df = spark.createDataFrame(rows, "k string, doc_id long, pay long")
    got = (
        bucket_pairs(df, ["k"], "doc_id", payload=("pay",))
        .select(F.col("pa.i").alias("a"), F.col("pb.i").alias("b"),
                F.col("pa.pay").alias("pa_pay"), F.col("pb.pay").alias("pb_pay"))
        .collect()
    )
    got_set = {(r.a, r.b, r.pa_pay, r.pb_pay) for r in got}
    assert got_set == _reference_pairs(rows)
    # no duplicates before the caller's DISTINCT when keys are unique
    assert len(got) == len(got_set)


def test_bucket_pairs_hot_bucket_stays_streamable(spark):
    """A near-dup cluster concentrates in ONE bucket (LSH working as
    designed); the pair generator must produce that bucket's k(k-1)/2
    pairs as streamed rows — the plan may not contain a value holding
    all pairs of a bucket (the old flatten-of-all-pairs array), only the
    O(k) member array per generator row."""
    k = 300  # 44,850 pairs from one bucket
    rows = [("hot", i, i) for i in range(k)] + [("c1", 900, 0), ("c1", 901, 1)]
    df = spark.createDataFrame(rows, "k string, doc_id long, pay long")
    out = bucket_pairs(df, ["k"], "doc_id", payload=("pay",))
    got = out.select(F.col("pa.i").alias("a"), F.col("pb.i").alias("b"),
                     "pa.pay", "pb.pay").collect()
    got_set = {(r[0], r[1], r[2], r[3]) for r in got}
    assert got_set == _reference_pairs(rows)
    assert len(got) == k * (k - 1) // 2 + 1
    # no single expression materializes the full pair set: the flatten-
    # of-nested-transforms formulation is gone from the plan
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "flatten" not in plan.lower()


def test_bucket_pairs_empty_and_singleton_buckets(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "k string, doc_id long")
    got = (bucket_pairs(df, ["k"], "doc_id")
           .select("pa.i", "pb.i").collect())
    assert [(r[0], r[1]) for r in got] == [(2, 3)]
