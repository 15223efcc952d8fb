"""Graph operators over the co-occurrence KG: degree/triangles/CC against
the DuckDB oracle (see test_queries_oracle for the hash compare); here:
structural invariants + PageRank properties."""

from remine_spark.operators import graph

SF = "/root/testdata/sf0.01"


def test_components_partition_nodes(spark):
    comp = {r.node: r.comp for r in
            graph.kg_connected_components(spark, SF).collect()}
    edges = graph.edges_df(spark, SF).collect()
    assert comp
    # every edge endpoint pair shares a component; comp label is a member
    for e in edges:
        assert comp[e.a] == comp[e.b]
    assert set(comp.values()) <= set(comp.keys())


def test_pagerank_invariants(spark):
    import math
    pr = {r.node: r.rank for r in graph.kg_pagerank(spark, SF).collect()}
    deg = {r.node: r.degree for r in graph.kg_degree(spark, SF).collect()}
    assert pr.keys() == deg.keys()
    assert all(r > 0 for r in pr.values())
    assert math.isclose(sum(pr.values()), len(pr), rel_tol=0.02)
    # the max-degree hub must rank in the top decile
    hub = max(deg, key=deg.get)
    ranked = sorted(pr, key=pr.get, reverse=True)
    assert ranked.index(hub) < max(1, len(ranked) // 10)


def test_free_local_checkpoint_releases_blocks(spark):
    """Superseded per-round label checkpoints must actually leave executor
    storage: DataFrame.unpersist() is a cache-manager no-op for
    localCheckpoint blocks, so graph loops free them via the LogicalRDD
    handle. Guards the helper AND that a full CC run leaves only its
    bounded final state persisted."""
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.getPersistentRDDs().size()

    base = n_persistent()
    df = spark.range(100).selectExpr("id", "id * 2 AS x") \
        .localCheckpoint(eager=True)
    assert n_persistent() == base + 1
    df.unpersist()                    # documented no-op for checkpoints
    assert n_persistent() == base + 1
    graph._free_local_checkpoint(df)  # the real release
    assert n_persistent() == base

    before = n_persistent()
    comp = graph.kg_connected_components(spark, "/root/testdata/sf0.001")
    comp.collect()
    # only the final labels checkpoint (the returned plan's leaf) may
    # remain from the whole iterative loop
    assert n_persistent() <= before + 1


def test_stats_free_leaf_bounds_iterative_stats(spark):
    """Dataset.localCheckpoint carries the origin plan's sizeInBytes onto
    the checkpoint leaf; in an iterative self-join loop that estimate
    MULTIPLIES every round and its BigInt doubles in bit-width — by round
    ~20 one Catalyst stats visit costs minutes of driver-side BigInt
    multiplication (the 1M-doc dedup_cluster_resolve stall). The
    _stats_free_leaf rebuild must hold the estimate constant."""
    from pyspark.sql import functions as F

    from remine_spark.operators.graph import _stats_free_leaf

    def stat_bits(df):
        return int(str(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes())).bit_length()

    df = spark.range(100).select(F.col("id").alias("node"),
                                 F.col("id").alias("lbl"))
    cur = _stats_free_leaf(df.localCheckpoint(eager=True))
    first = None
    for _ in range(6):
        lk = cur.select(F.col("node").alias("n2"), F.col("lbl").alias("l2"))
        cur = _stats_free_leaf(
            cur.join(lk, cur.lbl == lk.n2, "left")
            .select("node", F.least("lbl", F.coalesce("l2", "lbl"))
                    .alias("lbl"))
            .localCheckpoint(eager=True))
        first = first if first is not None else stat_bits(cur)
    # without the rebuild the bit-width doubles per round (~64 → ~2048
    # after 6); with it the leaf estimate is flat
    assert stat_bits(cur) == first <= 64
    assert cur.count() == 100
