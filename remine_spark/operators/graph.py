"""Graph operators over a KG edge list: degree, triangle counting,
connected components (iterative, oracle-checked against a DuckDB recursive
CTE), and PageRank (iterative, rows-only).

A KG-construction engine's output is consumed as a graph; these are the
first-line analytics over it: canonicalization quality (components merge
alias clusters), hub detection (degree/PageRank), and density (triangles).
The test graph is the deterministic token-co-occurrence graph of the
`documents` table (adjacent-token pairs above a frequency floor, undirected,
endpoints ordered lexically), so every operator is reproducible on both
engines.

Scale notes:
- degree/triangles are pure joins + aggs (shuffle on node id; AQE handles
  hub skew — triangle enumeration pre-orders endpoints a<b<c so each
  triangle is produced exactly once and the heaviest join side is bounded
  by the orientation trick).
- connected components is hash-min label propagation with star
  contraction (the large-star/small-star family): per round one edge join
  + groupBy-min, a pointer jump, and an edge-table rewrite through the
  labels, looped in the driver until a fixpoint — O(log n) rounds, each
  round's shuffle keyed by node id on a geometrically shrinking quotient.
- PageRank is the classic contribution-sum power iteration with fixed
  iteration count (deterministic; no convergence race).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from remine_spark.catalog import query, table
from remine_spark.plan_utils import (
    free_local_checkpoint as _free_local_checkpoint,
    stats_free_leaf as _stats_free_leaf,
)


EDGE_MIN_FREQ = 60  # sf0.01-calibrated: yields a non-regular 30-node graph (deg 6-23)

_DUCK_EDGES = f"""
    t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents),
    bi AS (SELECT least(toks[i], toks[i+1]) AS a,
                  greatest(toks[i], toks[i+1]) AS b
           FROM t, unnest(range(1, len(toks))) AS u(i)
           WHERE toks[i] <> toks[i+1]),
    edges AS (SELECT a, b, count(*) AS freq FROM bi GROUP BY a, b
              HAVING count(*) >= {EDGE_MIN_FREQ})
"""


def edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic co-occurrence edge list (a < b, freq ≥ threshold)."""
    d = table(spark, sf_dir, "documents")
    # adjacent pairs via element_at on the carried token array — one
    # codegen'd scan; the old (doc_id, i) self-join shuffled the exploded
    # token table twice just to pair neighbours
    arr = d.select(F.expr("filter(split(text,' '), x -> x != '')")
                   .alias("toks"))
    return (
        arr.select("toks", F.posexplode("toks").alias("i", "tok"))
        .filter(F.col("i") + 2 <= F.size("toks"))
        .select("tok", F.element_at("toks", F.col("i") + 2).alias("tok2"))
        .filter(F.col("tok") != F.col("tok2"))
        .select(F.least("tok", "tok2").alias("a"),
                F.greatest("tok", "tok2").alias("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= EDGE_MIN_FREQ)
    )


@query("kg_degree", f"""
    WITH {_DUCK_EDGES},
    und AS (SELECT a AS node, b AS nb FROM edges
            UNION ALL SELECT b, a FROM edges)
    SELECT node, count(*) AS degree FROM und GROUP BY node
""")
def kg_degree(spark, sf_dir):
    """Node degree over the undirected edge list."""
    e = edges_df(spark, sf_dir)
    und = e.select(F.col("a").alias("node")).unionAll(
        e.select(F.col("b").alias("node")))
    return und.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


@query("kg_triangles", f"""
    WITH {_DUCK_EDGES}
    SELECT count(*) AS n_triangles,
           (SELECT count(*) FROM edges) AS n_edges
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
""")
def kg_triangles(spark, sf_dir):
    """Triangle count via the oriented 3-way self-join (a<b<c once each)."""
    e = edges_df(spark, sf_dir).cache()
    n_edges = e.count()
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).count()
    return spark.createDataFrame(
        [(tri, n_edges)], "n_triangles long, n_edges long")


def hash_min_components(und_edges: DataFrame) -> DataFrame:
    """Connected components by hash-min label propagation WITH star
    contraction (the large-star/small-star family). ``und_edges`` must
    carry BOTH directions of every edge in columns (a, b); returns
    (node, comp) with comp = min node id of the component.

    Per round: (1) every plateau (set of nodes sharing a root label)
    adopts the minimum label reachable from its root over the CONTRACTED
    edge table; (2) one pointer jump re-compresses the forest; (3) the
    edge table itself is rewritten through the new labels — each edge
    (a, b) becomes (lbl(a), lbl(b)), self-loops dropped. Contraction is
    what makes this O(log n) rounds: plain neighbour-min advances a label
    one ORIGINAL-graph hop per round (a chain component needs diameter
    rounds — the 1M-doc near-dup graph, whose template chains are ~path
    components over 222k clustered docs, ran past 40 rounds with label
    shortcuts alone, because once a plateau's pointer depth is 1 a jump
    is a no-op and plateaus merge at boundary speed). With contraction
    the quotient graph shrinks geometrically, and both directions of
    every edge are preserved, so the fixpoint (no label changed ⇒ every
    remaining edge joins equal labels) is exactly full component merge.

    Shared by kg_connected_components (token co-occurrence graph) and
    dedup_cluster_resolve (near-duplicate pair graph).

    Plan discipline: every loop table is an eager localCheckpoint
    (plan truncation — cache() leaves the derivation plan in place and
    the loop's 2× references per round grew it exponentially, every leaf
    a parquet re-scan), wrapped by _stats_free_leaf so iterative joins
    cannot compound sizeInBytes estimates round over round, with the raw
    checkpoint handle (ck_*) kept for _free_local_checkpoint. On a
    cluster with lineage-reliability requirements swap localCheckpoint
    for checkpoint() on a fault-tolerant dir."""
    ck_und = und_edges.distinct().localCheckpoint(eager=True)
    und = _stats_free_leaf(ck_und)
    ck_labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "lbl", F.col("node")).localCheckpoint(eager=True)
    labels = _stats_free_leaf(ck_labels)
    while True:
        # (1) plateau improvement: min label adjacent to each root rt,
        # applied to every node THROUGH its root (labels.lbl == rt), so a
        # whole plateau moves in one round
        nb_min = (
            und.join(labels, und.b == labels.node)
            .groupBy(F.col("a").alias("rt"))
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        ck_imp = (
            labels.join(nb_min, labels.lbl == nb_min.rt, "left")
            .select("node", F.least("lbl", F.coalesce("nb_lbl", "lbl"))
                    .alias("lbl"))
            .localCheckpoint(eager=True)
        )
        cur = _stats_free_leaf(ck_imp)
        # (2) one pointer jump: the adopted label may itself have moved
        lk = cur.select(F.col("node").alias("lk_node"),
                        F.col("lbl").alias("lk_lbl"))
        ck_new = (
            cur.join(lk, cur.lbl == lk.lk_node, "left")
            .select("node", F.least("lbl", F.coalesce("lk_lbl", "lbl"))
                    .alias("lbl"))
            .localCheckpoint(eager=True)
        )
        new_labels = _stats_free_leaf(ck_new)
        _free_local_checkpoint(ck_imp)
        changed = (
            labels.withColumnRenamed("lbl", "old").join(new_labels, "node")
            .filter("old != lbl").count()
        )
        if changed == 0:
            _free_local_checkpoint(ck_labels)
            _free_local_checkpoint(ck_und)
            labels = new_labels
            break
        # (3) star contraction: rewrite the (already contracted) edge
        # table through the new labels; the quotient shrinks every round
        # and self-loops (merged plateaus) drop out
        la = new_labels.select(F.col("node").alias("na"),
                               F.col("lbl").alias("la"))
        lb = new_labels.select(F.col("node").alias("nb2"),
                               F.col("lbl").alias("lb"))
        ck_und2 = (
            und.join(la, und.a == F.col("na"))
            .join(lb, und.b == F.col("nb2"))
            .select(F.col("la").alias("a"), F.col("lb").alias("b"))
            .filter("a != b").distinct()
            .localCheckpoint(eager=True)
        )
        # safe: successors are independently materialized leaves
        _free_local_checkpoint(ck_und)
        _free_local_checkpoint(ck_labels)
        ck_und, und = ck_und2, _stats_free_leaf(ck_und2)
        ck_labels, labels = ck_new, new_labels
    return labels.select("node", F.col("lbl").alias("comp"))


@query("kg_connected_components", f"""
    WITH RECURSIVE {_DUCK_EDGES},
    und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
    reach(node, lbl) AS (
        SELECT a, a FROM und
        UNION
        SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.node
    )
    SELECT node, min(lbl) AS comp FROM reach GROUP BY node
""")
def kg_connected_components(spark, sf_dir):
    """Connected components by hash-min label propagation (iterative
    DataFrame loop, fixpoint detected with one agg per round); the oracle
    computes the same min-reachable-label via a recursive CTE."""
    e = edges_df(spark, sf_dir)
    und = e.select("a", "b").unionAll(e.select(F.col("b"), F.col("a")))
    return hash_min_components(und)


@query("kg_pagerank", f"""
    WITH RECURSIVE {_DUCK_EDGES},
    und AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
    deg AS (SELECT a AS node, count(*) AS deg FROM und GROUP BY a),
    pr AS (
        SELECT 0 AS iter, node, CAST(1.0 AS DOUBLE) AS rank FROM deg
        UNION ALL
        SELECT p.iter + 1, u.b AS node,
               0.15 + 0.85 * sum(p.rank / d.deg) AS rank
        FROM pr p
        JOIN deg d ON d.node = p.node
        JOIN und u ON u.a = p.node
        WHERE p.iter < 10
        GROUP BY p.iter + 1, u.b
    )
    SELECT node, round(rank, 6) AS rank FROM pr WHERE iter = 10
""")
def kg_pagerank(spark, sf_dir, iters: int = 10, damping: float = 0.85):
    """PageRank power iteration (fixed iteration count → deterministic).
    Oracle: the same damped contribution sum as an iteration-indexed
    recursive CTE (every node has degree ≥ 1 by construction, so no
    dangling-mass term and no node drops out of the recursion). Invariants
    (sum≈n_nodes, positivity, hub ordering vs degree) are also pytested."""
    e = edges_df(spark, sf_dir)
    und = e.select("a", "b").unionAll(e.select(F.col("b"), F.col("a")))
    # loop bases as plan leaves (see kg_connected_components note): both
    # are re-referenced every round, so cache() alone still grows the
    # returned plan by one full edge derivation per reference
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=True)
    ranks = deg.select("node", F.lit(1.0).alias("rank"))
    out_edges = und.join(deg, und.a == deg.node).select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "deg")\
        .localCheckpoint(eager=True)
    prev_ckpt = None
    for i in range(iters):
        contribs = (
            out_edges.join(ranks, out_edges.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("c"))
        )
        ranks = deg.select("node").join(contribs, "node", "left").select(
            "node",
            ((1 - damping) + damping * F.coalesce("c", F.lit(0.0)))
            .alias("rank"))
        if (i + 1) % 5 == 0 and (i + 1) < iters:
            # bound the nested-plan depth at ≤5 iterations regardless of
            # the iteration count (see kg_connected_components note);
            # stats-free so checkpoint windows cannot compound sizeInBytes
            ck = ranks.localCheckpoint(eager=True)
            ranks = _stats_free_leaf(ck)
            if prev_ckpt is not None:
                # the new (eager) checkpoint no longer reads the old one
                _free_local_checkpoint(prev_ckpt)
            prev_ckpt = ck
    # deg / out_edges / the last intermediate checkpoint stay persisted —
    # the returned plan still reads them
    return ranks.select("node", F.round("rank", 6).alias("rank"))
