"""Driver-contract query catalog: SURVEY §2 operators + training-data
pipeline ops, each as a (PySpark callable, DuckDB oracle SQL) pair.

Conventions (hash-compare safety):
- every aggregate/computed column is aliased identically in Spark and SQL;
- doubles are rounded (4-6 dp) on both sides;
- timestamps never surface raw — epoch seconds (BIGINT) only;
- result sets are order-insensitive (driver sorts before hashing).

Tables live at ``{sf_dir}/{name}.parquet``; DuckDB pre-registers views with
the bare table names.
"""

from __future__ import annotations

from pyspark.sql import functions as F, Window as W

from remine_spark.catalog import QUERIES, query as _q, table as _t

__all__ = ["QUERIES"]


# ---------------------------------------------------------------------------
# Aggregations (A1-A3, A9, A12) and filters (P3)
# ---------------------------------------------------------------------------

@_q("q1_pricing_summary", """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    """Flagship scan→filter→agg (whole-stage codegen, partial agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q("a1_unigram_count", """
    SELECT tok AS token, count(*) AS freq
    FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    WHERE tok <> ''
    GROUP BY tok
""")
def a1_unigram_count(spark, sf_dir):
    """A1 (frequent_pattern_mining.h:303-319): corpus unigram counts."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@_q("a2_bigram_minsup", """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT toks[i] || ' ' || toks[i + 1] AS ngram, count(*) AS freq
    FROM d, unnest(range(1, len(toks))) AS t(i)
    GROUP BY 1 HAVING count(*) >= 5
""")
def a2_bigram_minsup(spark, sf_dir):
    """A2+P3 (frequent_pattern_mining.h:350-435): n-gram mining with
    min-support, as one explode + hash agg (no self-join needed). Bigrams
    are formed by posexplode + element_at — whole-stage codegen end to
    end (a transform(sequence...) HOF evaluates interpreted and was the
    query's dominant cost)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.split("text", " ").alias("toks"))
        .select("toks", F.posexplode("toks").alias("i", "tok"))
        .filter(F.col("i") + 2 <= F.size("toks"))
        .select(F.concat_ws(
            " ", "tok", F.element_at("toks", F.col("i") + 2)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 5)
    )


@_q("a3_token_idf", """
    WITH d AS (SELECT count(*) AS n FROM documents),
    df AS (
      SELECT tok AS token, count(DISTINCT doc_id) AS df
      FROM documents, unnest(string_split(text, ' ')) AS u(tok)
      WHERE tok <> '' GROUP BY tok
    )
    SELECT token, df, round(ln(d.n / df), 6) AS idf FROM df, d
""")
def a3_token_idf(spark, sf_dir):
    """A3 (documents.h:300-309): document frequency + idf. The doc-count
    denominator rides the SAME job as a broadcast 1-row cross join (as the
    DuckDB oracle formulates it) — no separate count() pass."""
    d = _t(spark, sf_dir, "documents")
    n1 = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n1))
        .withColumn("idf", F.round(F.log(F.col("n_docs") / F.col("df")), 6))
        .drop("n_docs")
    )


@_q("a9_pool_counts", """
    SELECT tok AS text, count(*) AS freq
    FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    WHERE tok <> '' GROUP BY tok HAVING count(*) > 9
""")
def a9_pool_counts(spark, sf_dir):
    """A9 (utils.py:27-44): distant-supervision pool with freq > 9 cutoff."""
    return a1_unigram_count(spark, sf_dir).filter(F.col("freq") > 9) \
        .withColumnRenamed("token", "text")


@_q("a12_minmax_norm", """
    WITH ext AS (SELECT l_returnflag, min(l_extendedprice) AS mn,
                        max(l_extendedprice) AS mx
                 FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           round(avg((l.l_extendedprice - e.mn) / (e.mx - e.mn)), 6) AS avg_norm
    FROM lineitem l JOIN ext e ON l.l_returnflag = e.l_returnflag
    GROUP BY l.l_returnflag
""")
def a12_minmax_norm(spark, sf_dir):
    """A12 (dump.h:21-28): min-max score normalization per class."""
    li = _t(spark, sf_dir, "lineitem")
    ext = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx"))
    return (
        li.join(ext, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(F.round(F.avg((F.col("l_extendedprice") - F.col("mn"))
                           / (F.col("mx") - F.col("mn"))), 6).alias("avg_norm"))
    )


# ---------------------------------------------------------------------------
# Joins (J1, J2, J4, J8-analog)
# ---------------------------------------------------------------------------

@_q("j1_pattern_lookup", """
    SELECT p.p_brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
""")
def j1_pattern_lookup(spark, sf_dir):
    """J1 (frequent_pattern_mining.h:152): hash-map lookup → broadcast hash
    join (part is the small dimension)."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q("j2_subpattern_join", """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    uni AS (
      SELECT tok, count(*) AS freq
      FROM d, unnest(toks) AS u(tok) WHERE tok <> '' GROUP BY tok
    ),
    bi AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS freq
      FROM d, unnest(range(1, len(toks))) AS t(i)
      GROUP BY 1, 2 HAVING count(*) >= 10
    )
    SELECT bi.w1 || ' ' || bi.w2 AS ngram, bi.freq AS freq,
           u1.freq AS f_left, u2.freq AS f_right
    FROM bi JOIN uni u1 ON bi.w1 = u1.tok JOIN uni u2 ON bi.w2 = u2.tok
""")
def j2_subpattern_join(spark, sf_dir):
    """J2 (feature_extraction.h:262-293): sub-pattern self-join — each
    bigram looks up its unigram parts' frequencies (broadcast both ways)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("ord", "tok"))
    # uni feeds BOTH broadcast sides below; without materialization each
    # BroadcastExchange re-runs the full corpus scan+agg (no cross-side
    # subplan reuse, probed empirically). Lazy localCheckpoint computes it
    # once on first use; the vocab-sized result then serves both builds.
    uni = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
           .localCheckpoint(eager=False))
    # adjacent pairs via element_at on the carried token array — one
    # codegen'd scan instead of a (doc_id, ord) self-join shuffle
    arr = d.select(F.split("text", " ").alias("toks"))
    bi = (
        arr.select("toks", F.posexplode("toks").alias("i", "w1"))
        .filter(F.col("i") + 2 <= F.size("toks"))
        .select("w1", F.element_at("toks", F.col("i") + 2).alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 10)
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("freq").alias("f_left"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("freq").alias("f_right"))
    return (
        bi.join(F.broadcast(u1), "w1").join(F.broadcast(u2), "w2")
        .select(F.concat_ws(" ", "w1", "w2").alias("ngram"), "freq",
                "f_left", "f_right")
    )


@_q("j4_semi_anti_labels", """
    SELECT 'ordered' AS label, count(*) AS cnt FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    UNION ALL
    SELECT 'never_ordered' AS label, count(*) AS cnt FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
""")
def j4_semi_anti_labels(spark, sf_dir):
    """J4 (label_generation.h:243-276): pool membership as left-semi /
    left-anti joins."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    keys = li.select(F.col("l_partkey").alias("p_partkey"))
    semi = p.join(keys, "p_partkey", "left_semi").agg(
        F.count(F.lit(1)).alias("cnt")).withColumn("label", F.lit("ordered"))
    anti = p.join(keys, "p_partkey", "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")).withColumn("label", F.lit("never_ordered"))
    return semi.unionByName(anti).select("label", "cnt")


@_q("j8_nation_revenue", """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
""")
def j8_nation_revenue(spark, sf_dir):
    """Multi-join chain (Q5-style): fact-to-dim broadcast joins."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    li, n = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@_q("q5_region_revenue", """
    SELECT r.r_name AS region,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_rows
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name
""")
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: a 4-hop dim chain (region→nation→customer) hangs
    off the fact via broadcast joins — the dims collapse to one broadcast
    stage, the fact scans once, and the final agg groups on 5 regions.
    Exercises Catalyst join reordering over the full star schema."""
    r, n = _t(spark, sf_dir, "region"), _t(spark, sf_dir, "nation")
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# Windows / sorts / top-k (W1-W5)
# ---------------------------------------------------------------------------

@_q("w1_rank_per_group", """
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
""")
def w1_rank_per_group(spark, sf_dir):
    """W1 (postprocessing.py:30-50): per-doc rank → row_number window."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                           F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@_q("w3_topk_tokens", """
    SELECT tok AS token, count(*) AS freq
    FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    WHERE tok <> '' GROUP BY tok
    ORDER BY freq DESC, token ASC LIMIT 10
""")
def w3_topk_tokens(spark, sf_dir):
    """W2/W3 (dump.h:284-299): quality sort + top-k
    (TakeOrderedAndProject — no full sort)."""
    return (
        a1_unigram_count(spark, sf_dir)
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(10)
    )


@_q("w4_lead_gaps", """
    SELECT event_type, count(*) AS n, round(avg(gap), 2) AS avg_gap
    FROM (
      SELECT event_type,
             floor(epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT
               - floor(epoch(ts))::BIGINT AS gap
      FROM events)
    WHERE gap IS NOT NULL GROUP BY event_type
""")
def w4_lead_gaps(spark, sf_dir):
    """W4 (lead/lag adjacency, feature_extraction.h:174-178 analog)."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.withColumn("gap", F.unix_timestamp(F.lead("ts").over(w))
                     - F.unix_timestamp("ts"))
        .filter(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("gap"), 2).alias("avg_gap"))
    )


@_q("w5_session_starts", """
    SELECT user_id, count(*) AS n_sessions FROM (
      SELECT user_id,
             floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT AS gap
      FROM events)
    WHERE gap IS NULL OR gap > 600 GROUP BY user_id
""")
def w5_session_starts(spark, sf_dir):
    """W5 (mention merge scan, postprocessing.py:158-179 analog): lag-based
    adjacency merge → session starts."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.withColumn("gap", F.unix_timestamp("ts")
                     - F.unix_timestamp(F.lag("ts").over(w)))
        .filter(F.col("gap").isNull() | (F.col("gap") > 600))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


# ---------------------------------------------------------------------------
# Set operations (SO2/SO4)
# ---------------------------------------------------------------------------

@_q("so2_except_users", """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
""")
def so2_except_users(spark, sf_dir):
    """SO2 (postprocessing.py:81-100 set diff)."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    errors = e.filter(F.col("event_type") == "error").select("user_id")
    return clicks.subtract(errors)  # EXCEPT = set semantics


@_q("so4_intersect_users", """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
""")
def so4_intersect_users(spark, sf_dir):
    """SO4 (utils.py:383 set intersection)."""
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


# ---------------------------------------------------------------------------
# Training-data pipeline ops: dedup / text analysis
# ---------------------------------------------------------------------------

@_q("dedup_exact", """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_cnt
    FROM documents GROUP BY md5(text)
""")
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy, keep lowest doc_id."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


@_q("text_quality_score", """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           round(len(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 4) AS avg_tok_len,
           round(len(list_filter(string_split(text, ' '),
                                 t -> t IN ('the','a','of','in','and'))) * 1.0
                 / len(string_split(text, ' ')), 4) AS stop_ratio
    FROM documents
""")
def text_quality_score(spark, sf_dir):
    """Quality scoring: token count, mean token length, stopword ratio."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stops = F.filter(toks, lambda t: t.isin("the", "a", "of", "in", "and"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(F.length(F.regexp_replace("text", " ", ""))
                / F.size(toks), 4).alias("avg_tok_len"),
        F.round(F.size(stops) / F.size(toks), 4).alias("stop_ratio"),
    )


@_q("lang_id_heuristic", """
    SELECT lang,
           CASE WHEN len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','of','in','and','is','to'))) > 0
                THEN 'en' ELSE 'other' END AS pred,
           count(*) AS cnt
    FROM documents GROUP BY 1, 2
""")
def lang_id_heuristic(spark, sf_dir):
    """Language-ID heuristic (stopword evidence) vs the labeled lang col."""
    d = _t(spark, sf_dir, "documents")
    stops = F.filter(F.split("text", " "),
                     lambda t: t.isin("the", "a", "of", "in", "and", "is", "to"))
    return (
        d.select("lang", F.when(F.size(stops) > 0, "en")
                 .otherwise("other").alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Extended operator catalog: dedup / similarity / text-stats / multimodal /
# relational SURVEY §2 rows register themselves on import.
from remine_spark import operators  # noqa: E402,F401
