"""Shared LSH pair generation: ONE bucket aggregation instead of a
band-table self-join.

A self-join on the band rows executes the entire upstream signature plan
TWICE — Catalyst has no common-subplan reuse across join sides, so both
sides re-scan the corpus and re-run the signature kernel (md5-per-shingle /
Arrow sign-bucket), and the join shuffles the band table through two
exchanges. Grouping each bucket's members once replaces all of that with a
single exchange on the band key; the ordered pairs are generated JVM-side
as STREAMED rows (chained generators), never as one materialized O(k²)
array.

Hot buckets: band-key bits are sized ~log2(N) so RANDOM collisions stay
O(1) per bucket (tests/test_band_width_scaling.py asserts candidates shrink
~2^Δ as bits grow), but LSH deliberately concentrates near-duplicate
clusters — a templated web page with 100k near-identical copies lands its
whole cluster in one bucket, and dedup_exact does not remove near-dups.
The pair generator therefore must never hold a bucket's k(k-1)/2 pairs in
one value: the chained posexplode → prefix-slice explode below keeps
per-row state at O(k) (the sorted member array) and streams pairs out of
the generator, so a pathological bucket is throughput-bound, not
memory-bound. (An earlier formulation flattened all pairs into ONE array
value — 2 GB array-limit/OOM territory at ~65k members.) The remaining
single-task k² row cost for a true giant cluster is the operator's declared
semantics; pipelines should run dedup_exact first so only near-dup
(not identical) clusters reach the LSH stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucket_pairs(bands: DataFrame, keys: list[str], id_col: str,
                 payload: tuple[str, ...] = ()) -> DataFrame:
    """Candidate pairs from LSH band rows, one row per in-bucket ordered
    pair (by ``id_col``; ids are unique within a bucket — one band row per
    (id, band)). Returns struct columns ``pa``/``pb`` with fields
    ``i`` = id plus any ``payload`` columns; callers project and apply
    DISTINCT across bands."""
    member = F.struct(F.col(id_col).alias("i"),
                      *[F.col(c) for c in payload])
    buckets = (
        bands.groupBy(*[F.col(k) for k in keys])
        .agg(F.array_sort(F.collect_list(member)).alias("xs"))
        .filter(F.size("xs") >= 2)
    )
    # xs is sorted by id (struct order: i is the first field; ids are
    # unique per bucket, so payload fields never tie-break). Pairing each
    # element xs[j] (0-based j ≥ 1) with every element of its prefix
    # slice(xs, 1, j) yields exactly the i < j pairs. Both Generate nodes
    # pipeline in the same stage: rows stream out with O(k) per-row state
    # (see module docstring — never one O(k²) array value per bucket).
    return (
        buckets.select("xs", F.posexplode("xs").alias("j", "pb"))
        .filter(F.col("j") >= 1)
        .select(F.explode(F.expr("slice(xs, 1, j)")).alias("pa"), "pb")
    )
