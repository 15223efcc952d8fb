"""Shared LSH pair generation: ONE bucket aggregation instead of a
band-table self-join.

A self-join on the band rows executes the entire upstream signature plan
TWICE — Catalyst has no common-subplan reuse across join sides, so both
sides re-scan the corpus and re-run the signature kernel (md5-per-shingle /
Arrow sign-bucket), and the join shuffles the band table through two
exchanges. Grouping each bucket's members once replaces all of that with a
single exchange on the band key; the ordered pairs are generated JVM-side
from the per-bucket array.

Bucket cardinality is O(1) by construction — band-key bits are sized
~log2(N) (tests/test_band_width_scaling.py asserts candidates shrink ~2^Δ
as bits grow), so the per-bucket array and its O(k²) pair expansion stay
constant-sized as the corpus grows. A pathological giant bucket means
exact-duplicate territory — run dedup_exact first (see the scale notes in
operators/dedup.py).
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
    # unique per bucket, so payload fields never tie-break), hence pairing
    # each prefix element with xs[j] yields exactly the i < j pairs
    pairs = F.expr(
        "flatten(transform(sequence(2, size(xs)), j -> "
        "transform(slice(xs, 1, j - 1), x -> "
        "struct(x AS pa, element_at(xs, j) AS pb))))")
    return (buckets.select(F.explode(pairs).alias("p"))
            .select("p.pa", "p.pb"))
