"""Scale-parameterized LSH band widths: candidate-pair counts must shrink
~2^Δbits as the per-band key widens (the r2 fixed 4-/8-bit band keys made
the band self-joins O(N²/2^bits) — a constant that cannot survive a 100×
corpus). Both gates (simhash bands, embedding sign-bit bands) take width
parameters, and their DuckDB oracles are generated from the same constants
(tests/test_queries_oracle.py covers value parity)."""

from remine_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.01"


def test_near_dup_candidates_shrink_with_band_bits(spark):
    # 2 bands throughout; band key grows 4 bits → 8 bits. Random
    # collisions drop ~2^4; true near-dups put a floor under the ratio,
    # so assert a conservative ≥6x.
    narrow = similarity.near_dup_candidates(
        spark, SF, n_planes=8, n_bands=2).count()
    wide = similarity.near_dup_candidates(
        spark, SF, n_planes=16, n_bands=2).count()
    assert wide > 0
    assert narrow / wide >= 6, (narrow, wide)


def test_simhash_candidates_shrink_with_band_bits(spark):
    # 4 bands throughout; band key grows 8 bits (32-bit fingerprint) →
    # 15 bits (60-bit fingerprint).
    narrow = dedup.simhash_band_candidates(
        spark, SF, nbits=32, n_bands=4).count()
    wide = dedup.simhash_band_candidates(
        spark, SF, nbits=60, n_bands=4).count()
    assert wide > 0
    assert narrow / wide >= 6, (narrow, wide)


def test_defaults_are_at_least_8_bits_per_band():
    assert similarity.ND_PLANES // similarity.ND_BANDS >= 8
    assert dedup.SIM_BAND_BITS >= 8


def test_bucket_kernel_bit_identical_to_hof(spark):
    # ann_lsh_* and near_dup compute sign buckets with the Arrow kernel;
    # _bucket_spark is the reference HOF fold. The kernel's cumsum uses the
    # same left-to-right rounding chain, so buckets must match bit-for-bit
    # at every plane count in use.
    from pyspark.sql import functions as F

    from remine_spark.catalog import table

    emb = table(spark, SF, "embeddings")
    v = emb.select("vec_id", F.expr(similarity._V_SPARK).alias("v"))
    for planes in (8, 16):
        hof = v.select("vec_id",
                       F.expr(similarity._bucket_spark(planes)).alias("b1"))
        ker = v.select("vec_id",
                       similarity._bucket_udf(planes)(F.col("v")).alias("b2"))
        assert hof.join(ker, "vec_id").filter("b1 <> b2").count() == 0
