"""lm_perplexity semantics: a repetitive/templated document must score
strictly lower perplexity than a maximally diverse one under the
self-trained bigram LM, and every score must be finite and positive
(MLE on the training corpus itself can never hit a zero-probability
bigram). Cross-engine value equality is covered by the driver-replica
oracle harness (test_queries_oracle)."""

import math

from pyspark.sql import functions as F

from remine_spark.operators.textstats import lm_perplexity

SF = "/root/testdata/sf0.01"


def test_templated_beats_soup(spark, tmp_path):
    # 20 identical templated docs vs one doc that spreads the shared
    # prefix 'the' across 60 one-off continuations. (A doc of all-unique
    # bigrams would NOT work: each prefix then has exactly one observed
    # continuation, so self-MLE scores it P=1 — the LM rates prefix
    # AMBIGUITY, which is why the high-ppl tail catches token soup only
    # when it reuses common words with uncommon continuations.)
    rows = [(i, "the quick brown fox jumps over the lazy dog " * 5)
            for i in range(20)]
    rows.append((99, " ".join(f"the w{i}" for i in range(60))))
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in lm_perplexity(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(20)) | {99}
    for r in got.values():
        assert r.n_bigrams >= 1
        assert math.isfinite(r.ppl) and r.ppl >= 1.0
        assert math.isfinite(r.nll_per_token) and r.nll_per_token >= 0.0
    # the templated cluster dominates the LM -> near-certain bigrams;
    # the spread doc pays ~ln(c1('the')) on every other bigram
    assert got[0].ppl < got[99].ppl
    assert got[99].ppl > 5 * got[0].ppl


def test_short_docs_excluded(spark, tmp_path):
    rows = [(1, "one"), (2, ""), (3, "two words")]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = lm_perplexity(spark, str(tmp_path)).collect()
    assert [r.doc_id for r in got] == [3]
    # a 2-token doc whose single bigram is the whole LM: P = 1, ppl = 1
    assert got[0].ppl == 1.0 and got[0].nll_per_token == 0.0


def test_pack_token_budget_invariants(spark, tmp_path):
    from remine_spark.operators.textstats import PACK_BUDGET, pack_token_budget
    # doc sizes chosen to cross shard boundaries: 3000+2000 crosses 4096
    sizes = [3000, 2000, 100, 0, 1500, 4096, 7]
    rows = [(i, " ".join("w" for _ in range(n))) for i, n in enumerate(sizes)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = sorted(pack_token_budget(spark, str(tmp_path)).collect(),
                 key=lambda r: r.doc_id)
    # exclusive prefix sum in doc_id order
    off = 0
    for r, n in zip(got, sizes):
        assert r.n_tokens == n
        assert r.t_offset == off
        assert r.shard_id == off // PACK_BUDGET
        assert r.shard_off == off % PACK_BUDGET
        expect_spans = n > 0 and (off + n - 1) // PACK_BUDGET > off // PACK_BUDGET
        assert r.spans_shards == expect_spans, (r.doc_id, off, n)
        off += n
    # doc 1 (2000 tokens starting at 3000) crosses the first boundary
    assert got[1].spans_shards is True
    assert got[3].spans_shards is False  # empty doc never spans


def test_prefix_sum_matches_across_partition_counts(spark, tmp_path):
    """The distributed prefix sum must be partitioning-invariant."""
    from remine_spark.operators.textstats import _prefix_sum
    df = spark.range(0, 997).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v"))
    a = {r.k: r.s for r in _prefix_sum(df, "k", "v", "s", n_parts=1).collect()}
    b = {r.k: r.s for r in _prefix_sum(df, "k", "v", "s", n_parts=8).collect()}
    assert a == b
    assert a[0] == 0 and a[996] == sum(i % 13 for i in range(996))


def test_sample_stratified_deterministic_rates(spark, tmp_path):
    from remine_spark.operators.textstats import (
        SAMPLE_RATE_DEFAULT, SAMPLE_RATES, sample_stratified)
    rows = [(i, "x", lang) for i, lang in
            enumerate(["en"] * 400 + ["de"] * 200 + ["xx"] * 100)]
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    a = {r.lang: r.n_sampled for r in
         sample_stratified(spark, str(tmp_path)).collect()}
    b = {r.lang: r.n_sampled for r in
         sample_stratified(spark, str(tmp_path)).collect()}
    assert a == b  # hash-determined, not RNG
    # md5 buckets are uniform-ish: expect ~rate% per stratum (loose 3-sigma)
    assert abs(a["en"] - 400 * SAMPLE_RATES["en"] / 100) < 75
    assert abs(a["de"] - 200 * SAMPLE_RATES["de"] / 100) < 45
    assert a["xx"] == 100 * SAMPLE_RATE_DEFAULT // 100  # default keeps all


def test_contamination_check_planted(spark, tmp_path):
    from remine_spark.operators.textstats import (
        CONTAM_EVAL_MAX_ID, contamination_check)
    eval_text = " ".join(f"e{i}" for i in range(20))   # a 20-token "prompt"
    filler = " ".join(f"f{i}" for i in range(200))
    rows = [
        (1, eval_text),                                # eval doc
        (CONTAM_EVAL_MAX_ID + 1, filler + " " + eval_text + " " + filler),
        (CONTAM_EVAL_MAX_ID + 2, filler),              # clean train doc
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {(r.train_id, r.eval_id): r.shared_shingles
           for r in contamination_check(spark, str(tmp_path)).collect()}
    # the planted doc shares all 13 distinct 8-gram shingles of the prompt
    assert got == {(CONTAM_EVAL_MAX_ID + 1, 1): 13}
