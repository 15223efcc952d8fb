"""lm_perplexity semantics: a repetitive/templated document must score
strictly lower perplexity than a maximally diverse one under the
self-trained bigram LM, and every score must be finite and positive
(MLE on the training corpus itself can never hit a zero-probability
bigram). Cross-engine value equality is covered by the driver-replica
oracle harness (test_queries_oracle)."""

import math

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
