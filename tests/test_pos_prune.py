"""P2 POS-tag prune (pruneByPOSTag, frequent_pattern_mining.h:222-234,
opt-in like the reference's ENABLE_POS_PRUNE): multi-grams whose LAST tag
is a forbidden expansion are pruned; unigrams only when their tag is
forbidden as both initial and expansion."""

from remine_spark import mining, nlp


def _sents(spark):
    toks = ["acme", "acquired", "globex", "in", "gotham", "."]
    rows = [(d, 0, toks, nlp.pos_tag(toks)) for d in range(12)]
    return spark.createDataFrame(
        rows, "doc_id long, sent_id int, tokens array<string>, "
              "pos array<string>")


def test_pos_prune_drops_trailing_in(spark):
    sents = _sents(spark)
    base = {r.ngram_key for r in
            mining.mine_patterns(sents, min_sup=2, max_len=3).collect()}
    assert "globex in" in base and "in" in base

    pruned = {r.ngram_key for r in mining.mine_patterns(
        sents, min_sup=2, max_len=3,
        pos_prune=(set(), {"IN"})).collect()}
    # multi-grams ending in IN gone; 'in' unigram stays (IN not in
    # no_initial), everything else untouched
    assert "globex in" not in pruned and "acquired globex in" not in pruned
    assert "in" in pruned
    assert "acme acquired" in pruned

    both = {r.ngram_key for r in mining.mine_patterns(
        sents, min_sup=2, max_len=3,
        pos_prune=({"IN"}, {"IN"})).collect()}
    assert "in" not in both
