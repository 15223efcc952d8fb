"""Frequent contiguous n-gram (pattern) mining — pure DataFrame/Catalyst.

Reference: frequent_pattern_mining.h:260-435 mines length-k patterns
iteratively (Apriori) with thread-local hash maps. At Spark scale the
equivalent with identical post-MIN_SUP semantics is a single explode of all
within-sentence n-grams (≤ max_len) into one shuffle-parallel hash
aggregation — partial (map-side) + final aggregation replaces the mutex-striped
counter merging (frequent_pattern_mining.h:193-219, 354-390). Sentence
boundaries are respected by construction (n-grams are generated inside the
per-sentence array row, mirroring isEndOfSentence pruning at
frequent_pattern_mining.h:364,411).

Punctuation-crossing multi-grams are pruned pre-aggregation: GetPuncCost
(segmentation.h:355-358) makes them -INF at segmentation time, so counting
them would be wasted shuffle volume. Catalyst pushes this filter below the
explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .nlp import LEXICON, PUNC

MIN_SUP = 10      # phrase_extraction.sh:3 (compiled default 30, parameters.h:58)
MAX_LEN = 6       # frequent_pattern_mining.h:260 mine cap


def _pos_key_expr(ngram_key_col: str):
    """POS key of a space-joined n-gram as a pure Spark expression — the
    tagger (nlp.pos_tag) is a context-free per-token dictionary + suffix
    map, so it transliterates 1:1 into a map lookup + CASE chain (same
    rule order: punctuation, lexicon, digit, -ed, -ing, -s, NN default).
    JVM-side: no python worker in the patterns checkpoint write path."""
    items = []
    for p in sorted(PUNC):
        items += [F.lit(p), F.lit(".")]
    for w, t in sorted(LEXICON.items()):
        items += [F.lit(w), F.lit(t)]
    lex = F.create_map(*items)

    def tag(t):
        return F.coalesce(
            F.element_at(lex, t),
            F.when(t.rlike("^[0-9]+$"), "CD")
            .when((F.length(t) > 4) & t.endswith("ed"), "VBD")
            .when((F.length(t) > 4) & t.endswith("ing"), "VBG")
            .when(t.endswith("s") & (F.length(t) > 3), "NNS")
            .otherwise("NN"))

    return F.array_join(
        F.transform(F.split(F.col(ngram_key_col), " "), tag), " ")


def ngram_candidates(sentences: DataFrame, max_len: int = MAX_LEN) -> DataFrame:
    """Explode every within-sentence n-gram, 1 ≤ n ≤ max_len.

    Output: (doc_id, sent_id, start, n, ngram ARRAY<STRING>, pos_key STRING).
    """
    gen = F.expr(
        f"""
        flatten(transform(sequence(0, size(tokens)-1), i ->
          transform(sequence(1, least({int(max_len)}, size(tokens)-i)), n ->
            struct(i AS start, n AS n,
                   slice(tokens, i+1, n) AS ngram,
                   array_join(slice(pos, i+1, n), ' ') AS pos_key))))
        """
    )
    punc_lit = F.array(*[F.lit(p) for p in sorted(PUNC)])
    return (
        sentences
        .select("doc_id", "sent_id", F.explode(gen).alias("g"))
        .select("doc_id", "sent_id", "g.start", "g.n", "g.ngram", "g.pos_key")
        .filter(F.size(F.array_intersect(F.col("ngram"), punc_lit)) == 0)
    )


def mine_patterns(
    sentences: DataFrame, min_sup: int = MIN_SUP, max_len: int = MAX_LEN,
    pos_prune: tuple[set, set] | None = None,
) -> DataFrame:
    """patterns(ngram, ngram_key, n, freq, pos_key) with freq ≥ min_sup.

    One shuffle (hash agg). The candidate stream carries ONE string per
    n-gram — the space-joined ngram_key. Punctuation handling is moved
    BEFORE generation: each sentence's token array splits into punc-free
    segments (every PUNC token tags '.', so segment boundaries are the
    positions where pos = '.'), and n-grams are generated inside segments
    only. The r2 formulation generated (ngram_key, pos_key) struct pairs
    for ALL n-grams and filtered punc-crossers afterwards — carrying a
    second string through the 6×-corpus explode purely to drive the
    filter; this stage is memory-bandwidth-bound at high core counts
    (BENCH r2: 1.38× for 8→32 cores), so halving the exploded bytes is
    the direct scaling lever. The array form (ngram) and pos_key are
    rebuilt on the min_sup survivors only (the tagger is context-free,
    so survivor-side tagging is occurrence-identical).

    The opt-in ``pos_prune`` path keeps the pos-carrying stream (its
    predicate needs per-position tags).
    """
    if pos_prune is None:
        bnds = (
            "concat(array(0), "
            "filter(sequence(1, size(pos)), i -> element_at(pos, i) = '.'), "
            "array(size(tokens) + 1))"
        )
        segs = (
            f"filter(transform(sequence(1, size(bnds) - 1), k -> "
            f"slice(tokens, element_at(bnds, k) + 1, "
            f"element_at(bnds, k + 1) - element_at(bnds, k) - 1)), "
            f"s -> size(s) > 0)"
        )
        # Candidate generation is codegen-friendly on purpose: posexplode
        # the segment to token rows, then emit the ≤max_len n-grams
        # starting at each position as gated concat_ws(slice(...)) — all
        # whole-stage-codegen expressions. The previous formulation
        # (nested transform/flatten/array_join higher-order functions)
        # evaluated INTERPRETED per sentence and allocated Catalyst
        # objects per candidate; measured at 1M docs it was the pipeline's
        # worst scaler (explode alone 21.7 s @8 cores, 1.07× speedup
        # 8→32 — allocation-bound, not CPU-bound). This shape: 12.8 s @8
        # and the full mine (explode + agg) 6.8 s @32 on the same input.
        starts = [F.when(F.col("i") + k <= F.size("seg"),
                         F.concat_ws(" ", F.slice("seg", F.col("i") + 1, k)))
                  for k in range(1, int(max_len) + 1)]
        cand = (
            sentences
            .filter(F.expr("size(tokens) > 0"))
            .select(F.expr(bnds).alias("bnds"), "tokens")
            .select(F.explode(F.expr(segs)).alias("seg"))
            .select("seg", F.posexplode("seg").alias("i", "tok"))
            .select(F.explode(F.array(*starts)).alias("ngram_key"))
            .filter(F.col("ngram_key").isNotNull())
        )
    else:
        gen_pos = F.expr(
            f"""
            flatten(transform(sequence(0, size(tokens)-1), i ->
              transform(sequence(1, least({int(max_len)}, size(tokens)-i)), n ->
                struct(array_join(slice(tokens, i+1, n), ' ') AS ngram_key,
                       array_join(slice(pos, i+1, n), ' ') AS pos_key))))
            """
        )
        cand = (
            sentences
            .select(F.explode(gen_pos).alias("g"))
            .select("g.ngram_key", "g.pos_key")
            .filter(F.expr("instr(concat(' ', pos_key, ' '), ' . ') = 0"))
        )
    if pos_prune is not None:
        # P2 (pruneByPOSTag, frequent_pattern_mining.h:223-234; opt-in —
        # ENABLE_POS_PRUNE is off by default in the reference). The
        # reference prunes at every Apriori step: a unigram occurrence is
        # dropped when its tag is forbidden as BOTH initial and expansion
        # (:226), and an extension is dropped when the NEW token's tag is
        # a forbidden expansion (:229, applied at frequent_pattern_mining.h
        # :350-375 for every length). Net pattern-set semantics with a
        # context-free tagger: a candidate survives iff its FIRST tag is
        # not forbidden-as-both (patterns can never start at a pruned
        # unigram occurrence) and NO tag after position 0 is a forbidden
        # expansion. One scan-side predicate on the POS key, applied
        # before the aggregation so pruned candidates never shuffle.
        no_initial, no_expansion = pos_prune
        both = sorted(set(no_initial) & set(no_expansion))
        tags = F.split("pos_key", " ")
        first_hit = (F.element_at(tags, 1).isin(*both)
                     if both else F.lit(False))
        tail_hit = (
            F.exists(F.slice(tags, F.lit(2), F.size(tags)),
                     lambda t: t.isin(*sorted(no_expansion)))
            if no_expansion else F.lit(False))
        cand = cand.filter(~(first_hit | tail_hit))
    survivors = (
        cand
        .groupBy("ngram_key")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_sup)
    )
    # pos_key is re-derived on the bounded survivor set: the tagger is
    # context-free (nlp.pos_tag is a per-token map), so tagging the ngram
    # directly is identical to any occurrence slice — and not carrying a
    # second string through the 6x-corpus aggregation (nor a min() string
    # buffer per key) nearly halves the stage's shuffle and hashmap cost.
    return survivors.select(
        F.split("ngram_key", " ").alias("ngram"),
        "freq",
        _pos_key_expr("ngram_key").alias("pos_key"),
        F.size(F.split("ngram_key", " ")).alias("n"),
        "ngram_key",
    )


def boost_patterns(sentences: DataFrame, max_len: int = MAX_LEN) -> DataFrame:
    """M14 candidates: NP/DATE chunk spans (preprocessing.py:32-71 grammar,
    re-expressed in nlp.boost_chunk_spans). Output: (ngram, pos_key,
    boost_freq) — the observed chunk frequency, later floored to MIN_SUP
    on union.

    When the sentences table carries the stage-1 ``chunk_a``/``chunk_b``
    span columns (corpus.sentences_from_pages computes them inside the
    SAME python NLP pass that tags the corpus), this is a pure JVM
    explode + slice + agg — no second python corpus scan. The
    mapInPandas fallback below covers ad-hoc sentences tables built
    without those columns.

    Surface filter mirrors preprocessing.py:64 ('www'/'.com' excluded);
    span length capped at the loadExternalPatterns LENGTH_THRESHOLD
    (frequent_pattern_mining.h:244,251)."""
    if "chunk_a" in sentences.columns:
        spans = (
            sentences.filter(F.col("chunk_a").isNotNull())
            .select(
                "tokens", "pos",
                F.explode(F.arrays_zip("chunk_a", "chunk_b")).alias("s"))
            .select("tokens", "pos", F.col("s.chunk_a").alias("a"),
                    F.col("s.chunk_b").alias("b"))
            .filter(F.col("b") - F.col("a") <= max_len)
            .select(
                F.expr("slice(tokens, a + 1, b - a)").alias("ngram"),
                F.concat_ws(" ", F.expr("slice(pos, a + 1, b - a)"))
                .alias("pos_key"))
            .withColumn("surf", F.concat_ws(" ", "ngram"))
            .filter(~F.col("surf").contains("www")
                    & ~F.col("surf").contains(".com"))
            .drop("surf")
        )
        # Rows with NULL chunk columns (a resumed pre-chunk-upgrade
        # sentences checkpoint is re-read with the new schema, so the
        # columns exist but are null) would otherwise contribute ZERO
        # spans — M14 boost patterns silently vanishing. Route exactly
        # those rows through the python span generator; the null filter
        # pushes to the scan, so on a current-schema corpus this leg
        # receives no rows.
        null_rows = sentences.filter(F.col("chunk_a").isNull())
        spans = spans.unionByName(_py_chunk_spans(null_rows, max_len))
        return spans.groupBy("ngram").agg(
            F.count(F.lit(1)).alias("boost_freq"),
            F.min("pos_key").alias("pos_key"))

    return _py_chunk_spans(sentences, max_len).groupBy("ngram").agg(
        F.count(F.lit(1)).alias("boost_freq"),
        F.min("pos_key").alias("pos_key"))


def _py_chunk_spans(sentences: DataFrame, max_len: int) -> DataFrame:
    """mapInPandas chunk-span generator: (ngram, pos_key) rows for
    sentences tables without (or with null) stage-1 chunk columns."""
    import pandas as pd

    from .nlp import boost_chunk_spans

    def gen(batches):
        for pdf in batches:
            ngrams, keys = [], []
            for toks, tags in zip(pdf["tokens"], pdf["pos"]):
                toks, tags = list(toks), list(tags)
                for (a, b) in boost_chunk_spans(tags):
                    if b - a > max_len:
                        continue
                    surf = " ".join(toks[a:b])
                    if "www" in surf or ".com" in surf:
                        continue
                    ngrams.append(toks[a:b])
                    keys.append(" ".join(tags[a:b]))
            # explicit object dtype: an empty batch otherwise yields
            # float64 columns that Arrow cannot cast to list<string>
            yield pd.DataFrame({
                "ngram": pd.Series(ngrams, dtype="object"),
                "pos_key": pd.Series(keys, dtype="object"),
            })

    return sentences.select("tokens", "pos").mapInPandas(
        gen, schema="ngram array<string>, pos_key string")


def mine_patterns_boosted(
    sentences: DataFrame, min_sup: int = MIN_SUP, max_len: int = MAX_LEN,
    _persisted: list | None = None, eager: bool = True,
) -> DataFrame:
    """M14 (frequent_pattern_mining.h:236-258 loadExternalPatterns): union
    chunk-boost patterns into the mined table. A boost pattern already
    mined keeps its true frequency; a new one (i.e. below min_sup) enters
    with freq = min_sup exactly as the reference floors currentFreq to
    MIN_SUP — this is what lets legitimate tail NP entities become
    mentions. The anti-join's build side is the boost table (small);
    Catalyst broadcasts it.

    The mined table feeds BOTH the union and the anti-join — without
    materialization the full corpus explode-agg (the pipeline's most
    expensive JVM stage) would execute twice, so the min_sup survivors
    (bounded, ~100k rows at 1M docs) are persisted and forced once.
    Callers that want to release that persist when the downstream stage
    has materialized pass ``_persisted`` — the cached survivor table is
    appended to it (run_pipeline unpersists after the patterns
    checkpoint; ad-hoc callers may let it die with the session).

    ``is_boost`` marks the externally-injected rows: the reference
    zero-fills every occurrence-derived feature for external patterns
    (id >= id2ends.size() guards in extractStatistical /
    extractPunctuation, feature_extraction.h:210,255,394-400), so the
    classifier needs to know which rows those are.

    ``eager=False`` skips the persist + force — for callers that only
    need the PLAN (e.g. run_pipeline deriving the checkpoint schema on a
    resume hit, where the result is never executed)."""
    from pyspark import StorageLevel

    mined = mine_patterns(sentences, min_sup, max_len)
    if eager:
        mined = mined.persist(StorageLevel.MEMORY_AND_DISK)
        mined.count()
        if _persisted is not None:
            _persisted.append(mined)
    extra = (
        boost_patterns(sentences, max_len)
        .join(mined.select("ngram"), "ngram", "left_anti")
        .select(
            "ngram",
            F.lit(min_sup).cast("long").alias("freq"),
            "pos_key",
            F.size("ngram").alias("n"),
            F.array_join("ngram", " ").alias("ngram_key"),
        )
    )
    return (mined.withColumn("is_boost", F.lit(False))
            .unionByName(extra.withColumn("is_boost", F.lit(True))))


def unigram_counts(sentences: DataFrame) -> DataFrame:
    """A1 (frequent_pattern_mining.h:303-319): token → corpus count."""
    return (
        sentences.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def idf(sentences: DataFrame) -> DataFrame:
    """A3 (documents.h:300-309): idf = log(total_docs / doc_freq + EPS).

    The doc-count denominator rides the same job as a broadcast 1-row
    cross join (no separate count action). countDistinct shuffles once; at
    10^12-doc scale swap for approx_count_distinct — semantics of
    downstream features tolerate it.
    """
    n1 = (sentences.agg(F.count_distinct("doc_id").cast("double")
                        .alias("n_docs")))
    return (
        sentences.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n1))
        .withColumn("idf", F.log(F.col("n_docs") / F.col("df") + F.lit(1e-8)))
        .drop("n_docs")
    )


def occurrences(sentences: DataFrame, patterns: DataFrame,
                max_len: int = MAX_LEN) -> DataFrame:
    """id2ends equivalent (frequent_pattern_mining.h:149-152) as a real
    table: every (doc_id, sent_id, start, end_pos) of a surviving pattern.
    Semi-join against the mined patterns prunes the candidate stream."""
    cands = ngram_candidates(sentences, max_len)
    return (
        cands.join(patterns.select("ngram"), "ngram", "left_semi")
        .withColumn("end_pos", F.col("start") + F.col("n") - 1)
    )
