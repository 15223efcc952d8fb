"""M1-M5 as a real distributed classifier: feature extraction, DPDN
labeling, and a pyspark.ml RandomForest phrase-quality model.

The reference trains a 1000-tree extremely-randomized forest
(random_forest.h:108-290) on distant-supervision labels
(label_generation.h:215-293, method "DPDN": Distant Positive + Distant
Negative) over 25 engineered features (feature_extraction.h:363-408).
Its seeding is time(0) (label_generation.h:88), so exact replication is
impossible by construction; this module reproduces the *pipeline*: pools →
labels → features → seeded RF → per-pattern (indicator, quality) with the
verbatim unigram POS overrides (predict_quality.h:143-155).

The deterministic rule table in model.assign_quality remains the default
quality source (round-1 parity rationale in model.py); `assign_quality_ml`
is the drop-in alternative — downstream EM/Viterbi and the mirror-parity
gate consume only the (indicator, quality) contract, so both sources pass
the same end-to-end checks.

Scale notes: labeling is two broadcast semi-joins (pools are small);
features are pure column expressions; the RF trains on the pattern table
(≤ millions of rows — bounded by MIN_SUP, tiny next to the corpus) and is
broadcast for scoring, exactly how the reference ships its forest to
segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LABEL_BP, LABEL_EP, LABEL_RP = 0, 1, 2
POOL_MIN_FREQ = 1  # utils.py:41 uses >9 on a 60k-doc corpus; scaled fixture


def distant_pools(gold: list[tuple]) -> tuple[set[str], set[str]]:
    """A9 (utils.py:27-44, 50-111): entity / relation surface pools from
    gold annotations ('_'-joined canonical forms → space-joined surfaces)."""
    ents: dict[str, int] = {}
    rels: dict[str, int] = {}
    for (_url, s, p, o) in gold:
        for e in (s, o):
            k = e.replace("_", " ")
            ents[k] = ents.get(k, 0) + 1
        k = p.replace("_", " ")
        rels[k] = rels.get(k, 0) + 1
    return ({k for k, c in ents.items() if c >= POOL_MIN_FREQ},
            {k for k, c in rels.items() if c >= POOL_MIN_FREQ})


def label_patterns(patterns: DataFrame, ent_pool: set[str],
                   rel_pool: set[str]) -> DataFrame:
    """M3/J4 (label_generation.h:215-293, DPDN): distant positive from the
    pools, distant negative otherwise. Pool membership is `isin` over the
    space-joined surface (a broadcast semi-join in plan terms)."""
    surface = F.array_join("ngram", " ")
    return patterns.withColumn(
        "label",
        F.when(surface.isin(*sorted(ent_pool)) if ent_pool else F.lit(False),
               LABEL_EP)
        .when(surface.isin(*sorted(rel_pool)) if rel_pool else F.lit(False),
              LABEL_RP)
        .otherwise(LABEL_BP))


_NOUN = "^(NN|NNS|NNP|NNPS)$"
_VERB = "^VB"
_STOPS = ("the", "a", "of", "in", "and", "is", "to")


def featurize(patterns: DataFrame) -> DataFrame:
    """M1/M2: engineered per-pattern features as pure column expressions
    (the reference's statistical/POS-ratio feature families,
    feature_extraction.h:371-380 / 501-506)."""
    tags = F.split("pos_key", " ")
    toks = F.col("ngram")
    nf = F.size(F.filter(tags, lambda t: t.rlike(_NOUN))) / F.size(tags)
    vf = F.size(F.filter(tags, lambda t: t.rlike(_VERB))) / F.size(tags)
    pf = F.size(F.filter(tags, lambda t: t.isin("NNP", "NNPS"))) / F.size(tags)
    sf = F.size(F.filter(toks, lambda t: t.isin(*_STOPS))) / F.size(toks)
    return patterns.select(
        "*",
        F.log(F.col("freq") + 1).alias("f_logfreq"),
        F.col("n").cast("double").alias("f_len"),
        nf.alias("f_noun_ratio"),
        vf.alias("f_verb_ratio"),
        pf.alias("f_propn_ratio"),
        sf.alias("f_stop_ratio"),
        F.element_at(tags, 1).rlike(_NOUN).cast("double").alias("f_first_noun"),
        F.element_at(tags, -1).rlike(_NOUN).cast("double").alias("f_last_noun"),
        F.element_at(tags, 1).rlike(_VERB).cast("double").alias("f_first_verb"),
        F.expr("cast(array_contains(split(pos_key, ' '), 'IN') as double)")
        .alias("f_has_in"),
    )


FEATURES = ["f_logfreq", "f_len", "f_noun_ratio", "f_verb_ratio",
            "f_propn_ratio", "f_stop_ratio", "f_first_noun", "f_last_noun",
            "f_first_verb", "f_has_in"]


def fit_quality_forest(patterns: DataFrame, ent_pool: set[str],
                       rel_pool: set[str], num_trees: int = 100,
                       seed: int = 42):
    """M4 (random_forest.h:108-290 contract): seeded pyspark.ml
    RandomForest on DPDN-labeled, featurized patterns. 100 trees (not the
    reference's 1000 — its forest is extremely-randomized with 4 feature ×
    4 split candidates, so trees are individually much weaker)."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    labeled = featurize(label_patterns(patterns, ent_pool, rel_pool))
    asm = VectorAssembler(inputCols=FEATURES, outputCol="features")
    rf = RandomForestClassifier(
        labelCol="label", featuresCol="features", numTrees=num_trees,
        maxDepth=8, seed=seed)
    train = asm.transform(labeled)
    return rf.fit(train), asm


def assign_quality_ml(patterns: DataFrame, rf_model, assembler) -> DataFrame:
    """M5 (predict_quality.h:12-82): indicator = argmax class, quality =
    probability of that class; unigram POS overrides verbatim
    (predict_quality.h:143-155). Scoring is JVM-side (pyspark.ml broadcast
    model), no python in the loop."""
    from pyspark.ml.functions import vector_to_array

    scored = rf_model.transform(assembler.transform(featurize(patterns)))
    probs = vector_to_array("probability")
    pred = F.col("prediction").cast("int")
    ind = (F.when(pred == LABEL_EP, "EP")
           .when(pred == LABEL_RP, "RP").otherwise("BP"))
    quality = F.element_at(probs, pred + 1)
    pk = F.col("pos_key")
    multi = F.col("n") > 1
    # unigram overrides, verbatim from predict_quality.h:143-155
    ind = (F.when(~multi & pk.rlike("^VB"), "RP")
           .when(~multi & pk.isin("IN", "TO", "RP"), "RP")
           .when(~multi & pk.isin("PRP", "PRP$"), "EP")
           .otherwise(ind))
    quality = (F.when(~multi & (pk.rlike("^VB")
                                | pk.isin("IN", "TO", "RP", "PRP", "PRP$")),
                      F.lit(1.0)).otherwise(quality))
    return (scored.withColumn("indicator", ind)
            .withColumn("quality", quality)
            .drop("features", "rawPrediction", "probability", "prediction",
                  "label", *FEATURES))
