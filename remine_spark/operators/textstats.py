"""Text-analysis operators over ``documents``: token counting (whitespace +
BPE-ish regex) and document fingerprinting (winnowing-style selection over
char-8-gram hashes).

Language-ID and quality scoring live in remine_spark.queries
(lang_id_heuristic, text_quality_score); together these four cover the
text-analysis block of a training-data pipeline.

Scale notes: both operators are pure scan-side array expressions — no
shuffle at all except the final write; they run inside whole-stage codegen
and cost O(chars) per document.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from remine_spark.catalog import h32_duck, h32_spark, query, table

# One "word" per letter-run, digit-run, or single non-alnum char — the same
# pre-tokenization regex family BPE tokenizers (GPT-2 style) apply before
# merges; ~1.3 subword inflation is the standard planning estimate.
_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"
_BPE_INFLATION = 1.3

GRAM = 8          # fingerprint char n-gram width
MOD_P = 16        # winnowing mod-p selection: keep hashes ≡ 0 (mod 16)


@query("token_count", f"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
           len(regexp_extract_all(text, '{_RE}')) AS re_tokens,
           CAST(ceil(len(regexp_extract_all(text, '{_RE}')) * {_BPE_INFLATION})
                AS BIGINT) AS est_bpe_tokens
    FROM documents
""")
def token_count(spark, sf_dir):
    """Token counting: whitespace tokens, regex pre-tokens, and a BPE token
    estimate (regex pre-tokens × 1.3). All codegen'd scan-side exprs."""
    d = table(spark, sf_dir, "documents")
    re_toks = F.expr(f"size(regexp_extract_all(text, '{_RE}', 0))")
    return d.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), x -> x != ''))").alias("ws_tokens"),
        re_toks.alias("re_tokens"),
        F.ceil(re_toks * _BPE_INFLATION).cast("bigint").alias("est_bpe_tokens"),
    )


@query("doc_fingerprint", f"""
    WITH g AS (SELECT doc_id,
                      list_filter(
                          list_transform(range(1, len(text) - {GRAM - 2}),
                              i -> {h32_duck(f"substr(text, CAST(i AS INT), {GRAM})")}),
                          h -> h % {MOD_P} = 0) AS fps
               FROM documents WHERE len(text) >= {GRAM})
    SELECT doc_id,
           len(list_distinct(fps)) AS n_fp,
           CAST(list_min(fps) AS BIGINT) AS min_fp
    FROM g
""")
def doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: rolling char-8-gram hashes, winnowing-style
    mod-p selection (keep h ≡ 0 mod 16). n_fp is the sketch size; min_fp a
    stable per-doc signature. Two docs sharing content share fingerprints —
    joinable for plagiarism/containment detection (groupBy fp → doc lists)."""
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= GRAM)
    fps = F.expr(
        f"filter(transform(sequence(1, length(text) - {GRAM - 1}), "
        f"i -> {h32_spark(f'substr(text, cast(i as int), {GRAM})')}), "
        f"h -> h % {MOD_P} = 0)")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(fps)).alias("n_fp"),
        F.array_min(fps).cast("bigint").alias("min_fp"),
    )
