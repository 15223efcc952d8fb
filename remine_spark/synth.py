"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Produces the exact input-table shape from BASELINE.json's input_hint:
``pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``.

The corpus is grammar-generated so that (a) the deterministic parser in
:mod:`remine_spark.nlp` is exact on it, (b) analytic gold triples are known
for evaluation (the reference's eval corpus ``data/nyt/test.*`` plays this
role for the C++ pipeline), and (c) entity frequencies are Zipfian —
exercising the head-entity skew the sink salting must defuse.

`html` wraps `text` with a fixed template so the extractor's byte-identical
invariant (input_hint) is a real, testable contract: extract(html) == text.
"""

from __future__ import annotations

import datetime as _dt
import random

from .nlp import _NN_WORDS, _VBD_WORDS

# Multi-token org/person entities and single-token locations, drawn from the
# NNP lexicon in nlp.py so tagging is exact.
ORGS: list[tuple[str, ...]] = [
    ("acme",), ("globex",), ("initech",), ("umbrella",), ("stark",),
    ("wayne",), ("oscorp",), ("cyberdyne",), ("tyrell",), ("weyland",),
    ("aperture",), ("hooli",), ("vandelay",), ("wonka",), ("duff",),
    ("massive", "dynamic"), ("dunder", "mifflin"), ("sterling", "cooper"),
    ("pied", "piper"), ("spacely", "sprockets"), ("stark", "initech"),
    ("wayne", "globex"), ("buynlarge",), ("rekall",), ("soylent",),
    ("virtucon",), ("zorg",), ("parallax",), ("octan",), ("veidt",),
]
LOCS: list[tuple[str, ...]] = [
    ("springfield",), ("gotham",), ("metropolis",), ("zion",), ("arrakis",),
    ("trantor",), ("coruscant",), ("hogsmeade",), ("rivendell",), ("asgard",),
    ("wakanda",), ("latveria",), ("genosha",), ("atlantis",), ("krypton",),
    ("kamino",), ("naboo",), ("dagobah",), ("endor",), ("hoth",),
]
VERBS = _VBD_WORDS[:16]
NOUNS = _NN_WORDS[:20]

_NOISE_DE = "der das und ein nicht mit auf von aus bei nach zeit jahr stadt welt".split()
_NOISE_FR = "le la et un ne pas avec sur dans pour ville temps monde anne".split()


def _zipf_weights(n: int, s: float = 1.1) -> list[float]:
    return [1.0 / (r + 1) ** s for r in range(n)]


def _pick(rng: random.Random, pool: list, weights: list[float]):
    return rng.choices(pool, weights=weights, k=1)[0]


def _sentence(rng: random.Random, ow, lw, vw, nw) -> tuple[list[str], list[tuple[str, str, str]]]:
    """One template sentence → (tokens, analytic gold triples).

    Gold triples follow the reference's end-to-end semantics: predicates are
    the dependency-path tokens joined by '_' (postprocessing.py:71,77) and
    arguments are lowercase '_'-joined mention texts (postprocessing.py:326-327).
    """
    kind = rng.choices(["t1", "t2", "t3", "n1", "n2"], weights=[35, 25, 15, 15, 10], k=1)[0]
    J = lambda e: "_".join(e)
    if kind == "t1":
        e1, e2 = _pick(rng, ORGS, ow), _pick(rng, ORGS, ow)
        while e2 == e1:
            e2 = _pick(rng, ORGS, ow)
        v = _pick(rng, VERBS, vw)
        return [*e1, v, *e2, "."], [(J(e1), v, J(e2))]
    if kind == "t2":
        e1, e2 = _pick(rng, ORGS, ow), _pick(rng, ORGS, ow)
        while e2 == e1:
            e2 = _pick(rng, ORGS, ow)
        v, l3 = _pick(rng, VERBS, vw), _pick(rng, LOCS, lw)
        return [*e1, v, *e2, "in", *l3, "."], [
            (J(e1), v, J(e2)),
            (J(e1), f"{v}_in", J(l3)),
        ]
    if kind == "t3":
        n1 = _pick(rng, NOUNS, nw)
        l1, e2 = _pick(rng, LOCS, lw), _pick(rng, ORGS, ow)
        v = _pick(rng, VERBS, vw)
        return [n1, "of", *l1, v, *e2, "."], [
            (n1, "of", J(l1)),
            (n1, v, J(e2)),
        ]
    if kind == "n1":
        n1, n2 = _pick(rng, NOUNS, nw), _pick(rng, NOUNS, nw)
        return ["the", n1, n2, "."], []
    e1 = _pick(rng, ORGS, ow)
    v = _pick(rng, VERBS, vw)
    return [*e1, v, "."], []


def render_html(text: str) -> bytes:
    """Deterministic html wrapper: one <p> per newline-separated sentence."""
    paras = "".join(f"<p>{line}</p>" for line in text.split("\n"))
    return (
        '<html><head><meta charset="utf-8"><title>synthetic</title></head>'
        f"<body>{paras}</body></html>"
    ).encode("utf-8")


_WEIGHTS = None


def _weights():
    global _WEIGHTS
    if _WEIGHTS is None:
        _WEIGHTS = (
            _zipf_weights(len(ORGS)), _zipf_weights(len(LOCS)),
            _zipf_weights(len(VERBS), 0.8), _zipf_weights(len(NOUNS), 0.8),
        )
    return _WEIGHTS


def _gen_doc(i: int, seed: int) -> dict:
    """Doc i, seeded per (seed, i) — computable on any executor without
    sequential RNG state, so corpus generation is itself shuffle-free and
    embarrassingly parallel (the property a 10^12-doc synthetic run needs)."""
    ow, lw, vw, nw = _weights()
    rng = random.Random(seed * 1_000_003 + i)
    epoch = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
    url = f"https://example.org/doc/{i:08d}"
    ts = epoch + _dt.timedelta(seconds=137 * i)
    if rng.random() < 0.08:
        lang = rng.choice(["de", "fr"])
        words = _NOISE_DE if lang == "de" else _NOISE_FR
        n_sent = rng.randint(1, 3)
        sents = [
            " ".join(rng.choices(words, k=rng.randint(4, 9))) + " ."
            for _ in range(n_sent)
        ]
        text = "\n".join(sents)
        return dict(url=url, warc_ts=ts, html=render_html(text), text=text,
                    lang=lang, gold_triples=[])
    n_sent = rng.randint(1, 10)
    sents, gold = [], []
    for _ in range(n_sent):
        toks, tris = _sentence(rng, ow, lw, vw, nw)
        sents.append(" ".join(toks))
        gold.extend(tris)
    text = "\n".join(sents)
    return dict(url=url, warc_ts=ts, html=render_html(text), text=text,
                lang="en", gold_triples=gold)


def generate_docs(n_docs: int, seed: int = 42) -> list[dict]:
    """Deterministic corpus. ~8% non-en rows (must be filtered, not crash)."""
    return [_gen_doc(i, seed) for i in range(n_docs)]


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n_docs: int, seed: int = 42, num_partitions: int | None = None):
    """pages DataFrame matching the input_hint schema, generated ON THE
    EXECUTORS (mapInPandas over a range) — the driver never materializes the
    corpus, so input prep scales with the cluster like a real crawl scan."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            docs = [_gen_doc(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame({
                "url": [d["url"] for d in docs],
                "warc_ts": pd.Series(
                    [d["warc_ts"].replace(tzinfo=None) for d in docs],
                    dtype="datetime64[us]"),
                "html": pd.Series([d["html"] for d in docs], dtype=object),
                "text": [d["text"] for d in docs],
                "lang": [d["lang"] for d in docs],
            })

    parts = num_partitions or max(2, n_docs // 2000)
    rng_df = spark.range(0, n_docs, numPartitions=parts)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def analytic_gold(docs: list[dict]) -> list[tuple[str, str, str, str]]:
    """(url, subj, pred, obj) analytic gold triples."""
    out = []
    for d in docs:
        for (s, p, o) in d["gold_triples"]:
            out.append((d["url"], s, p, o))
    return out
