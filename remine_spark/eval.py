"""Evaluation: triple P/R (utils.py:357-384 semantics — raw predicted /
gold / correct counts → precision & recall).

Two reference sets:

1. **Mirror parity (the strict ≥0.95 gate).** The single-node mirror runs
   the exact same reference-semantics algorithms (algo.py) sequentially over
   the corpus. Matching it verifies that the *distributed* execution —
   Arrow batching, broadcasts, shuffles, checkpoint/resume — is faithful to
   single-node ReMine semantics. (The reference C++ binaries cannot run
   here: the pre-trained model blob is absent, `.MISSING_LARGE_BLOBS`, and
   its RF is seeded from time(0), label_generation.h:88 — not even
   self-reproducible. The mirror plays the role the golden
   `remine_results.txt` plays for the reference.)

2. **Analytic gold (diagnostic).** Template-derived triples from the
   synthetic grammar. The engine legitimately diverges where ReMine
   semantics differ from naive templates (frequent 'N of N' phrases become
   single mentions; sub-MIN_SUP tail entities cannot be mentions), so this
   is reported, not gated.
"""

from __future__ import annotations

from . import nlp
from .tuples import extract_tuples_py


def mirror_triples(docs: list[dict], payload: dict) -> set[tuple]:
    """Single-node reference run over generated docs (en only)."""
    out = set()
    for d in docs:
        if d["lang"] != "en":
            continue
        for sent in d["text"].split("\n"):
            toks = sent.split()
            if not toks:
                continue
            tags = nlp.pos_tag(toks)
            heads, types = nlp.parse(toks, tags)
            _m, tups = extract_tuples_py(toks, tags, heads, types, payload)
            for (s, p, o, _r, _ss, _os) in tups:
                out.add((d["url"], s, p, o))
    return out


def precision_recall(pred: set, gold: set) -> tuple[float, float, int]:
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    return p, r, tp
