"""Deterministic tokenizer / POS tagger / dependency parser.

The reference consumes pre-lemmatized, pre-tagged, pre-parsed corpora
(``data/nyt/test.{lemmas,pos,dep}.txt``; loaded at ``remine.cpp:120-158``).
This engine instead starts from raw page text (input contract), so it ships a
fully deterministic rule-based tagger/parser: lexicon POS lookup + suffix
fallback, and a chunk-based dependency grammar that emits the same 1-based
``head`` / ``type`` encoding the reference parses from ``*_dep`` files
(``idx_head_type``, parsed at ``remine.cpp:151-156``).

Everything here is pure Python on purpose: it runs inside Arrow-batched
``mapInPandas`` workers (see :mod:`remine_spark.corpus`), one sentence-array
per row, never per-token Python round trips through the JVM.
"""

from __future__ import annotations

# Punctuation surface forms (mirrors postprocessing.py:217 and the
# separatePunc set at documents.h:75,105-110).
PUNC = {
    ".", ",", '"', "'", "?", ":", ";", "-", "!",
    "-lrb-", "-rrb-", "``", "''", "(", ")",
}
SENT_END = {".", "!", "?"}

# POS groups (genSepath.h:10-12).
VERB_TAGS = {"VB", "BES", "HVS", "VBD", "VBG", "VBN", "VBP", "VBZ"}
NOUN_TAGS = {"NN", "NNS", "NNP", "NNPS"}
ATTACH_TAGS = {"IN", "TO", "RP"}

# --- lexicon -----------------------------------------------------------
# Proper-noun entity vocabulary (NNP per token). The synthetic corpus
# generator draws from the same lists, so the tagger is exact on that
# grammar while remaining a plain dictionary tagger for any other text.
_NNP_WORDS = """
acme globex initech umbrella stark wayne oscorp cyberdyne tyrell weyland
aperture hooli pied piper vandelay wonka duff sterling cooper dunder mifflin
gringotts olivanders nakatomi massive dynamic veidt buynlarge monsters
rekall soylent spacely sprockets virtucon zorg parallax octan
springfield gotham metropolis zion arrakis trantor coruscant hogsmeade
rivendell asgard wakanda latveria genosha atlantis themyscira krypton
kamino naboo dagobah endor hoth mustafar alderaan tatooine
""".split()

_NN_WORDS = """
mayor company city firm startup agency bank museum lab factory studio
market team board council committee union league club press journal
network station port bridge tower plant mine farm mill yard depot
professor senator minister judge doctor engineer analyst broker chef
""".split()

_VBD_WORDS = """
acquired visited founded launched sued hired endorsed toured opened
bought sold joined met left entered praised criticized backed funded
audited briefed consulted advised courted lobbied
""".split()

# present-tense / ambiguous verbs so out-of-grammar text (e.g. the
# driver's `documents` word-soup table) still yields parse trees
_VB_WORDS = """
scan join merge sort filter group order query count select insert
update run read write stream batch hash
""".split()

_IN_WORDS = ["in", "of", "with", "at", "on", "from", "by"]
_DT_WORDS = ["the", "a", "an"]
_CC_WORDS = ["and", "or", "but"]
_TO_WORDS = ["to"]

LEXICON: dict[str, str] = {}
for _w in _NNP_WORDS:
    LEXICON[_w] = "NNP"
for _w in _NN_WORDS:
    LEXICON[_w] = "NN"
for _w in _VBD_WORDS:
    LEXICON[_w] = "VBD"
for _w in _VB_WORDS:
    LEXICON[_w] = "VB"
for _w in _IN_WORDS:
    LEXICON[_w] = "IN"
for _w in _DT_WORDS:
    LEXICON[_w] = "DT"
for _w in _CC_WORDS:
    LEXICON[_w] = "CC"
for _w in _TO_WORDS:
    LEXICON[_w] = "TO"


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization (corpora arrive pre-lemmatized/space-split,
    matching the reference's token-per-space files)."""
    return text.split()


def split_sentences(tokens: list[str]) -> list[list[str]]:
    """Split a token stream into sentences after ./!/? — the reference's
    SEPARATOR_AFTER logic (documents.h:318-358) keyed on separatePunc."""
    sents: list[list[str]] = []
    cur: list[str] = []
    for t in tokens:
        cur.append(t)
        if t in SENT_END:
            sents.append(cur)
            cur = []
    if cur:
        sents.append(cur)
    return sents


def pos_tag(tokens: list[str]) -> list[str]:
    """Deterministic dictionary tagger with suffix fallback."""
    tags = []
    for t in tokens:
        if t in PUNC:
            tags.append(".")
        elif t in LEXICON:
            tags.append(LEXICON[t])
        elif t.isascii() and t.isdigit():
            # ASCII digits only — keeps this tagger bit-identical to the
            # JVM expression form (mining._pos_key_expr uses ^[0-9]+$;
            # python isdigit() alone would also accept Unicode digits)
            tags.append("CD")
        elif len(t) > 4 and t.endswith("ed"):
            tags.append("VBD")
        elif len(t) > 4 and t.endswith("ing"):
            tags.append("VBG")
        elif t.endswith("s") and len(t) > 3:
            tags.append("NNS")
        else:
            tags.append("NN")
    return tags


def case_mask(tokens: list[str]) -> list[int]:
    """Capitalization class per token (mirrors preprocessing.py:13-21)."""
    out = []
    for t in tokens:
        if t.isupper() and len(t) > 1:
            out.append(3)
        elif t[:1].isupper():
            out.append(1)
        elif any(c.isupper() for c in t):
            out.append(4)
        else:
            out.append(0)
    return out


def _noun_chunks(tags: list[str]) -> list[tuple[int, int]]:
    """Maximal runs of noun-tagged tokens, [start, end) 0-based."""
    chunks = []
    i, n = 0, len(tags)
    while i < n:
        if tags[i] in NOUN_TAGS or tags[i] == "PRP":
            j = i
            while j < n and (tags[j] in NOUN_TAGS or tags[j] == "PRP"):
                j += 1
            chunks.append((i, j))
            i = j
        else:
            i += 1
    return chunks


def boost_chunk_spans(tags: list[str]) -> list[tuple[int, int]]:
    """M14 chunk grammar (preprocessing.py:34-42, chunk_train): the
    reference's nltk.RegexpParser rules applied in declaration order over
    unconsumed tokens, leftmost-longest, no overlaps:

        DATE: {<NNP><CD>}
        NP:   {<DT|PP$>?<JJ>*<NN|NNS>+}
              {<NNP>+<IN><NNP>+}
              {<NNP>+}

    Returns [start, end) spans with len > 1 only (preprocessing.py:62
    keeps multi-token branches); callers apply the www/.com surface filter
    and the ≤6-token cap (frequent_pattern_mining.h:251 LENGTH_THRESHOLD).
    """
    n = len(tags)
    used = [False] * n
    spans: list[tuple[int, int]] = []

    def claim(a: int, b: int) -> None:
        for k in range(a, b):
            used[k] = True
        if b - a > 1:
            spans.append((a, b))

    # DATE: NNP CD
    i = 0
    while i + 1 < n:
        if (not used[i] and not used[i + 1]
                and tags[i] == "NNP" and tags[i + 1] == "CD"):
            claim(i, i + 2)
            i += 2
        else:
            i += 1

    # NP rule 1: (DT|PRP$)? JJ* (NN|NNS)+
    i = 0
    while i < n:
        if used[i]:
            i += 1
            continue
        p = i
        if tags[p] in ("DT", "PRP$"):
            p += 1
        while p < n and not used[p] and tags[p] == "JJ":
            p += 1
        q = p
        while q < n and not used[q] and tags[q] in ("NN", "NNS"):
            q += 1
        if q > p:
            claim(i, q)
            i = q
        else:
            i += 1

    def _nnp_run(start: int) -> int:
        j = start
        while j < n and not used[j] and tags[j] == "NNP":
            j += 1
        return j

    # NP rule 2: NNP+ IN NNP+
    i = 0
    while i < n:
        if used[i] or tags[i] != "NNP":
            i += 1
            continue
        b1 = _nnp_run(i)
        if b1 < n and not used[b1] and tags[b1] == "IN":
            b2 = _nnp_run(b1 + 1)
            if b2 > b1 + 1:
                claim(i, b2)
                i = b2
                continue
        i = b1 if b1 > i else i + 1

    # NP rule 3: NNP+
    i = 0
    while i < n:
        if used[i] or tags[i] != "NNP":
            i += 1
            continue
        b = _nnp_run(i)
        claim(i, b)
        i = b

    return sorted(spans)


def parse(tokens: list[str], tags: list[str]) -> tuple[list[int], list[str]]:
    """Rule-based dependency parse → (head, type) per token.

    ``head`` is 1-based, 0 = root — the encoding the reference reads from
    ``*_dep`` files (remine.cpp:151-156) and genSepath consumes
    (genSepath.h:64-88). Exactly one root is emitted (genSepath bails on
    multi-root sentences, genSepath.h:72).

    Grammar: noun chunks (internal tokens → chunk head via ``compound``),
    determiner→``det``, ``of``-PP inside an NP (``case`` + ``nmod:of``),
    first pre-verb chunk → ``nsubj``, first post-verb chunk → ``dobj``,
    IN+chunk after the verb → ``case`` + ``nmod``, punctuation → ``punct``.
    """
    n = len(tokens)
    heads = [0] * n
    types = ["dep"] * n
    attached = [False] * n

    chunks = _noun_chunks(tags)
    chunk_head = {}  # start index -> head token index (0-based)
    for (a, b) in chunks:
        h = b - 1
        chunk_head[a] = h
        for k in range(a, b - 1):
            heads[k] = h + 1
            types[k] = "compound"
            attached[k] = True

    verb_idxs = [i for i, t in enumerate(tags) if t in VERB_TAGS]
    root = verb_idxs[0] if verb_idxs else (chunks[0][1] - 1 if chunks else 0)

    # det / amod attach forward to the next chunk head
    for i in range(n):
        if tags[i] in ("DT", "JJ") and not attached[i]:
            for (a, b) in chunks:
                if a > i:
                    heads[i] = b  # 1-based head = (b-1)+1
                    types[i] = "det" if tags[i] == "DT" else "amod"
                    attached[i] = True
                    break

    # of-PP linking two adjacent chunks: N1 of N2 -> case(of->N2h), nmod:of(N2h->N1h)
    chunk_by_start = dict((a, (a, b)) for (a, b) in chunks)
    top_heads = [chunk_head[a] for (a, b) in chunks]
    for i in range(n):
        if tokens[i] == "of" and tags[i] == "IN":
            prev_c = next(((a, b) for (a, b) in reversed(chunks) if b == i), None)
            nxt_c = chunk_by_start.get(i + 1)
            if prev_c and nxt_c:
                ph, nh = chunk_head[prev_c[0]], chunk_head[nxt_c[0]]
                heads[i] = nh + 1
                types[i] = "case"
                attached[i] = True
                heads[nh] = ph + 1
                types[nh] = "nmod:of"
                attached[nh] = True

    # other IN/TO + chunk: case to the chunk head, chunk head -> verb (nmod)
    for i in range(n):
        if tags[i] in ("IN", "TO") and not attached[i] and tokens[i] != "of":
            nxt_c = chunk_by_start.get(i + 1)
            if nxt_c:
                nh = chunk_head[nxt_c[0]]
                heads[i] = nh + 1
                types[i] = "case"
                attached[i] = True
                if not attached[nh]:
                    heads[nh] = root + 1
                    types[nh] = "nmod"
                    attached[nh] = True

    # subject: first unattached chunk head before root verb
    if verb_idxs:
        for h in top_heads:
            if h < root and not attached[h]:
                heads[h] = root + 1
                types[h] = "nsubj"
                attached[h] = True
                break
        # object: first unattached chunk head after root verb
        for h in top_heads:
            if h > root and not attached[h]:
                heads[h] = root + 1
                types[h] = "dobj"
                attached[h] = True
                break

    # root
    heads[root] = 0
    types[root] = "root"
    attached[root] = True

    # everything else (punct, stray chunks, extra verbs) hangs off the root
    for i in range(n):
        if not attached[i]:
            heads[i] = root + 1
            types[i] = "punct" if tokens[i] in PUNC else "dep"
            attached[i] = True
    return heads, types


def analyze(text: str) -> list[dict]:
    """text → per-sentence records {tokens, pos, dep_head, dep_type, case_mask}."""
    out = []
    for sent in split_sentences(tokenize(text)):
        tags = pos_tag(sent)
        heads, types = parse(sent, tags)
        out.append(
            {
                "tokens": sent,
                "pos": tags,
                "dep_head": heads,
                "dep_type": types,
                "case_mask": case_mask(sent),
            }
        )
    return out
