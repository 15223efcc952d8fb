"""Tokenizer/tagger/parser unit tests with hand-computed expectations."""

from remine_spark import nlp


def test_split_sentences():
    toks = "acme acquired globex . stark toured .".split()
    sents = nlp.split_sentences(toks)
    assert sents == [["acme", "acquired", "globex", "."],
                     ["stark", "toured", "."]]


def test_pos_tag_lexicon_and_fallback():
    assert nlp.pos_tag(["acme", "acquired", "globex", "."]) == \
        ["NNP", "VBD", "NNP", "."]
    assert nlp.pos_tag(["mayor", "of", "gotham"]) == ["NN", "IN", "NNP"]
    # fallbacks
    assert nlp.pos_tag(["zzzqed"]) == ["VBD"]
    assert nlp.pos_tag(["blorps"]) == ["NNS"]
    assert nlp.pos_tag(["42"]) == ["CD"]


def test_parse_t1_simple_svo():
    # "acme acquired globex ." → acme-nsubj->acquired(root), globex-dobj, .-punct
    toks = ["acme", "acquired", "globex", "."]
    heads, types = nlp.parse(toks, nlp.pos_tag(toks))
    assert heads == [2, 0, 2, 2]
    assert types == ["nsubj", "root", "dobj", "punct"]


def test_parse_multiword_entities():
    # "dunder mifflin hired sterling cooper ."
    toks = ["dunder", "mifflin", "hired", "sterling", "cooper", "."]
    heads, types = nlp.parse(toks, nlp.pos_tag(toks))
    assert heads == [2, 3, 0, 5, 3, 3]
    assert types == ["compound", "nsubj", "root", "compound", "dobj", "punct"]


def test_parse_t2_nmod_in():
    # "acme acquired globex in gotham ."
    toks = ["acme", "acquired", "globex", "in", "gotham", "."]
    heads, types = nlp.parse(toks, nlp.pos_tag(toks))
    assert heads == [2, 0, 2, 5, 2, 2]
    assert types == ["nsubj", "root", "dobj", "case", "nmod", "punct"]


def test_parse_t3_nmod_of():
    # "mayor of gotham visited acme ."
    toks = ["mayor", "of", "gotham", "visited", "acme", "."]
    heads, types = nlp.parse(toks, nlp.pos_tag(toks))
    assert heads == [4, 3, 1, 0, 4, 4]
    assert types == ["nsubj", "case", "nmod:of", "root", "dobj", "punct"]


def test_parse_single_root_always():
    import random
    rng = random.Random(7)
    vocab = ["acme", "visited", "of", "the", "mayor", ".", "in", "gotham",
             "blorps", "42", "scan"]
    for _ in range(200):
        toks = rng.choices(vocab, k=rng.randint(1, 12))
        tags = nlp.pos_tag(toks)
        heads, types = nlp.parse(toks, tags)
        assert len(heads) == len(types) == len(toks)
        assert heads.count(0) == 1
        assert all(0 <= h <= len(toks) for h in heads)


def test_noverb_sentence_has_root():
    toks = ["the", "stock", "market", "."]
    heads, types = nlp.parse(toks, nlp.pos_tag(toks))
    assert heads.count(0) == 1
    assert types[heads.index(0)] == "root"
