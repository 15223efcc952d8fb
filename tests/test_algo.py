"""Hand-computed unit tests for the reference-semantics algorithm mirrors."""

import math

from remine_spark import algo


def payload_from(patterns, deps_prob=None):
    """Tiny model payload: per-length freq-normalized log probs
    (segmentation.h:440-498)."""
    by_len = {}
    for (toks, freq, _q, _i) in patterns:
        by_len[len(toks)] = by_len.get(len(toks), 0) + freq
    prob, prob_t = [], []
    for (toks, freq, q, _i) in patterns:
        p = freq / by_len[len(toks)]
        prob_t.append(math.log(p + algo.EPS))
        prob.append(math.log(p + algo.EPS) + math.log(q + algo.EPS))
    dlp = {k: math.log(v + algo.EPS) for k, v in (deps_prob or {}).items()}
    return {
        "patterns": patterns,
        "trie": algo.build_trie(patterns),
        "prob": prob,
        "prob_tuple": prob_t,
        "deps_logprob": dlp,
        "default_logprob": math.log(algo.EPS),
    }


def test_tree_signature_chain_vs_fork():
    # chain a<-b<-c (heads: b, c, outside): tokens 0,1,2 heads 2,3,4 (1-based)
    deps = [(0, 2), (1, 3), (2, 4)]
    assert algo.tree_signature(deps, 0, 3) == "(x(x(x(x))))"
    # fork: both 0 and 2 head to 1 (token id 2)
    deps = [(0, 2), (1, 5), (2, 2)]
    assert algo.tree_signature(deps, 0, 3) == "(x(x(x)(x)))"
    # two roots (both point outside)
    deps = [(0, 9), (1, 9)]
    assert algo.tree_signature(deps, 0, 2) == "(x(x)(x))"


def test_tree_signature_external_head_clamped():
    # The shape never depends on WHERE an out-of-span head points — only
    # that it is out of span. Equal shapes with different external
    # targets must give the same signature AND collapse to one memo key
    # (the key clamps external heads to sentinel 0).
    a = [(0, 2), (1, 3), (2, 7)]    # last head 4 tokens to the right
    b = [(0, 2), (1, 3), (2, 99)]   # last head far to the right
    c = [(5, 7), (6, 8), (7, 12)]   # same shape, translated span
    before = len(algo._SIG_MEMO)
    sa = algo.tree_signature(a, 0, 3)
    sb = algo.tree_signature(b, 0, 3)
    sc = algo.tree_signature(c, 0, 3)
    assert sa == sb == sc == "(x(x(x(x))))"
    assert len(algo._SIG_MEMO) <= before + 1
    # a head pointing BEFORE the span is external too
    d = [(3, 1), (4, 4), (5, 5)]    # token 3 heads back to 1 (external)
    e = [(3, 0), (4, 4), (5, 5)]
    assert algo.tree_signature(d, 0, 3) == algo.tree_signature(e, 0, 3)


def test_sig_memo_capped_on_adversarial_corpora():
    # A long-lived worker fed pathological parses must not grow the memo
    # forever: when it reaches the cap it resets, and results stay
    # correct through the reset (the memo is a pure cache).
    old_memo, old_cap = dict(algo._SIG_MEMO), algo._SIG_MEMO_CAP
    try:
        algo._SIG_MEMO.clear()
        algo._SIG_MEMO_CAP = 4
        sigs = {}
        for n in range(2, 12):  # 10 distinct chain shapes > cap
            deps = [(i, i + 1) for i in range(n)]
            sigs[n] = algo.tree_signature(deps, 0, n)
        assert len(algo._SIG_MEMO) <= 4
        # correctness across the reset: recompute equals first compute
        for n, want in sigs.items():
            deps = [(i, i + 1) for i in range(n)]
            assert algo.tree_signature(deps, 0, n) == want
    finally:
        algo._SIG_MEMO_CAP = old_cap
        algo._SIG_MEMO.clear()
        algo._SIG_MEMO.update(old_memo)


def test_tree_signature_order_invariant():
    # children sorted: left-heavy and right-heavy forks give same signature
    fork_l = [(0, 3), (1, 3), (2, 9)]   # 1,2 -> 3
    fork_r = [(0, 9), (1, 1), (2, 1)]   # 2,3 -> 1
    assert (algo.tree_signature(fork_l, 0, 3)
            == algo.tree_signature(fork_r, 0, 3))


def test_punc_cost():
    assert algo.punc_cost(["a", "b"], 0, 1) == 0.0
    assert algo.punc_cost(["a", ",", "b"], 0, 2) == algo.NEG_INF
    assert algo.punc_cost(["a", ",", "b"], 2, 2) == 0.0


def test_viterbi_prefers_high_prob_phrase():
    # patterns: "new york" (bigram, q .95), "new" & "york" unigrams (q .6)
    pats = [(("new", "york"), 50, 0.95, "EP"),
            (("new",), 60, 0.6, "EP"),
            (("york",), 55, 0.6, "EP")]
    # deps: compound chain, signature present with decent prob
    deps = [(0, 2), (1, 0)]
    sig = algo.tree_signature(deps, 0, 2)
    m = payload_from(pats, {sig: 0.5})
    segs, energy = algo.segment_sentence(
        ["new", "york"], deps, m["trie"], m["patterns"], m["prob"],
        m["deps_logprob"], m["default_logprob"])
    assert [(s, e) for (s, e, _p, _ok) in segs] == [(0, 2)]
    assert energy > algo.NEG_INF


def test_viterbi_punct_blocks_span():
    pats = [(("a", ",", "b"), 50, 0.95, "EP"),
            (("a",), 60, 0.6, "EP"), (("b",), 55, 0.6, "EP")]
    deps = [(0, 0), (1, 1), (2, 1)]
    sig = algo.tree_signature(deps, 0, 3)
    m = payload_from(pats, {sig: 0.9})
    segs, _ = algo.segment_sentence(
        ["a", ",", "b"], deps, m["trie"], m["patterns"], m["prob"],
        m["deps_logprob"], m["default_logprob"])
    # trigram blocked by punc cost; ',' not in trie → advances alone
    assert [(s, e) for (s, e, _p, _ok) in segs] == [(0, 1), (1, 2), (2, 3)]


def test_viterbi_unknown_tokens_advance():
    pats = [(("x",), 10, 0.9, "EP")]
    m = payload_from(pats)
    segs, _ = algo.segment_sentence(
        ["q", "x", "z"], [(0, 0), (1, 0), (2, 0)], m["trie"], m["patterns"],
        m["prob"], m["deps_logprob"], m["default_logprob"])
    assert [(s, e) for (s, e, _p, _ok) in segs] == [(0, 1), (1, 2), (2, 3)]


def test_backtrace_quality_gate():
    # bigram below multi-word threshold 0.65 → chosen but not ok
    pats = [(("a", "b"), 50, 0.5, "EP")]
    deps = [(0, 2), (1, 0)]
    m = payload_from(pats, {algo.tree_signature(deps, 0, 2): 0.9})
    segs, _ = algo.segment_sentence(
        ["a", "b"], deps, m["trie"], m["patterns"], m["prob"],
        m["deps_logprob"], m["default_logprob"])
    assert segs == [(0, 2, 0, False)]


def test_gen_sepath_simple_svo():
    # "acme acquired globex ." heads: [2,0,2,2]
    deps = [(0, 2), (1, 0), (2, 2), (3, 2)]
    tags = ["NNP", "VBD", "NNP", "."]
    types = ["nsubj", "root", "dobj", "punct"]
    ems = [(0, 1), (2, 3)]
    paths = algo.gen_sepath(deps, tags, types, ems)
    # target j=1 (globex) from source 0 (acme) via the verb (token id 2)
    assert 1 in paths
    mi, bgs = paths[1]
    assert mi == 0 and bgs == {2}
    # no path targeting the nsubj mention (genSepath.h:133-134)
    assert 0 not in paths


def test_gen_sepath_nmod_in():
    # "acme acquired globex in gotham ." heads [2,0,2,5,2,2]
    deps = [(0, 2), (1, 0), (2, 2), (3, 5), (4, 2), (5, 2)]
    tags = ["NNP", "VBD", "NNP", "IN", "NNP", "."]
    types = ["nsubj", "root", "dobj", "case", "nmod", "punct"]
    ems = [(0, 1), (2, 3), (4, 5)]
    paths = algo.gen_sepath(deps, tags, types, ems)
    # globex ← acme via verb; gotham ← acme via verb + attached 'in'
    assert paths[1] == (0, {2})
    assert paths[2] == (0, {2, 4})


def test_gen_sepath_multiroot_returns_empty():
    deps = [(0, 0), (1, 0)]
    assert algo.gen_sepath(deps, ["NN", "NN"], ["root", "root"],
                           [(0, 1), (1, 2)]) == {}


def test_mentions_merge_of():
    # segments: "mayor" EP + "of" + "gotham" EP with 'of' between → no
    # adjacency → both kept; adjacent "mayor" + "of gotham" merges.
    pats = [(("mayor",), 10, 0.9, "EP"), (("of", "gotham"), 10, 0.9, "EP")]
    toks = ["mayor", "of", "gotham"]
    pos = ["NN", "IN", "NNP"]
    segs = [(0, 1, 0, True), (1, 3, 1, True)]
    out = algo.mentions_from_segments(segs, toks, pos, pats)
    assert out == [(0, 3, "mayor of gotham")]


def test_mentions_trim_edges():
    pats = [(("of", "gotham"), 10, 0.9, "EP")]
    segs = [(0, 2, 0, True)]
    out = algo.mentions_from_segments(segs, ["of", "gotham"], ["IN", "NNP"],
                                      pats)
    assert out == [(1, 2, "gotham")]
