"""Property-based check: dependency-constrained Viterbi equals brute-force
best segmentation on small random inputs (hypothesis).

The brute force enumerates every segmentation into trie-matched spans and
single-token advances, replicating the DP's scoring exactly (phrase logprob
+ subtree-signature prob + punctuation cost for multi-token spans; an
"impossible" position advances only when no span starts there — the
reference's semantics at segmentation.h:607-681)."""

import math

from hypothesis import given, settings, strategies as st

from remine_spark import algo
from tests.test_algo import payload_from

VOCAB = ["acme", "globex", "acquired", "in", "zion", "the", ",", "sprockets"]

PATTERNS = [
    (("acme",), 5, 0.9, "EP"),
    (("globex",), 5, 0.9, "EP"),
    (("acquired",), 6, 0.8, "RP"),
    (("zion",), 4, 0.7, "EP"),
    (("acme", "globex"), 3, 0.95, "EP"),
    (("acquired", "in"), 2, 0.85, "RP"),
    (("globex", "sprockets"), 2, 0.6, "EP"),
]


def brute_force_best(tokens, deps, m):
    trie, prob = m["trie"], m["prob"]
    dlp, dflt = m["deps_logprob"], m["default_logprob"]
    n = len(tokens)
    best = [algo.NEG_INF] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        if best[i] < -1e80:
            continue
        any_span = False
        for j in range(i, n):
            # trie_lookup returns -1 for unmatched spans; enumerating all j
            # is a superset of the DP's early-broken trie walk, so scores
            # agree exactly
            pid = algo.trie_lookup(trie, tokens, i, j + 1)
            if pid >= 0:
                any_span = True
                score = prob[pid]
                if j > i:
                    sig = algo.tree_signature(deps, i, j + 1)
                    score += dlp.get(sig, dflt)
                    score += algo.punc_cost(tokens, i, j)
                if best[i] + score > best[j + 1]:
                    best[j + 1] = best[i] + score
        if not any_span and best[i] > best[i + 1]:
            best[i + 1] = best[i]
    return best[n]


@given(
    toks=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=7),
    heads=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_viterbi_matches_brute_force(toks, heads):
    n = len(toks)
    # random dependency heads (1-based, 0..n meaning possibly outside span)
    hs = [heads.draw(st.integers(min_value=1, max_value=n + 1)) for _ in range(n)]
    deps = list(enumerate(hs))
    m = payload_from(PATTERNS, deps_prob={"(x(x(x)))": 0.3})
    f, pre, pids = algo.viterbi_deps(
        toks, deps, m["trie"], m["prob"], m["deps_logprob"], m["default_logprob"])
    want = brute_force_best(toks, deps, m)
    got = f[n]
    if want < -1e80:
        assert got < -1e80
    else:
        assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)
    # the DP-recorded pid of every reachable backtrace step must equal the
    # trie re-walk over the same span (the property backtrace_segments'
    # fast path relies on)
    if got > -1e80:
        i = n
        while i > 0:
            j = pre[i]
            assert pids[i] == algo.trie_lookup(m["trie"], toks, j, i)
            i = j


def test_any_span_semantics_differs_from_unconditional_advance():
    """Regression guard for the 'impossible' rule: a position where a span
    STARTS but none completes cheaply must not silently advance for free."""
    m = payload_from(PATTERNS)
    toks = ["acme", "globex", "acquired"]
    deps = [(0, 2), (1, 3), (2, 4)]
    f, pre, pids = algo.viterbi_deps(
        toks, deps, m["trie"], m["prob"], m["deps_logprob"], m["default_logprob"])
    assert f[3] > -1e80
    segs = algo.backtrace_segments(toks, pre, m["trie"], m["patterns"])
    assert segs  # a full segmentation exists
    # pid fast path ≡ trie re-walk path
    assert algo.backtrace_segments(
        toks, pre, m["trie"], m["patterns"], pids=pids) == segs
