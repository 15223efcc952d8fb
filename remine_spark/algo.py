"""Core ReMine algorithms — exact-semantics mirrors of the reference C++.

Pure Python on purpose: these run vectorized over Arrow batches inside
``mapInPandas`` workers (one call per *sentence*, thousands of sentences per
batch — never per-token JVM round trips), and double as the single-node
oracle the distributed pipeline is tested against.

Mirrored semantics (file:line into /root/reference):
- subtree canonical signature   segmentation.h:121-153 (treeToString),
                                segmentation.h:179-205 (GetSubtreeID, pair variant)
- punctuation span cost         segmentation.h:334-358 (GetPuncCost)
- deps-constrained Viterbi      segmentation.h:607-681
- backtrace + quality gate      remine.cpp:22-82 (process)
- shortest dep path extraction  genSepath.h:22-211 (printSubtree/genSepath)
- mention merge / trim          postprocessing.py:158-199
"""

from __future__ import annotations

from .nlp import ATTACH_TAGS, NOUN_TAGS, PUNC

NEG_INF = -1e100

# Emission quality thresholds (parameters.h:65-68, gate applied at
# remine.cpp:45-48).
SEGMENT_MULTI_WORD_QUALITY_THRESHOLD = 0.65
SEGMENT_MULTI_PHRASE_QUALITY_THRESHOLD = 0.50
SEGMENT_SINGLE_WORD_QUALITY_THRESHOLD = 0.50
EPS = 1e-8


# --------------------------------------------------------------------------
# Trie (segmentation.h:23-65). Node = [pattern_id, {token: node}].
# --------------------------------------------------------------------------

def build_trie(patterns: list[tuple]) -> list:
    """patterns: list of (tokens: tuple[str], freq, quality, indicator).
    Mirrors constructTrie (segmentation.h:41-65): every pattern with
    freq > 0 (multi-word) enters; the quality gate happens at emit time."""
    root = [-1, {}]
    for pid, (tokens, freq, _q, _ind) in enumerate(patterns):
        if len(tokens) == 0 or (len(tokens) > 1 and freq == 0):
            continue
        u = root
        for t in tokens:
            u = u[1].setdefault(t, [-1, {}])
        u[0] = pid
    return root


# --------------------------------------------------------------------------
# Subtree signatures (segmentation.h:121-205)
# --------------------------------------------------------------------------

def _tree_to_string(children: dict[int, list[int]], u: int) -> str:
    subs = sorted(_tree_to_string(children, v) for v in children.get(u, ()))
    return "(x" + "".join(subs) + ")"


# Signature memo: the canonical string is a pure function of the span's
# RELATIVE (idx, head) offsets (both translated by idx_start — the inside
# test `idx_start < b <= idx_end + 1` and the tree build only use
# differences), and the tree shape never looks at WHERE an out-of-span
# head points (any external head just makes its token a root child), so
# external heads are clamped to sentinel 0 in the key. ≤max_len-token
# spans then repeat the same few hundred dependency shapes across a
# corpus (hit rate ~100% after warm-up) and the memo is bounded: keys
# are ≤2·max_len ints with head offsets confined to [0, span+1]. This is
# the hot path of every EM/segmentation pass (profiled: tree_signature
# was 69% of the Viterbi kernel before memoization).
_SIG_MEMO: dict[tuple, str] = {}
# On THIS corpus the clamped key space is a few hundred shapes, but a
# worker process lives for the executor's lifetime and adversarial web
# text (pathological parses, long sentences when max_len grows) could
# grow the memo without bound. Hard cap: reset when full — the kernel is
# correct without the memo, so a reset only costs recomputation.
_SIG_MEMO_CAP = 1_000_000


def tree_signature(deps: list[tuple[int, int]], start: int, end: int) -> str:
    """Canonical shape string of the dep-subtree over deps[start:end).

    ``deps`` is the (idx_in_sentence, head) pair list the reference parses
    from *_dep files; mirrors GetSubtreeID's pair variant
    (segmentation.h:179-205) including its handling of gappy subsequences
    (TUPLE_MODE path tokens keep their original indices)."""
    idx_start = deps[start][0]
    # in-span head test `idx_start < b <= idx_end + 1` ⟺ 0 < rb <= span+1
    span1 = deps[end - 1][0] - idx_start + 1
    parts = []
    ap = parts.append
    for i in range(start, end):
        a, b = deps[i]
        ap(a - idx_start)
        rb = b - idx_start
        ap(rb if 0 < rb <= span1 else 0)
    key = tuple(parts)
    sig = _SIG_MEMO.get(key)
    if sig is None:
        children: dict[int, list[int]] = {}
        is_root: dict[int, bool] = {}
        for j in range(0, len(parts), 2):
            a, rb = parts[j] + 1, parts[j + 1]
            if rb:
                children.setdefault(rb, []).append(a)
                is_root[a] = False
        for j in range(0, len(parts), 2):
            a = parts[j] + 1
            if a not in is_root:
                children.setdefault(0, []).append(a)
        sig = _tree_to_string(children, 0)
        if len(_SIG_MEMO) >= _SIG_MEMO_CAP:
            _SIG_MEMO.clear()
        _SIG_MEMO[key] = sig
    return sig


def census_signatures(deps: list[tuple[int, int]], max_len: int = 6):
    """All span signatures, lengths 2..max_len (initializeDeps,
    segmentation.h:295-332). Yields signature strings."""
    n = len(deps)
    for ln in range(2, max_len + 1):
        for st in range(0, n - ln + 1):
            yield tree_signature(deps, st, st + ln)


# --------------------------------------------------------------------------
# Viterbi (segmentation.h:607-681) + punc cost (segmentation.h:334-358)
# --------------------------------------------------------------------------

def punc_cost(tokens: list[str], start: int, end_incl: int) -> float:
    for i in range(start, end_incl + 1):
        if tokens[i] in PUNC:
            return NEG_INF
    return 0.0


def viterbi_deps(
    tokens: list[str],
    deps: list[tuple[int, int]],
    trie: list,
    prob: list[float],
    deps_logprob: dict[str, float],
    default_logprob: float,
) -> tuple[list[float], list[int]]:
    """Dependency-constrained Viterbi (segmentation.h:607-681).

    ``deps_logprob`` maps signature → log prob; a missing signature mirrors
    the reference's map::operator[] default-insert quirk (GetSubtreeID is
    called on signatures absent from tree_map for gappy TUPLE_MODE spans;
    with assertions off it resolves to id 0) — we pass the id-0 signature's
    log prob as ``default_logprob``.

    Returns (f, pre, pids) where ``pids[x]`` is the pattern id of the span
    (pre[x], x) that wrote f[x] (-1 for the no-pattern fallback step).
    The trie maps each token sequence to at most one id, so the recorded
    pid is exactly what re-walking the trie over (pre[x], x) would find —
    the backtrace needs no second trie pass."""
    n = len(tokens)
    f = [NEG_INF] * (n + 1)
    pre = [-1] * (n + 1)
    pids = [-1] * (n + 1)
    f[0], pre[0] = 0.0, 0
    # punc prefix counts: span [i, j] contains punctuation iff
    # pc[j+1] - pc[i] > 0 — same NEG_INF semantics as punc_cost
    # (GetPuncCost, segmentation.h:334-358) without the O(span) rescan
    # per candidate
    pc = [0] * (n + 1)
    for i, t in enumerate(tokens):
        pc[i + 1] = pc[i] + (t in PUNC)
    dlp_get = deps_logprob.get
    for i in range(n):
        fi = f[i]
        if fi < -1e80:
            continue
        impossible = True
        u = trie
        for j in range(i, n):
            u = u[1].get(tokens[j])
            if u is None:
                break
            pid = u[0]
            if pid >= 0:
                impossible = False
                cand = fi + prob[pid]
                if j > i:
                    if pc[j + 1] - pc[i] > 0:
                        continue
                    sig = tree_signature(deps, i, j + 1)
                    cand += dlp_get(sig, default_logprob)
                if cand > f[j + 1]:
                    f[j + 1] = cand
                    pre[j + 1] = i
                    pids[j + 1] = pid
        if impossible and fi > f[i + 1]:
            f[i + 1] = fi
            pre[i + 1] = i
            pids[i + 1] = -1
    return f, pre, pids


def trie_lookup(trie: list, tokens: list[str], start: int, end: int) -> int:
    """Pattern id of tokens[start:end) in the trie, or -1."""
    u = trie
    for k in range(start, end):
        u = u[1].get(tokens[k])
        if u is None:
            return -1
    return u[0]


def backtrace_segments(
    tokens: list[str], pre: list[int], trie: list, patterns: list[tuple],
    rp_only: bool = False, pids: list[int] | None = None,
) -> list[tuple[int, int, int, bool]]:
    """Backtrace → [(start, end, pattern_id, quality_gate_passed)] in order.

    The gate mirrors remine.cpp:45-48: pattern found in trie, (mode 0 or
    indicator == 'RP'), and the size-dependent quality threshold. When the
    DP's recorded ``pids`` are passed, the per-segment trie re-walk is
    skipped (identical result — see viterbi_deps)."""
    segs = []
    i = len(tokens)
    while i > 0:
        j = pre[i]
        pid = pids[i] if pids is not None else trie_lookup(trie, tokens, j, i)
        ok = pid >= 0
        if ok:
            toks, _freq, q, ind = patterns[pid]
            ok = (not rp_only or ind == "RP") and (
                (len(toks) > 1 and q >= SEGMENT_MULTI_WORD_QUALITY_THRESHOLD)
                or (len(toks) == 1 and q >= SEGMENT_SINGLE_WORD_QUALITY_THRESHOLD)
            )
        segs.append((j, i, pid, bool(ok)))
        i = j
    segs.reverse()
    return segs


def segment_sentence(
    tokens, deps, trie, patterns, prob, deps_logprob, default_logprob,
    rp_only: bool = False,
):
    """Viterbi + backtrace in one call. Returns (segments, energy)."""
    f, pre, pids = viterbi_deps(
        tokens, deps, trie, prob, deps_logprob, default_logprob)
    segs = backtrace_segments(tokens, pre, trie, patterns,
                              rp_only=rp_only, pids=pids)
    return segs, f[len(tokens)]


# --------------------------------------------------------------------------
# Mention derivation (postprocessing.py:103-199), position-exact.
#
# The reference re-searches segment text in the token list (lossy,
# postprocessing.py:125-155); positions here come straight from the
# segmenter, which is the same dedup-by-end-position (cur_max) semantics
# without the re-search failure mode.
# --------------------------------------------------------------------------

def mentions_from_segments(
    segments: list[tuple[int, int, int, bool]],
    tokens: list[str],
    pos: list[str],
    patterns: list[tuple],
) -> list[tuple[int, int, str]]:
    """EP/BP quality segments → merged/trimmed entity mentions
    [start, end) + text. Mirrors postprocessing.py:158-199."""
    ments = []
    for (s, e, pid, ok) in segments:
        if not ok:
            continue
        ind = patterns[pid][3]
        if ind in ("EP", "BP"):
            ments.append([s, e, " ".join(tokens[s:e])])
    ments.sort(key=lambda m: m[1])

    # 'of' / 's merge + NN/W/PRP containment filter (postprocessing.py:158-179)
    new: list[list] = []
    for i in range(len(ments) - 1):
        cur, nxt = ments[i], ments[i + 1]
        if cur[1] == nxt[0] and (
            nxt[2][:2] == "of" or cur[2][-2:] == "of"
            or nxt[2][:2] == "'s" or cur[2][-2:] == "'s"
        ):
            postags = "".join(pos[cur[0]:nxt[1]])
            if "NN" in postags or "W" in postags:
                new.append([cur[0], nxt[1], cur[2] + " " + nxt[2]])
        elif len(new) == 0 or cur[0] >= new[-1][1]:
            postags = "".join(pos[cur[0]:cur[1]])
            if "NN" in postags or "W" in postags or "PRP" in postags:
                new.append(cur)
    if len(new) == 0:
        new = ments
    elif ments and new[-1][1] != ments[-1][1]:
        new.append(ments[-1])

    # IN/CC/TO edge trim (postprocessing.py:181-199)
    out = []
    for (s, e, text) in new:
        postags = pos[s:e]
        words = text.strip().split(" ")
        ns, ne = s, e
        if postags and postags[0] in ("IN", "CC", "TO"):
            words = words[1:]
            ns += 1
        if words and postags and postags[-1] in ("IN", "CC", "TO"):
            words = words[:-1]
            ne -= 1
        if (ns != s or ne != e):
            if ns != ne:
                out.append((ns, ne, " ".join(words)))
            # degenerate (all trimmed) → dropped, matching reference
        else:
            out.append((s, e, text))
    return out


# --------------------------------------------------------------------------
# Shortest dependency path (genSepath.h:22-211)
# --------------------------------------------------------------------------

def _print_subtree(parents, tags, bgs: set, index: int, special: bool) -> None:
    """printSubtree (genSepath.h:22-52): collect non-noun nodes of the
    subtree under `index` (1-based); in special mode collect IN/TO/RP."""
    if special or tags[index - 1] not in NOUN_TAGS:
        for child in parents[index]:
            _print_subtree(parents, tags, bgs, child, special)
    if not special and tags[index - 1] not in NOUN_TAGS:
        bgs.add(index)
    if special and tags[index - 1] in ATTACH_TAGS:
        bgs.add(index)


def gen_sepath(
    deps: list[tuple[int, int]],
    tags: list[str],
    types: list[str],
    ems: list[tuple[int, int]],
) -> dict[int, tuple[int, set[int]]]:
    """genSepath (genSepath.h:54-211), faithful including tie-breaks.

    deps: (idx_in_sentence, head) pairs, head 1-based, 0 = root.
    ems: mention [start, end) 0-based spans.
    Returns {target_mention_j: (source_mention_i, path_token_ids_1based)}.
    """
    n = len(deps)
    children: list[list[int]] = [[] for _ in range(n + 1)]  # ancestor chains
    parents: list[list[int]] = [[] for _ in range(n + 1)]
    paths: dict[int, tuple[int, set[int]]] = {}

    num_root = 0
    for i in range(n):
        a, b = i + 1, deps[i][1]
        if b == 0:
            children[a].append(a)
            num_root += 1
        if num_root > 1 or b > n:
            return paths
        parents[b].append(a)
        back = 0
        while b != 0:
            back += 1
            if b > n or back > n:
                return paths
            children[a].append(b)
            b = deps[b - 1][1]
    for item in children:
        item.reverse()

    out_nodes: list[list[int]] = [[] for _ in ems]
    out_types: list[list[str]] = [[] for _ in ems]
    for i, (ms, me) in enumerate(ems):
        for index in range(ms, me):
            if deps[index][1] <= ms or deps[index][1] > me:
                if deps[index][1] == 0:
                    out_nodes[i].append(index + 1)
                else:
                    out_nodes[i].append(deps[index][1])
                out_types[i].append(types[index])

    for j in range(len(ems)):
        distance = n
        min_i = -1
        min_start = min_end = min_parent = 0
        bgs: set[int] = set()
        for i in range(len(ems)):
            if i == j:
                continue
            broke = False
            for si in range(len(out_nodes[i])):
                if broke:
                    break
                for ei in range(len(out_nodes[j])):
                    if ("nmod" in out_types[i][si] or "dobj" in out_types[i][si]
                            or "nsubj" in out_types[j][ei]):
                        continue
                    start, end = out_nodes[i][si], out_nodes[j][ei]
                    min_depth = min(len(children[start]), len(children[end]))
                    parent = 0
                    for k in range(min_depth):
                        if children[start][k] != children[end][k]:
                            break
                        parent = k + 1
                    path_length = (len(children[end]) + len(children[start])
                                   + 2 - 2 * parent)
                    if path_length <= distance:
                        # tie-break quirk preserved (genSepath.h:151): equal
                        # length + non-nsubj source + no closer → break out
                        if (path_length == distance
                                and "nsubj" not in out_types[i][si]
                                and abs(i - j) >= abs(min_i - j)):
                            broke = True
                            break
                        distance = path_length
                        min_start, min_end = start, end
                        min_parent = parent
                        min_i = i

        if min_parent == 0:
            continue

        for st in range(min_parent, len(children[min_start])):
            _print_subtree(parents, tags, bgs, children[min_start][st],
                           False)
        _print_subtree(parents, tags, bgs, min_start, False)
        if min_start != min_end:
            for st in range(min_parent, len(children[min_end])):
                _print_subtree(parents, tags, bgs, children[min_end][st],
                               False)
            _print_subtree(parents, tags, bgs, min_end, False)
        for i in range(ems[j][0], ems[j][1]):
            _print_subtree(parents, tags, bgs, i + 1, True)

        # trim to the window between source end and target start
        # (genSepath.h:191-200)
        bgs = {p for p in bgs
               if not (p <= ems[min_i][1] or p > ems[j][0])}
        if bgs:
            paths[j] = (min_i, bgs)
    return paths
