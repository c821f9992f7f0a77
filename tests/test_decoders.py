"""Greedy + beam decoder correctness, incl. beam-vs-brute-force and LM fusion."""

import itertools
import math

import numpy as np

from dsjax.decode.beam import BeamCTCDecoder
from dsjax.decode.greedy import GreedyDecoder
from dsjax.decode.lm import ArpaLM

LABELS = ["_", "'", "A", "B", "C", " "]


def test_greedy_collapse():
    dec = GreedyDecoder(LABELS)
    # frames: A A _ B B _ A -> "ABA"
    ids = [2, 2, 0, 3, 3, 0, 2]
    probs = np.full((1, len(ids), len(LABELS)), 0.01, np.float32)
    for t, c in enumerate(ids):
        probs[0, t, c] = 0.9
    strings, offsets = dec.decode(probs)
    assert strings[0][0] == "ABA"
    np.testing.assert_array_equal(offsets[0][0], [0, 3, 6])


def test_greedy_respects_sizes():
    dec = GreedyDecoder(LABELS)
    ids = [2, 0, 3, 4, 4]
    probs = np.full((1, len(ids), len(LABELS)), 0.01, np.float32)
    for t, c in enumerate(ids):
        probs[0, t, c] = 0.9
    strings, _ = dec.decode(probs, sizes=[3])
    assert strings[0][0] == "AB"


def test_greedy_spaces():
    dec = GreedyDecoder(LABELS)
    ids = [2, 5, 3]  # "A B"
    probs = np.full((1, 3, len(LABELS)), 0.01, np.float32)
    for t, c in enumerate(ids):
        probs[0, t, c] = 0.9
    strings, _ = dec.decode(probs)
    assert strings[0][0] == "A B"


def _brute_force_best(probs):
    """Exact posterior argmax over collapsed label sequences."""
    T, C = probs.shape
    scores = {}
    for path in itertools.product(range(C), repeat=T):
        p = math.prod(probs[t, c] for t, c in enumerate(path))
        collapsed = []
        prev = None
        for c in path:
            if c != prev and c != 0:
                collapsed.append(c)
            prev = c
        key = tuple(collapsed)
        scores[key] = scores.get(key, 0.0) + p
    return max(scores.items(), key=lambda kv: kv[1])


def test_beam_matches_brute_force_no_lm():
    rng = np.random.default_rng(5)
    T, C = 5, 4
    logits = rng.standard_normal((T, C))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    best_seq, _ = _brute_force_best(probs)
    dec = BeamCTCDecoder(LABELS[:C], beam_width=64, cutoff_top_n=C)
    strings, _ = dec.decode(probs[None].astype(np.float32))
    expect = "".join(LABELS[c] for c in best_seq)
    assert strings[0][0] == expect


def test_beam_wider_is_no_worse_than_greedy():
    rng = np.random.default_rng(6)
    T, C = 30, len(LABELS)
    logits = rng.standard_normal((T, C)) * 2
    probs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    greedy = GreedyDecoder(LABELS)
    beam = BeamCTCDecoder(LABELS, beam_width=32, cutoff_top_n=C)
    g_str = greedy.decode(probs[None])[0][0][0]
    b_str = beam.decode(probs[None])[0][0][0]
    assert isinstance(b_str, str)
    # beam should at least produce a non-degenerate hypothesis
    assert len(b_str) > 0 or len(g_str) == 0


ARPA = """\\data\\
ngram 1=6
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.8\tCAB\t-0.3
-1.5\tBAC\t-0.3
-0.9\tAB\t-0.2
-2.0\t<unk>

\\2-grams:
-0.2\t<s> CAB
-0.4\tCAB AB
-1.8\t<s> BAC

\\end\\
"""


def test_arpa_lm_loading_and_backoff(tmp_path):
    p = tmp_path / "test.arpa"
    p.write_text(ARPA)
    lm = ArpaLM(str(p))
    assert lm.order == 2
    # direct bigram hit
    np.testing.assert_allclose(lm.score_word("CAB", ["<s>"]), -0.2)
    # backoff: P(BAC | CAB) = b(CAB) + P(BAC) = -0.3 + -1.5
    np.testing.assert_allclose(lm.score_word("BAC", ["CAB"]), -1.8)
    # OOV -> <unk>
    np.testing.assert_allclose(lm.score_word("ZZZ", []), -2.0)


def test_beam_lm_rescoring(tmp_path):
    """With an LM strongly favoring 'CAB', ambiguous acoustics flip to it."""
    p = tmp_path / "test.arpa"
    p.write_text(ARPA)
    # acoustics slightly favor "BAC" over "CAB"
    T = 7
    C = len(LABELS)
    probs = np.full((T, C), 0.02, np.float32)
    seq_b = [3, 2, 4, 5, 0, 0, 0]   # "BAC "
    seq_c = [4, 2, 3, 5, 0, 0, 0]   # "CAB "
    for t in range(T):
        probs[t, seq_b[t]] = 0.42
        probs[t, seq_c[t]] += 0.38
    probs /= probs.sum(-1, keepdims=True)

    no_lm = BeamCTCDecoder(LABELS, beam_width=16, cutoff_top_n=C)
    s0, _ = no_lm.decode(probs[None])
    assert s0[0][0].strip() == "BAC"

    with_lm = BeamCTCDecoder(LABELS, lm_path=str(p), alpha=1.5, beta=0.0,
                             beam_width=16, cutoff_top_n=C)
    s1, _ = with_lm.decode(probs[None])
    assert s1[0][0].strip() == "CAB"

    # reset_params back to alpha=0 restores the acoustic-only result
    with_lm.reset_params(0.0, 0.0)
    s2, _ = with_lm.decode(probs[None])
    assert s2[0][0].strip() == "BAC"


def test_metrics():
    from dsjax.train.metrics import CharErrorRate, WordErrorRate

    wer, cer = WordErrorRate(), CharErrorRate()
    wer.update("THE CAT", "THE CAT")
    cer.update("THE CAT", "THE CAT")
    assert wer.compute() == 0.0 and cer.compute() == 0.0
    wer.update("THE BAT", "THE CAT")
    cer.update("THE BAT", "THE CAT")
    # 1 wrong word of 2 -> cumulative: 1/(2+2)*100 = 25
    assert wer.compute() == 25.0
    # 1 wrong char of 6+6 non-space chars
    np.testing.assert_allclose(cer.compute(), 100.0 / 12)


# ---------------------------------------------------------------------------
# ctcdecode offsets semantics: brute-force cross-check
# ---------------------------------------------------------------------------


def _naive_ctcdecode(probs, beam_width, blank=0, cutoff_top_n=10**9):
    """Independent, deliberately-naive reimplementation of ctcdecode's
    prefix beam search WITH its timestep bookkeeping (parlance/ctcdecode
    ctc_beam_search_decoder.cpp + path_trie.cpp): prefix-tuple-keyed dicts
    instead of a trie. Node state (log_prob_c, timestep) updates on every
    extension attempt from an in-beam parent; pruned beams are marked dead
    and dead childless chains are deleted (forgetting their state)."""
    lp = np.log(np.maximum(probs, 1e-30))
    t_dim, c_dim = lp.shape
    NEG = -float("inf")

    def lse(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    # node store: prefix -> dict(exists, lp_c, ts); mass: prefix -> [pb, pnb]
    nodes = {(): {"exists": True, "lp_c": NEG, "ts": 0}}
    mass = {(): [0.0, NEG]}
    beams = [()]

    def get_path(prefix, c, t, p_c):
        ext = prefix + (c,)
        st = nodes.get(ext)
        if st is None:
            nodes[ext] = {"exists": True, "lp_c": p_c, "ts": t}
        else:
            if st["lp_c"] < p_c:
                st["lp_c"] = p_c
                st["ts"] = t
            st["exists"] = True
        return ext

    def remove(prefix):
        st = nodes[prefix]
        st["exists"] = False
        has_children = any(k[:-1] == prefix for k in nodes if len(k) == len(prefix) + 1)
        if not has_children and prefix:
            del nodes[prefix]
            parent = prefix[:-1]
            pst = nodes.get(parent)
            if pst is not None and not pst["exists"]:
                remove(parent)

    for t in range(t_dim):
        row = lp[t]
        cand = list(np.argsort(row)[::-1][:cutoff_top_n])
        new_mass = {}

        def bump(prefix, which, val):
            m = new_mass.setdefault(prefix, [NEG, NEG])
            m[which] = lse(m[which], val)

        for prefix in beams:
            pb, pnb = mass[prefix]
            p_total = lse(pb, pnb)
            last = prefix[-1] if prefix else -1
            for c in cand:
                p_c = float(row[c])
                if c == blank:
                    bump(prefix, 0, p_total + p_c)
                    continue
                if c == last:
                    bump(prefix, 1, pnb + p_c)
                ext = get_path(prefix, int(c), t, p_c)
                sc = (pb + p_c) if c == last else (p_total + p_c)
                bump(ext, 1, sc)

        # every live node competes (untouched ones at -inf), top-W survive
        all_live = [p for p, st in nodes.items() if st["exists"]]
        scored = []
        for p in all_live:
            m = new_mass.get(p, [NEG, NEG])
            scored.append((lse(m[0], m[1]), p))
        scored.sort(key=lambda s: s[0], reverse=True)
        beams = [p for _, p in scored[:beam_width]]
        mass = {p: new_mass.get(p, [NEG, NEG]) for p in beams}
        for _, p in scored[beam_width:]:
            remove(p)

    out = []
    for p in beams:
        m = mass[p]
        offs = tuple(nodes[p[: j + 1]]["ts"] for j in range(len(p)))
        out.append((p, offs, lse(m[0], m[1])))
    out.sort(key=lambda r: r[2], reverse=True)
    return out


def test_beam_offsets_match_naive_ctcdecode():
    """The PathTrie twin (and therefore the C++ beam, which test_cpp_native
    pins to it exactly) reproduces ctcdecode's quirky timestep semantics:
    a char's offset is the LOUDEST attempt frame, which can move after the
    char was first emitted and need not be monotone across the string."""
    rng = np.random.default_rng(7)
    dec = BeamCTCDecoder(LABELS, beam_width=12, cutoff_top_n=len(LABELS))
    dec._cpp = None  # exercise the python twin
    for trial in range(6):
        t_dim = int(rng.integers(6, 20))
        probs = rng.dirichlet(np.full(len(LABELS), 0.5), size=t_dim).astype(np.float32)
        py = dec._decode_one(probs)
        naive = _naive_ctcdecode(probs, beam_width=12)
        assert py[0][0] == naive[0][0], f"trial {trial}: ids differ"
        assert tuple(py[0][1]) == tuple(naive[0][1]), f"trial {trial}: offsets differ"
        assert abs(py[0][2] - naive[0][2]) < 1e-6


def test_beam_offsets_loudest_frame_rule():
    """Constructed case: char A emits early but its loudest frame is later
    while the prefix parent is still in the beam -> the reported offset is
    the later, louder frame (ctcdecode parity), not the emission frame."""
    C = len(LABELS)
    probs = np.full((5, C), 0.01, np.float32)
    # t0: A likely (emission), t1..t2 blank-ish, t3: A very loud again
    probs[0, 2] = 0.60   # A
    probs[0, 0] = 0.35
    probs[1, 0] = 0.90
    probs[2, 0] = 0.90
    probs[3, 2] = 0.95   # louder A attempt (extends "" -> "A" again / "A"->"AA")
    probs[4, 0] = 0.90
    probs /= probs.sum(axis=1, keepdims=True)
    dec = BeamCTCDecoder(LABELS, beam_width=8, cutoff_top_n=C)
    dec._cpp = None
    py = dec._decode_one(probs)
    naive = _naive_ctcdecode(probs, beam_width=8)
    assert py[0][0] == naive[0][0]
    assert tuple(py[0][1]) == tuple(naive[0][1])
    # winner "AA": BOTH chars report frame 3 — the first A emitted at t=0
    # but its loudest attempt (while "" was still in the beam) is t=3, and
    # the second A's only strong attempt is t=3 too. Offsets are neither
    # unique nor monotone: exactly ctcdecode's behavior.
    assert tuple(py[0][0]) == (2, 2)
    assert tuple(py[0][1]) == (3, 3)


def test_trie_handles_depth_beyond_recursion_limit():
    """Long transcripts build prefix tries deeper than Python's recursion
    limit; iterate_to_vec/remove must be iterative (a few minutes of
    audio decoded one-shot exceeds 1000 chars)."""
    import sys

    from dsjax.decode.beam import _TrieNode

    depth = sys.getrecursionlimit() + 500
    root = _TrieNode()
    node = root
    for t in range(depth):
        node = node.get_path_trie(1 + (t % 5), t, -1.0)
    out = []
    root.iterate_to_vec(out)
    assert len(out) == depth + 1
    node.remove()          # deepest chain unwinds without RecursionError
    for n in out:
        n.exists = False
    node2 = root
    while node2.children:
        node2 = next(iter(node2.children.values()))
    node2.remove()
    assert not root.children
