"""Native (C++) extension tests: beam decoder parity vs the Python reference
implementation, ARPA LM parity, Levenshtein."""

import numpy as np
import pytest

cpp = pytest.importorskip("dsjax.cpp.beam_binding")

from dsjax.decode.beam import BeamCTCDecoder  # noqa: E402
from dsjax.decode.lm import ArpaLM  # noqa: E402

from .test_decoders import ARPA, LABELS  # noqa: E402


def _rand_probs(rng, t, c):
    logits = rng.standard_normal((t, c)) * 2
    p = np.exp(logits)
    return (p / p.sum(-1, keepdims=True)).astype(np.float32)


def test_levenshtein_native():
    assert cpp.levenshtein([1, 2, 3], [1, 2, 3]) == 0
    assert cpp.levenshtein([1, 2, 3], [2, 3]) == 1
    assert cpp.levenshtein([], [1, 2]) == 2
    assert cpp.levenshtein([5, 6], [7, 8, 9]) == 3


def test_cpp_lm_matches_python(tmp_path):
    p = tmp_path / "t.arpa"
    p.write_text(ARPA)
    py = ArpaLM(str(p))
    native = cpp.CppLM(str(p))
    cases = [("CAB", ["<s>"]), ("BAC", ["CAB"]), ("ZZZ", []), ("AB", ["CAB"]),
             ("AB", ["<s>", "CAB"]), ("</s>", ["AB"])]
    for word, ctx in cases:
        np.testing.assert_allclose(native.score_word(word, ctx),
                                   py.score_word(word, ctx), rtol=1e-6,
                                   err_msg=f"{word}|{ctx}")


@pytest.mark.parametrize("with_lm", [False, True])
def test_cpp_beam_matches_python(tmp_path, with_lm):
    lm_path = None
    if with_lm:
        p = tmp_path / "t.arpa"
        p.write_text(ARPA)
        lm_path = str(p)
    rng = np.random.default_rng(9)
    dec = BeamCTCDecoder(LABELS, lm_path=lm_path, alpha=1.0 if with_lm else 0.0,
                         beta=0.5 if with_lm else 0.0, beam_width=8,
                         cutoff_top_n=len(LABELS))
    assert dec._cpp is not None, "native decoder should have built"
    for trial in range(4):
        probs = _rand_probs(rng, 12, len(LABELS))
        cpp_hyps = dec._cpp.decode(probs, dec.alpha, dec.beta, dec.beam_width,
                                   dec.cutoff_top_n, dec.cutoff_prob)
        py_hyps = dec._decode_one(probs)
        # top hypothesis must match in labels and score
        assert cpp_hyps[0][0] == py_hyps[0][0], f"trial {trial}"
        np.testing.assert_allclose(cpp_hyps[0][2], py_hyps[0][2], rtol=1e-5)
        # full beam label sets should agree
        assert {h[0] for h in cpp_hyps[:5]} == {h[0] for h in py_hyps[:5]}


def test_decode_api_uses_native():
    rng = np.random.default_rng(3)
    dec = BeamCTCDecoder(LABELS, beam_width=8, cutoff_top_n=len(LABELS))
    probs = _rand_probs(rng, 10, len(LABELS))[None]
    strings, offsets = dec.decode(probs)
    assert isinstance(strings[0][0], str)
    assert len(offsets[0][0]) == len(strings[0][0])


def test_binary_lm_matches_text(tmp_path):
    """DSLMBIN1 (mmap'd, KenLM-binary equivalent) scores == ARPA text."""
    p = tmp_path / "t.arpa"
    p.write_text(ARPA)
    b = tmp_path / "t.bin"
    cpp.build_lm_binary(str(p), str(b))
    assert b.read_bytes()[:8] == b"DSLMBIN2"  # v2: + device-build sections
    text = cpp.CppLM(str(p))
    binary = cpp.CppLM(str(b))
    assert binary.order == text.order == 2
    cases = [("CAB", ["<s>"]), ("BAC", ["CAB"]), ("ZZZ", []), ("AB", ["CAB"]),
             ("AB", ["<s>", "CAB"]), ("</s>", ["AB"]), ("CAB", ["ZZZ"]),
             ("ZZZ", ["ZZZ", "ZZZ"])]
    for word, ctx in cases:
        np.testing.assert_allclose(binary.score_word(word, ctx),
                                   text.score_word(word, ctx), rtol=1e-6,
                                   err_msg=f"{word}|{ctx}")


def test_beam_decode_binary_lm_matches_text(tmp_path):
    """Full beam decode through the binary LM equals the text-LM decode."""
    from dsjax.decode.beam import BeamCTCDecoder

    p = tmp_path / "t.arpa"
    p.write_text(ARPA)
    b = tmp_path / "t.bin"
    cpp.build_lm_binary(str(p), str(b))
    rng = np.random.default_rng(11)
    d_text = BeamCTCDecoder(LABELS, lm_path=str(p), alpha=1.0, beta=0.4,
                            beam_width=8, cutoff_top_n=len(LABELS))
    d_bin = BeamCTCDecoder(LABELS, lm_path=str(b), alpha=1.0, beta=0.4,
                           beam_width=8, cutoff_top_n=len(LABELS))
    from dsjax.decode.lm import MmapLM

    assert isinstance(d_bin.lm, MmapLM)  # python twin loads the binary too
    for _ in range(3):
        probs = _rand_probs(rng, 14, len(LABELS))[None]
        s_text, _ = d_text.decode(probs)
        s_bin, _ = d_bin.decode(probs)
        assert s_text[0][0] == s_bin[0][0]


@pytest.mark.parametrize("with_lm", [False, True])
def test_cpp_beam_matches_python_wide(tmp_path, with_lm):
    """Width-64 / T=50 stress parity (exercises the epoch-stamped merge +
    lazy node materialization: fresh-vs-existing targets, pruned prefixes
    re-extended later, beams dominated by pruning)."""
    lm_path = None
    if with_lm:
        p = tmp_path / "t.arpa"
        p.write_text(ARPA)
        lm_path = str(p)
    rng = np.random.default_rng(4)
    dec = BeamCTCDecoder(LABELS, lm_path=lm_path, alpha=0.7 if with_lm else 0.0,
                         beta=0.3 if with_lm else 0.0, beam_width=64,
                         cutoff_top_n=len(LABELS))
    assert dec._cpp is not None
    for trial in range(2):
        probs = _rand_probs(rng, 50, len(LABELS))
        cpp_hyps = dec._cpp.decode(probs, dec.alpha, dec.beta, dec.beam_width,
                                   dec.cutoff_top_n, dec.cutoff_prob)
        py_hyps = dec._decode_one(probs)
        assert cpp_hyps[0][0] == py_hyps[0][0], f"trial {trial}"
        np.testing.assert_allclose(cpp_hyps[0][2], py_hyps[0][2], rtol=1e-5)
        assert {h[0] for h in cpp_hyps[:8]} == {h[0] for h in py_hyps[:8]}
        # offsets follow ctcdecode timestep semantics (loudest attempt
        # frame per trie node — NOT monotone emission frames); the C++
        # trie must agree with the python PathTrie twin exactly
        offs = cpp_hyps[0][1]
        assert len(offs) == len(cpp_hyps[0][0])
        assert all(0 <= o < 50 for o in offs)
        assert tuple(offs) == tuple(py_hyps[0][1]), f"trial {trial}"


def test_binary_lm_fuzz_truncated_corrupted(tmp_path):
    """DSLMBIN1 is untrusted input: truncated and bit-flipped binaries must
    load as invalid (or raise) — never memcpy past the map or crash."""
    p = tmp_path / "t.arpa"
    p.write_text(ARPA)
    bin_path = str(tmp_path / "lm.bin")
    cpp.build_lm_binary(str(p), bin_path)
    blob = bytearray(open(bin_path, "rb").read())
    rng = np.random.default_rng(0)
    for trial in range(40):
        buf = bytearray(blob)
        if trial % 2 == 0:
            buf = buf[: int(rng.integers(9, len(buf)))]  # keep magic
        else:
            idx = rng.integers(8, len(buf), size=6)
            for i in idx:
                buf[int(i)] ^= int(rng.integers(1, 255))
        f = tmp_path / f"f{trial}.bin"
        f.write_bytes(bytes(buf))
        try:
            lm = cpp.CppLM(str(f))
            # loaded or rejected: any score query must be finite-safe
            if lm.order >= 1:
                lm.score_word("CAB", ["AB"])
        except Exception:
            pass  # clean rejection is fine; a crash would kill pytest
