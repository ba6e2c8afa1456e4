"""Contiguous NFA backend tests (automata/contiguous.py).

The contiguous encoding is a pure re-encoding of the noncontiguous
automaton: every walk must be step-for-step identical (after the
offset remap), and the encoding must be smaller for non-tiny sets.
"""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, AhoCorasickKind, Input, MatchKind
from ahocorasick_tpu.automata.contiguous import build_contiguous
from ahocorasick_tpu.automata.noncontiguous import compile_nfa
from ahocorasick_tpu.utils.search import Anchored
from ahocorasick_tpu import oracle as _unused  # noqa: F401


def walk_equal(pats, hay, kind, ci=False, dense_depth=3):
    nfa = compile_nfa(
        [p.encode() if isinstance(p, str) else p for p in pats],
        match_kind=kind,
        ascii_case_insensitive=ci,
    )
    c = build_contiguous(nfa, dense_depth)
    from ahocorasick_tpu import oracle

    a = oracle.find_all_overlapping(nfa, hay) if kind.is_standard() else \
        [m.astuple() for m in oracle.find_iter(nfa, Input(hay))]
    b = oracle.find_all_overlapping(c, hay) if kind.is_standard() else \
        [m.astuple() for m in oracle.find_iter(c, Input(hay))]
    assert a == b, (pats, hay[:40], kind)
    return nfa, c


@pytest.mark.parametrize(
    "kind",
    [MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
     MatchKind.LEFTMOST_LONGEST],
)
@pytest.mark.parametrize("dense_depth", [0, 1, 3, 100])
def test_walk_equivalence(kind, dense_depth):
    rng = np.random.default_rng(1)
    pats = ["ab", "abc", "bc", "c", "cba", "abcabc"]
    hay = bytes(rng.choice(list(b"abc"), size=4000).astype(np.uint8))
    walk_equal(pats, hay, kind, dense_depth=dense_depth)


def test_walk_case_insensitive_and_anchored():
    nfa, c = walk_equal(
        ["AbC", "bC"], b"abc ABC aBc xbc", MatchKind.STANDARD, ci=True
    )
    # anchored stepping parity
    for hay in (b"abc", b"xabc", b"bcq"):
        s1 = nfa.start_state(Anchored.YES)
        s2 = c.start_state(Anchored.YES)
        for byte in hay:
            s1 = nfa.next_state(Anchored.YES, s1, byte)
            s2 = c.next_state(Anchored.YES, s2, byte)
            assert nfa.is_dead(s1) == c.is_dead(s2)
            assert nfa.is_match(s1) == c.is_match(s2)
            if nfa.is_match(s1):
                assert nfa.match_len(s1) == c.match_len(s2)
                assert all(
                    nfa.match_pattern(s1, i) == c.match_pattern(s2, i)
                    for i in range(c.match_len(s2))
                )


def test_memory_smaller_than_dfa():
    rng = np.random.default_rng(2)
    pats = [
        bytes(rng.choice(list(b"abcdefghij"), size=int(rng.integers(3, 12))
                         ).astype(np.uint8))
        for _ in range(500)
    ]
    ac = AhoCorasick(pats)
    nfa = ac._match_nfa
    c = build_contiguous(nfa)
    assert c.memory_usage() < ac._dfa.memory_usage()
    assert c.memory_usage() < nfa.memory_usage()


def test_facade_kind_routes_host_paths():
    pats = ["ab", "abc", "bc"]
    ac = AhoCorasick(pats, kind=AhoCorasickKind.CONTIGUOUS_NFA)
    aut = ac._oracle_automaton()
    from ahocorasick_tpu.automata.contiguous import ContiguousNFA

    assert isinstance(aut, ContiguousNFA)
    # anchored search (always host) through the contiguous backend
    from ahocorasick_tpu import StartKind

    ac2 = AhoCorasick(
        pats,
        kind=AhoCorasickKind.CONTIGUOUS_NFA,
        start_kind=StartKind.BOTH,
    )
    inp = Input("abcq", anchored=Anchored.YES)
    got = [m.astuple() for m in ac2.find_iter(inp)]
    ref = AhoCorasick(pats, start_kind=StartKind.BOTH)
    want = [m.astuple() for m in ref.find_iter(
        Input("abcq", anchored=Anchored.YES)
    )]
    assert got == want
