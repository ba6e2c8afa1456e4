"""Transducer (set-intersection) adapter tests.

Parity targets: the reference's doc examples (transducer.rs:26-40
unanchored, :104-121 anchored) plus pruning / sticky-match /
sorted-order contracts.
"""

import pytest

from ahocorasick_tpu import AhoCorasick, MatchKind, StartKind
from ahocorasick_tpu.transducer import Anchored, Unanchored, search_keys
from ahocorasick_tpu.utils.errors import MatchError


def keys_of(searcher, keys):
    return [k.decode() for k in search_keys(searcher, sorted(keys))]


def test_unanchored_doc_example():
    # transducer.rs:26-40: keys {abcd, bc, bcd, xyz} x patterns
    # {bcd, x} -> [abcd, bcd, xyz]
    ac = AhoCorasick(["bcd", "x"])
    got = keys_of(Unanchored(ac), ["abcd", "bc", "bcd", "xyz"])
    assert got == ["abcd", "bcd", "xyz"]


def test_anchored_doc_example():
    # transducer.rs:104-121: same inputs, anchored -> [bcd, xyz]
    ac = AhoCorasick(["bcd", "x"], start_kind=StartKind.BOTH)
    got = keys_of(Anchored(ac), ["abcd", "bc", "bcd", "xyz"])
    assert got == ["bcd", "xyz"]


def test_anchored_requires_anchored_start_kind():
    # Fallible construction (transducer.rs:50-55, :130-136): the default
    # facade supports unanchored only.
    ac = AhoCorasick(["bcd"])
    with pytest.raises(MatchError):
        Anchored(ac)
    ac2 = AhoCorasick(["bcd"], start_kind=StartKind.ANCHORED)
    with pytest.raises(MatchError):
        Unanchored(ac2)


def test_sticky_match_accepts_extensions():
    ac = AhoCorasick(["ab"])
    got = keys_of(Unanchored(ac), ["ab", "abzzz", "azzz", "zab"])
    assert got == ["ab", "abzzz", "zab"]


def test_anchored_prunes_dead_subtrees():
    ac = AhoCorasick(["foo"], start_kind=StartKind.BOTH)
    calls = []
    w = Anchored(ac)
    orig = w.accept

    def counting_accept(state, byte):
        calls.append(byte)
        return orig(state, byte)

    w.accept = counting_accept
    keys = ["bar", "barbell", "barrel", "foo", "food"]
    got = [k.decode() for k in search_keys(w, keys)]
    assert got == ["foo", "food"]
    # 'bar...' dies at 'b'; barbell/barrel are pruned without any
    # accept() calls: b + foo + d(food) = 5 total.
    assert len(calls) == 5


def test_unsorted_keys_rejected():
    ac = AhoCorasick(["a"])
    with pytest.raises(ValueError):
        list(search_keys(Unanchored(ac), ["b", "a"]))


def test_shared_prefix_state_reuse():
    ac = AhoCorasick(["abc", "abd"], match_kind=MatchKind.STANDARD)
    got = keys_of(Unanchored(ac), ["ab", "abc", "abcz", "abd", "abe"])
    assert got == ["abc", "abcz", "abd"]


def test_wrappers_expose_inner():
    ac = AhoCorasick(["z"])
    w = Unanchored(ac)
    assert w.as_ref() is ac
    assert w.into_inner() is ac


def test_case_insensitive_automaton():
    ac = AhoCorasick(["BCD"], ascii_case_insensitive=True)
    got = keys_of(Unanchored(ac), ["abcd", "xbCd", "xyz"])
    assert got == ["abcd", "xbCd"]
