"""Positional-variation sweep — packed/tests.rs:42-51 analog.

The reference expands every packed test into 783 variations (prefix /
suffix / both Z-padding, offsets 0..=260) to hit every vector-alignment
path. Our kernel's alignment-sensitive seams are: byte-in-word (mod 4),
bitmap word (mod 32), chunk (mod Lc) and per-lane stream (mod L)
boundaries. Instead of 783 engine dispatches per case, each sweep packs
every offset variation into ONE haystack (copies separated by >=
max_pattern_len 'Z' runs, which no pattern touches), so a single scan
must produce the union of all shifted match sets — same alignment
coverage, hundreds of times cheaper.
"""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, Input, MatchKind

# (patterns, haystack, expected (pid, start, end) triples)
BASES = [
    (["abba"], "abba", [(0, 0, 4)]),
    (["abba", "bb"], "xabbax", [(0, 1, 5), (1, 2, 4)]),
    (["fox", "foxtrot"], "the foxtrot fox", [(0, 4, 7), (1, 4, 11),
                                             (0, 12, 15)]),
    (["a"], "aaa", [(0, 0, 1), (0, 1, 2), (0, 2, 3)]),
    (["abcdefghijklm", "def"], "abcdefghijklm",
     [(0, 0, 13), (1, 3, 6)]),
]

OFFSETS = list(range(0, 261))


def _sweep_haystack(hay: bytes, maxlen: int):
    """All offset variations of `hay` packed into one buffer; returns
    (buffer, base offset of each copy)."""
    sep = b"Z" * max(maxlen, 4)
    parts, bases = [], []
    pos = 0
    for off in OFFSETS:
        lead = b"Z" * off
        parts.append(lead)
        pos += len(lead)
        bases.append(pos)
        parts.append(hay)
        pos += len(hay)
        parts.append(sep)
        pos += len(sep)
    return b"".join(parts), bases


@pytest.mark.parametrize("engine", ["bitap", "fingerprint"])
@pytest.mark.parametrize("case_idx", range(len(BASES)))
def test_positional_sweep_overlapping(engine, case_idx):
    pats, hay, triples = BASES[case_idx]
    hay = hay.encode()
    maxlen = max(len(p) for p in pats)
    buf, bases = _sweep_haystack(hay, maxlen)
    want = []
    for b in bases:
        for (pid, s, e) in triples:
            want.append((pid, b + s, b + e))
    want.sort(key=lambda t: (t[2], -(t[2] - t[1]), t[0]))
    ac = AhoCorasick(pats, engine=engine, device_threshold=0)
    got = [m.astuple() for m in ac.find_overlapping_iter(Input(buf))]
    assert got == want


@pytest.mark.parametrize("engine", ["bitap", "fingerprint"])
def test_positional_sweep_packed_api(engine):
    """The packed (leftmost-first) searcher over the same sweep."""
    from ahocorasick_tpu.packed import Builder

    pats = [b"fox", b"foxtrot", b"ox"]
    hay = b"the foxtrot!"
    maxlen = 7
    buf, bases = _sweep_haystack(hay, maxlen)
    s = Builder().extend(pats).build()
    got = [(m.pattern, m.start, m.end) for m in s.find_iter(buf)]
    # Leftmost-first: "fox" (pattern 0) wins over "foxtrot" at the same
    # start (packed/api.rs leftmost-first default).
    want = [(0, b + 4, b + 7) for b in bases]
    assert got == want


def test_positional_sweep_counts_match_find():
    """count_matches must agree with the overlapping iterator across
    every alignment (exercises the popcount/window masking seams)."""
    pats = ["ab", "ba", "aba"]
    hay = b"abab"
    buf, bases = _sweep_haystack(hay, 3)
    ac = AhoCorasick(pats, engine="bitap", device_threshold=0)
    want = len(list(ac.find_overlapping_iter(Input(buf))))
    assert ac.count_matches(Input(buf)) == want
    ac2 = AhoCorasick(pats, engine="fingerprint", device_threshold=0)
    assert ac2.count_matches(Input(buf)) == want
