"""Prefilter framework tests (utils/prefilter.py).

Prefilters must never change results (automaton.rs contract) — every
oracle search with a prefilter must equal the same search without one.
"""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, Input, MatchKind
from ahocorasick_tpu.utils import prefilter as pf


def test_selection_heuristics():
    assert isinstance(pf.build([b"needle"]), pf.Memmem)
    # 2 distinct, non-ubiquitous start bytes
    p = pf.build([b"xray", b"x-ray", b"query"])
    assert isinstance(p, pf.StartBytes)
    assert p.bytes == b"qx"
    # >3 start bytes, but rare bytes exist (q, z, X)
    p = pf.build([b"aqua", b"fez zz", b"miXr", b"help q"])
    assert isinstance(p, (pf.RareBytes, pf.StartBytes))
    # no prefilter for empty patterns
    assert pf.build([b""]) is None
    assert pf.build([]) is None


def test_case_insensitive_folding():
    p = pf.build([b"Query"], case_insensitive=True)
    # single pattern but case-insensitive -> not memmem
    assert not isinstance(p, pf.Memmem)
    if p is not None:
        c = p.find_in(b"zzz qUERY", 0, 9)
        assert c is not None and c.start <= 4


def test_candidates_sound():
    """A candidate's start is never past a real match start."""
    rng = np.random.default_rng(0)
    pats = [b"zebra", b"quartz", b"jinx"]
    p = pf.build(pats)
    assert p is not None
    hay = bytearray(rng.choice(list(b"aeiou tnsh"), size=4000
                               ).astype(np.uint8))
    hay[1000:1005] = b"zebra"
    hay[3000:3006] = b"quartz"
    hay = bytes(hay)
    c = p.find_in(hay, 0, len(hay))
    assert c is not None and c.start <= 1000
    c = p.find_in(hay, 1500, len(hay))
    assert c is not None and c.start <= 3000
    assert p.find_in(hay, 3500, len(hay)) is None


@pytest.mark.parametrize(
    "kind",
    [MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
     MatchKind.LEFTMOST_LONGEST],
)
def test_oracle_with_prefilter_matches_without(kind):
    rng = np.random.default_rng(7)
    pats = ["zebra", "quartz", "jinx", "zeb"]
    hay = "".join(
        rng.choice(list("aeiou tnshzebraquartzjinx"), size=3000)
    )
    with_pf = AhoCorasick(pats, match_kind=kind, engine="oracle")
    no_pf = AhoCorasick(
        pats, match_kind=kind, engine="oracle", prefilter=False
    )
    assert with_pf._prefilter() is not None
    a = [m.astuple() for m in with_pf.find_iter(Input(hay))]
    b = [m.astuple() for m in no_pf.find_iter(Input(hay))]
    assert a == b
    assert len(a) > 0
