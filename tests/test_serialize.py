"""Checkpoint/restore round-trip tests (serialize.py)."""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, Input, MatchKind, StartKind


def triples(it):
    return [m.astuple() for m in it]


@pytest.mark.parametrize(
    "kind",
    [MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
     MatchKind.LEFTMOST_LONGEST],
)
def test_roundtrip_semantics(tmp_path, kind):
    pats = ["append", "appendage", "app", "ap", "Snap"]
    ac = AhoCorasick(pats, match_kind=kind, device_threshold=0)
    h = "the appendage Snapped app ap append " * 7
    want = triples(ac.find_iter(Input(h)))
    p = str(tmp_path / "ac.npz")
    ac.save(p)
    ac2 = AhoCorasick.load(p)
    assert triples(ac2.find_iter(Input(h))) == want
    assert ac2.kind() == ac.kind()
    assert ac2.match_kind() == ac.match_kind()
    assert ac2.patterns_len() == ac.patterns_len()
    assert ac2.max_pattern_len() == ac.max_pattern_len()
    assert ac2.memory_usage() == ac.memory_usage()


def test_roundtrip_config_variants(tmp_path):
    ac = AhoCorasick(
        ["aB", "cd"],
        ascii_case_insensitive=True,
        start_kind=StartKind.BOTH,
        engine="bitap",
        device_threshold=0,
    )
    p = str(tmp_path / "ac.npz")
    ac.save(p)
    ac2 = AhoCorasick.load(p)
    h = "xAb cD ab"
    assert triples(ac2.find_iter(Input(h))) == triples(
        ac.find_iter(Input(h))
    )
    assert ac2.start_kind() == StartKind.BOTH
    # anchored search still works after restore (oracle path uses the NFA)
    from ahocorasick_tpu import Anchored

    inp = Input("aB xx", anchored=Anchored.YES)
    assert triples(ac2.find_iter(inp)) == triples(ac.find_iter(inp))


def test_roundtrip_overlapping_and_stream(tmp_path):
    import io

    ac = AhoCorasick(["abba", "b", "ba"])
    p = str(tmp_path / "ac.npz")
    ac.save(p)
    ac2 = AhoCorasick.load(p)
    h = "abbabba"
    assert triples(ac2.find_overlapping_iter(Input(h))) == triples(
        ac.find_overlapping_iter(Input(h))
    )
    got = triples(ac2.stream_find_iter(io.BytesIO(h.encode())))
    assert got == triples(ac.stream_find_iter(io.BytesIO(h.encode())))
