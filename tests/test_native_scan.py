"""Native C++ DFA search fallback tests (large, bitap-ineligible sets)."""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, Input, MatchKind
from ahocorasick_tpu.automata import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(autouse=True)
def _disable_fingerprint(monkeypatch):
    """These tests exercise the native C++ walk; the fingerprint engine
    would otherwise intercept these (candidate-dense) pattern sets,
    escalate through its plan ladder (minutes of interpret-mode kernel
    compiles on CPU), and only then fall back to the native walk."""
    from ahocorasick_tpu.ops import fingerprint

    monkeypatch.setattr(
        fingerprint.FingerprintEngine, "eligible",
        classmethod(lambda cls, *a, **k: False),
    )


def big_pattern_set(seed=0, n=700):
    rng = np.random.default_rng(seed)
    return [
        bytes(rng.choice(list(b"abcdefgh"),
                         size=int(rng.integers(3, 10))).astype(np.uint8))
        for _ in range(n)
    ]


def test_native_count_and_find_match_oracle():
    pats = big_pattern_set()
    ac = AhoCorasick(pats)
    assert ac._bitap_engine() is None  # really exercising the fallback
    rng = np.random.default_rng(1)
    hay = bytes(rng.choice(list(b"abcdefgh "), size=60000
                           ).astype(np.uint8))
    truth = AhoCorasick(pats, engine="oracle")
    want_count = sum(
        1 for _ in truth.find_overlapping_iter(Input(hay))
    )
    assert ac.count_matches(hay) == want_count
    got = [m.astuple() for m in ac.find_iter(Input(hay))]
    want = [m.astuple() for m in truth.find_iter(Input(hay))]
    assert got == want


def test_native_positions_cap_growth():
    # >4096 match positions forces the retry-with-bigger-cap path
    ac = AhoCorasick([b"aa", b"bb"] * 600)  # 2400 pattern bytes
    assert ac._bitap_engine() is None
    hay = b"a" * 10000
    # "aa" ends at 9999 positions, once per duplicate pattern
    count = ac.count_matches(hay)
    assert count == 9999 * 600
    first = next(iter(ac.find_iter(Input(hay))))
    assert first.astuple() == (0, 0, 2)


@pytest.mark.slow  # default keeps test_native_count_and_find_match_oracle
def test_native_leftmost_kinds():
    pats = big_pattern_set(seed=3)
    rng = np.random.default_rng(4)
    hay = bytes(rng.choice(list(b"abcdefgh"), size=30000
                           ).astype(np.uint8))
    for kind in (MatchKind.LEFTMOST_FIRST, MatchKind.LEFTMOST_LONGEST):
        ac = AhoCorasick(pats, match_kind=kind)
        truth = AhoCorasick(pats, match_kind=kind, engine="oracle")
        got = [m.astuple() for m in ac.find_iter(Input(hay))]
        want = [m.astuple() for m in truth.find_iter(Input(hay))]
        assert got == want


def test_multithreaded_walk_matches_single():
    """The host-core sharded walk (halo warmup + stitch, the same
    contract as parallel/shard.py) is exact for any thread count."""
    pats = big_pattern_set(seed=3, n=300)
    ac = AhoCorasick(pats)
    dfa = ac._dfa
    rng = np.random.default_rng(5)
    hay = bytes(rng.choice(list(b"abcdefgh "), size=(1 << 21) + 777
                           ).astype(np.uint8))
    want_count = native.dfa_count(dfa, hay, n_threads=1)
    want_pos = native.dfa_positions(dfa, hay, n_threads=1)
    for nt in (2, 3, 7):
        assert native.dfa_count(dfa, hay, n_threads=nt) == want_count
        pos, sid = native.dfa_positions(dfa, hay, n_threads=nt)
        assert np.array_equal(pos, want_pos[0])
        assert np.array_equal(sid, want_pos[1])
    # default thread count goes through the mt path on large inputs
    assert native.dfa_count(dfa, hay) == want_count
