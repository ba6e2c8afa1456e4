"""Fingerprint filter engine (ops/fingerprint.py) vs the oracle.

The engine must produce the complete overlapping match set for pattern
sets beyond the exact bit-parallel kernel's bounds — the workload class
the reference routes through its automaton + prefilter stack. Every
case is cross-checked against the sequential host oracle.
"""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, Input, MatchKind
from ahocorasick_tpu.automata.noncontiguous import compile_nfa
from ahocorasick_tpu.ops.fingerprint import (
    FP_LEN,
    FingerprintEngine,
    FingerprintTables,
    VerifyIndex,
    plan_buckets,
)
from ahocorasick_tpu import oracle


def _dictionary(rng, count, lmin=3, lmax=14, alphabet=b"abcdefgh"):
    pats = set()
    while len(pats) < count:
        ln = int(rng.integers(lmin, lmax + 1))
        pats.add(rng.choice(list(alphabet), ln).astype(np.uint8).tobytes())
    return sorted(pats)


def _text_with_matches(rng, n, pats, density=0.01):
    out = []
    size = 0
    while size < n:
        if rng.random() < density:
            w = pats[int(rng.integers(len(pats)))]
        else:
            w = rng.choice(list(b"abcdefghijklmnop"),
                           int(rng.integers(2, 9))).astype(np.uint8)
            w = w.tobytes()
        out.append(w)
        size += len(w)
    return b"".join(out)[:n]


def _oracle_pairs(pats, hs, ci=False):
    nfa = compile_nfa(pats, match_kind=MatchKind.STANDARD,
                      ascii_case_insensitive=ci)
    triples = oracle.find_all_overlapping(nfa, hs)
    pids = np.array([t[0] for t in triples], np.int64)
    ends = np.array([t[2] for t in triples], np.int64)
    return pids, ends


@pytest.mark.parametrize("count,ci", [
    (150, False),
    pytest.param(400, True,
                 marks=pytest.mark.slow),  # default keeps 150/False
])
@pytest.mark.parametrize("device_verify", [True, False])
def test_match_pairs_vs_oracle(count, ci, device_verify, monkeypatch):
    from ahocorasick_tpu.ops import fingerprint as F

    rng = np.random.default_rng(count)
    pats = _dictionary(rng, count)
    hs = _text_with_matches(rng, 1 << 15, pats)
    eng = FingerprintEngine(pats, ci)
    if device_verify:
        monkeypatch.setattr(F, "FP_DV_MIN", 0)
        assert eng.dv is not None  # letters-only set must support it
    else:
        eng.dv = None  # force the host verification path
    got = eng.match_pairs(hs)
    assert got is not None
    pids, ends = got
    epids, eends = _oracle_pairs(pats, hs, ci)
    assert np.array_equal(ends, eends)
    assert np.array_equal(pids, epids)
    assert eng.count_matches(hs) == len(epids)


def test_stream_boundary_straddle():
    """Matches crossing the per-lane stream boundaries (multiples of L)
    must be found via the halo warm-up."""
    pats = _dictionary(np.random.default_rng(7), 130, lmin=4, lmax=24)
    # L = 128 for small inputs; plant a long pattern across each of the
    # first few boundaries.
    hs = bytearray(np.random.default_rng(8).choice(
        list(b"xyzw"), 4096).astype(np.uint8).tobytes())
    planted = pats[100]
    for b in range(1, 8):
        pos = b * 128 - len(planted) // 2
        hs[pos:pos + len(planted)] = planted
    hs = bytes(hs)
    eng = FingerprintEngine(pats, False)
    pids, ends = eng.match_pairs(hs)
    epids, eends = _oracle_pairs(pats, hs)
    assert np.array_equal(ends, eends)
    assert np.array_equal(pids, epids)
    assert len(ends) >= 7


def test_duplicate_and_shared_prefix_patterns():
    pats = [b"abcde", b"abcdefgh", b"abcdefghi", b"abcde", b"bcd",
            b"abcdefghijklm"] + _dictionary(
                np.random.default_rng(3), 80, lmin=3, lmax=10)
    hs = b"zzabcdefghijklmzz" * 50 + b"bcdbcdbcd"
    eng = FingerprintEngine(pats, False)
    pids, ends = eng.match_pairs(hs)
    epids, eends = _oracle_pairs(pats, hs)
    assert np.array_equal(ends, eends)
    assert np.array_equal(pids, epids)


def test_short_patterns_mixed():
    """Length classes below FP_LEN verify via exact key membership."""
    pats = [b"a", b"ab", b"abc", b"abcd", b"abcdefg", b"abcdefgh",
            b"abcdefghij"] + _dictionary(
                np.random.default_rng(5), 100, lmin=2, lmax=20)
    hs = _text_with_matches(np.random.default_rng(6), 1 << 14, pats,
                            density=0.05)
    eng = FingerprintEngine(pats, False)
    pids, ends = eng.match_pairs(hs)
    epids, eends = _oracle_pairs(pats, hs)
    assert np.array_equal(ends, eends)
    assert np.array_equal(pids, epids)


def test_matches_at_edges():
    pats = _dictionary(np.random.default_rng(11), 120, lmin=4, lmax=12)
    p0, p1 = pats[0], pats[1]
    hs = p0 + b"qq" * 300 + p1
    eng = FingerprintEngine(pats, False)
    pids, ends = eng.match_pairs(hs)
    epids, eends = _oracle_pairs(pats, hs)
    assert np.array_equal(ends, eends)
    assert np.array_equal(pids, epids)


def test_empty_and_no_match():
    pats = _dictionary(np.random.default_rng(13), 90)
    eng = FingerprintEngine(pats, False)
    assert eng.count_matches(b"") == 0
    pids, ends = eng.match_pairs(b"QQQQ" * 1000)
    assert len(pids) == 0 and len(ends) == 0


def test_plan_buckets_budget():
    rng = np.random.default_rng(17)
    pats = _dictionary(rng, 1000, lmin=4, lmax=16,
                       alphabet=bytes(range(97, 123)))
    plan = plan_buckets(pats, False)
    assert plan is not None
    buckets, offsets, K = plan
    assert K <= 64
    assert sum(len(b[1]) for b in buckets) == len(pats)
    t = FingerprintTables(pats, False)
    assert t.k == K
    assert t.pad_byte is not None  # letters-only set


def test_facade_forced_fingerprint_vs_oracle():
    rng = np.random.default_rng(23)
    pats = _dictionary(rng, 200, lmin=3, lmax=12)
    hs = _text_with_matches(rng, 1 << 14, pats, density=0.03)
    ac = AhoCorasick(pats, engine="fingerprint")
    aco = AhoCorasick(pats, engine="oracle")
    got = [m.astuple() for m in ac.find_iter(Input(hs))]
    want = [m.astuple() for m in aco.find_iter(Input(hs))]
    assert got == want
    govl = [m.astuple() for m in ac.find_overlapping_iter(Input(hs))]
    wovl = [m.astuple() for m in aco.find_overlapping_iter(Input(hs))]
    assert govl == wovl
    assert ac.count_matches(Input(hs)) == len(wovl)


@pytest.mark.parametrize(
    "kind", [MatchKind.LEFTMOST_FIRST, MatchKind.LEFTMOST_LONGEST]
)
def test_facade_fingerprint_leftmost(kind):
    rng = np.random.default_rng(29)
    pats = _dictionary(rng, 180, lmin=3, lmax=10)
    hs = _text_with_matches(rng, 1 << 13, pats, density=0.05)
    ac = AhoCorasick(pats, engine="fingerprint", match_kind=kind)
    aco = AhoCorasick(pats, engine="oracle", match_kind=kind)
    got = [m.astuple() for m in ac.find_iter(Input(hs))]
    want = [m.astuple() for m in aco.find_iter(Input(hs))]
    assert got == want


def test_hostile_guard_falls_back(monkeypatch):
    """Degenerate candidate-dense input: the engine must flag itself
    hostile and the facade must stay correct via the native-walk
    fallback."""
    from ahocorasick_tpu.ops import fingerprint as F

    monkeypatch.setattr(F, "CAND_FLOOR", 64)
    # > 2048 total pattern bytes so the exact bitap engine is ineligible
    # and the facade reaches the fingerprint engine.
    pats = [bytes([c]) * 4 for c in b"abcdefgh"] + _dictionary(
        np.random.default_rng(31), 400, lmin=5, lmax=9)
    hs = b"aaaaaaaa" * 512  # every position matches "aaaa"
    ac = AhoCorasick(pats, engine="auto", device_threshold=1024)
    aco = AhoCorasick(pats, engine="oracle")
    want = len(list(aco.find_overlapping_iter(Input(hs))))
    assert ac.count_matches(Input(hs)) == want
    assert ac._fp is not None and ac._fp.hostile


def test_verify_index_direct():
    pats = [b"hello", b"help", b"helloworld", b"world", b"ld"]
    vi = VerifyIndex(pats, False)
    hs = b"xxhelloworldxx"
    a = np.frombuffer(hs, np.uint8)
    # Candidates at every position (as if the filter passed everything):
    cand = np.arange(len(hs), dtype=np.int64)
    pids, ends = vi.verify(a, cand)
    # hello ends at 7; helloworld, world, ld all end at 12.
    got = sorted(zip(pids.tolist(), ends.tolist()))
    assert got == [(0, 7), (2, 12), (3, 12), (4, 12)]


def test_plan_ladder_starts_cheap_dict1k():
    """Level-0 plans must stay lean: the dict1k-shaped workload measured
    7.9 GB/s at K=7 but only 6.8 at the K=11 plan a 12-limb budget
    reaches with dense chain packing — the ladder, not the prior model,
    buys extra selectivity (PLAN_LEVELS comment)."""
    import sys

    sys.path.insert(0, ".")
    from bench import build_dictionary

    eng = FingerprintEngine(build_dictionary(), True)
    assert eng.level == 0
    assert eng.tables.k <= 8, (eng.tables.k, eng.tables.num_buckets)


def test_device_verify_window_covers_class4_tails(monkeypatch):
    """Regression: a class-4 pattern (length 5-7) occupies window
    columns [4, 4 + len) — beyond FP_LEN when len > 4 — so DeviceVerify
    must size W to FP_LEN - class + len, not max(FP_LEN, max_len).
    With W = 8 the tail compare of "Street" (cols 8-9) was silently
    truncated and "Streatham" matched (found via the reference's own
    name-alt1 set over sherlock.txt)."""
    from ahocorasick_tpu.ops import fingerprint as F

    monkeypatch.setattr(F, "FP_DV_MIN", 0)
    pats = [b"Sherlock", b"Street"]
    eng = FingerprintEngine(pats, False)
    assert eng.dv is not None and eng.dv.W >= 10
    hs = b"going to Streatham via Baker Street with Sherlock today"
    pids, ends = eng.match_pairs(hs)
    epids, eends = _oracle_pairs(pats, hs)
    assert np.array_equal(ends, eends)
    assert np.array_equal(pids, epids)


def test_plan_buckets_coarsens_past_prefix_budget():
    """Prefix-diverse sets (the reference's real dictionaries reach
    11k-15k distinct 4-byte prefixes) must coarsen bucket sizes to fit
    the limb budget rather than refuse; plans whose finest affordable
    bucketing is modeled filter-saturated still return None."""
    import os

    path = ("/root/reference/benchmarks/regexes/dictionary/english/"
            "sorted.txt")
    if not os.path.exists(path):
        pytest.skip("reference dictionary not mounted")
    dic = [w for w in open(path, "rb").read().split(b"\n") if w]
    # All length>=5 words: 15,132 distinct 4-byte prefixes — far beyond
    # the bucket-64 budget at 32 limbs, selective once coarsened
    # (sorted English prefixes share leading bytes, so coarse buckets
    # stay narrow; random prefixes would saturate instead).
    prefixes = sorted({w[:4] for w in dic if len(w) >= 5})
    assert len(prefixes) > 10_000
    plan = plan_buckets(prefixes, False, 32)
    assert plan is not None
    _, _, K = plan
    assert K <= 32
    # The full English dictionary head (many 1-2 byte patterns) is
    # structurally saturated: every position matches some chain.
    short = [bytes([c]) for c in b"abcdefghijklmnopqrstuvwxyz"]
    short += [bytes([a, b]) for a in b"abcdefgh" for b in b"abcdefgh"]
    assert plan_buckets(short, False, 32) is None
