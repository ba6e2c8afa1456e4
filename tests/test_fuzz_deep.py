"""Deepened randomized fuzzing across engine eligibility boundaries.

Extends test_fuzz.py (the fuzz_find.rs:25-62 analog) along the axes the
reference's libFuzzer target reaches through arbitrary inputs but our
seeded generator previously did not:

  - pattern lengths that cross the bit-parallel kernel's 32-bit limb
    boundaries (31/32/33, 63/64/65) and its 2048-byte chain budget
    (ops/bitap.py MAX_LIMBS/MAX_PATTERN_LEN edges),
  - full-alphabet haystacks: ASCII case pairs AND 0x80+ bytes (the
    reference's case folding is ASCII-only — high bytes must never fold,
    nfa/noncontiguous.rs:1138-1141),
  - stream search with adversarial chunk sizes (tests.rs:690-693 uses a
    capacity-1 reader for the same reason),
  - anchored and span-limited Inputs (util/search.rs:82-630 surface),
  - the cascade engine's length classes (1..4, 8) and its long-pattern
    side engine.

Matches are planted explicitly so deep paths see real hits; the oracle
engine is the truth for every comparison.
"""

import io

import numpy as np
import pytest

from ahocorasick_tpu import (
    AhoCorasick,
    Anchored,
    Input,
    MatchKind,
    StartKind,
)

KINDS = [MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
         MatchKind.LEFTMOST_LONGEST]


def _seeds(n, fast=2):
    """Seed list with the tail marked slow: every fuzz axis keeps its
    first `fast` seeds in the default profile; the rest run in the full
    profile (pytest -m "" tests/)."""
    return [s if s < fast else pytest.param(s, marks=pytest.mark.slow)
            for s in range(n)]
# Case pairs, digits, punctuation, and high bytes (never case-fold).
WIDE_ALPHA = np.array(
    list(range(0x41, 0x5B)) + list(range(0x61, 0x7B))
    + [0x30, 0x39, 0x20, 0x00, 0x7F, 0x80, 0xC3, 0xE2, 0xFF],
    np.uint8,
)


def rand_bytes(rng, n, alpha=WIDE_ALPHA):
    return bytes(rng.choice(alpha, size=n).astype(np.uint8))


def plant(rng, hay: bytearray, pats, k):
    """Overwrite k random windows of `hay` with random patterns."""
    for _ in range(k):
        p = pats[int(rng.integers(len(pats)))]
        if len(p) == 0 or len(p) > len(hay):
            continue
        i = int(rng.integers(0, len(hay) - len(p) + 1))
        hay[i:i + len(p)] = p
    return bytes(hay)


def check(pats, hay, cfg, engine, overlapping=True):
    truth = AhoCorasick(pats, engine="oracle", **cfg)
    ac = AhoCorasick(pats, engine=engine, device_threshold=0, **cfg)
    want = [m.astuple() for m in truth.find_iter(Input(hay))]
    got = [m.astuple() for m in ac.find_iter(Input(hay))]
    assert got == want, (len(pats), hay[:40], cfg, engine)
    if overlapping and cfg.get("match_kind",
                               MatchKind.STANDARD).is_standard():
        w2 = [m.astuple() for m in truth.find_overlapping_iter(Input(hay))]
        g2 = [m.astuple() for m in ac.find_overlapping_iter(Input(hay))]
        assert g2 == w2, (len(pats), hay[:40], cfg, engine)


@pytest.mark.parametrize("seed", _seeds(6))
def test_fuzz_limb_boundary_lengths(seed):
    """Pattern lengths straddling 32-bit limb boundaries; every engine
    that accepts the set must agree with the oracle."""
    rng = np.random.default_rng(7000 + seed)
    lens = [31, 32, 33, 63, 64, 65, 1, 2, 17]
    for _ in range(4):
        k = int(rng.integers(2, 6))
        pats = [rand_bytes(rng, lens[int(rng.integers(len(lens)))])
                for _ in range(k)]
        pats = sorted(set(pats))
        hay = plant(rng, bytearray(rand_bytes(rng, 700)), pats, 12)
        cfg = dict(match_kind=KINDS[int(rng.integers(3))],
                   ascii_case_insensitive=bool(rng.integers(2)))
        for engine in ("bitap", "auto"):
            check(pats, hay, cfg, engine)


@pytest.mark.parametrize("case", [
    # (max single pattern len, n extra pats, engine) at the 2048 edges
    pytest.param((2048, 0, "bitap"),
                 marks=pytest.mark.slow),  # exactly at MAX_PATTERN_LEN
    ((2049, 0, "auto")),   # one past: bitap ineligible, auto must route
    pytest.param((2040, 2, "auto"),
                 marks=pytest.mark.slow),  # straddling 32*MAX_LIMBS
])
def test_fuzz_chain_budget_edges(case):
    maxlen, extra, engine = case
    rng = np.random.default_rng(8123 + maxlen)
    big = rand_bytes(rng, maxlen, np.array([97, 98, 99], np.uint8))
    pats = [big] + [rand_bytes(rng, 5) for _ in range(extra)]
    pats = sorted(set(pats))
    hay = bytearray(rand_bytes(rng, 4600,
                               np.array([97, 98, 100], np.uint8)))
    hay[100:100 + len(big)] = big           # plant the giant pattern
    hay = plant(rng, hay, pats, 6)
    check(pats, hay, dict(match_kind=MatchKind.LEFTMOST_FIRST), engine,
          overlapping=False)


@pytest.mark.parametrize("seed", _seeds(4))
def test_fuzz_streams_random_chunks(seed):
    """stream_find_iter over random chunk sizes == find_iter offsets
    (standard semantics; the reference forces worst-case chunking with a
    capacity-1 reader, tests.rs:690-693)."""
    rng = np.random.default_rng(9000 + seed)
    k = int(rng.integers(2, 7))
    pats = sorted({rand_bytes(rng, int(rng.integers(1, 12)))
                   for _ in range(k)})
    hay = plant(rng, bytearray(rand_bytes(rng, 3000)), pats, 30)
    ac = AhoCorasick(pats, match_kind=MatchKind.STANDARD,
                     ascii_case_insensitive=bool(rng.integers(2)))
    want = [m.astuple() for m in ac.find_iter(Input(hay))]
    from ahocorasick_tpu.stream import stream_find_iter

    for chunk in (1, 2, 3, 7, 64, 997):
        got = [m.astuple()
               for m in stream_find_iter(ac, io.BytesIO(hay),
                                         chunk_size=chunk)]
        assert got == want, (chunk, pats)


@pytest.mark.parametrize("seed", _seeds(6))
def test_fuzz_anchored_and_spans(seed):
    """Random Input spans crossed with anchored mode vs the oracle's
    anchored walk (automaton.rs:1328-1380 filtering contract)."""
    rng = np.random.default_rng(10_000 + seed)
    k = int(rng.integers(1, 6))
    pats = sorted({rand_bytes(rng, int(rng.integers(1, 9)))
                   for _ in range(k)})
    hay = plant(rng, bytearray(rand_bytes(rng, 900)), pats, 15)
    cfg = dict(match_kind=KINDS[int(rng.integers(3))],
               ascii_case_insensitive=bool(rng.integers(2)),
               start_kind=StartKind.BOTH)
    truth = AhoCorasick(pats, engine="oracle", **cfg)
    ac = AhoCorasick(pats, device_threshold=0, **cfg)
    for _ in range(6):
        a = int(rng.integers(0, len(hay)))
        b = int(rng.integers(a, len(hay) + 1))
        anch = Anchored.YES if rng.integers(2) else Anchored.NO
        inp = Input(hay, start=a, end=b, anchored=anch)
        want = [m.astuple() for m in truth.find_iter(inp)]
        got = [m.astuple() for m in ac.find_iter(inp)]
        assert got == want, (a, b, anch, pats)


@pytest.mark.parametrize("seed", _seeds(4))
def test_fuzz_cascade_length_classes(seed):
    """Cascade engine across its length classes (1..4, 8+) and the
    long-pattern (>64B) side engine, full alphabet, planted matches."""
    rng = np.random.default_rng(11_000 + seed)
    pats = set()
    for ln in (1, 2, 3, 4, 5, 7, 8, 9, 20, 64, 65, 80):
        for _ in range(int(rng.integers(1, 4))):
            pats.add(rand_bytes(rng, ln))
    pats = sorted(pats)
    hay = plant(rng, bytearray(rand_bytes(rng, 2500)), pats, 40)
    cfg = dict(match_kind=KINDS[int(rng.integers(3))],
               ascii_case_insensitive=bool(rng.integers(2)))
    check(pats, hay, cfg, "cascade")


@pytest.mark.parametrize("seed", _seeds(3))
def test_fuzz_high_bytes_never_case_fold(seed):
    """0x80+ bytes whose low-ASCII projections are case pairs must not
    fold: e.g. 0xC1 vs 0xE1 differ even when 0x41/0x61 fold."""
    rng = np.random.default_rng(12_000 + seed)
    alpha = np.array([0x41, 0x61, 0xC1, 0xE1, 0x5A, 0x7A, 0xDA, 0xFA],
                     np.uint8)
    pats = sorted({rand_bytes(rng, int(rng.integers(1, 6)), alpha)
                   for _ in range(5)})
    hay = plant(rng, bytearray(rand_bytes(rng, 600, alpha)), pats, 10)
    cfg = dict(match_kind=KINDS[int(rng.integers(3))],
               ascii_case_insensitive=True)
    for engine in ("auto", "bitap", "fingerprint"):
        check(pats, hay, cfg, engine)
