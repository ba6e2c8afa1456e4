"""Randomized config cross-product fuzzing — fuzz_find.rs analog.

The reference's libFuzzer target feeds arbitrary (patterns, haystack,
kind, match_kind, case, dense_depth, prefilter, byte_classes) tuples
through find/replace_all (fuzz/fuzz-targets/fuzz_find.rs:25-62). Here a
seeded RNG drives the same cross-product; the oracle engine is the truth.
"""

import numpy as np
import pytest

from ahocorasick_tpu import (
    AhoCorasick,
    AhoCorasickKind,
    Input,
    MatchKind,
)

KINDS = [MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
         MatchKind.LEFTMOST_LONGEST]
ALPHA = [97, 98, 99, 65, 66, 0, 255, 32]


def gen_case(rng):
    npat = int(rng.integers(1, 8))
    pats = []
    for _ in range(npat):
        ln = int(rng.integers(0, 9))  # empty patterns included
        pats.append(bytes(rng.choice(ALPHA, size=ln).astype(np.uint8)))
    if all(len(p) == 0 for p in pats):
        pats[0] = b"a"
    n = int(rng.integers(0, 800))
    hay = bytes(rng.choice(ALPHA, size=n).astype(np.uint8))
    cfg = dict(
        match_kind=KINDS[int(rng.integers(3))],
        ascii_case_insensitive=bool(rng.integers(2)),
        byte_classes=bool(rng.integers(2)),
        prefilter=bool(rng.integers(2)),
        # MAX-analog (1 << 20) crosses the all-dense contiguous encoding
        # the way tests.rs:686-863 does.
        dense_depth=[0, 1, 2, 3, 1 << 20][int(rng.integers(5))],
        kind=[None, AhoCorasickKind.CONTIGUOUS_NFA,
              AhoCorasickKind.DFA][int(rng.integers(3))],
    )
    engines = ["bitap", "dfa-scan", "auto", "device-only", "fingerprint"]
    engine = engines[int(rng.integers(len(engines)))]
    if engine == "fingerprint" and any(len(p) == 0 for p in pats):
        engine = "auto"  # empty patterns are outside the filter engine
    return pats, hay, cfg, engine


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_cross_product(seed):
    rng = np.random.default_rng(1000 + seed)
    for _ in range(16):
        pats, hay, cfg, engine = gen_case(rng)
        truth = AhoCorasick(pats, engine="oracle", **cfg)
        want = [m.astuple() for m in truth.find_iter(Input(hay))]
        ac = AhoCorasick(pats, engine=engine, device_threshold=0, **cfg)
        got = [m.astuple() for m in ac.find_iter(Input(hay))]
        assert got == want, (pats, hay[:40], cfg, engine)
        if cfg["match_kind"].is_standard():
            w2 = [m.astuple()
                  for m in truth.find_overlapping_iter(Input(hay))]
            g2 = [m.astuple()
                  for m in ac.find_overlapping_iter(Input(hay))]
            assert g2 == w2, (pats, hay[:40], cfg, engine)
        # replace_all round-trip (standard kinds reject nothing here)
        reps = [b"<%d>" % i for i in range(len(pats))]
        assert ac.try_replace_all_bytes(hay, reps) == \
            truth.try_replace_all_bytes(hay, reps)
