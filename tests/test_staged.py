"""Two-stage fingerprint-prefilter count engine (ops/staged.py).

The staged count must equal the single-pass bitap count exactly: stage 1
may only over-approximate the candidate stream set (false positives cost
time, false negatives are forbidden — matches whose fingerprint lands in
a stream's halo are the adversarial case planted here).
"""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick
from ahocorasick_tpu.ops.bitap import BitapEngine
from ahocorasick_tpu.ops.staged import STAGED_L, StagedEngine

PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]


def plant(buf: bytearray, at: int, pat: bytes):
    buf[at:at + len(pat)] = pat


def make_hay(n=3 * STAGED_L * 1024, seed=0) -> bytes:
    """Sparse hits, including matches straddling stream boundaries and
    matches whose fingerprint ends inside the previous stream."""
    rng = np.random.default_rng(seed)
    buf = bytearray(rng.integers(97, 123, size=n, dtype=np.uint8)
                    .tobytes())
    for i, at in enumerate(range(1000, n - 64, 7919)):
        plant(buf, at, PATS[i % len(PATS)])
    # Straddle every flavor of stream-boundary offset.
    for s in range(1, 6):
        edge = s * STAGED_L
        for off in (1, 4, 7, 14):
            p = PATS[off % len(PATS)]
            plant(buf, edge - off, p)  # starts before, ends after edge
    return bytes(buf)


def test_staged_count_matches_bitap():
    hay = make_hay()
    bit = BitapEngine(PATS, False)
    st = StagedEngine(PATS, False)
    want = bit.count_matches(hay)
    got = st.count_matches(hay)
    assert got is not None and got == want and want > 0


def test_staged_matches_on_boundary_heavy_input():
    """Every match crosses a boundary or sits at the very start/end."""
    n = STAGED_L * 1024 + 333
    buf = bytearray(b"." * n)
    plant(buf, 0, PATS[0])
    plant(buf, n - len(PATS[1]), PATS[1])
    for s in range(1, n // STAGED_L, 7):
        plant(buf, s * STAGED_L - 5, PATS[2])
    hay = bytes(buf)
    bit = BitapEngine(PATS, False)
    st = StagedEngine(PATS, False)
    got = st.count_matches(hay)
    assert got is not None  # sparse enough to stay under the cap
    assert got == bit.count_matches(hay)


def test_staged_dense_overflow_falls_back():
    """All-candidate input overflows the gather capacity -> None, and
    the facade transparently falls back to the single-pass engine."""
    pats = [b"Sherlock Holmes"]
    n = STAGED_L * 1024
    hay = (b"Sherlock Holmes " * (n // 16))[:n]
    st = StagedEngine(pats, False)
    got = st.count_matches(hay)
    want = BitapEngine(pats, False).count_matches(hay)
    assert got is None or got == want


def test_staged_case_insensitive():
    hay = bytearray(make_hay(n=STAGED_L * 1024))
    plant(hay, 50_000, b"sHERLOCK hOLMES")
    hay = bytes(hay)
    bit = BitapEngine(PATS, True)
    st = StagedEngine(PATS, True)
    assert st.count_matches(hay) == bit.count_matches(hay)


def test_eligibility_rules():
    assert not StagedEngine.eligible(PATS, 1 << 10)  # too small
    # fingerprints not materially cheaper: short patterns
    assert not StagedEngine.eligible(
        [b"ab", b"cd"], 1 << 24
    )
    assert StagedEngine.eligible(PATS, 1 << 24)


def test_facade_count_uses_staged_path(monkeypatch):
    ac = AhoCorasick([p.decode() for p in PATS])
    hay = make_hay(n=STAGED_L * 1024)
    import ahocorasick_tpu.ops.staged as sg

    monkeypatch.setattr(sg, "STAGED_MIN", 1 << 16)
    want = ac._bitap_engine().count_matches(hay)
    assert ac.count_matches(hay) == want
    assert ac._staged is not None  # staged path actually engaged


def pairs_eq(a, b):
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_staged_extraction_matches_bitap():
    """Staged match_pairs must equal the single-pass extraction exactly
    (same (pid, end) set in the same report order), including matches
    straddling stream boundaries."""
    hay = make_hay(n=STAGED_L * 1024 + 77)
    bit = BitapEngine(PATS, False)
    st = StagedEngine(PATS, False)
    want = bit.match_pairs(hay)
    got = st.match_pairs(hay)
    assert got is not None and len(got[0]) > 0
    pairs_eq(got, want)
    # repeated search on a prepared layout: settled caps, same result
    ph = st.prepare(hay)
    pairs_eq(st.match_pairs(ph), want)
    pairs_eq(st.match_pairs(ph), want)


def test_staged_extraction_boundary_and_case():
    n = STAGED_L * 1024 + 13
    buf = bytearray(b"." * n)
    plant(buf, 0, PATS[0])
    plant(buf, n - len(PATS[1]), PATS[1])
    for s in range(1, n // STAGED_L, 5):
        plant(buf, s * STAGED_L - 6, b"iRENE aDLER")
    hay = bytes(buf)
    bit = BitapEngine(PATS, True)
    st = StagedEngine(PATS, True)
    got = st.match_pairs(hay)
    assert got is not None
    pairs_eq(got, bit.match_pairs(hay))


def test_staged_extraction_dense_overflow_falls_back():
    pats = [b"Sherlock Holmes"]
    n = STAGED_L * 1024
    hay = (b"Sherlock Holmes " * (n // 16))[:n]
    st = StagedEngine(pats, False)
    got = st.match_pairs(hay)
    if got is not None:
        pairs_eq(got, BitapEngine(pats, False).match_pairs(hay))


def test_facade_find_iter_uses_staged_extraction(monkeypatch):
    """find_iter through the facade must engage the staged extract path
    for large haystacks and agree with the oracle. (The fingerprint
    fused extract outranks it in the routing, so it is disabled here to
    exercise the staged fallback.)"""
    from ahocorasick_tpu import Input

    import ahocorasick_tpu.ops.fingerprint as fpm
    import ahocorasick_tpu.ops.staged as sg

    monkeypatch.setattr(sg, "STAGED_MIN", 1 << 16)
    monkeypatch.setattr(fpm.FingerprintEngine, "eligible",
                        classmethod(lambda cls, *a, **k: False))
    hay = make_hay(n=STAGED_L * 1024)
    ac = AhoCorasick([p.decode() for p in PATS], device_threshold=1 << 16)
    ref = AhoCorasick([p.decode() for p in PATS], engine="oracle")
    got = [m.astuple() for m in ac.find_iter(Input(hay))]
    want = [m.astuple() for m in ref.find_iter(Input(hay))]
    assert got == want and len(got) > 0
    assert ac._staged is not None and ac._staged._cap_s > 0
