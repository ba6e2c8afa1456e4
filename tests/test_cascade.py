"""Cascade engine (ops/cascade.py) parity tests.

The cascade is the device path for pattern sets beyond the fingerprint
planner's bucket budget; these tests force it on smaller sets (CPU
interpret-mode Pallas) and assert exact (pid, end) parity against a
brute-force overlapping enumeration — the reference's
slow-but-obviously-correct-oracle strategy (tests.rs:686-873).
"""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, Input, MatchKind
from ahocorasick_tpu.ops.cascade import CascadeEngine


def brute_pairs(patterns, hay, ci=False):
    """All overlapping (pid, 1-based end) matches, reference report
    order (end asc, length desc, pid asc)."""
    def fold(b):
        return bytes(
            c | 0x20 if 0x41 <= c <= 0x5A else c for c in b
        ) if ci else b

    h = fold(hay)
    out = []
    for pid, p in enumerate(patterns):
        q = fold(p)
        start = 0
        while True:
            i = h.find(q, start)
            if i < 0:
                break
            out.append((i + len(q), -len(q), pid))
            start = i + 1
    out.sort()
    pids = np.array([pid for _, _, pid in out], np.int64)
    ends = np.array([e for e, _, _ in out], np.int64)
    return pids, ends


def make_dict(rng, count, syllables, lens=(2, 4), cap=0.0):
    pats = set()
    while len(pats) < count:
        ns = int(rng.integers(lens[0], lens[1] + 1))
        w = "".join(
            syllables[int(rng.integers(len(syllables)))]
            for _ in range(ns)
        )
        if cap and rng.random() < cap:
            w = w.capitalize()
        pats.add(w.encode())
    return sorted(pats)


NAME_SYL = ("bar bel bor dan dar del dor fan far gar gor hal han har "
            "kar kel kor lan lor mar mor nal nar nor pal par ral ran "
            "rok sar sel sor tan tar tor val van var vor wan war zan "
            "zor").split()
PROSE_SYL = ("a be ce de e fi ge hi i je ke li me ni o pe qui re si "
             "te u ve we xi ye ze tion ing ed er ly un con com pro "
             "per").split()


def make_text(rng, n, pats, density=0.01):
    filler = make_dict(rng, 500, PROSE_SYL, (1, 3))
    parts, size = [], 0
    while size < n:
        w = (pats[int(rng.integers(len(pats)))]
             if rng.random() < density
             else filler[int(rng.integers(len(filler)))])
        parts.append(w)
        size += len(w) + 1
    return b" ".join(parts)[:n]


def check_engine(patterns, hay, ci=False):
    eng = CascadeEngine(patterns, ci)
    want_p, want_e = brute_pairs(patterns, hay, ci)
    got = eng.count_matches(hay)
    assert got == len(want_p), (got, len(want_p))
    pairs = eng.match_pairs(hay)
    assert pairs is not None
    gp, ge = pairs
    np.testing.assert_array_equal(ge, want_e)
    np.testing.assert_array_equal(gp, want_p)
    return eng


def test_cascade_basic_dictionary():
    rng = np.random.default_rng(42)
    pats = make_dict(rng, 300, NAME_SYL)
    hay = make_text(rng, 20_000, pats)
    assert CascadeEngine.eligible(pats)
    check_engine(pats, hay)


def test_cascade_case_insensitive():
    rng = np.random.default_rng(43)
    pats = make_dict(rng, 200, NAME_SYL, cap=0.4)
    hay = make_text(rng, 16_000, pats).title()[:16_000].encode() \
        if False else make_text(rng, 16_000, pats)
    # Mix the haystack's case so folding actually matters.
    arr = np.frombuffer(hay, np.uint8).copy()
    flip = np.random.default_rng(7).random(len(arr)) < 0.3
    lower = (arr | 0x20)
    is_alpha = (lower >= 0x61) & (lower <= 0x7A)
    arr[flip & is_alpha] ^= 0x20
    hay = arr.tobytes()
    check_engine(pats, hay, ci=True)


def test_cascade_shared_prefix_groups_beyond_gmax():
    """More than GMAX_CAP (16) patterns sharing one 8-byte prefix: the
    CSR expansion must handle what DeviceVerify's packed rows cannot."""
    rng = np.random.default_rng(44)
    base = b"barbarda"
    pats = [base + bytes([97 + i % 26, 97 + (i // 26) % 26])
            for i in range(40)]
    pats += make_dict(rng, 100, NAME_SYL)
    pats = sorted(set(pats))
    hay = make_text(rng, 12_000, pats, density=0.05)
    check_engine(pats, hay)


def test_cascade_short_and_mixed_lengths():
    """Classes 1..4 and 8 all present (lengths 1, 2, 3, 4-7, 8+)."""
    rng = np.random.default_rng(45)
    pats = [b"q", b"zx", b"wqa", b"gorm", b"haldan", b"barbelfan",
            b"danvors", b"xy"]
    pats += make_dict(rng, 80, NAME_SYL)
    pats = sorted(set(pats))
    hay = make_text(rng, 10_000, pats, density=0.03) + b" q zx wqa gorm"
    check_engine(pats, hay)


def test_cascade_long_pattern_side_engine():
    """Patterns beyond W_CASCADE=64 bytes ride the side bitap engine
    and merge in report order."""
    rng = np.random.default_rng(46)
    pats = make_dict(rng, 60, NAME_SYL)
    long1 = b"x" * 70 + b"end"
    long2 = b"barbar" * 14  # 84 bytes
    pats = sorted(set(pats + [long1, long2]))
    eng_probe = CascadeEngine(pats, False)
    assert eng_probe.side is not None
    hay = (make_text(rng, 6_000, pats, density=0.04)
           + long1 + b" pad " + long2 + long2[:6])
    check_engine(pats, hay)


def test_cascade_empty_and_tiny_haystacks():
    rng = np.random.default_rng(47)
    pats = make_dict(rng, 120, NAME_SYL)
    eng = CascadeEngine(pats, False)
    assert eng.count_matches(b"") == 0
    p, e = eng.match_pairs(b"")
    assert len(p) == 0 and len(e) == 0
    tiny = pats[5] + b"!"
    assert eng.count_matches(tiny) == brute_pairs(pats, tiny)[0].size
    check_engine(pats, pats[0][:2])  # shorter than any pattern


def test_cascade_repeated_search_reuses_prepared_layout():
    rng = np.random.default_rng(48)
    pats = make_dict(rng, 150, NAME_SYL)
    eng = CascadeEngine(pats, False)
    hay = make_text(rng, 8_000, pats)
    ph = eng.prepare(hay)
    want = brute_pairs(pats, hay)[0].size
    assert eng.count_matches(ph) == want
    assert eng.count_matches(ph) == want  # settled caps: single dispatch
    gp, ge = eng.match_pairs(ph)
    assert len(gp) == want


def test_facade_cascade_forced_and_semantics():
    """engine='cascade' end-to-end through the facade: standard,
    leftmost-first, leftmost-longest all agree with the oracle."""
    rng = np.random.default_rng(49)
    pats = make_dict(rng, 130, NAME_SYL)
    # add a nested pair so leftmost semantics differ
    pats = sorted(set(pats + [b"barbel", b"barbelfan", b"bar"]))
    hay = make_text(rng, 9_000, pats, density=0.04)
    for mk in (MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
               MatchKind.LEFTMOST_LONGEST):
        ac = AhoCorasick(pats, match_kind=mk, engine="cascade",
                         device_threshold=1)
        ref = AhoCorasick(pats, match_kind=mk, engine="oracle")
        got = [(m.pattern, m.start, m.end)
               for m in ac.find_iter(Input(hay))]
        want = [(m.pattern, m.start, m.end)
                for m in ref.find_iter(Input(hay))]
        assert got == want, mk


def test_facade_auto_routes_large_sets_to_cascade():
    """A pattern set beyond the fingerprint planner's budget must pick
    the cascade under engine='auto' (not the host walk)."""
    rng = np.random.default_rng(50)
    syl = [a + b for a in "bcdfghjklmnpqrstvwz"
           for b in "aeiouy"][:90]
    pats = make_dict(rng, 6000, syl, (3, 4))
    assert CascadeEngine.eligible(pats)
    hay = make_text(rng, 30_000, pats, density=0.01)
    ac = AhoCorasick(pats, device_threshold=1)
    want_p, _ = brute_pairs(pats, hay)
    assert ac.count_matches(hay) == len(want_p)
    assert ac._cascade is not None and not ac._cascade.hostile


def test_cascade_duplicate_patterns():
    """Exact duplicate patterns must each report (the device emits the
    representative pid once; the host expands short-class duplicates,
    the long CSR carries them natively)."""
    rng = np.random.default_rng(52)
    base = make_dict(rng, 60, NAME_SYL)
    dup_short = base[3]              # len <= 8 duplicate
    dup_long = b"barbelfandanvor"    # len > 8 duplicate
    pats = list(base) + [dup_short, dup_short, dup_long, dup_long]
    hay = make_text(rng, 8_000, pats, density=0.05) + dup_long + dup_short
    check_engine(pats, hay)


def test_cascade_all_ff_bytes():
    """0xFF-saturated patterns and windows: an all-0xFF window key
    equals the empty-slot sentinel and must neither fake-hit empty
    slots nor shadow a real all-0xFF pattern."""
    rng = np.random.default_rng(53)
    pats = make_dict(rng, 50, NAME_SYL)
    pats += [b"\xff" * 8, b"\xff" * 4, b"\xff\xff\xff\xff\xff\xff\xff"]
    pats = sorted(set(pats))
    hay = (make_text(rng, 5_000, pats, density=0.03)
           + b"\xff" * 40 + make_text(rng, 2_000, pats))
    check_engine(pats, hay)


def test_cascade_hostile_input_falls_back():
    """Candidate-dense input (text made of dictionary words) must mark
    the engine hostile and return None so the facade can fall back."""
    rng = np.random.default_rng(51)
    pats = make_dict(rng, 250, NAME_SYL)
    # haystack that IS dictionary material: every position a candidate
    hay = b" ".join(
        pats[int(rng.integers(len(pats)))] for _ in range(30_000)
    )[:150_000]
    eng = CascadeEngine(pats, False)
    got = eng.count_matches(hay)
    if got is None:
        assert eng.hostile
        # the facade must still produce the right answer
        ac = AhoCorasick(pats, device_threshold=1)
        assert ac.count_matches(hay) == brute_pairs(pats, hay)[0].size
    else:
        # dense-but-within-limits inputs must still be exact
        assert got == brute_pairs(pats, hay)[0].size
