"""Packed (Teddy/Rabin-Karp) engine tests.

Mirrors the strategy of the reference packed tests (src/packed/tests.rs):
leftmost corpus cases expanded with positional padding variations to
exercise fingerprint alignment paths, run against the Teddy engine and
the forced Rabin-Karp fallback, with the core oracle as cross-check.
"""

import pytest

import corpus
from ahocorasick_tpu import AhoCorasick, MatchKind as CoreKind
from ahocorasick_tpu.packed import Builder, Config, MatchKind, Searcher


def packed_cases(kind):
    coll = (
        corpus.AC_LEFTMOST_FIRST
        if kind is MatchKind.LEFTMOST_FIRST
        else corpus.AC_LEFTMOST_LONGEST
    )
    for name, patterns, haystack, expected in corpus.iter_tests(coll):
        if not patterns or any(len(p) == 0 for p in patterns):
            continue
        if len(patterns) > 128:
            continue
        yield name, patterns, haystack, expected


# Padding variations in the spirit of packed/tests.rs:42-51 (offsets as
# prefix/suffix padding with 'Z's to exercise every alignment path).
PADS = [0, 1, 2, 7, 15, 16, 17, 40, 128, 260]


@pytest.mark.parametrize(
    "kind", [MatchKind.LEFTMOST_FIRST, MatchKind.LEFTMOST_LONGEST]
)
@pytest.mark.parametrize("force", [None, "rabinkarp"])
def test_packed_find_iter(kind, force):
    for name, patterns, haystack, expected in packed_cases(kind):
        cfg = Config().match_kind(kind)
        if force == "rabinkarp":
            cfg.only_rabin_karp(True)
        s = cfg.builder().extend(patterns).build()
        assert s is not None
        got = [m.astuple() for m in s.find_iter(haystack)]
        assert got == expected, (
            f"{name} kind={kind} force={force}: patterns={patterns!r}"
            f" haystack={haystack!r}: got {got}, want {expected}"
        )


@pytest.mark.parametrize("pad", PADS)
def test_packed_padding_variations(pad):
    patterns = ["abc", "xyz", "ab", "yz"]
    s = Searcher.new(patterns)
    base = "abcxxyzz"
    for mode in ("prefix", "suffix", "both"):
        pre = "Z" * pad if mode in ("prefix", "both") else ""
        suf = "Z" * pad if mode in ("suffix", "both") else ""
        h = pre + base + suf
        got = [m.astuple() for m in s.find_iter(h)]
        off = len(pre)
        want = [(0, off + 0, off + 3), (1, off + 4, off + 7)]
        assert got == want, f"pad={pad} mode={mode}: {got}"


def test_packed_inert_on_empty_pattern():
    # api.rs:303-322: adding an empty pattern makes build() return None.
    assert Builder().extend(["a", ""]).build() is None
    assert Builder().build() is None


def test_packed_pattern_limit():
    pats = ["p%03d" % i for i in range(129)]
    assert Builder().extend(pats).build() is None
    assert Builder().extend(pats[:128]).build() is not None


def test_packed_vs_core_leftmost():
    import random

    random.seed(9)
    for _ in range(25):
        k = random.randint(1, 8)
        pats = list({
            "".join(random.choice("ab") for _ in range(random.randint(1, 5)))
            for _ in range(k)
        })
        h = "".join(random.choice("abz") for _ in range(300))
        s = Searcher.new(pats)
        core = AhoCorasick(pats, match_kind=CoreKind.LEFTMOST_FIRST)
        got = [m.astuple() for m in s.find_iter(h)]
        want = [m.astuple() for m in core.find_iter(h)]
        assert got == want, (pats, h[:50], got[:5], want[:5])


def test_packed_find_in_span():
    from ahocorasick_tpu.utils.search import Span

    s = Searcher.new(["teddy", "bear"])
    h = "a teddy bear"
    m = s.find_in(h, Span(3, len(h)))
    assert m is not None and m.astuple() == (1, 8, 12)


def test_packed_large_set_rides_fingerprint_engine():
    """128 long patterns exceed the exact kernel's 2048-byte bound: the
    packed default engine must ride the bucketed fingerprint filter and
    still agree with the core leftmost-first searcher."""
    import random

    random.seed(17)
    pats = sorted({
        "".join(random.choice("abcdefgh") for _ in range(
            random.randint(17, 24)
        ))
        for _ in range(120)
    })[:120]
    assert sum(len(p) for p in pats) > 2048
    s = Searcher.new(pats)
    # The fingerprint engine is constructed lazily on first use.
    assert s._bitap is None and s._fp is None
    assert s._fp_engine() is not None and s._fp is not None
    planted = "".join(
        random.choice("abcdefghij") for _ in range(4000)
    )
    h = planted[:500] + pats[3] + planted[500:900] + pats[77] + planted[900:]
    core = AhoCorasick(pats, match_kind=CoreKind.LEFTMOST_FIRST)
    got = [m.astuple() for m in s.find_iter(h)]
    want = [m.astuple() for m in core.find_iter(h)]
    assert got == want
    assert len(got) >= 2
