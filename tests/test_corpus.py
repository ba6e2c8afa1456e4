"""Conformance corpus runner: the parity acceptance gate.

Crosses the reference's test collections (tests.rs:47-88) with framework
configurations, the way testconfig!/testcombo! do (tests.rs:653-873):
every collection runs against the device engine and the oracle engine,
with byte classes on and off.
"""

import pytest

import corpus
from ahocorasick_tpu import (
    AhoCorasick,
    AhoCorasickKind,
    Anchored,
    Input,
    MatchKind,
    StartKind,
)

CONFIGS = [
    # Forces every haystack through the bit-parallel Pallas kernel
    # (interpret mode on CPU); ineligible pattern sets (empty patterns,
    # >512 bytes) fall back to the DFA scan, so this config still covers
    # every corpus case.
    ("bitap", dict(engine="bitap", device_threshold=0)),
    # Forces the blocked dense-DFA device scan.
    ("dfa_scan", dict(engine="dfa-scan", device_threshold=0)),
    # Same dense-table semantics via the host scalar walk (fast), with
    # byte classes disabled (identity alphabet).
    ("device_nobc", dict(engine="dfa-scan", byte_classes=False)),
    ("oracle", dict(engine="oracle")),
    ("auto", dict()),
    # Bucketed fingerprint filter + exact verification, forced even for
    # pattern sets the exact engine could take.
    ("fingerprint", dict(engine="fingerprint", device_threshold=0)),
    # dense_depth crosses on the contiguous host walk: all-sparse (0)
    # and all-dense (usize::MAX analog), per tests.rs:686-863.
    ("contig_sparse", dict(engine="oracle", dense_depth=0,
                           kind=AhoCorasickKind.CONTIGUOUS_NFA)),
    ("contig_dense", dict(engine="oracle", dense_depth=1 << 20,
                          kind=AhoCorasickKind.CONTIGUOUS_NFA)),
]

NONOVERLAPPING_COLLECTIONS = [
    ("standard", MatchKind.STANDARD, corpus.AC_STANDARD_NON_OVERLAPPING),
    ("leftmost_first", MatchKind.LEFTMOST_FIRST, corpus.AC_LEFTMOST_FIRST),
    (
        "leftmost_longest",
        MatchKind.LEFTMOST_LONGEST,
        corpus.AC_LEFTMOST_LONGEST,
    ),
]

ANCHORED_COLLECTIONS = [
    (
        "standard",
        MatchKind.STANDARD,
        corpus.AC_STANDARD_ANCHORED_NON_OVERLAPPING,
    ),
    (
        "leftmost_first",
        MatchKind.LEFTMOST_FIRST,
        corpus.AC_LEFTMOST_FIRST_ANCHORED,
    ),
    (
        "leftmost_longest",
        MatchKind.LEFTMOST_LONGEST,
        corpus.AC_LEFTMOST_LONGEST_ANCHORED,
    ),
]


def triples(it):
    return [m.astuple() for m in it]


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS)
@pytest.mark.parametrize("kind_name,kind,collection", NONOVERLAPPING_COLLECTIONS)
def test_find_iter(cfg_name, cfg, kind_name, kind, collection):
    for name, patterns, haystack, expected in corpus.iter_tests(collection):
        ac = AhoCorasick(patterns, match_kind=kind, **cfg)
        got = triples(ac.try_find_iter(Input(haystack)))
        assert got == expected, (
            f"test {name}: patterns={patterns!r} haystack={haystack!r}"
            f" kind={kind_name} cfg={cfg_name}: got {got}, want {expected}"
        )


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS)
@pytest.mark.parametrize("kind_name,kind,collection", ANCHORED_COLLECTIONS)
def test_find_iter_anchored(cfg_name, cfg, kind_name, kind, collection):
    for name, patterns, haystack, expected in corpus.iter_tests(collection):
        ac = AhoCorasick(
            patterns, match_kind=kind, start_kind=StartKind.BOTH, **cfg
        )
        inp = Input(haystack, anchored=Anchored.YES)
        got = triples(ac.try_find_iter(inp))
        assert got == expected, (
            f"test {name}: patterns={patterns!r} haystack={haystack!r}"
            f" kind={kind_name} cfg={cfg_name}: got {got}, want {expected}"
        )


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS)
def test_find_overlapping_iter(cfg_name, cfg):
    for name, patterns, haystack, expected in corpus.iter_tests(
        corpus.AC_STANDARD_OVERLAPPING
    ):
        ac = AhoCorasick(patterns, match_kind=MatchKind.STANDARD, **cfg)
        got = triples(ac.try_find_overlapping_iter(Input(haystack)))
        assert got == expected, (
            f"test {name}: patterns={patterns!r} haystack={haystack!r}"
            f" cfg={cfg_name}: got {got}, want {expected}"
        )


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS)
@pytest.mark.parametrize(
    "kind",
    [MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST, MatchKind.LEFTMOST_LONGEST],
)
def test_ascii_case_insensitive(cfg_name, cfg, kind):
    groups = [
        corpus.ASCII_CASE_INSENSITIVE,
        corpus.ASCII_CASE_INSENSITIVE_NON_OVERLAPPING,
    ]
    for name, patterns, haystack, expected in corpus.iter_tests(groups):
        ac = AhoCorasick(
            patterns, match_kind=kind, ascii_case_insensitive=True, **cfg
        )
        got = triples(ac.try_find_iter(Input(haystack)))
        assert got == expected, (
            f"test {name}: patterns={patterns!r} haystack={haystack!r}"
            f" kind={kind} cfg={cfg_name}: got {got}, want {expected}"
        )


@pytest.mark.parametrize("cfg_name,cfg", CONFIGS)
def test_ascii_case_insensitive_overlapping(cfg_name, cfg):
    for name, patterns, haystack, expected in corpus.iter_tests(
        [corpus.ASCII_CASE_INSENSITIVE,
         corpus.ASCII_CASE_INSENSITIVE_OVERLAPPING]
    ):
        ac = AhoCorasick(
            patterns,
            match_kind=MatchKind.STANDARD,
            ascii_case_insensitive=True,
            **cfg,
        )
        got = triples(ac.try_find_overlapping_iter(Input(haystack)))
        assert got == expected, (
            f"test {name}: patterns={patterns!r} haystack={haystack!r}"
            f" cfg={cfg_name}: got {got}, want {expected}"
        )


def test_corpus_names_unique():
    # Mirror of tests.rs:1382-1405.
    for group_name in dir(corpus):
        group = getattr(corpus, group_name)
        if (
            isinstance(group, list)
            and group
            and isinstance(group[0], tuple)
            and group_name.isupper()
            and not group_name.startswith("AC_")
        ):
            names = [t[0] for t in group]
            assert len(names) == len(set(names)), f"dups in {group_name}"
