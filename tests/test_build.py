"""Construction tests: native C++ builder vs Python builder equivalence,
byte classes, special-state layout, and build-error contracts."""

import random

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, MatchKind
from ahocorasick_tpu.automata import native
from ahocorasick_tpu.automata.noncontiguous import compile_nfa

ARRAYS = [
    "fail",
    "depth",
    "match_starts",
    "match_pids",
    "trans_starts",
    "trans_bytes",
    "trans_next",
    "classes",
    "pattern_lens",
]


def assert_same(a, b, ctx):
    assert a.num_states == b.num_states, ctx
    assert a.alphabet_len == b.alphabet_len, ctx
    assert a.special.__dict__ == b.special.__dict__, ctx
    assert a.start_loop_open == b.start_loop_open, ctx
    assert a.min_pattern_len == b.min_pattern_len, ctx
    assert a.max_pattern_len == b.max_pattern_len, ctx
    for name in ARRAYS:
        x, y = getattr(a, name), getattr(b, name)
        assert np.array_equal(x, y), f"{ctx}: array {name} differs"


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_builder_matches_python():
    random.seed(5)
    cases = [
        ([], {}),
        ([b""], {}),
        ([b"a", b"ab", b"abc"], {}),
        ([b"abc", b"bc", b"c"], {"match_kind": MatchKind.LEFTMOST_FIRST}),
        ([b"abc", b"bc", b"c"], {"match_kind": MatchKind.LEFTMOST_LONGEST}),
        ([b"", b"a"], {"match_kind": MatchKind.LEFTMOST_FIRST}),
        ([b"Sam", b"Samwise"], {"ascii_case_insensitive": True}),
        ([b"foo", b"foo"], {}),
    ]
    for _ in range(30):
        pats = [
            bytes(
                random.choice(b"abAB\x00\xff")
                for _ in range(random.randint(0, 5))
            )
            for _ in range(random.randint(1, 8))
        ]
        kind = random.choice(list(MatchKind))
        ci = random.random() < 0.5
        cases.append(
            (pats, {"match_kind": kind, "ascii_case_insensitive": ci})
        )
    for pats, kw in cases:
        py = compile_nfa(pats, builder="python", **kw)
        nat = compile_nfa(pats, builder="native", **kw)
        assert_same(py, nat, f"pats={pats!r} kw={kw}")


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_builder_speed_sanity():
    # 10k random patterns should build in well under a second natively.
    import time

    random.seed(6)
    pats = [
        bytes(random.choice(b"abcdefgh") for _ in range(random.randint(3, 12)))
        for _ in range(10_000)
    ]
    t0 = time.perf_counter()
    nfa = compile_nfa(pats, builder="native")
    dt = time.perf_counter() - t0
    assert nfa.num_states > 1000
    assert dt < 2.0, f"native build took {dt:.2f}s"


def test_byte_classes_partition():
    nfa = compile_nfa([b"ab"])
    # 'a' and 'b' get their own classes; everything else shares.
    ca, cb = nfa.classes[ord("a")], nfa.classes[ord("b")]
    assert ca != cb
    other = {int(nfa.classes[x]) for x in range(256) if x not in (97, 98)}
    assert len(other) <= 3  # runs below/between/above


def test_special_state_layout():
    nfa = compile_nfa([b"ab", b"b"])
    sp = nfa.special
    # DEAD=0, reserved=1, match states 2..max_match_id, starts after.
    assert sp.max_match_id >= 2
    assert sp.start_unanchored_id == sp.max_match_id + 1
    assert sp.start_anchored_id == sp.start_unanchored_id + 1
    # Empty pattern present -> starts are match states.
    nfa2 = compile_nfa([b"", b"a"])
    assert nfa2.special.max_match_id == nfa2.special.start_anchored_id


def test_memory_usage_and_introspection():
    ac = AhoCorasick(["foo", "bar", "quux"])
    assert ac.memory_usage() > 0
    assert ac.min_pattern_len() == 3
    assert ac.max_pattern_len() == 4
    assert ac.patterns_len() == 3
