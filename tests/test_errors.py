"""Error-contract and targeted regression tests.

Mirrors the reference's contract suite (src/tests.rs:1410-1489) and the
targeted regressions (src/tests.rs:1523-1664): unsupported search modes
must be rejected with a typed MatchError *regardless of backend
capability*, and historical prefilter/case-folding bugs stay fixed.
"""

import pytest

from ahocorasick_tpu import (
    AhoCorasick,
    Anchored,
    Input,
    MatchError,
    MatchKind,
    OverlappingState,
    StartKind,
)


@pytest.mark.parametrize(
    "kind", [MatchKind.LEFTMOST_FIRST, MatchKind.LEFTMOST_LONGEST]
)
def test_leftmost_rejects_overlapping(kind):
    """tests.rs:1410-1441 — overlapping requires standard semantics."""
    ac = AhoCorasick(["foo", "foofoo"], match_kind=kind)
    with pytest.raises(MatchError) as ei:
        list(ac.try_find_overlapping_iter(Input("foofoo")))
    assert ei.value.kind == "unsupported-overlapping"
    with pytest.raises(MatchError):
        ac.try_find_overlapping(Input("foofoo"), OverlappingState())
    with pytest.raises(MatchError):
        ac.count_matches(Input("foofoo"))


def test_standard_supports_overlapping():
    ac = AhoCorasick(["foo", "foofoo"], match_kind=MatchKind.STANDARD)
    got = [m.astuple() for m in ac.find_overlapping_iter(Input("foofoo"))]
    assert got == [(0, 0, 3), (1, 0, 6), (0, 3, 6)]


@pytest.mark.parametrize(
    "start_kind", [StartKind.UNANCHORED, StartKind.BOTH]
)
def test_unanchored_accepted(start_kind):
    ac = AhoCorasick(["b"], start_kind=start_kind)
    assert ac.find(Input("ab")).astuple() == (0, 1, 2)


@pytest.mark.parametrize(
    "start_kind", [StartKind.ANCHORED, StartKind.BOTH]
)
def test_anchored_accepted(start_kind):
    ac = AhoCorasick(["a"], start_kind=start_kind)
    inp = Input("ab").set_anchored(Anchored.YES)
    assert ac.find(inp).astuple() == (0, 0, 1)


def test_anchored_rejected_when_unanchored_only():
    """tests.rs:1460-1489 — request inconsistent with start_kind."""
    ac = AhoCorasick(["a"], start_kind=StartKind.UNANCHORED)
    inp = Input("a").set_anchored(Anchored.YES)
    with pytest.raises(MatchError) as ei:
        ac.try_find(inp)
    assert ei.value.kind == "invalid-input-anchored"
    with pytest.raises(MatchError):
        list(ac.try_find_iter(inp))


def test_unanchored_rejected_when_anchored_only():
    ac = AhoCorasick(["a"], start_kind=StartKind.ANCHORED)
    with pytest.raises(MatchError) as ei:
        ac.try_find(Input("a"))
    assert ei.value.kind == "invalid-input-unanchored"
    with pytest.raises(MatchError):
        list(ac.try_find_iter(Input("a")))
    with pytest.raises(MatchError):
        ac.try_replace_all("a", ["b"])


def test_anchored_consistency_all_apis():
    """The consistency check guards every entry point
    (ahocorasick.rs:2778-2789 applied at each try_* method)."""
    ac = AhoCorasick(["x"], start_kind=StartKind.ANCHORED)
    unanchored = Input("x")
    with pytest.raises(MatchError):
        list(ac.try_find_overlapping_iter(unanchored))
    with pytest.raises(MatchError):
        ac.count_matches(unanchored)
    assert ac.is_match(Input("xy").set_anchored(Anchored.YES))


# ---------------------------------------------------------------------------
# Build-error contracts (util/error.rs:23-49)
# ---------------------------------------------------------------------------
def test_contiguous_state_id_overflow(monkeypatch):
    """The contiguous encoding caps state IDs (= repr offsets) at 2^24-1
    (contiguous.rs:414-418); exceeding it must raise a typed BuildError,
    not a TypeError. The limit is monkeypatched down so the test does not
    have to materialize a 16M-word automaton."""
    from ahocorasick_tpu.automata import contiguous, noncontiguous
    from ahocorasick_tpu.utils.errors import BuildError

    monkeypatch.setattr(contiguous, "_NEXT_LIMIT", 16)
    nfa = noncontiguous.compile_nfa(
        [b"abcdef", b"ghijkl", b"mnopqr"], builder="python"
    )
    with pytest.raises(BuildError) as ei:
        contiguous.build_contiguous(nfa, 3)
    assert ei.value.kind == "state-id-overflow"


def test_noncontiguous_state_id_overflow(monkeypatch):
    """util/primitives.rs:92-117 — allocating more states than SmallIndex
    can identify fails with state-id-overflow."""
    from ahocorasick_tpu.automata import noncontiguous
    from ahocorasick_tpu.utils.errors import BuildError

    monkeypatch.setattr(noncontiguous, "MAX_SMALL_INDEX", 8)
    with pytest.raises(BuildError) as ei:
        noncontiguous.compile_nfa(
            [b"abc", b"def", b"ghi"], builder="python"
        )
    assert ei.value.kind == "state-id-overflow"


def test_pattern_id_overflow(monkeypatch):
    from ahocorasick_tpu.automata import noncontiguous
    from ahocorasick_tpu.utils.errors import BuildError

    monkeypatch.setattr(noncontiguous, "MAX_SMALL_INDEX", 2)
    with pytest.raises(BuildError) as ei:
        noncontiguous.compile_nfa(
            [b"a", b"b", b"c"], builder="python"
        )
    assert ei.value.kind == "pattern-id-overflow"


# ---------------------------------------------------------------------------
# Targeted regressions (tests.rs:1523-1664)
# ---------------------------------------------------------------------------
def test_search_respects_input_span():
    """tests.rs:1523 — prefilter must not look outside the span."""
    ac = AhoCorasick(["foo"])
    hay = "foofoo"
    got = [m.astuple() for m in ac.find_iter(Input(hay).span(3, 6))]
    assert got == [(0, 3, 6)]
    got = [m.astuple() for m in ac.find_iter(Input(hay).span(1, 6))]
    assert got == [(0, 3, 6)]
    assert list(ac.find_iter(Input(hay).span(1, 5))) == []


def test_case_insensitive_build_not_exponential():
    """tests.rs:1537 — many case variants must not blow up the build."""
    pats = ["Sherlock", "Holmes", "Watson", "#&#&_@&#", "BrUh"] * 4
    ac = AhoCorasick(
        pats, ascii_case_insensitive=True, match_kind=MatchKind.LEFTMOST_FIRST
    )
    m = ac.find(Input("x shERLock y"))
    assert m is not None and m.astuple()[1:] == (2, 10)


def test_rare_byte_prefilter_bounds():
    """tests.rs:1551/:1559 — rare-byte offsets near pattern ends."""
    ac = AhoCorasick(["iti"])
    got = [m.astuple() for m in ac.find_iter(Input("osssssssssssssssiti"))]
    assert got == [(0, 16, 19)]
    ac = AhoCorasick(["e_sugar", "s_sugar"])
    hay = "testing e_sugar and s_sugar yum"
    got = [m.astuple() for m in ac.find_iter(Input(hay))]
    assert got == [(0, 8, 15), (1, 20, 27)]


def test_earliest_semantics():
    """Input(earliest=True) returns the leftmost *detectable* match
    (automaton.rs try_find with earliest)."""
    ac = AhoCorasick(
        ["foo", "foofoo"], match_kind=MatchKind.LEFTMOST_LONGEST
    )
    assert ac.find(Input("foofoo")).astuple() == (1, 0, 6)
    got = ac.find(Input("foofoo").set_earliest(True))
    assert got.astuple() == (0, 0, 3)


# ---------------------------------------------------------------------------
# Automaton debug dump (nfa/noncontiguous.rs:1691-1762, dfa.rs:305-381)
# ---------------------------------------------------------------------------
def test_debug_dump():
    from ahocorasick_tpu.utils.debug import sparse_transitions

    ac = AhoCorasick(["abc", "bc", "b"], match_kind=MatchKind.LEFTMOST_FIRST)
    s = ac.debug_str()
    assert "noncontiguous::NFA(" in s and "dfa::DFA(" in s
    # Match states are starred with their pattern lists.
    assert "*" in s and "fail =>" in s
    # Range collapsing (automaton.rs:1583-1608).
    assert list(sparse_transitions([(0, 5), (1, 5), (2, 7), (9, 7)])) == [
        (0, 1, 5), (2, 2, 7), (9, 9, 7)
    ]
    capped = ac.debug_str(max_states=2)
    assert "more states" in capped


def test_overlapping_resumable_device_backed():
    """try_find_overlapping backed by the device match set must emit the
    same sequence as the oracle walk, including resumption on a changed
    input (the state devolves to the carried automaton walk)."""
    pats = ["foo", "foofoo", "oo"]
    hay = b"foofoo" * 40
    ac = AhoCorasick(pats, device_threshold=16)
    aco = AhoCorasick(pats, engine="oracle")

    def drain(a, h, limit=None):
        from ahocorasick_tpu import OverlappingState

        st = OverlappingState()
        out = []
        while limit is None or len(out) < limit:
            a.try_find_overlapping(Input(h), st)
            m = st.get_match()
            if m is None:
                break
            out.append(m.astuple())
        return out, st

    got, _ = drain(ac, hay)
    want, _ = drain(aco, hay)
    assert got == want and len(got) > 100

    # Mid-drain input switch: continue on an extended haystack.
    got_partial, st = drain(ac, hay, limit=5)
    hay2 = hay + b"foo"
    rest = []
    while True:
        ac.try_find_overlapping(Input(hay2), st)
        m = st.get_match()
        if m is None:
            break
        rest.append(m.astuple())
    wo_partial, sto = drain(aco, hay, limit=5)
    wrest = []
    while True:
        aco.try_find_overlapping(Input(hay2), sto)
        m = sto.get_match()
        if m is None:
            break
        wrest.append(m.astuple())
    assert got_partial == wo_partial
    assert rest == wrest


def test_overlapping_drained_then_input_switch():
    """Regression: after the device-backed state is fully drained (a None
    was served), resuming on a different input must behave like the
    reference's exhausted carried state — not replay stale matches from
    the old input's match list."""
    from ahocorasick_tpu import OverlappingState

    pats = ["foo", "oo"]
    hay1 = b"xxfoo xx"          # matches on the device path
    # hay2 places a match AFTER hay1's last match position: a stale
    # devolved state (at = last match instead of end-of-scan) would
    # rescan hay2's tail and report it; the exhausted oracle does not.
    hay2 = b"zzzzzfoo"
    ac = AhoCorasick(pats, device_threshold=4)
    aco = AhoCorasick(pats, engine="oracle")

    def run(a):
        st = OverlappingState()
        seq = []
        # Drain input 1 fully, INCLUDING the terminating None.
        for _ in range(16):
            a.try_find_overlapping(Input(hay1), st)
            m = st.get_match()
            seq.append(None if m is None else m.astuple())
            if m is None:
                break
        # Resume on a different input with the same (exhausted) state.
        for _ in range(4):
            a.try_find_overlapping(Input(hay2), st)
            m = st.get_match()
            seq.append(None if m is None else m.astuple())
        return seq

    assert run(ac) == run(aco)
