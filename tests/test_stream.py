"""Stream search/replace tests.

Mirrors the reference's stream test strategy (tests.rs:686-705): the
standard non-overlapping corpus driven through the stream API with
worst-case chunking (chunk_size=1, the BufReader::with_capacity(1)
analog), skipping empty-pattern cases (stream rejects them,
automaton.rs:1101-1103).
"""

import io

import pytest

import corpus
from ahocorasick_tpu import AhoCorasick, MatchKind, MatchError
from ahocorasick_tpu.stream import (
    stream_find_iter,
    stream_replace_all,
    stream_replace_all_with,
)


def stream_cases():
    for name, patterns, haystack, expected in corpus.iter_tests(
        corpus.AC_STANDARD_NON_OVERLAPPING
    ):
        if any(len(p) == 0 for p in patterns):
            continue
        yield name, patterns, haystack, expected


@pytest.mark.parametrize("chunk_size", [1, 3, 1 << 20])
def test_stream_find_iter_corpus(chunk_size):
    for name, patterns, haystack, expected in stream_cases():
        ac = AhoCorasick(patterns)
        rdr = io.BytesIO(haystack.encode())
        got = [
            m.astuple()
            for m in stream_find_iter(ac, rdr, chunk_size=chunk_size)
        ]
        assert got == expected, (
            f"{name} chunk={chunk_size}: patterns={patterns!r}"
            f" haystack={haystack!r}: got {got}, want {expected}"
        )


@pytest.mark.parametrize("chunk_size", [1, 7, 1 << 20])
def test_stream_replace_all(chunk_size):
    ac = AhoCorasick(["fox", "brown", "quick"])
    rdr = io.BytesIO(b"The quick brown fox jumps." * 5)
    w = io.BytesIO()
    stream_replace_all(
        ac, rdr, w, [b"sloth", b"grey", b"slow"], chunk_size=chunk_size
    )
    assert w.getvalue() == b"The slow grey sloth jumps." * 5


def test_stream_replace_matches_inline_replace():
    import random

    random.seed(11)
    pats = ["ab", "bc", "ca"]
    reps = [b"X", b"YY", b""]
    for _ in range(10):
        h = "".join(random.choice("abc") for _ in range(500)).encode()
        ac = AhoCorasick(pats)
        want = ac.replace_all_bytes(h, reps)
        for cs in (1, 13, 100000):
            w = io.BytesIO()
            stream_replace_all(ac, io.BytesIO(h), w, reps, chunk_size=cs)
            assert w.getvalue() == want, (h[:30], cs)


def test_stream_rejects_leftmost_and_empty():
    ac = AhoCorasick(["x"], match_kind=MatchKind.LEFTMOST_FIRST)
    with pytest.raises(MatchError) as ei:
        list(stream_find_iter(ac, io.BytesIO(b"x")))
    assert ei.value.kind == "unsupported-stream"
    ac = AhoCorasick(["x", ""])
    with pytest.raises(MatchError) as ei:
        list(stream_find_iter(ac, io.BytesIO(b"x")))
    assert ei.value.kind == "unsupported-empty"


def test_stream_replace_with_callback():
    ac = AhoCorasick(["cat", "dog"])
    w = io.BytesIO()
    stream_replace_all_with(
        ac,
        io.BytesIO(b"a cat and a dog"),
        w,
        lambda m, matched: matched.upper(),
    )
    assert w.getvalue() == b"a CAT and a DOG"


def test_stream_boundary_regression():
    # Analog of the reference regression_stream_rare_byte_prefilter
    # (tests.rs:1588-1664): a match placed exactly across the internal
    # chunk boundary must be found.
    magic = b"1234j"
    begin = 65_535
    data = bytearray(b"\x00" * 100_000)
    data[begin:begin + len(magic)] = magic
    ac = AhoCorasick([magic])
    whole = [m.astuple() for m in ac.find_iter(bytes(data))]
    for cs in (65_536, 8192, 1):
        got = [
            m.astuple()
            for m in stream_find_iter(ac, io.BytesIO(bytes(data)), chunk_size=cs)
        ]
        assert got == whole == [(0, begin, begin + len(magic))], (cs, got)
