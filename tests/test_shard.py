"""Multi-device sharded search tests on the virtual 8-device CPU mesh."""

import random

import jax
import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasick, Input, MatchKind
from ahocorasick_tpu.ops.bitap import BitapEngine
from ahocorasick_tpu.parallel.shard import (
    make_mesh,
    sharded_bitap_count,
    sharded_count_matches,
)


def total_overlapping(ac, h):
    return sum(1 for _ in ac.find_overlapping_iter(Input(h)))


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_count_matches_small(ndev):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    random.seed(3)
    pats = ["ab", "babc", "c", "ccc"]
    h = "".join(random.choice("abc") for _ in range(5000)).encode()
    ac = AhoCorasick(pats)
    want = total_overlapping(ac, h)
    mesh = make_mesh(ndev)
    got = sharded_count_matches(ac._device_automaton(), h, mesh)
    assert got == want


def test_sharded_count_cross_shard_matches():
    # Matches that span shard boundaries must be counted exactly once by
    # the shard in which they END (halo warm-up).
    pats = ["xyxyxyxy"]
    n = 40000
    h = bytearray(b"." * n)
    ac = AhoCorasick(pats)
    # Place matches straddling every shard boundary for an 8-way split.
    shard = -(-n // 8)
    for i in range(1, 8):
        p = i * shard - 4
        h[p:p + 8] = b"xyxyxyxy"
    h = bytes(h)
    want = total_overlapping(ac, h)
    assert want >= 7
    got = sharded_count_matches(ac._device_automaton(), h, make_mesh(8))
    assert got == want


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_bitap_count(ndev):
    random.seed(5)
    pats = [b"ab", b"babc", b"c", b"ccc"]
    h = "".join(random.choice("abc") for _ in range(5000)).encode()
    ac = AhoCorasick(pats)
    want = total_overlapping(ac, h)
    eng = BitapEngine(pats, False)
    got = sharded_bitap_count(eng, h, make_mesh(ndev))
    assert got == want


def test_sharded_bitap_cross_shard_matches():
    pats = [b"xyxyxyxy"]
    n = 40000
    h = bytearray(b"." * n)
    shard = -(-n // 8)
    for i in range(1, 8):
        p = i * shard - 4
        h[p:p + 8] = b"xyxyxyxy"
    h = bytes(h)
    ac = AhoCorasick(pats)
    want = total_overlapping(ac, h)
    assert want >= 7
    eng = BitapEngine(pats, False)
    # shard rounding inside sharded_bitap_count differs from the straddle
    # positions above, but every boundary region is still covered.
    got = sharded_bitap_count(eng, h, make_mesh(8))
    assert got == want
    assert sharded_bitap_count(eng, b"", make_mesh(8)) == 0
    assert sharded_bitap_count(eng, b"xyxyxyxy", make_mesh(8)) == 1


def test_sharded_count_empty_and_tiny():
    ac = AhoCorasick(["abc"])
    assert sharded_count_matches(ac._device_automaton(), b"", make_mesh(8)) == 0
    assert (
        sharded_count_matches(ac._device_automaton(), b"abc", make_mesh(8))
        == 1
    )


# ---------------------------------------------------------------------------
# Sharded extraction + sharded stream replace (round 2)
# ---------------------------------------------------------------------------
def _oracle_pairs(ac, h):
    ms = [(m.pattern, m.end) for m in ac.find_overlapping_iter(Input(h))]
    return ms


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_match_pairs(ndev):
    from ahocorasick_tpu.parallel.shard import sharded_bitap_match_pairs

    random.seed(11)
    pats = ["ab", "babc", "c", "ccc", "abcabc"]
    h = "".join(random.choice("abcx") for _ in range(6000)).encode()
    ac = AhoCorasick(pats)
    eng = ac._bitap_engine()
    pids, ends = sharded_bitap_match_pairs(eng, h, make_mesh(ndev))
    want = _oracle_pairs(ac, h)
    assert list(zip(pids.tolist(), ends.tolist())) == want


def test_sharded_match_pairs_cross_shard():
    from ahocorasick_tpu.parallel.shard import sharded_bitap_match_pairs

    pats = ["xyxyxyxy", "yx"]
    n = 40000
    h = bytearray(b"." * n)
    shard = -(-n // 8)
    for i in range(1, 8):
        p = i * shard - 4
        h[p:p + 8] = b"xyxyxyxy"
    h = bytes(h)
    ac = AhoCorasick(pats)
    pids, ends = sharded_bitap_match_pairs(
        ac._bitap_engine(), h, make_mesh(8)
    )
    want = _oracle_pairs(ac, h)
    assert list(zip(pids.tolist(), ends.tolist())) == want
    assert len(want) == 7 * 4  # per planted block: 1 long + 3 "yx"


def test_sharded_searcher_find_iter_semantics():
    from ahocorasick_tpu.parallel.shard import ShardedSearcher
    from ahocorasick_tpu import semantics

    random.seed(13)
    pats = ["Samwise", "Sam", "wise"]
    h = ("Sam and Samwise the wise " * 40).encode()
    for kind in (MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
                 MatchKind.LEFTMOST_LONGEST):
        ac = AhoCorasick(pats, match_kind=kind)
        ss = ShardedSearcher(ac, make_mesh(8))
        ms = ss._match_set(Input(h))
        got = [m.astuple() for m in
               semantics.select_non_overlapping(ms, kind, 0)]
        want = [m.astuple() for m in ac.find_iter(Input(h))]
        assert got == want


def test_sharded_stream_replace_all():
    import io

    from ahocorasick_tpu.parallel.shard import (
        sharded_stream_replace_all,
    )

    random.seed(17)
    pats = ["fox", "dog", "foxtrot"]
    body = "".join(
        random.choice(["the fox ", "a dog ", "foxtrot! ", "zzz "])
        for _ in range(3000)
    ).encode()
    ac = AhoCorasick(pats)
    # Single-chip reference behavior.
    want = ac.try_replace_all_bytes(body, [b"F", b"D", b"FT"])
    out = io.BytesIO()
    sharded_stream_replace_all(
        ac, io.BytesIO(body), out, [b"F", b"D", b"FT"],
        mesh=make_mesh(8), chunk_size=997,  # force many carry rounds
    )
    assert out.getvalue() == want


@pytest.mark.slow  # default profile keeps test_sharded_stream_replace_all
def test_sharded_stream_replace_cross_chunk_and_shard():
    import io

    from ahocorasick_tpu.parallel.shard import (
        sharded_stream_replace_all,
    )

    pats = ["xyxyxyxy"]
    n = 30000
    h = bytearray(b"." * n)
    for p in range(911, n - 8, 911):
        h[p:p + 8] = b"xyxyxyxy"
    h = bytes(h)
    ac = AhoCorasick(pats)
    want = ac.try_replace_all_bytes(h, [b"<>"])
    out = io.BytesIO()
    sharded_stream_replace_all(
        ac, io.BytesIO(h), out, [b"<>"], mesh=make_mesh(8),
        chunk_size=1024,
    )
    assert out.getvalue() == want


def test_sharded_fingerprint_match_pairs():
    """Pattern sets beyond the exact engine's bounds shard through the
    fingerprint filter with host verification."""
    import numpy as np

    from ahocorasick_tpu.parallel.shard import sharded_fp_match_pairs
    from ahocorasick_tpu.ops.fingerprint import FingerprintEngine

    rng = np.random.default_rng(41)
    pats = sorted({
        rng.choice(list(b"abcdefgh"), int(rng.integers(4, 12)))
        .astype(np.uint8).tobytes()
        for _ in range(300)
    })
    assert sum(len(p) for p in pats) > 2048  # beyond bitap bounds
    h = rng.choice(list(b"abcdefghijk"), 20000).astype(np.uint8).tobytes()
    # Plant matches, including across shard boundaries for 8 shards.
    hb = bytearray(h)
    shard = -(-len(hb) // 8)
    for i in range(1, 8):
        p = pats[i * 17 % len(pats)]
        pos = i * shard - len(p) // 2
        hb[pos:pos + len(p)] = p
    h = bytes(hb)
    eng = FingerprintEngine(pats, False)
    got = sharded_fp_match_pairs(eng, h, make_mesh(8))
    assert got is not None
    pids, ends = got
    ac = AhoCorasick(pats)
    want = _oracle_pairs(ac, h)
    assert list(zip(pids.tolist(), ends.tolist())) == want
    assert len(want) >= 7


@pytest.mark.slow  # default profile keeps test_sharded_stream_replace_all
def test_sharded_searcher_fingerprint_stream_replace():
    import io
    import numpy as np

    from ahocorasick_tpu.parallel.shard import sharded_stream_replace_all

    rng = np.random.default_rng(43)
    pats = sorted({
        rng.choice(list(b"mnopqrst"), int(rng.integers(5, 12)))
        .astype(np.uint8).tobytes()
        for _ in range(340)
    })
    # Beyond bitap bounds so the sharded searcher (and any single-chip
    # fallback) actually exercises the fingerprint path this test names.
    assert sum(len(p) for p in pats) > 2048
    body = rng.choice(list(b"mnopqrstuvwx"), 30000).astype(
        np.uint8).tobytes()
    bb = bytearray(body)
    for p in range(500, len(bb) - 12, 1500):
        pat = pats[p % len(pats)]
        bb[p:p + len(pat)] = pat
    body = bytes(bb)
    ac = AhoCorasick(pats)
    reps = [b"<%d>" % i for i in range(len(pats))]
    # Expected output from the host oracle walk (cheap and
    # engine-independent; the device path is what's under test).
    want = AhoCorasick(pats, engine="oracle").try_replace_all_bytes(
        body, reps
    )
    out = io.BytesIO()
    sharded_stream_replace_all(
        ac, io.BytesIO(body), out, reps, mesh=make_mesh(8),
        chunk_size=2048,
    )
    assert out.getvalue() == want


def test_sharded_match_pairs_slabbed(monkeypatch):
    """Extraction larger than ndev * MAX_EXTRACT_CHUNK must slab the
    haystack (bounding each shard's device words output) and still
    produce the exact match set, including matches straddling slab
    boundaries."""
    from ahocorasick_tpu.ops import bitap as B
    from ahocorasick_tpu.parallel.shard import sharded_bitap_match_pairs

    monkeypatch.setattr(B, "MAX_EXTRACT_CHUNK", 1 << 10)
    random.seed(13)
    pats = ["ab", "babc", "abcabc"]
    n = 40000  # >> 8 devices * 1 KiB slab bound
    h = bytearray(
        "".join(random.choice("abcx") for _ in range(n)).encode()
    )
    # Straddle the first few slab boundaries explicitly.
    slab = (1 << 10) * 8
    for i in range(1, 4):
        p = i * slab - 3
        h[p:p + 6] = b"abcabc"
    h = bytes(h)
    ac = AhoCorasick(pats)
    pids, ends = sharded_bitap_match_pairs(
        ac._bitap_engine(), h, make_mesh(8)
    )
    want = _oracle_pairs(ac, h)
    assert list(zip(pids.tolist(), ends.tolist())) == want


def test_sharded_cascade_match_pairs():
    """The very-large-dictionary cascade engine over the mesh: per-shard
    coarse filter + local probe/expand/verify, forward-halo ownership
    (candidates anchor at the coarse prefix END, near the match start)."""
    import numpy as np

    from ahocorasick_tpu.ops.cascade import CascadeEngine
    from ahocorasick_tpu.parallel.shard import sharded_cascade_match_pairs

    rng = np.random.default_rng(44)
    syl = ("bar bel bor dan dar del dor fan far gar gor hal han har "
           "kar kel kor lan lor mar mor nal nar").split()
    pats = set()
    while len(pats) < 400:
        k = int(rng.integers(2, 5))
        pats.add("".join(
            syl[int(rng.integers(len(syl)))] for _ in range(k)
        ).encode())
    pats = sorted(pats)
    filler = [w.encode() for w in "xu qo ki ve zam tup lyn".split()]
    parts = []
    for i in range(4000):
        parts.append(pats[int(rng.integers(len(pats)))]
                     if rng.random() < 0.02
                     else filler[int(rng.integers(len(filler)))])
    h = bytearray(b" ".join(parts)[:24000])
    # Matches straddling every shard boundary for 8 shards (both a
    # pattern crossing the edge and one whose coarse prefix ends just
    # before it).
    shard = -(-len(h) // 8)
    for i in range(1, 8):
        p = pats[(i * 31) % len(pats)]
        pos = i * shard - len(p) // 2
        h[pos:pos + len(p)] = p
        p2 = pats[(i * 7) % len(pats)]
        pos2 = max(0, i * shard - 2)
        h[pos2:pos2 + len(p2)] = p2
    h = bytes(h)
    assert CascadeEngine.eligible(pats)
    eng = CascadeEngine(pats, False)
    got = sharded_cascade_match_pairs(eng, h, make_mesh(8))
    assert got is not None
    pids, ends = got
    single = eng.match_pairs(h)
    np.testing.assert_array_equal(pids, single[0])
    np.testing.assert_array_equal(ends, single[1])
    ac = AhoCorasick(pats)
    want = _oracle_pairs(ac, h)
    assert list(zip(pids.tolist(), ends.tolist())) == want
    assert len(want) >= 14


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_staged_count(ndev):
    """Two-stage (prefilter + rescan) count over the mesh must equal
    the single-chip overlapping count, including matches straddling
    shard boundaries (halo warmup) and candidate streams."""
    from ahocorasick_tpu.ops.staged import StagedEngine
    from ahocorasick_tpu.parallel.shard import sharded_staged_count

    random.seed(11)
    pats = [b"needle", b"haystack", b"sherlock"]
    n = 60000
    h = bytearray(
        "".join(random.choice("xyzw ") for _ in range(n)).encode()
    )
    shard = -(-n // ndev)
    for i in range(ndev):
        p = pats[i % len(pats)]
        pos = min(max(0, i * shard - len(p) // 2), n - len(p))
        h[pos:pos + len(p)] = p
    h = bytes(h)
    ac = AhoCorasick([p.decode() for p in pats])
    want = total_overlapping(ac, h)
    assert want >= ndev - 1
    eng = StagedEngine(pats, False)
    got = sharded_staged_count(eng, h, make_mesh(ndev))
    assert got == want
