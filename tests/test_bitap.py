"""Bit-parallel engine (ops/bitap.py) unit + randomized oracle tests.

The reference's strategy of forcing slow-but-correct backends as oracles
(tests.rs:686-873): here the oracle is naive per-pattern scanning, and the
engine under test is the Pallas kernel in interpret mode (CPU).
"""

import numpy as np
import pytest

from ahocorasick_tpu.ops.bitap import BitapEngine, BitapTables


def naive_pairs(pats, hay, ci=False):
    out = []
    h = hay.lower() if ci else hay
    for pid, p in enumerate(pats):
        q = p.lower() if ci else p
        st = 0
        while True:
            i = h.find(q, st)
            if i < 0:
                break
            out.append((pid, i + len(p)))
            st = i + 1
    lens = np.array([len(p) for p in pats])
    order = np.lexsort((np.arange(len(pats)), -lens))
    rank = np.empty(len(pats), np.int64)
    rank[order] = np.arange(len(pats))
    out.sort(key=lambda t: (t[1], rank[t[0]]))
    return out


def check(pats, hay, ci=False):
    eng = BitapEngine(pats, ci)
    want = naive_pairs(pats, hay, ci)
    assert eng.count_matches(hay) == len(want)
    pids, ends = eng.match_pairs(hay)
    assert list(zip(pids.tolist(), ends.tolist())) == want


def test_basics():
    check([b"apple", b"maple", b"Snapple"],
          b"Nobody likes maple in their apple flavored Snapple.")
    check([b"a"], b"aaaa")
    check([b"abba", b"b", b"ba"], b"abbabba")
    check([b"xyz"], b"")
    check([b"q", b"q", b"q"], b"qq")  # duplicate patterns


def test_case_insensitive():
    check([b"aBc", b"XY"], b"AbC abc ABC xy Xy xbc", ci=True)


def test_match_at_boundaries():
    # patterns straddling the packed-word and halo boundaries
    pat = b"boundary!"
    for pos in [0, 1, 3, 4, 5, 511, 512, 513, 2043, 2044, 4095]:
        hay = bytearray(b"." * 8192)
        hay[pos:pos + len(pat)] = pat
        check([pat, b".."], bytes(hay))


def test_long_pattern_halo():
    # max_pattern_len larger than one packed word and near halo size
    pat = bytes(range(65, 65 + 50))
    hay = b"z" * 3000 + pat + b"z" * 1000 + pat
    check([pat], hay)


def test_chunked_extraction(monkeypatch):
    """Exercise the >MAX_EXTRACT_CHUNK splitting path, including matches
    straddling chunk boundaries."""
    import ahocorasick_tpu.ops.bitap as M

    monkeypatch.setattr(M, "MAX_EXTRACT_CHUNK", 1 << 14)
    pats = [b"needle", b"edl"]
    hay = bytearray(np.random.default_rng(3).integers(
        97, 123, size=40000, dtype=np.uint8).tobytes())
    for p in [100, 8190, 8195, 16383, 30000, 39990]:
        hay[p:p + 6] = b"needle"
    hay = bytes(hay)
    check(pats, hay)


def test_randomized_vs_naive():
    rng = np.random.default_rng(42)
    for trial in range(8):
        npat = int(rng.integers(1, 10))
        pats = []
        for _ in range(npat):
            ln = int(rng.integers(1, 12))
            pats.append(bytes(rng.choice(
                [97, 98, 99, 65, 66], size=ln
            ).astype(np.uint8)))
        n = int(rng.integers(1, 6000))
        hay = bytes(rng.choice(
            [97, 98, 99, 65, 66, 32], size=n
        ).astype(np.uint8))
        ci = bool(rng.integers(2))
        check(pats, hay, ci)


def test_baked_variant(monkeypatch):
    """The constant-baked kernel (used for large haystacks) must agree
    with the generic kernel and the naive oracle."""
    import ahocorasick_tpu.ops.bitap as M

    monkeypatch.setattr(M, "BAKED_MIN", 0)
    rng = np.random.default_rng(11)
    pats = [b"abra", b"cadabra", b"bra", b"Abc"]
    hay = bytes(rng.choice(
        [97, 98, 99, 100, 114, 65], size=9000
    ).astype(np.uint8))
    eng = BitapEngine(pats, False)
    assert eng.tables.pad_byte is not None
    assert eng._use_baked(len(hay))
    check(pats, hay)
    check(pats, hay, ci=False)
    # case-insensitive baked
    check([b"aBRa", b"CAD"], hay, ci=True)


def test_prepare_baked_override():
    """prepare(baked=True) opts a small pinned haystack into the
    constant-baked kernel; results must match the generic path."""
    rng = np.random.default_rng(12)
    pats = [b"abra", b"cadabra", b"bra"]
    hay = bytes(rng.choice(
        [97, 98, 99, 100, 114], size=3000
    ).astype(np.uint8))
    eng = BitapEngine(pats, False)
    assert not eng._use_baked(len(hay))  # below BAKED_MIN
    ph_gen = eng.prepare(hay)
    ph_baked = eng.prepare(hay, baked=True)
    assert not ph_gen.baked and ph_baked.baked
    assert eng.count_matches(ph_baked) == eng.count_matches(ph_gen)
    gp, ge = eng.match_pairs(ph_gen)
    bp, be = eng.match_pairs(ph_baked)
    np.testing.assert_array_equal(gp, bp)
    np.testing.assert_array_equal(ge, be)


def test_pad_byte_detection():
    t = BitapTables([b"abc"], False)
    assert t.pad_byte == 0
    # pattern containing \x00 pushes the pad byte elsewhere
    t = BitapTables([b"\x00abc"], False)
    assert t.pad_byte is not None and t.pad_byte != 0
    cm_lo = t.lo.view(np.uint32)
    cm_hi = t.hi.view(np.uint32)
    b = t.pad_byte
    assert not (cm_lo[:, b & 15] & cm_hi[:, b >> 4]).any()


def test_eligibility():
    from ahocorasick_tpu.ops.bitap import MAX_LIMBS, MAX_PATTERN_LEN

    limit = 32 * MAX_LIMBS
    assert not BitapEngine.eligible([])
    assert not BitapEngine.eligible([b""])
    assert not BitapEngine.eligible([b"a" * (MAX_PATTERN_LEN + 1)])
    assert not BitapEngine.eligible([b"ab"] * (limit // 2 + 1))
    assert BitapEngine.eligible([b"ab"] * (limit // 2))
    assert BitapEngine.eligible([b"x"])


def test_tables_factorization_exact():
    """lo/hi nybble product must reconstruct the charmask exactly."""
    rng = np.random.default_rng(0)
    for ci in (False, True):
        pats = [bytes(rng.integers(0, 256, size=7).astype(np.uint8))
                for _ in range(4)]
        t = BitapTables(pats, ci)
        # rebuild reference charmask
        cm = np.zeros((256, t.k), np.uint32)
        off = 0
        for p in pats:
            for i, ch in enumerate(p):
                g = off + i
                vs = {ch}
                if ci and 0x61 <= (ch | 0x20) <= 0x7A:
                    vs = {ch | 0x20, ch & ~0x20}
                for v in vs:
                    cm[v, g // 32] |= np.uint32(1 << (g % 32))
            off += len(p)
        lo = t.lo.view(np.uint32)
        hi = t.hi.view(np.uint32)
        for b in range(256):
            got = lo[:, b & 15] & hi[:, b >> 4]
            assert (got == cm[b]).all(), (b, got, cm[b])


def test_layout_search_properties():
    """Layout invariants: coverage, bounded padding waste, pow2 L, and
    unchanged large-scan packing (the 64 MiB headline must stay at
    L=2048 x 32 tiles)."""
    from ahocorasick_tpu.ops.bitap import (
        LANES, _layout_search, _round_tiles,
    )

    for need in list(range(1, 70)) + [100, 1000, 12345]:
        t = _round_tiles(need)
        assert t >= need
        assert (t - need) / need <= 1 / 8 or need <= 8
    for n in (1 << 17, 594915, 899232, 1 << 20, 1570556, 1 << 22,
              1 << 26, (1 << 26) + 5):
        for H in (8, 64, 256):
            L, tiles = _layout_search(n, H)
            assert L & (L - 1) == 0 and L >= max(128, H)
            assert tiles * LANES * L >= n  # coverage
            # padding + halo waste bounded: never worse than the old
            # pure-pow2 packing at L=2048
            old = 2048 * max(
                1, 1 << (max(-(-n // (LANES * 2048)) - 1, 0).bit_length())
            ) * LANES
            assert tiles * LANES * (L + H) <= old + old // 2
    L, tiles = _layout_search(1 << 26, 8)
    assert (L, tiles) == (2048, 32)
