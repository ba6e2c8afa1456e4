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
