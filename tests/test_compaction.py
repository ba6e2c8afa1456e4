"""Rank/select compaction parity vs brute-force enumeration.

The compaction helpers back every device extraction path (bitap extract,
fingerprint candidates, staged stream gather); this harness checks them
against a host enumeration across densities, sizes, and caps — including
empty, all-set, and cap-overflow shapes.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ahocorasick_tpu.ops.compaction import (  # noqa: E402
    select_nonzero_words,
    select_set_bits,
)


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    words = np.zeros(len(bits) // 32, np.uint32)
    for b in range(32):
        words |= bits[b::32].astype(np.uint32) << b
    return words


@pytest.mark.parametrize("seed", range(6))
def test_select_set_bits_random(seed):
    rng = np.random.default_rng(seed)
    for _ in range(5):
        n = int(rng.choice([128, 256, 4096, 1 << 15]))
        dens = float(rng.choice([0.0, 0.001, 0.02, 0.5, 1.0]))
        bits = (rng.random(n * 32) < dens).astype(np.uint32)
        words = _pack_bits(bits)
        flat = jnp.asarray(words.view(np.int32))
        cap = int(rng.choice([64, 128, 1000, 4096]))
        total, widx, bitpos, live = select_set_bits(flat, cap)
        exp = [(w, b) for w in range(n) for b in range(32)
               if (int(words[w]) >> b) & 1]
        assert int(total) == len(exp)
        k = min(cap, len(exp))
        got = list(zip(np.asarray(widx)[:k].tolist(),
                       np.asarray(bitpos)[:k].tolist()))
        assert got == exp[:k]
        lv = np.asarray(live)
        assert lv[:k].all() and not lv[k:].any()


@pytest.mark.parametrize("seed", range(4))
def test_select_nonzero_words_random(seed):
    rng = np.random.default_rng(100 + seed)
    for _ in range(5):
        n = int(rng.choice([128, 1024, 1 << 14]))
        dens = float(rng.choice([0.0, 0.01, 0.3]))
        words = np.where(rng.random(n) < dens,
                         rng.integers(1, 1 << 31, n), 0).astype(np.int32)
        flat = jnp.asarray(words)
        cap = int(rng.choice([64, 512, 4096]))
        total, widx, vals, live = select_nonzero_words(flat, cap)
        nz = np.flatnonzero(words)
        assert int(total) == len(nz)
        k = min(cap, len(nz))
        assert np.asarray(widx)[:k].tolist() == nz[:k].tolist()
        assert (np.asarray(vals)[:k] == words[nz[:k]]).all()
        lv = np.asarray(live)
        assert lv[:k].all() and not lv[k:].any()


def test_select_single_block_edge():
    # nb == 1 (smaller than one superblock row): the two-level search
    # degenerates to a single block.
    words = np.zeros(128, np.int32)
    words[3] = 0b1010
    total, widx, bitpos, live = select_set_bits(jnp.asarray(words), 8)
    assert int(total) == 2
    assert np.asarray(widx)[:2].tolist() == [3, 3]
    assert np.asarray(bitpos)[:2].tolist() == [1, 3]
