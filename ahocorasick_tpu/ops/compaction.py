"""Device-side sparse compaction via succinct rank/select.

jnp.nonzero lowers catastrophically on TPU (~10 ns/element scanned —
18.9 ms for a 2M-word array); these helpers replace it with per-block
sums + one cumsum + a vectorized binary search per selected rank + short
unrolled in-block scans (~2 ms for the same array, and the cost scales
with selected count, not scan size, past the cumsum).

Both helpers require the scanned array length to be a multiple of
BLOCK (the engine layouts guarantee it).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

BLOCK = 128  # words per rank-select block


def _search_blocks(bcum, q):
    """Smallest block index b with bcum[b] >= q, vectorized binary
    search (log2(nb) gather rounds)."""
    nb = bcum.shape[0]
    lo = jnp.zeros(q.shape[0], jnp.int32)
    hi = jnp.full(q.shape[0], nb - 1, jnp.int32)
    for _ in range(max(nb - 1, 1).bit_length()):
        mid = (lo + hi) >> 1
        go_hi = jnp.take(bcum, mid) < q
        lo = jnp.where(go_hi, mid + 1, lo)
        hi = jnp.where(go_hi, hi, mid)
    return lo


def _select_in_block(rows, remaining):
    """Index of the word inside each block holding the remaining-th
    unit, plus the residual rank within that word. `rows` holds
    per-word unit counts [n, BLOCK]."""
    n = rows.shape[0]
    wsel = jnp.zeros(n, jnp.int32)
    resid = remaining
    chosen = jnp.zeros(n, bool)
    for w in range(BLOCK):
        c_w = rows[:, w]
        now = (~chosen) & (remaining < c_w)
        wsel = jnp.where(now, w, wsel)
        resid = jnp.where(now, remaining, resid)
        chosen = chosen | now
        remaining = jnp.where(chosen, remaining, remaining - c_w)
    return wsel, resid


def select_nonzero_words(flat, cap: int):
    """(count, indices[cap], values[cap], live[cap]) of the first `cap`
    nonzero words of `flat` in index order."""
    nz = (flat != 0).astype(jnp.int32)
    counts = nz.reshape(-1, BLOCK)
    bcum = jnp.cumsum(jnp.sum(counts, axis=1))
    total = bcum[-1]
    q = jnp.arange(1, cap + 1, dtype=jnp.int32)
    blk = _search_blocks(bcum, q)
    prev = jnp.where(blk > 0, jnp.take(bcum, jnp.maximum(blk - 1, 0)), 0)
    rows = jnp.take(counts, blk, axis=0)
    wsel, _ = _select_in_block(rows, q - prev - 1)
    widx = blk * BLOCK + wsel
    vals = jnp.take(flat, widx)
    return total, widx, vals, q <= total


def select_set_bits(flat, cap: int):
    """(count, word_index[cap], bit_index[cap], live[cap]) of the first
    `cap` set bits across the int32 words of `flat`, in (word, bit)
    order."""
    cnt = lax.population_count(flat)
    counts = cnt.reshape(-1, BLOCK)
    bcum = jnp.cumsum(jnp.sum(counts, axis=1))
    total = bcum[-1]
    q = jnp.arange(1, cap + 1, dtype=jnp.int32)
    blk = _search_blocks(bcum, q)
    prev = jnp.where(blk > 0, jnp.take(bcum, jnp.maximum(blk - 1, 0)), 0)
    rows = jnp.take(counts, blk, axis=0)
    wsel, resid = _select_in_block(rows, q - prev - 1)
    widx = blk * BLOCK + wsel
    word = jnp.take(flat, widx)
    bitpos = jnp.zeros(cap, jnp.int32)
    rcnt = resid
    for b in range(32):
        is_set = (word >> b) & 1
        takeit = (is_set == 1) & (rcnt == 0)
        bitpos = jnp.where(takeit, b, bitpos)
        rcnt = rcnt - is_set
    return total, widx, bitpos, q <= total
