"""Device-side sparse compaction via succinct rank/select.

jnp.nonzero lowers catastrophically on TPU (~10 ns/element scanned —
18.9 ms for a 2M-word array); these helpers replace it with per-block
sums + one cumsum + a two-level rank search + a cumsum-based in-block
select.

The first implementation used a per-rank binary search (log2(nb) gather
rounds over the block cumsums) and a 128-iteration unrolled scan inside
each block; stage profiling on the dict1k pipeline (experiments/
fp_profile.py) measured that at 11.8 ms for a 2M-word bitmap at
cap=65536 — the selected-rank machinery, not the bitmap pass, was the
cost. This version replaces both:

  - the binary search becomes a TWO-LEVEL search: one broadcast compare
    against the ~sqrt(nb) superblock cumsums picks the superblock, one
    row gather + broadcast compare picks the block within it — two
    [cap, 128] compares and one [cap, 128] row gather instead of
    log2(nb) dependent element-gather rounds;
  - the in-block word select becomes one row cumsum + one broadcast
    compare + one take_along_axis instead of a BLOCK-step unrolled loop
    (which re-read the gathered [cap, BLOCK] rows once per step).

Both helpers require the scanned array length to be a multiple of
BLOCK (the engine layouts guarantee it).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

BLOCK = 128  # words per rank-select block


def _two_level_search(bcum, q):
    """Smallest block index b with bcum[b] >= q (bcum is the inclusive
    per-block cumsum), vectorized: superblock pick by broadcast compare,
    block pick by one row gather + broadcast compare."""
    nb = bcum.shape[0]
    if nb <= BLOCK:
        # Small bitmaps (<= 512 KiB of haystack): one broadcast compare
        # against the whole block cumsum — no superblock row gather.
        b_in = jnp.sum((bcum[None, :] < q[:, None]).astype(jnp.int32),
                       axis=1)
        return jnp.minimum(b_in, nb - 1)
    s2 = min(BLOCK, nb)
    s1 = -(-nb // s2)
    pad = s1 * s2 - nb
    if pad:
        bcum = jnp.concatenate(
            [bcum, jnp.broadcast_to(bcum[-1], (pad,))]
        )
    b2 = bcum.reshape(s1, s2)
    sup = b2[:, -1]  # cumsum at each superblock's end
    s_idx = jnp.sum((sup[None, :] < q[:, None]).astype(jnp.int32), axis=1)
    s_idx = jnp.minimum(s_idx, s1 - 1)
    inner = jnp.take(b2, s_idx, axis=0)  # [cap, s2]
    b_in = jnp.sum((inner < q[:, None]).astype(jnp.int32), axis=1)
    b_in = jnp.minimum(b_in, s2 - 1)
    return jnp.minimum(s_idx * s2 + b_in, nb - 1)


def _select_in_block(rcs, remaining):
    """Index of the word inside each block holding the (0-based)
    remaining-th unit, plus the residual rank within that word. `rcs`
    holds per-block inclusive word-count cumsums [n, BLOCK] (computed
    once over all blocks, not per selected rank)."""
    wsel = jnp.sum((rcs <= remaining[:, None]).astype(jnp.int32), axis=1)
    wsel = jnp.minimum(wsel, rcs.shape[1] - 1)
    prevw = jnp.take_along_axis(
        rcs, jnp.maximum(wsel - 1, 0)[:, None], axis=1
    )[:, 0]
    prevw = jnp.where(wsel > 0, prevw, 0)
    return wsel, remaining - prevw


def _select_units(counts, cap: int):
    """Shared rank/select over per-word unit counts [nb, BLOCK].

    Returns (total, widx[cap], live[cap], resid[cap]) — the word index
    holding each selected unit and the unit's 0-based rank within it.
    """
    # One in-block cumsum over ALL blocks ([nb, BLOCK], a single vector
    # pass) so the per-rank path gathers ready-made cumsum rows instead
    # of cumsumming its [cap, BLOCK] gather.
    rcs_all = jnp.cumsum(counts, axis=1)
    bcum = jnp.cumsum(rcs_all[:, -1])
    total = bcum[-1]
    q = jnp.arange(1, cap + 1, dtype=jnp.int32)
    blk = _two_level_search(bcum, q)
    prev = jnp.where(blk > 0, jnp.take(bcum, jnp.maximum(blk - 1, 0)), 0)
    rows = jnp.take(rcs_all, blk, axis=0)
    wsel, resid = _select_in_block(rows, q - prev - 1)
    widx = blk * BLOCK + wsel
    return total, widx, q <= total, resid


def select_nonzero_words(flat, cap: int):
    """(count, indices[cap], values[cap], live[cap]) of the first `cap`
    nonzero words of `flat` in index order."""
    nz = (flat != 0).astype(jnp.int32)
    counts = nz.reshape(-1, BLOCK)
    total, widx, live, _ = _select_units(counts, cap)
    vals = jnp.take(flat, widx)
    return total, widx, vals, live


def select_set_bits(flat, cap: int):
    """(count, word_index[cap], bit_index[cap], live[cap]) of the first
    `cap` set bits across the int32 words of `flat`, in (word, bit)
    order."""
    cnt = lax.population_count(flat)
    counts = cnt.reshape(-1, BLOCK)
    total, widx, live, resid = _select_units(counts, cap)
    word = jnp.take(flat, widx)
    # Select the resid-th set bit by binary halving (5 popcount steps)
    # instead of the former 32-step scan: the scan's 96 sequential
    # vector ops were a visible slice of the ~29 ns/slot select cost
    # at small caps (experiments/fp_floor.py).
    w = word
    r = resid
    pos = jnp.zeros(cap, jnp.int32)
    for width in (16, 8, 4, 2, 1):
        mask = jnp.int32((1 << width) - 1)
        low = w & mask
        c = lax.population_count(low)
        go_hi = r >= c
        r = jnp.where(go_hi, r - c, r)
        w = jnp.where(go_hi, lax.shift_right_logical(w, width), low)
        pos = pos + jnp.where(go_hi, width, 0)
    return total, widx, pos, live
