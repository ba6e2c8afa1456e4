"""Compaction alternatives for sparse-nonzero extraction on TPU.

nonzero(size=k) over 2M words measured ~19 ms inside the fp pipeline.
Candidates: cumsum + vectorized binary search (select), top_k, sort,
scatter. Inputs rotated per iteration to defeat CSE.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(chained, r_lo=2, r_hi=8, iters=4):
    jax.block_until_ready(chained(r_lo))
    def t_at(reps):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(reps))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t_at(r_hi) - t_at(r_lo)) / (r_hi - r_lo)


def main():
    M = 1 << 21   # 2M words (64 MiB haystack bitmap)
    CAP = 16384
    rng = np.random.default_rng(0)
    base = (rng.random(M) < (12000 / M)).astype(np.int32)
    base = base * rng.integers(1, 1 << 30, M).astype(np.int32)
    flat0 = jnp.asarray(base)

    def mk(body):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(reps):
            acc = jnp.int32(0)
            for i in range(reps):
                acc = acc + body(jnp.int32(i) + (acc & 1))
                acc = lax.optimization_barrier(acc)
            return acc
        return chained

    def rotated(i):
        # Cheap per-iteration variation: roll by a data-dependent scalar.
        return jnp.roll(flat0, i)

    tests = []
    tests.append(("nonzero(size)", mk(lambda i: jnp.nonzero(
        rotated(i) != 0, size=CAP, fill_value=M)[0][0].astype(jnp.int32))))
    tests.append(("cumsum2M", mk(lambda i: jnp.cumsum(
        (rotated(i) != 0).astype(jnp.int32))[-1])))
    tests.append(("topk", mk(lambda i: lax.top_k(
        jnp.where(rotated(i) != 0,
                  jnp.arange(M, 0, -1, dtype=jnp.int32), 0),
        CAP)[0][0])))
    tests.append(("sort2M", mk(lambda i: jnp.sort(rotated(i))[0])))

    def select_cumsum(i):
        flat = rotated(i)
        nz = (flat != 0).astype(jnp.int32)
        cum = jnp.cumsum(nz)
        # Vectorized binary search for the q-th nonzero, q in [1, CAP].
        q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
        lo = jnp.zeros(CAP, jnp.int32)
        hi = jnp.full(CAP, M - 1, jnp.int32)
        for _ in range(21):
            mid = (lo + hi) >> 1
            v = jnp.take(cum, mid)
            go_hi = v < q
            lo = jnp.where(go_hi, mid + 1, lo)
            hi = jnp.where(go_hi, mid, hi)
        vals = jnp.take(flat, lo)
        return lo[0] + vals[0]
    tests.append(("cumsum+binsearch", mk(select_cumsum)))

    # Two-level: pack word-flags 32x, cumsum 64k, search, bit-rank.
    def packed_select(i):
        flat = rotated(i)
        nz = (flat != 0).astype(jnp.int32).reshape(-1, 32)
        packed = jnp.sum(
            nz << jnp.arange(32, dtype=jnp.int32)[None, :], axis=1
        )  # [M/32]
        cnt = lax.population_count(packed)
        cum = jnp.cumsum(cnt)
        q = jnp.arange(1, CAP + 1, dtype=jnp.int32)
        lo = jnp.zeros(CAP, jnp.int32)
        hi = jnp.full(CAP, M // 32 - 1, jnp.int32)
        for _ in range(16):
            mid = (lo + hi) >> 1
            v = jnp.take(cum, mid)
            go_hi = v < q
            lo = jnp.where(go_hi, mid + 1, lo)
            hi = jnp.where(go_hi, mid, hi)
        blk = lo
        w = jnp.take(packed, blk)
        prev = jnp.where(blk > 0, jnp.take(cum, blk - 1), 0)
        rank = q - prev - 1  # rank of the wanted bit within the block
        # Select the rank-th set bit of w (32-step loop, vector ops).
        bitpos = jnp.zeros(CAP, jnp.int32)
        rcnt = rank
        for b in range(32):
            is_set = (w >> b) & 1
            takeit = (is_set == 1) & (rcnt == 0)
            bitpos = jnp.where(takeit, b, bitpos)
            rcnt = rcnt - is_set
        idx = blk * 32 + bitpos
        vals = jnp.take(flat, idx)
        return idx[0] + vals[0]
    tests.append(("packed-rank-select", mk(packed_select)))

    for name, fn in tests:
        per = slope(fn)
        log(f"{name:20s} {per*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
