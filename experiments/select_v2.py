"""A/B: current select_set_bits (binary-search rank/select) vs a
compare-sum hierarchical select (2 row gathers + vector compare-sums,
no per-query binary search) at the dict1k shape: M=2M words, cap=64K.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ahocorasick_tpu.ops.compaction import select_set_bits


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def select_set_bits_v2(flat, cap: int):
    """(count, word_index[cap], bit_index[cap], live[cap]) of the first
    `cap` set bits, via 128-way hierarchical compare-sum select."""
    M = flat.shape[0]
    nb = -(-M // 128)
    padw = nb * 128 - M
    if padw:
        flat = jnp.concatenate([flat, jnp.zeros(padw, flat.dtype)])
    pc = lax.population_count(flat)
    bsum = jnp.sum(pc.reshape(nb, 128), axis=1)          # [nb]
    NSB = -(-nb // 128)
    padb = NSB * 128 - nb
    bsum_p = (jnp.concatenate([bsum, jnp.zeros(padb, jnp.int32)])
              if padb else bsum)
    bsr = bsum_p.reshape(NSB, 128)                        # [NSB,128]
    sbsum = jnp.sum(bsr, axis=1)                          # [NSB]
    sbcum = jnp.cumsum(sbsum)                             # inclusive
    total = sbcum[-1]
    q = jnp.arange(1, cap + 1, dtype=jnp.int32)           # [cap] ranks
    cols = jnp.arange(128, dtype=jnp.int32)

    # Level 0: superblock by compare-sum over the (small) sbcum table.
    sb = jnp.sum((sbcum[None, :] < q[:, None]).astype(jnp.int32), axis=1)
    sb = jnp.minimum(sb, NSB - 1)
    r1 = q - jnp.take(sbcum - sbsum, sb)                  # 1-based in sb

    # Level 1: block within superblock. Row gather + on-the-fly cumsum.
    g1 = jnp.take(bsr, sb, axis=0)                        # [cap,128]
    c1 = jnp.cumsum(g1, axis=1)                           # inclusive
    bi = jnp.sum((c1 < r1[:, None]).astype(jnp.int32), axis=1)
    bi = jnp.minimum(bi, 127)
    excl1 = jnp.sum(
        jnp.where(cols[None, :] == (bi - 1)[:, None], c1, 0), axis=1
    )
    r2 = r1 - excl1                                       # 1-based in blk
    blk = jnp.minimum(sb * 128 + bi, nb - 1)

    # Level 2: word within block; the gathered row also yields the value.
    g3 = jnp.take(flat.reshape(nb, 128), blk, axis=0)     # [cap,128]
    c3 = jnp.cumsum(lax.population_count(g3), axis=1)
    wi = jnp.sum((c3 < r2[:, None]).astype(jnp.int32), axis=1)
    wi = jnp.minimum(wi, 127)
    excl2 = jnp.sum(
        jnp.where(cols[None, :] == (wi - 1)[:, None], c3, 0), axis=1
    )
    resid = r2 - excl2 - 1                                # 0-based in word
    word = jnp.sum(
        jnp.where(cols[None, :] == wi[:, None], g3, 0), axis=1
    )
    widx = blk * 128 + wi

    bitpos = jnp.zeros(cap, jnp.int32)
    rcnt = resid
    for b in range(32):
        is_set = (word >> b) & 1
        takeit = (is_set == 1) & (rcnt == 0)
        bitpos = jnp.where(takeit, b, bitpos)
        rcnt = rcnt - is_set
    return total, widx, bitpos, q <= total


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
    M = 1 << 21
    CAP = 1 << 16
    rng = np.random.default_rng(0)
    # ~40k set bits spread over 2M words, some words multi-bit.
    nset = 40000
    w = rng.choice(M, nset // 2, replace=False)
    base = np.zeros(M, np.uint32)
    for _ in range(2):
        bits = rng.integers(0, 32, len(w))
        base[w] |= np.uint32(1) << bits.astype(np.uint32)
    flat0 = jnp.asarray(base.view(np.int32))

    # correctness
    t1, w1, b1, l1 = jax.jit(select_set_bits, static_argnums=1)(flat0, CAP)
    t2, w2, b2, l2 = jax.jit(select_set_bits_v2, static_argnums=1)(
        flat0, CAP)
    n1 = int(t1)
    assert int(t2) == n1, (int(t2), n1)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    k = min(n1, CAP)
    np.testing.assert_array_equal(np.asarray(w1)[:k], np.asarray(w2)[:k])
    np.testing.assert_array_equal(np.asarray(b1)[:k], np.asarray(b2)[:k])
    log(f"correct: {n1} set bits match")

    for name, fn in (("old", select_set_bits), ("v2", select_set_bits_v2)):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(reps, fn=fn):
            acc = jnp.int32(0)
            f = flat0
            for _ in range(reps):
                t, w, b, l = fn(f, CAP)
                acc = acc + t + jnp.sum(w) + jnp.sum(b)
                f, acc = jax.lax.optimization_barrier((f, acc))
            return acc

        per = slope(lambda r, c=chained: c(reps=r))
        log(f"{name}: {per*1e3:.3f} ms per select")


if __name__ == "__main__":
    main()
