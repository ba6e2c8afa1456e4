"""Budget measurements for the cascade (very-large-dictionary) engine.

Measures, with chained slope timing on the real TPU:
  1. fp bitmap kernel cost at K = 8/12/16/24 limbs over 64 MiB
  2. select_set_bits cost at cap = 64k/256k/1M over the same bitmap
  3. jnp.take probe throughput at 256k/1M indices into small tables
  4. dense rolling-key (H4 int32) computation over 64 MiB
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, r_lo=4, r_hi=12, iters=3):
    def t_at(reps):
        fn(reps)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(reps)
            best = min(best, time.perf_counter() - t0)
        return best

    return (t_at(r_hi) - t_at(r_lo)) / (r_hi - r_lo)


def bench_kernel_k():
    from ahocorasick_tpu.ops import fingerprint as F
    from ahocorasick_tpu.ops.bitap import _to_stream_major, LANES

    n = 1 << 26
    rng = np.random.default_rng(0)
    hs = rng.integers(97, 118, n, dtype=np.uint8).tobytes()
    # Synthetic pattern sets tuned to hit target K values.
    for npat, label in ((12, "K~8"), (48, "K~16"), (96, "K~32")):
        pats = []
        for i in range(npat):
            w = bytes(rng.integers(97, 118, 8, dtype=np.uint8))
            pats.append(w)
        eng = F.FingerprintEngine(pats, False)
        t = eng.tables
        ph = eng.prepare(hs)
        K = t.k
        fn = F._fp_baked_jit(t.baked_key(), K, ph.L, ph.Lc, eng.halo,
                             ph.tiles)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(halo, body, reps):
            acc = jnp.int32(0)
            for _ in range(reps):
                nc, e, l = fn(halo, body, cap=4096)
                acc = acc + nc
                body, acc = jax.lax.optimization_barrier((body, acc))
            return acc

        def run(reps):
            int(chained(ph.halo_a, ph.body, reps))

        per = slope(run)
        log(f"kernel {label} actualK={K}: {per*1e3:.2f} ms/scan "
            f"({n/per/1e9:.1f} GB/s)")


def bench_select():
    from ahocorasick_tpu.ops.compaction import select_set_bits

    nwords = (1 << 26) // 32  # bitmap for 64 MiB
    rng = np.random.default_rng(1)
    # ~1% of positions set
    words = rng.integers(0, 1 << 32, nwords, dtype=np.uint64)
    mask = rng.random(nwords) < 0.3
    arr = np.where(mask, words & (words >> 1) & (words >> 7) & 0x01010101,
                   0).astype(np.uint32).view(np.int32)
    flat = jnp.asarray(arr)
    total = int(jax.jit(lambda f: jnp.sum(jax.lax.population_count(f)))(flat))
    log(f"select input: {nwords} words, {total} set bits")
    for cap in (1 << 16, 1 << 18, 1 << 20):
        f = jax.jit(functools.partial(select_set_bits, cap=cap))

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(flat, reps):
            acc = jnp.int32(0)
            for _ in range(reps):
                t, w, b, l = f(flat)
                acc = acc + t + w[0]
                flat, acc = jax.lax.optimization_barrier((flat, acc))
            return acc

        def run(reps):
            int(chained(flat, reps))

        per = slope(run)
        log(f"select cap={cap}: {per*1e3:.2f} ms")


def bench_take():
    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.integers(0, 1 << 31, 1 << 18, dtype=np.int32))
    big = jnp.asarray(
        rng.integers(0, 1 << 31, 1 << 26, dtype=np.int32)
    )  # dense H-like array
    for ncand in (1 << 18, 1 << 20):
        idx = jnp.asarray(
            rng.integers(0, 1 << 26, ncand, dtype=np.int32)
        )

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(idx, reps):
            acc = jnp.int32(0)
            for _ in range(reps):
                h = jnp.take(big, idx)          # H gather (big table)
                s1 = (h.astype(jnp.uint32) * jnp.uint32(2654435761)
                      >> jnp.uint32(14)).astype(jnp.int32)
                v1 = jnp.take(tab, s1)          # cuckoo probe 1
                s2 = (h.astype(jnp.uint32) * jnp.uint32(40503)
                      >> jnp.uint32(14)).astype(jnp.int32)
                v2 = jnp.take(tab, s2)          # cuckoo probe 2
                acc = acc + v1[0] + v2[0]
                idx, acc = jax.lax.optimization_barrier((idx, acc))
            return acc

        def run(reps):
            int(chained(idx, reps))

        per = slope(run)
        log(f"3x take ncand={ncand}: {per*1e3:.2f} ms "
            f"({per/ncand*1e9:.2f} ns/cand)")


def bench_h4():
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.integers(0, 256, 1 << 26, dtype=np.uint8))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(b, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            x = b.astype(jnp.int32)
            h4 = (
                jnp.roll(x, 3) << 24 | jnp.roll(x, 2) << 16
                | jnp.roll(x, 1) << 8 | x
            )
            h8 = h4
            for s in range(4, 8):
                h8 = h8 * 31 + jnp.roll(x, s)
            acc = acc + h4[0] + h8[0]
            b, acc = jax.lax.optimization_barrier((b, acc))
        return acc

    def run(reps):
        int(chained(b, reps))

    per = slope(run)
    log(f"H4+H8 dense 64MiB: {per*1e3:.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1:] or ["kernel", "select", "take", "h4"]
    if "kernel" in which:
        bench_kernel_k()
    if "select" in which:
        bench_select()
    if "take" in which:
        bench_take()
    if "h4" in which:
        bench_h4()
