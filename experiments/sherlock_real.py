"""Real-corpus benchmark: the reference's sherlock/name-alt1 row.

Patterns ["Sherlock", "Street"], haystack sherlock.txt (594,915 bytes,
count=158) — the exact configuration behind the reference's 51 GB/s
headline (11.67 us median, record/x86_64/2023-09-17.csv). Measures the
bitap engine per-scan marginal time at this (small) input size, with
both the table-generic kernel (what prepare() picks below BAKED_MIN)
and the constant-baked kernel, plus the extraction path.

Also runs name-alt2 ["Sherlock", "Holmes"] (count=558) and the
opensubtitles en-sampled haystack for breadth.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def host_count(patterns, hay):
    total = 0
    for p in patterns:
        start = 0
        while True:
            i = hay.find(p, start)
            if i < 0:
                break
            total += 1
            start = i + 1
    return total


def slope(fn, r_lo=4, r_hi=36, iters=4):
    def t_at(reps):
        fn(reps)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(reps)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = t_at(r_lo), t_at(r_hi)
    per = (t_hi - t_lo) / (r_hi - r_lo)
    log(f"  t({r_lo})={t_lo*1e3:.2f} t({r_hi})={t_hi*1e3:.2f} "
        f"-> {per*1e6:.2f} us/scan")
    return per


def bench_config(name, patterns, hay):
    from ahocorasick_tpu.ops import bitap as B

    want = host_count(patterns, hay)
    n = len(hay)
    log(f"--- {name}: n={n} want={want}")
    eng = B.BitapEngine(patterns, False)
    ph = eng.prepare(hay)
    got = eng.count_matches(ph)
    assert got == want, (got, want)
    log(f"K={eng.tables.k} L={ph.L} Lc={ph.Lc} tiles={ph.tiles} "
        f"baked={ph.baked} halo={eng.halo}")

    # generic kernel (production path at this size)
    lo, hi, sm, em = eng.tables.device_args()
    nn = jnp.asarray([0, n], jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained_gen(halo, body, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            t, _ = B._bitap_call(lo, hi, sm, em, halo, body, nn,
                                 K=eng.tables.k, L=ph.L, Lc=ph.Lc,
                                 H=eng.halo, tiles=ph.tiles,
                                 extract=False)
            acc = acc + t
            body, acc = jax.lax.optimization_barrier((body, acc))
        return acc

    def run_g(reps):
        out = int(chained_gen(ph.halo_a, ph.body, reps))
        assert out == want * reps, (out, want * reps)

    per = slope(run_g)
    log(f"{name} generic count: {per*1e6:.2f} us/scan = "
        f"{n/per/1e9:.2f} GB/s")

    # baked kernel (repeated-search path; requires a pad byte)
    if eng.tables.pad_byte is not None:
        pad = eng.tables.pad_byte
        x32 = jax.device_put(eng._pack(hay, ph.L, ph.tiles, pad=pad))
        halo_b, body_b = B._to_stream_major(x32, ph.L, ph.tiles, eng.halo)
        fnb = B._baked_jit(eng.tables.baked_key(), eng.tables.k, ph.L,
                           ph.Lc, eng.halo, ph.tiles, False)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained_baked(halo, body, reps):
            acc = jnp.int32(0)
            for _ in range(reps):
                acc = acc + fnb(halo, body)
                body, acc = jax.lax.optimization_barrier((body, acc))
            return acc

        def run_b(reps):
            out = int(chained_baked(halo_b, body_b, reps))
            assert out == want * reps, (out, want * reps)

        per_b = slope(run_b)
        log(f"{name} baked count: {per_b*1e6:.2f} us/scan = "
            f"{n/per_b/1e9:.2f} GB/s")

        # baked extraction (fused word compaction)
        fne = B._baked_jit(eng.tables.baked_key(), eng.tables.k, ph.L,
                           ph.Lc, eng.halo, ph.tiles, True)
        cap = 1 << max((want - 1).bit_length(), 10)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained_ext(halo, body, reps):
            acc = jnp.int32(0)
            for _ in range(reps):
                t, nnzw, idx, vals = fne(halo, body, cap=cap)
                acc = acc + t + idx[0] + vals[-1]
                body, acc = jax.lax.optimization_barrier((body, acc))
            return acc

        def run_e(reps):
            int(chained_ext(halo_b, body_b, reps))

        per_e = slope(run_e)
        log(f"{name} baked extract: {per_e*1e6:.2f} us/scan = "
            f"{n/per_e/1e9:.2f} GB/s")

    # full facade find_iter wall (one-shot, includes host decode)
    from ahocorasick_tpu import AhoCorasick, Input

    ac = AhoCorasick(patterns)
    ms = list(ac.find_iter(Input(hay)))
    t0 = time.perf_counter()
    for _ in range(3):
        ms = list(ac.find_iter(Input(hay)))
    t = (time.perf_counter() - t0) / 3
    log(f"{name} facade find_iter wall: {t*1e3:.2f} ms "
        f"({len(ms)} matches)")


def main():
    sher = open("/root/reference/benchmarks/haystacks/sherlock.txt",
                "rb").read()
    subs = open("/root/reference/benchmarks/haystacks/opensubtitles/"
                "en-sampled.txt", "rb").read()
    bench_config("name-alt1", [b"Sherlock", b"Street"], sher)
    bench_config("name-alt2", [b"Sherlock", b"Holmes"], sher)
    bench_config("subs-en", [b"Sherlock Holmes", b"John Watson",
                             b"Irene Adler", b"Inspector Lestrade",
                             b"Professor Moriarty"], subs)


if __name__ == "__main__":
    main()
