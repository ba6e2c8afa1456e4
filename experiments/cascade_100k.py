"""Cascade engine at the reference's signature 100k-dictionary scale.

Measures, on the real TPU, count and extraction throughput of the
cascade engine (ops/cascade.py) on a 100k-entry name dictionary over a
64 MiB prose haystack — the workload class the reference documents as
its signature build example (src/ahocorasick.rs:46-55) and runs on its
bare automaton at ~0.8 GB/s (dfa.rs:218-226).

Parity is asserted against the native C++ DFA walk (count on the full
haystack; (pid, end) triples on a slice).

Usage: python experiments/cascade_100k.py [npats] [logn]
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

from bench import build_words, build_dict_text, NAME_SYLLABLES


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

    t_lo, t_hi = t_at(r_lo), t_at(r_hi)
    per = (t_hi - t_lo) / (r_hi - r_lo)
    log(f"  t({r_lo})={t_lo*1e3:.1f} ms t({r_hi})={t_hi*1e3:.1f} ms "
        f"-> per-scan {per*1e3:.3f} ms")
    return per


def main():
    npats = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    logn = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    n = 1 << logn

    t0 = time.perf_counter()
    pats = build_words(npats, 99, NAME_SYLLABLES, capitalize=0.3)
    log(f"dict: {len(pats)} patterns, lens "
        f"{min(map(len, pats))}..{max(map(len, pats))} "
        f"({time.perf_counter()-t0:.1f}s to generate)")
    hs = build_dict_text(n, pats)
    log(f"haystack: {len(hs)} bytes")

    from ahocorasick_tpu.ops.cascade import CascadeEngine, _cascade_jit
    from ahocorasick_tpu import AhoCorasick

    t0 = time.perf_counter()
    eng = CascadeEngine(pats, True)
    log(f"cascade build: {time.perf_counter()-t0:.2f}s, "
        f"level={eng.level} K={eng.tables.coarse.k} "
        f"prefixes={eng.tables.num_prefixes} W={eng.tables.W} "
        f"mem={eng.memory_usage()/1e6:.1f} MB")

    t0 = time.perf_counter()
    ac = AhoCorasick(pats, ascii_case_insensitive=True,
                     device_threshold=1 << 62)
    want = ac.count_matches(hs)
    log(f"native count = {want} ({time.perf_counter()-t0:.1f}s incl. "
        f"DFA build)")

    t0 = time.perf_counter()
    ph = eng.prepare(hs)
    log(f"prepare: {time.perf_counter()-t0:.2f}s baked={ph.baked}")

    t0 = time.perf_counter()
    got = eng.count_matches(ph)
    assert got == want, (got, want)
    cap_c, cap_e, _ = eng.last_caps
    log(f"count parity OK ({time.perf_counter()-t0:.1f}s first run) "
        f"caps: c={cap_c} e={cap_e}")

    # --- count throughput (settled caps, one dispatch) ---
    t = eng.tables
    dv = t.device_args()
    fn = _cascade_jit(t.coarse.baked_key(), t.meta_key(), t.coarse.k,
                      ph.L, ph.Lc, eng.halo, ph.tiles, False)
    n_dev = jnp.int32(ph.n)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained_count(halo, body, u8f, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            _nc, _ne, total = fn(halo, body, u8f, n_dev, dv,
                                 cap_c=cap_c, cap_e=cap_e)
            acc = acc + total
            body, acc = jax.lax.optimization_barrier((body, acc))
        return acc

    def run_count(reps):
        out = int(chained_count(ph.halo_a, ph.body, ph.u8f, reps))
        assert out == want * reps, (out, want * reps)

    log("count slope:")
    per = slope(run_count)
    log(f"dict{npats//1000}k count: {n/per/1e9:.2f} GB/s")

    # --- extraction throughput ---
    t0 = time.perf_counter()
    gp, ge = eng.match_pairs(ph)
    assert len(gp) == want
    _, _, cap_m = eng.last_caps
    log(f"extract first run {time.perf_counter()-t0:.1f}s cap_m={cap_m}")
    fne = _cascade_jit(t.coarse.baked_key(), t.meta_key(), t.coarse.k,
                       ph.L, ph.Lc, eng.halo, ph.tiles, True)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained_ext(halo, body, u8f, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            _nc, _ne, total, opid, oend = fne(
                halo, body, u8f, n_dev, dv,
                cap_c=cap_c, cap_e=cap_e, cap_m=cap_m)
            acc = acc + total + opid[0] + oend[-1].astype(jnp.int32)
            body, acc = jax.lax.optimization_barrier((body, acc))
        return acc

    def run_ext(reps):
        int(chained_ext(ph.halo_a, ph.body, ph.u8f, reps))

    log("extract slope:")
    per_e = slope(run_ext)
    log(f"dict{npats//1000}k extract: {n/per_e/1e9:.2f} GB/s")

    # --- triple parity on a slice against the native walk ---
    slice_n = min(n, 1 << 22)
    hs_s = hs[:slice_n]
    gp_s, ge_s = eng.match_pairs(hs_s)
    import ahocorasick_tpu.automata.native as native
    pos, sid = native.dfa_positions(ac._dfa, hs_s)
    # expand native (end,state) to (pid,end) pairs via DFA match CSR
    dfa = ac._dfa
    cnt = dfa.match_count[sid]
    we = np.repeat(pos, cnt)
    idx = (np.repeat(dfa.match_starts[sid], cnt)
           + (np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)))
    wp = dfa.match_pids[idx].astype(np.int64)
    order = np.lexsort((eng.pid_rank[wp], we))
    wp, we = wp[order], we[order]
    np.testing.assert_array_equal(ge_s, we)
    np.testing.assert_array_equal(gp_s, wp)
    log(f"extraction triple parity OK on {slice_n} bytes "
        f"({len(gp_s)} matches)")


if __name__ == "__main__":
    main()
