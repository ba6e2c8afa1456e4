"""Benchmark suite — the rebar-harness analog (reference benchmarks/).

Suites (mirroring the reference's definitions):
  sherlock   5-name leftmost query over English-like text (the headline)
  patsweep   pattern-count sweep 1..64 (the teddy.toml role)
  same       degenerate all-match haystack (same/onebyte-match)
  build      automaton construction time, python vs native builder
  memory     per-backend table sizes

Device rows use tunnel-free slope timing (chained in-jit kernel
invocations separated by optimization_barrier; see bench.py docstring).
Prints one JSON line per row.

    python benchmarks/run.py [suite ...]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**row):
    print(json.dumps(row), flush=True)


def english_haystack(n, names=(), hit_rate=0.001, seed=1234):
    rng = np.random.default_rng(seed)
    words = (
        "the quick brown fox jumps over lazy dog time of day it was best "
        "worst epoch belief incredulity season light darkness hope despair"
    ).split()
    parts, size = [], 0
    while size < n:
        if names and rng.random() < hit_rate:
            w = names[int(rng.integers(len(names)))]
        else:
            w = words[int(rng.integers(len(words)))].encode()
        parts.append(w)
        size += len(w) + 1
    return b" ".join(parts)[:n]


def device_count_gbps(patterns, hay, r_lo=4, r_hi=16):
    """Slope-timed count-mode throughput for one pattern set."""
    import jax
    import jax.numpy as jnp

    from ahocorasick_tpu.ops import bitap as B

    n = len(hay)
    eng = B.BitapEngine(patterns, False)
    ph = eng.prepare(hay)
    if ph.baked:
        baked = B._baked_jit(eng.tables.baked_key(), eng.tables.k, ph.L,
                             ph.Lc, eng.halo, ph.tiles, False)

        def fn(h, b):
            return baked(h, b)
    else:
        lo, hi, sm, em = eng._args()
        nn = jnp.asarray([0, n], jnp.int32)

        def fn(h, b):
            t, _ = B._bitap_call(lo, hi, sm, em, h, b, nn, K=eng.tables.k,
                                 L=ph.L, Lc=ph.Lc, H=eng.halo,
                                 tiles=ph.tiles, extract=False)
            return t

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(h, b, reps):
        total = jnp.int32(0)
        for _ in range(reps):
            total = total + fn(h, b)
            b, total = jax.lax.optimization_barrier((b, total))
        return total

    def t_at(reps, iters=3):
        int(chained(ph.halo_a, ph.body, reps))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained(ph.halo_a, ph.body, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_at(r_hi) - t_at(r_lo)) / (r_hi - r_lo)
    count = int(chained(ph.halo_a, ph.body, 1))
    return n / per / 1e9, count, eng.tables.k


SHERLOCK = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
            b"Inspector Lestrade", b"Professor Moriarty"]


def suite_sherlock():
    n = 1 << 26
    hay = english_haystack(n, SHERLOCK)
    gbps, count, k = device_count_gbps(SHERLOCK, hay)
    emit(suite="sherlock", engine="bitap", bytes=n, matches=count,
         limbs=k, gbps=round(gbps, 2),
         ref_dfa_gbps=0.86, ref_default_gbps=51.0)


def suite_patsweep():
    rng = np.random.default_rng(7)
    words = [
        bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz"),
                         size=int(rng.integers(5, 14))).astype(np.uint8))
        for _ in range(64)
    ]
    n = 1 << 25
    hay = english_haystack(n)
    for cnt in (1, 2, 4, 8, 16, 32, 64):
        pats = words[:cnt]
        gbps, count, k = device_count_gbps(pats, hay)
        emit(suite="patsweep", engine="bitap", patterns=cnt, limbs=k,
             bytes=n, matches=count, gbps=round(gbps, 2))


def suite_same():
    # degenerate all-match: every byte matches (reference same/onebyte)
    n = 1 << 25
    hay = b"a" * n
    gbps, count, k = device_count_gbps([b"a"], hay, r_lo=8, r_hi=64)
    emit(suite="same", engine="bitap", bytes=n, matches=count,
         gbps=round(gbps, 2), ref_dfa_us_per_10kb=118.69)


def suite_dict1k():
    """Case-insensitive 1K-pattern dictionary on the fingerprint engine
    (BASELINE.json config #3); the reference runs this class on its bare
    automaton at ~0.3-0.9 GB/s (no prefilter past 64 patterns)."""
    from bench import bench_dict1k

    import jax
    import jax.numpy as jnp

    gbps = bench_dict1k(jax, jnp)
    # The reference's bare-automaton rate on this workload class is a
    # range, not a point: 0.34 (noncontiguous NFA) to 0.86 (dense DFA)
    # GB/s on the sherlock rows (BASELINE.md, record/x86_64 CSV).
    emit(suite="dict1k", engine="fingerprint", patterns=1000,
         case_insensitive=True, bytes=1 << 26, gbps=round(gbps, 2),
         ref_bare_automaton_gbps_lo=0.34, ref_bare_automaton_gbps_hi=0.86)


def suite_build():
    from ahocorasick_tpu.automata.noncontiguous import compile_nfa

    rng = np.random.default_rng(3)
    for npat in (5, 1000, 100_000):
        pats = [
            bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz -"),
                             size=int(rng.integers(4, 24))
                             ).astype(np.uint8))
            for _ in range(npat)
        ]
        for builder in ("python", "native"):
            try:
                t0 = time.perf_counter()
                nfa = compile_nfa(pats, builder=builder)
                dt = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                emit(suite="build", builder=builder, patterns=npat,
                     error=str(e)[:60])
                continue
            emit(suite="build", builder=builder, patterns=npat,
                 states=nfa.num_states, seconds=round(dt, 3),
                 ref_noncontig_100k_s=0.24)


def suite_memory():
    from ahocorasick_tpu import AhoCorasick
    from ahocorasick_tpu.automata.contiguous import build_contiguous

    rng = np.random.default_rng(3)
    pats = [
        bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz -"),
                         size=int(rng.integers(4, 24))).astype(np.uint8))
        for _ in range(100_000)
    ]
    ac = AhoCorasick(pats)
    c = build_contiguous(ac._match_nfa)
    emit(suite="memory", patterns=len(pats),
         noncontiguous_mb=round(ac._match_nfa.memory_usage() / 2**20, 1),
         contiguous_mb=round(c.memory_usage() / 2**20, 1),
         dfa_mb=round(ac._dfa.memory_usage() / 2**20, 1),
         ref_mb={"noncontiguous": 99, "contiguous": 21, "dfa": 1600})


SUITES = {
    "sherlock": suite_sherlock,
    "patsweep": suite_patsweep,
    "same": suite_same,
    "dict1k": suite_dict1k,
    "build": suite_build,
    "memory": suite_memory,
}


if __name__ == "__main__":
    which = sys.argv[1:] or list(SUITES)
    for name in which:
        log(f"== {name} ==")
        SUITES[name]()
