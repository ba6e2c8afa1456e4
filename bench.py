"""Benchmark: multi-pattern search throughput per chip.

Measures the production count path on the reference's headline
configuration — the sherlock/name-alt1 pattern set (5 literals) over
English-like text, 64 MiB resident in HBM. The facade routes this
workload to the staged engine (ops/staged.py): a K=1 fingerprint
prefilter pass flags candidate streams, and the exact bit-parallel
kernel (ops/bitap.py) rescans only those — the TPU analog of the
reference's prefilter-accelerated default engine, which is what its
51 GB/s headline row measures (BASELINE.md).

Reference baselines (BASELINE.md): same query, forced dense DFA
~0.86 GB/s; prefilter default ~51 GB/s (x86_64).

Methodology: this environment reaches the TPU through a tunnel with
~25-60 ms per-dispatch latency, so single-call timing measures the tunnel,
not the chip. We chain R invocations inside one jit (separated by
lax.optimization_barrier so XLA cannot CSE them) and report the slope
(t(R2) - t(R1)) / (R2 - R1) — the marginal per-scan device time, which is
what a production (non-tunneled) deployment sees per call.

Prints ONE JSON line on stdout (headline metric + secondary keys);
diagnostics go to stderr.
"""

import functools
import json
import sys
import time

import numpy as np

BASELINE_DEFAULT_GBPS = 51.0  # BASELINE.md sherlock/name-alt1 default
BASELINE_DFA_GBPS = 0.86      # BASELINE.md sherlock/name-alt1 forced DFA


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_haystack(n: int) -> bytes:
    """English-like text with occasional pattern hits, deterministic."""
    rng = np.random.default_rng(1234)
    words = (
        "the quick brown fox jumps over lazy dog time of day it was best "
        "worst epoch belief incredulity season light darkness hope despair"
    ).split()
    names = [
        b"Sherlock Holmes",
        b"John Watson",
        b"Irene Adler",
        b"Inspector Lestrade",
        b"Professor Moriarty",
    ]
    parts = []
    size = 0
    while size < n:
        if rng.random() < 0.001:
            w = names[int(rng.integers(len(names)))]
        else:
            w = words[int(rng.integers(len(words)))].encode()
        parts.append(w)
        size += len(w) + 1
    return b" ".join(parts)[:n]


def host_count(patterns, hay: bytes) -> int:
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


def slope_time(jax, chained, args, expect_of, r_lo=4, r_hi=20, iters=4):
    """Marginal per-call seconds via chained-invocation slope timing."""
    def t_at(reps):
        out = int(chained(*args, reps))
        assert out == expect_of(reps), (out, expect_of(reps))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained(*args, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = t_at(r_lo)
    t_hi = t_at(r_hi)
    per = (t_hi - t_lo) / (r_hi - r_lo)
    log(f"t({r_lo})={t_lo*1e3:.1f} ms t({r_hi})={t_hi*1e3:.1f} ms "
        f"-> per-scan {per*1e3:.3f} ms")
    return per


def bench_staged(jax, jnp, patterns, haystack, expect):
    """Production count path: staged prefilter + exact rescan."""
    from ahocorasick_tpu.ops import staged as S

    assert S.StagedEngine.eligible(patterns, len(haystack))
    eng = S.StagedEngine(patterns, False)
    ph = eng.prepare(haystack)
    # Find the steady-state rescan cap the adaptive path settles on.
    ns = ph.tiles * S.LANES
    cap = max(S.LANES, 1 << (max(ns // 8, 1) - 1).bit_length())
    while True:
        total, ncand = eng.count_fn(ph, cap)()
        if int(ncand) <= cap:
            break
        cap *= 2
    assert int(total) == expect, (int(total), expect)
    log(f"staged: Kf={eng.fp.k} K={eng.full.k} L={ph.L} tiles={ph.tiles} "
        f"ncand={int(ncand)} cap={cap} ({100.0*int(ncand)/ns:.1f}% streams)")
    fn = S._staged_jit(eng.fp.baked_key(), eng.full.baked_key(),
                       eng.fp.k, eng.full.k, ph.L, ph.Lc, eng.halo,
                       ph.tiles, cap)
    nn = jnp.asarray([0, ph.n], jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(rows, hrows, halo, body, reps):
        total = jnp.int32(0)
        for _ in range(reps):
            t, _ = fn(rows, hrows, halo, body, nn)
            total = total + t
            body, total = jax.lax.optimization_barrier((body, total))
        return total

    per = slope_time(
        jax, chained, (ph.rows, ph.hrows, ph.halo_a, ph.body),
        lambda r: expect * r,
    )
    return len(haystack) / per / 1e9


def bench_bitap(jax, jnp, patterns, haystack, expect):
    """Single-pass exact kernel (no prefilter) — the engine floor."""
    from ahocorasick_tpu.ops import bitap as B

    eng = B.BitapEngine(patterns, False)
    ph = eng.prepare(haystack)
    assert ph.baked
    count_fn = B._baked_jit(
        eng.tables.baked_key(), eng.tables.k, ph.L, ph.Lc, eng.halo,
        ph.tiles, False
    )

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(halo_a, body, reps):
        total = jnp.int32(0)
        for _ in range(reps):
            total = total + count_fn(halo_a, body)
            body, total = jax.lax.optimization_barrier((body, total))
        return total

    per = slope_time(jax, chained, (ph.halo_a, ph.body),
                     lambda r: expect * r)
    return len(haystack) / per / 1e9


# Two syllable pools: dictionary entries (name-like) vs prose filler —
# the "search 1K names in text" shape: the dictionary shares prefixes
# internally (which the bucket planner exploits) while the text is
# drawn from ordinary vocabulary.
NAME_SYLLABLES = (
    "bar bel bor dan dar del dor fan far gar gor hal han har kar kel "
    "kor lan lor mar mor nal nar nor pal par ral ran rok sar sel sor "
    "tan tar tor val van var vor wan war zan zor"
).split()
PROSE_SYLLABLES = (
    "a be ce de e fi ge hi i je ke li me ni o pe qui re si te u ve "
    "we xi ye ze tion ing ed er ly un de re in con com pro per"
).split()


def build_words(count, seed, syllables, capitalize=0.0):
    rng = np.random.default_rng(seed)
    pats = set()
    while len(pats) < count:
        ns = int(rng.integers(2, 5))
        w = "".join(syllables[int(rng.integers(len(syllables)))]
                    for _ in range(ns))
        if capitalize and rng.random() < capitalize:
            w = w.capitalize()
        pats.add(w.encode())
    return sorted(pats)


def build_dictionary(count=1000, seed=99):
    """A 1K-entry mixed-case name dictionary (BASELINE.json config #3):
    prefix-sharing entries, the shape of real dictionaries (gazetteers,
    name lists, Wikipedia titles)."""
    return build_words(count, seed, NAME_SYLLABLES, capitalize=0.3)


def build_dict_text(n, pats, seed=7, density=0.002):
    """Prose-shaped text with planted dictionary hits."""
    rng = np.random.default_rng(seed)
    filler = build_words(4000, seed + 1, PROSE_SYLLABLES)
    parts = []
    size = 0
    while size < n:
        if rng.random() < density:
            w = pats[int(rng.integers(len(pats)))]
        else:
            w = filler[int(rng.integers(len(filler)))]
        parts.append(w)
        size += len(w) + 1
    return b" ".join(parts)[:n]


def bench_fp_count(jax, jnp, pats, hs, expect, ci, label):
    """Fused fingerprint count pipeline: bitmap filter kernel +
    on-device candidate expansion + on-device windowed verification —
    one dispatch, one scalar back."""
    from ahocorasick_tpu.ops import fingerprint as F

    eng = F.FingerprintEngine(pats, ci)
    assert eng.dv is not None, "device verify must be available"
    t = eng.tables
    ph = eng.prepare(hs)
    got = eng.count_matches(ph)
    assert got == expect, (got, expect)
    cap_c, _ = eng.last_caps
    log(f"{label}: buckets={t.num_buckets} K={t.k} W={eng.dv.W} "
        f"cap_c={cap_c}")
    fn = F._fp_verified_jit(
        t.baked_key(), eng.dv.key(), t.k, ph.L, ph.Lc, eng.halo,
        ph.tiles, eng.dv.W, False,
    )
    dv_args = eng.dv.device_args()
    n_dev = jnp.int32(ph.n)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(halo_a, body, u8f, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            _nc, total = fn(
                halo_a, body, u8f, n_dev, dv_args, cap_c=cap_c,
            )
            acc = acc + total
            body, acc = jax.lax.optimization_barrier((body, acc))
        return acc

    per = slope_time(jax, chained, (ph.halo_a, ph.body, ph.u8f),
                     lambda r: expect * r)
    return len(hs) / per / 1e9


def bench_dict1k(jax, jnp):
    """Case-insensitive 1K-pattern dictionary, exact overlapping count
    (BASELINE.json config #3). The reference runs this workload class on
    its bare automaton at ~0.3-0.9 GB/s (no prefilter applies past 64
    patterns, teddy/builder.rs:113)."""
    pats = build_dictionary()
    n = 1 << 26
    hs = build_dict_text(n, pats)
    # Exact expectation from the native C++ DFA walk.
    from ahocorasick_tpu import AhoCorasick

    ac = AhoCorasick(pats, ascii_case_insensitive=True, engine="auto",
                     device_threshold=1 << 62)  # force native walk
    want = ac.count_matches(hs)
    log(f"dict1k: native count = {want}")
    return bench_fp_count(jax, jnp, pats, hs, want, True, "dict1k")


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev}")

    patterns = [
        b"Sherlock Holmes",
        b"John Watson",
        b"Irene Adler",
        b"Inspector Lestrade",
        b"Professor Moriarty",
    ]
    n = 1 << 26  # 64 MiB
    haystack = build_haystack(n)
    expect = host_count(patterns, haystack)
    log(f"host count = {expect}")

    t0 = time.perf_counter()
    bitap_gbps = bench_bitap(jax, jnp, patterns, haystack, expect)
    log(f"bitap single-pass: {bitap_gbps:.2f} GB/s "
        f"(wall {time.perf_counter()-t0:.0f}s)")
    t0 = time.perf_counter()
    staged_gbps = bench_staged(jax, jnp, patterns, haystack, expect)
    log(f"staged two-pass: {staged_gbps:.2f} GB/s "
        f"(wall {time.perf_counter()-t0:.0f}s)")
    t0 = time.perf_counter()
    dict1k_gbps = bench_dict1k(jax, jnp)
    log(f"dict1k fused count: {dict1k_gbps:.2f} GB/s "
        f"(wall {time.perf_counter()-t0:.0f}s)")

    gbps = max(staged_gbps, bitap_gbps)
    print(
        json.dumps(
            {
                "metric": "5-pattern search throughput, production count "
                f"path ({dev.platform})",
                "value": round(gbps, 2),
                "unit": "GB/s/chip",
                "vs_baseline": round(gbps / BASELINE_DFA_GBPS, 1),
                "vs_reference_default_51gbps": round(
                    gbps / BASELINE_DEFAULT_GBPS, 2
                ),
                "bitap_single_pass_gbps": round(bitap_gbps, 2),
                "staged_gbps": round(staged_gbps, 2),
                "dict1k_case_insensitive_gbps": round(dict1k_gbps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
