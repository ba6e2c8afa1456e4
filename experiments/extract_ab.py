"""Extraction-path A/B on the 5-pattern headline config (64 MiB).

Compares, on the real TPU:
  A. bitap match_pairs (current production routing): Ke end-limb words
     per position to HBM, chunked at MAX_EXTRACT_CHUNK, on-device word
     compaction, host decode.
  B. fingerprint engine fused extraction (_verified(extract=True)):
     1-bit bitmap -> rank/select -> cuckoo verify -> O(#matches) pairs.
  C. fingerprint fused count (for the extract-vs-count gap).
  D. bitap count (the 51.87 GB/s floor, for reference).

Also checks triple parity between A and B.
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

from bench import build_haystack, host_count

PATTERNS = [
    b"Sherlock Holmes",
    b"John Watson",
    b"Irene Adler",
    b"Inspector Lestrade",
    b"Professor Moriarty",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wall(fn, iters=3):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn, r_lo=2, r_hi=10, iters=3):
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
    log(f"  t({r_lo})={t_lo*1e3:.1f} t({r_hi})={t_hi*1e3:.1f} "
        f"-> {per*1e3:.3f} ms/scan")
    return per


def main():
    n = 1 << 26
    hs = build_haystack(n)
    want = host_count(PATTERNS, hs)
    log(f"n={n} matches={want}")

    from ahocorasick_tpu.ops.bitap import BitapEngine
    from ahocorasick_tpu.ops import fingerprint as F

    # --- A: bitap match_pairs, full path wall time (includes chunk
    # re-prepare + host decode: what the facade does today) ---
    beng = BitapEngine(PATTERNS, False)
    bp, be = beng.match_pairs(hs)
    assert len(bp) == want, (len(bp), want)
    t = wall(lambda: beng.match_pairs(hs), iters=2)
    log(f"A bitap match_pairs full wall: {t*1e3:.1f} ms "
        f"({n/t/1e9:.2f} GB/s)")

    # --- B/C: fingerprint engine ---
    feng = F.FingerprintEngine(PATTERNS, False)
    assert feng.dv is not None
    ph = feng.prepare(hs)
    fp_, fe_ = feng.match_pairs(ph)
    assert len(fp_) == want
    np.testing.assert_array_equal(fe_, be)
    np.testing.assert_array_equal(fp_, bp)
    log("A/B triple parity OK")
    t = wall(lambda: feng.match_pairs(ph), iters=3)
    log(f"B fp match_pairs full wall: {t*1e3:.1f} ms "
        f"({n/t/1e9:.2f} GB/s)")

    cap_c, cap_m = feng.last_caps
    tb = feng.tables
    log(f"fp: K={tb.k} buckets={tb.num_buckets} cap_c={cap_c} "
        f"cap_m={cap_m} W={feng.dv.W}")
    dv_args = feng.dv.device_args()
    n_dev = jnp.int32(ph.n)

    fne = F._fp_verified_jit(tb.baked_key(), feng.dv.key(), tb.k, ph.L,
                             ph.Lc, feng.halo, ph.tiles, feng.dv.W, True)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained_ext(halo, body, u8f, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            _nc, total, opid, oend = fne(halo, body, u8f, n_dev, dv_args,
                                         cap_c=cap_c, cap_m=cap_m)
            acc = acc + total + opid[0] + oend[-1].astype(jnp.int32)
            body, acc = jax.lax.optimization_barrier((body, acc))
        return acc

    log("B' fp fused extract slope:")
    per = slope(lambda r: int(chained_ext(ph.halo_a, ph.body, ph.u8f, r)))
    log(f"B' fp fused extract: {n/per/1e9:.2f} GB/s")

    fnc = F._fp_verified_jit(tb.baked_key(), feng.dv.key(), tb.k, ph.L,
                             ph.Lc, feng.halo, ph.tiles, feng.dv.W, False)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained_cnt(halo, body, u8f, reps):
        acc = jnp.int32(0)
        for _ in range(reps):
            _nc, total = fnc(halo, body, u8f, n_dev, dv_args, cap_c=cap_c)
            acc = acc + total
            body, acc = jax.lax.optimization_barrier((body, acc))
        return acc

    log("C fp fused count slope:")
    per = slope(lambda r: int(chained_cnt(ph.halo_a, ph.body, ph.u8f, r)))
    log(f"C fp fused count: {n/per/1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
