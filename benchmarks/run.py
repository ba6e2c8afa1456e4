"""Benchmark suite — the rebar-harness analog (reference benchmarks/).

Suites (mirroring the reference's definitions):
  sherlock     5-name leftmost query over English-like text (headline)
  patsweep     pattern-count sweep 1..64 (the teddy.toml role)
  teddysweep   forced-fingerprint sweep + auto-routed production rows
  same         degenerate all-match haystack (same/onebyte-match)
  dict1k/dict100k   synthetic dictionary configs (fingerprint/cascade)
  realcorpus   sherlock.txt name-alt1/alt2 + opensubtitles-en rows
  multilang    alt-sherlock-ru/zh on opensubtitles ru/zh (UTF-8)
  dict15       curated dictionary-15 (2,663 length>=15 real words)
  dict-english full-123k boundary row + length-10 cascade rows
  build        automaton construction time, python vs native builder
  memory       per-backend table sizes

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


_GENERIC_CHAINS = {}


def _generic_chain(K, L, Lc, H, tiles):
    """Memoized chained generic-count graph: tables/haystack are traced
    args, so ONE tunnel compile serves every pattern set with the same
    (K, layout) shape — the teddysweep production rows would otherwise
    pay a fresh multi-minute compile per sweep point."""
    key = (K, L, Lc, H, tiles)
    if key not in _GENERIC_CHAINS:
        import jax
        import jax.numpy as jnp

        from bench import make_chained
        from ahocorasick_tpu.ops import bitap as B

        def fn(lo, hi, sm, em, nn, h, b):
            t, _ = B._bitap_call(lo, hi, sm, em, h, b, nn, K=K, L=L,
                                 Lc=Lc, H=H, tiles=tiles, extract=False)
            return t

        _GENERIC_CHAINS[key] = make_chained(jax, jnp, fn, body_idx=6)
    return _GENERIC_CHAINS[key]


def device_count_gbps(patterns, hay, r_lo=4, r_hi=16):
    """Slope-timed count-mode throughput for one pattern set."""
    import jax
    import jax.numpy as jnp

    from bench import make_chained
    from ahocorasick_tpu.ops import bitap as B

    n = len(hay)
    eng = B.BitapEngine(patterns, False)
    ph = eng.prepare(hay)
    if ph.baked:
        bfn = B._baked_jit(eng.tables.baked_key(), eng.tables.k, ph.L,
                           ph.Lc, eng.halo, ph.tiles, False)
        chained = make_chained(jax, jnp, bfn, body_idx=1)
    else:
        lo, hi, sm, em = eng._args()
        nn = jnp.asarray([0, n], jnp.int32)
        gchain = _generic_chain(eng.tables.k, ph.L, ph.Lc, eng.halo,
                                ph.tiles)

        def chained(halo, body, reps):
            return gchain(lo, hi, sm, em, nn, halo, body, reps)

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


def suite_teddysweep():
    """Teddy-sweep analog (benchmarks/definitions/teddy.toml): pattern
    count x pattern length on the fingerprint engine's fused count.

    Runs the table-GENERIC fused pipeline over a 1 MiB haystack so one
    compile is shared by every sweep point with the same (K, logT, W)
    shape — the per-pattern-set baked kernels would cost one multi-
    minute tunnel compile per point."""
    import jax
    import jax.numpy as jnp

    from bench import make_chained
    from ahocorasick_tpu.ops import fingerprint as F

    rng = np.random.default_rng(21)
    n = 1 << 19  # below FP_BAKED_MIN: the generic kernel serves
    hay = english_haystack(n)
    base = bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz"),
                            size=4096).astype(np.uint8))
    for plen in (4, 8, 16):
        for cnt in (2, 8, 16, 32, 64):
            pats = sorted({base[i * 53:i * 53 + plen]
                           for i in range(cnt)})
            if not F.FingerprintEngine.eligible(pats):
                emit(suite="teddysweep", patterns=cnt, plen=plen,
                     eligible=False)
                continue
            eng = F.FingerprintEngine(pats, False)
            if eng.dv is None:
                emit(suite="teddysweep", patterns=cnt, plen=plen,
                     device_verify=False)
                continue
            ph = eng.prepare(hay)
            assert not ph.baked and ph.u8f is not None
            want = eng.count_matches(ph)
            cap_c, _ = eng.last_caps
            fn = F._fp_verified_generic_jit(
                eng.dv.key(), eng.tables.k, ph.L, ph.Lc, eng.halo,
                ph.tiles, eng.dv.W, False)
            dv_args = eng.dv.device_args()
            args = eng._args()
            nn = jnp.asarray([0, ph.n], jnp.int32)
            n_dev = jnp.int32(ph.n)

            chained = make_chained(
                jax, jnp, lambda halo, body, u8f, fn=fn,
                dv_args=dv_args, args=args, nn=nn, n_dev=n_dev,
                cap_c=cap_c:
                fn(*args, nn, halo, body, u8f, n_dev, dv_args,
                   cap_c=cap_c)[1],
                body_idx=1)

            def t_at(reps, iters=4):
                out = int(chained(ph.halo_a, ph.body, ph.u8f, reps))
                assert out == want * reps
                best = float("inf")
                for _ in range(iters):
                    t0 = time.perf_counter()
                    int(chained(ph.halo_a, ph.body, ph.u8f, reps))
                    best = min(best, time.perf_counter() - t0)
                return best

            per = (t_at(2048) - t_at(256)) / (2048 - 256)
            emit(suite="teddysweep", engine="fingerprint", patterns=cnt,
                 plen=plen, limbs=eng.tables.k,
                 buckets=eng.tables.num_buckets, bytes=n, matches=want,
                 gbps=round(n / per / 1e9, 2), forced_engine=True)
            # Production row: auto routing sends every teddy-suite shape
            # (<= 64 short patterns) to the exact bit-parallel engine —
            # the forced-fingerprint rows above measure a NON-production
            # path at these scales (VERDICT r04 weak #2).
            pgbps, pcount, pk = device_count_gbps(pats, hay,
                                                  r_lo=64, r_hi=512)
            assert pcount == want, (pcount, want)
            emit(suite="teddysweep", engine="bitap-production",
                 patterns=cnt, plen=plen, limbs=pk, bytes=n,
                 matches=want, gbps=round(pgbps, 2))


def suite_dict100k():
    """100k-pattern dictionary on the cascade engine (the reference's
    signature build shape, src/ahocorasick.rs:46-55; its dense DFA walks
    this at ~0.8 GB/s single-core, dfa.rs:218-226)."""
    import functools

    import jax
    import jax.numpy as jnp

    from bench import build_words, build_dict_text, NAME_SYLLABLES
    from ahocorasick_tpu.ops.cascade import CascadeEngine, _cascade_jit
    from ahocorasick_tpu import AhoCorasick

    pats = build_words(100_000, 99, NAME_SYLLABLES, capitalize=0.3)
    n = 1 << 26
    hs = build_dict_text(n, pats)
    eng = CascadeEngine(pats, True)
    ac = AhoCorasick(pats, ascii_case_insensitive=True,
                     device_threshold=1 << 62)
    want = ac.count_matches(hs)
    ph = eng.prepare(hs)
    assert eng.count_matches(ph) == want
    cap_c, cap_e, _ = eng.last_caps
    t = eng.tables
    dv = t.device_args()
    n_dev = jnp.int32(ph.n)
    fn = _cascade_jit(t.coarse.baked_key(), t.meta_key(), t.coarse.k,
                      ph.L, ph.Lc, eng.halo, ph.tiles, False)
    from bench import make_chained

    chained = make_chained(
        jax, jnp, lambda halo, body, u8f:
        fn(halo, body, u8f, n_dev, dv, cap_c=cap_c, cap_e=cap_e)[2],
        body_idx=1)

    def t_at(reps, iters=3):
        out = int(chained(ph.halo_a, ph.body, ph.u8f, reps))
        assert out == want * reps
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained(ph.halo_a, ph.body, ph.u8f, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_at(12) - t_at(4)) / 8
    emit(suite="dict100k", engine="cascade", patterns=len(pats),
         case_insensitive=True, bytes=n, matches=want,
         coarse_limbs=t.coarse.k, prefixes=t.num_prefixes,
         gbps=round(n / per / 1e9, 2),
         ref_bare_automaton_gbps_lo=0.34, ref_bare_automaton_gbps_hi=0.86)


def suite_realcorpus():
    """The reference's own corpora: sherlock.txt name-alt1/alt2 rows
    (record/x86_64/2023-09-17.csv) and an opensubtitles haystack."""
    import os

    base = "/root/reference/benchmarks/haystacks"
    if not os.path.exists(base):
        emit(suite="realcorpus", skipped="no reference corpora mounted")
        return
    sher = open(f"{base}/sherlock.txt", "rb").read()
    subs = open(f"{base}/opensubtitles/en-sampled.txt", "rb").read()
    # Reference medians: sherlock rows from record/x86_64/2023-09-17.csv
    # sherlock/name-alt*; the en-sampled rows from the same CSV's
    # regexcurated/{alt-,}sherlock[-casei]-en default/leftmost-first.
    rows = [
        ("name-alt1", [b"Sherlock", b"Street"], sher, 11.67, False),
        ("name-alt2", [b"Sherlock", b"Holmes"], sher, 32.51, False),
        ("alt-sherlock-en", SHERLOCK, subs, 74.01, False),
        ("sherlock-en", [b"Sherlock Holmes"], subs, 30.05, False),
        ("sherlock-casei-en", [b"Sherlock Holmes"], subs, 72.88, True),
    ]
    from ahocorasick_tpu.ops import bitap as B

    import jax
    import jax.numpy as jnp

    from bench import host_count

    def _fold(b):
        return bytes(x | 0x20 if 0x41 <= x <= 0x5A else x for x in b)

    for name, pats, hay, ref_us, ci in rows:
        n = len(hay)
        eng = B.BitapEngine(pats, ci)
        ph = eng.prepare(hay, baked=True)  # pinned corpus: baked kernel
        want = eng.count_matches(ph)
        want_host = (host_count([_fold(p) for p in pats], _fold(hay))
                     if ci else host_count(pats, hay))
        assert want == want_host, (name, want, want_host)
        fn = B._baked_jit(eng.tables.baked_key(), eng.tables.k, ph.L,
                          ph.Lc, eng.halo, ph.tiles, False)

        # Sub-100us scans need a dynamic fori_loop chain (one compile,
        # thousands of reps) to rise above the tunnel dispatch jitter.
        @jax.jit
        def chained(halo, body, reps, fn=fn):
            def it(_, carry):
                body, acc = carry
                acc = acc + fn(halo, body)
                return jax.lax.optimization_barrier((body, acc))

            _, acc = jax.lax.fori_loop(0, reps, it,
                                       (body, jnp.int32(0)))
            return acc

        def t_at(reps, iters=5):
            out = int(chained(ph.halo_a, ph.body, reps))
            assert out == want * reps
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                int(chained(ph.halo_a, ph.body, reps))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (t_at(4096) - t_at(256)) / (4096 - 256)
        emit(suite="realcorpus", config=name, bytes=n, matches=want,
             us_per_scan=round(per * 1e6, 2),
             gbps=round(n / per / 1e9, 2),
             ref_default_us=ref_us)


def _count_extract_rows(suite, name, pats, hay, ref_us, r_lo=256,
                        r_hi=4096):
    """Count + extraction slope rows for one (patterns, corpus) pair on
    the bit-parallel engine, with full triple parity asserted."""
    import jax
    import jax.numpy as jnp

    from bench import brute_pairs, host_count, make_chained
    from ahocorasick_tpu.ops import bitap as B

    n = len(hay)
    want = host_count(pats, hay)
    eng = B.BitapEngine(pats, False)
    ph = eng.prepare(hay, baked=True)
    assert ph.baked, "pattern set must admit a pad byte"
    assert eng.count_matches(ph) == want
    gp, ge = eng.match_pairs(ph)
    wp, we = brute_pairs(pats, hay)
    assert np.array_equal(gp, wp) and np.array_equal(ge, we), \
        f"{name}: triple parity failure"
    t = eng.tables
    fn = B._baked_jit(t.baked_key(), t.k, ph.L, ph.Lc, eng.halo,
                      ph.tiles, False)
    chained = make_chained(jax, jnp, fn, body_idx=1)
    assert int(chained(ph.halo_a, ph.body, 3)) == want * 3

    def t_at(ch, reps, iters=4):
        int(ch(ph.halo_a, ph.body, reps))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(ch(ph.halo_a, ph.body, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_at(chained, r_hi) - t_at(chained, r_lo)) / (r_hi - r_lo)
    # Extraction: the PRODUCTION route — the facade prefers the
    # fingerprint fused extract (candidate bitmap + device verify +
    # O(#matches) pairs) over the single-pass end-word floor whenever
    # the pattern set supports device verification.
    from ahocorasick_tpu.ops import fingerprint as F

    feng = F.FingerprintEngine(pats, False)
    assert feng.dv is not None
    fph = feng.prepare(hay)
    fgp, fge = feng.match_pairs(fph)
    assert np.array_equal(fgp, wp) and np.array_equal(fge, we), \
        f"{name}: fp extraction triple parity failure"
    cap_c, cap_m = feng.last_caps
    ft = feng.tables
    if fph.baked:
        ffe = F._fp_verified_jit(
            ft.baked_key(), feng.dv.key(), ft.k, fph.L, fph.Lc,
            feng.halo, fph.tiles, feng.dv.W, True)
        fargs = (fph.halo_a, fph.body, fph.u8f)

        def call_e(halo, body, u8f):
            _nc, tot, opid, oend = ffe(
                halo, body, u8f, jnp.int32(fph.n), feng.dv.device_args(),
                cap_c=cap_c, cap_m=cap_m)
            return tot + opid[0] + oend[-1].astype(jnp.int32)
    else:
        ffe = F._fp_verified_generic_jit(
            feng.dv.key(), ft.k, fph.L, fph.Lc, feng.halo, fph.tiles,
            feng.dv.W, True)
        targs = feng._args()
        nnf = jnp.asarray([0, fph.n], jnp.int32)
        fargs = (fph.halo_a, fph.body, fph.u8f)

        def call_e(halo, body, u8f):
            _nc, tot, opid, oend = ffe(
                *targs, nnf, halo, body, u8f, jnp.int32(fph.n),
                feng.dv.device_args(), cap_c=cap_c, cap_m=cap_m)
            return tot + opid[0] + oend[-1].astype(jnp.int32)

    chained_e = make_chained(jax, jnp, call_e, body_idx=1)

    def te_at(reps, iters=4):
        int(chained_e(*fargs, reps))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained_e(*fargs, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    per_e = (te_at(r_hi // 4) - te_at(r_lo // 4)) \
        / (r_hi // 4 - r_lo // 4)
    emit(suite=suite, config=name, bytes=n, matches=want,
         us_per_scan=round(per * 1e6, 2), gbps=round(n / per / 1e9, 2),
         extract_us_per_scan=round(per_e * 1e6, 2),
         extract_gbps=round(n / per_e / 1e9, 2),
         extract_engine="fingerprint-fused",
         triple_parity="ok", ref_default_us=ref_us)


def suite_multilang():
    """Non-ASCII real corpora: the reference's alt-sherlock-{ru,zh}
    configs (regexcurated.toml:154-212) over opensubtitles ru/zh.
    UTF-8 Cyrillic/CJK bytes stress the nybble mux trees and pad-byte
    machinery with dense high bytes and no ASCII case pairs; reference
    default medians from record/x86_64/2023-09-17.csv."""
    import os

    base = "/root/reference/benchmarks/haystacks/opensubtitles"
    if not os.path.exists(base):
        emit(suite="multilang", skipped="no reference corpora mounted")
        return
    rows = [
        ("alt-sherlock-ru",
         ["Шерлок Холмс", "Джон Уотсон", "Ирен Адлер",
          "инспектор Лестрейд", "профессор Мориарти"],
         "ru-sampled.txt", 234.19),
        ("alt-sherlock-zh",
         ["夏洛克·福尔摩斯", "约翰华生", "阿德勒", "雷斯垂德",
          "莫里亚蒂教授"],
         "zh-sampled.txt", 56.62),
    ]
    for name, pats_s, fname, ref_us in rows:
        pats = [p.encode() for p in pats_s]
        hay = open(f"{base}/{fname}", "rb").read()
        _count_extract_rows("multilang", name, pats, hay, ref_us)


def suite_dict15():
    """The curated dictionary-15 config: 2,663 length>=15 English words
    (dictionary/english/length-15.txt) — fingerprint-engine territory
    (the production route: past the exact kernel's 2048-byte budget).
    The reference walks this on its bare automaton: default 312.17 us /
    forced DFA 82.12 us on en-medium (61,436 B) = 0.20 / 0.75 GB/s
    (record/x86_64/2023-09-17.csv regexcurated/dictionary-15)."""
    import os

    import jax
    import jax.numpy as jnp

    from bench import bench_fp_count, bench_fp_extract, brute_pairs

    path = ("/root/reference/benchmarks/regexes/dictionary/english/"
            "length-15.txt")
    if not os.path.exists(path):
        emit(suite="dict15", skipped="no reference dictionary mounted")
        return
    pats = [w for w in open(path, "rb").read().split(b"\n") if w]
    hay = open("/root/reference/benchmarks/haystacks/opensubtitles/"
               "en-sampled.txt", "rb").read()
    wp, we = brute_pairs(pats, hay)
    gbps = bench_fp_count(jax, jnp, pats, hay, len(wp), False, "dict15")
    egbps = bench_fp_extract(jax, jnp, pats, hay, len(wp), False,
                             "dict15-extract", (wp, we))
    emit(suite="dict15", engine="fingerprint", patterns=len(pats),
         bytes=len(hay), matches=len(wp), gbps=round(gbps, 2),
         extract_gbps=round(egbps, 2), triple_parity="ok",
         ref_default_gbps=0.20, ref_dfa_gbps=0.75)


def suite_dict_english():
    """Real-dictionary rows (sorted.txt boundary + length-10 cascade);
    see bench.bench_dict_english."""
    import jax
    import jax.numpy as jnp

    from bench import bench_dict_english

    full_gbps, l10_gbps, l10_egbps, l10_native = bench_dict_english(
        jax, jnp)
    emit(suite="dict-english", config="full-123k",
         engine="native-walk (saturation boundary: 1.31 matches/byte)",
         patterns=123115, gbps=round(full_gbps, 3))
    # The cascade values are FORCED-engine measurements (the workload
    # is candidate-dense past the n/64 hostile bound); production
    # auto-routing uses the native walk, whose rate is the
    # native_walk_gbps field.
    emit(suite="dict-english", config="length-10-43k", engine="cascade",
         patterns=43029, gbps=round(l10_gbps, 2),
         extract_gbps=round(l10_egbps, 2), forced_engine=True,
         production_engine="native-walk",
         native_walk_gbps=round(l10_native, 3), triple_parity="ok")


def suite_build():
    import os

    from ahocorasick_tpu.automata.noncontiguous import compile_nfa

    # The reference's own recorded build rows on its real word lists
    # (record/x86_64/2023-09-07.csv build/words5000, build/words15000;
    # default/leftmost-first medians on its 2023 x86_64 desktop).
    refbase = "/root/reference/benchmarks/regexes"
    for fname, ref_ms in (("words-5000", 2.93), ("words-15000", 9.00)):
        path = f"{refbase}/{fname}"
        if not os.path.exists(path):
            continue
        pats = [w for w in open(path, "rb").read().split(b"\n") if w]
        compile_nfa(pats[:50], builder="native")  # warm the library
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            nfa = compile_nfa(pats, builder="native")
            best = min(best, time.perf_counter() - t0)
        emit(suite="build", builder="native", config=fname,
             patterns=len(pats), states=nfa.num_states,
             ms=round(best * 1e3, 2), ref_default_ms=ref_ms)

    rng = np.random.default_rng(3)
    for npat in (5, 1000, 100_000):
        pats = [
            bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz -"),
                             size=int(rng.integers(4, 24))
                             ).astype(np.uint8))
            for _ in range(npat)
        ]
        # Native first (the Python build allocates GBs and pollutes the
        # page cache), min of 3 — the same best-of convention as the
        # rebar timing rows this is compared against.
        for builder, iters in (("native", 5), ("python", 1)):
            try:
                best = float("inf")
                for _ in range(iters):
                    t0 = time.perf_counter()
                    nfa = compile_nfa(pats, builder=builder)
                    best = min(best, time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                emit(suite="build", builder=builder, patterns=npat,
                     error=str(e)[:60])
                continue
            emit(suite="build", builder=builder, patterns=npat,
                 states=nfa.num_states, seconds=round(best, 3),
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
    "teddysweep": suite_teddysweep,
    "same": suite_same,
    "dict1k": suite_dict1k,
    "dict100k": suite_dict100k,
    "realcorpus": suite_realcorpus,
    "multilang": suite_multilang,
    "dict15": suite_dict15,
    "dict-english": suite_dict_english,
    "build": suite_build,
    "memory": suite_memory,
}


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1:] or list(SUITES)
    for name in which:
        log(f"== {name} ==")
        SUITES[name]()
