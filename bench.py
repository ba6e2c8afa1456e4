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

Further rows cover the full production surface: extraction (the
reference's headline IS find_iter — fingerprint fused extract with TPU
triple-parity asserted against host enumeration), the dict1k and
dict100k dictionary configs (fingerprint / cascade engines, triple
parity vs the native C++ walk), the reference's REAL dictionaries
(dict-english-123k measured boundary on the native walk +
dict-english-l10 cascade rows over real opensubtitles text), and the
reference's actual corpus+patterns (name-alt1 over sherlock.txt,
us/scan comparable to its recorded 11.67 us median, reported with
run-to-run dispersion).

Measured ceiling note (v5e): the exact kernel is VPU-ALU-bound at
~(0.57 + 0.24K) ms per 64 MiB scan, so staging buys only ~4% on counts
at K=3; its lever pays on extraction and on large dictionaries instead
(see ARCHITECTURE.md).

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


def brute_pairs(patterns, hay: bytes):
    """Host truth: all overlapping (pid, 1-based end) pairs in the
    reference's overlapping report order."""
    lens = [len(p) for p in patterns]
    out = []
    for pid, p in enumerate(patterns):
        start = 0
        while True:
            i = hay.find(p, start)
            if i < 0:
                break
            out.append((i + len(p), -lens[pid], pid))
            start = i + 1
    out.sort()
    return (np.array([pid for _, _, pid in out], np.int64),
            np.array([e for e, _, _ in out], np.int64))


def make_chained(jax, jnp, call, body_idx=-1):
    """One jit with a DYNAMIC fori_loop over repeated kernel calls.

    ``call(*args) -> int32 scalar``; args[body_idx] is threaded through
    an optimization_barrier each iteration so XLA cannot CSE the calls.
    The rep count is a traced scalar: one compile serves every rep
    count (the previous statically-unrolled chains compiled 2 large
    graphs per row — several minutes each through the tunnel)."""
    @jax.jit
    def chained(*args_and_reps):
        args = list(args_and_reps[:-1])
        reps = args_and_reps[-1]

        def it(_, carry):
            body, acc = carry
            a = list(args)
            a[body_idx] = body
            acc = acc + call(*a)
            return jax.lax.optimization_barrier((body, acc))

        _, acc = jax.lax.fori_loop(
            0, reps, it, (args[body_idx], jnp.int32(0)))
        return acc

    return chained


SPREADS = {}  # label -> percent spread of the per-round slope estimates


def slope_time(jax, chained, args, expect_of, r_lo=4, r_hi=20, iters=4,
               label=None):
    """Marginal per-call seconds via chained-invocation slope timing.

    Runs `iters` alternating (r_lo, r_hi) timing rounds: the headline
    estimate is the min-over-rounds slope (tunnel jitter only ever adds
    time), and the round-to-round slope dispersion is recorded in
    SPREADS so 1.0x-vs-reference claims carry error bars (the r03->r04
    headline moved ~5% run to run with no dispersion reported)."""
    out = int(chained(*args, r_lo))
    want = expect_of(r_lo)
    assert want is None or out == want, (out, want)
    out = int(chained(*args, r_hi))
    want = expect_of(r_hi)
    assert want is None or out == want, (out, want)

    def t_once(reps):
        t0 = time.perf_counter()
        int(chained(*args, reps))
        return time.perf_counter() - t0

    slopes = []
    t_lo_min = t_hi_min = float("inf")
    for _ in range(iters):
        t_lo = t_once(r_lo)
        t_hi = t_once(r_hi)
        slopes.append((t_hi - t_lo) / (r_hi - r_lo))
        t_lo_min = min(t_lo_min, t_lo)
        t_hi_min = min(t_hi_min, t_hi)
    per = (t_hi_min - t_lo_min) / (r_hi - r_lo)
    spread = ((max(slopes) - min(slopes)) / per * 100.0) if per > 0 else 0.0
    if label is not None:
        SPREADS[label] = round(spread, 1)
    log(f"t({r_lo})={t_lo_min*1e3:.1f} ms t({r_hi})={t_hi_min*1e3:.1f} ms "
        f"-> per-scan {per*1e3:.3f} ms (spread {spread:.0f}%)")
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
    chained = make_chained(
        jax, jnp, lambda rows, hrows, halo, body:
        fn(rows, hrows, halo, body, nn)[0], body_idx=3)
    per = slope_time(
        jax, chained, (ph.rows, ph.hrows, ph.halo_a, ph.body),
        lambda r: expect * r, label="staged",
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
    chained = make_chained(jax, jnp, count_fn, body_idx=1)
    per = slope_time(jax, chained, (ph.halo_a, ph.body),
                     lambda r: expect * r, label="bitap")
    return len(haystack) / per / 1e9


def bench_fp_extract(jax, jnp, pats, hs, expect, ci, label,
                     want_pairs=None):
    """Fused fingerprint extraction (bitmap -> rank/select -> device
    verify -> O(#matches) pairs) — the production extraction route for
    every fp-eligible set (facade _match_set ordering). When
    ``want_pairs`` is given, full (pid, end) triple parity is asserted
    on the real TPU — the extraction correctness gate."""
    from ahocorasick_tpu.ops import fingerprint as F

    eng = F.FingerprintEngine(pats, ci)
    assert eng.dv is not None
    ph = eng.prepare(hs)
    gp, ge = eng.match_pairs(ph)
    assert len(gp) == expect, (len(gp), expect)
    if want_pairs is not None:
        wp, we = want_pairs
        assert np.array_equal(gp, wp) and np.array_equal(ge, we), \
            "TPU extraction triple parity failure"
        log(f"{label}: TPU triple parity OK ({len(wp)} matches)")
    cap_c, cap_m = eng.last_caps
    t = eng.tables
    fn = F._fp_verified_jit(
        t.baked_key(), eng.dv.key(), t.k, ph.L, ph.Lc, eng.halo,
        ph.tiles, eng.dv.W, True,
    )
    dv_args = eng.dv.device_args()
    n_dev = jnp.int32(ph.n)
    log(f"{label}: cap_c={cap_c} cap_m={cap_m}")

    def call(halo, body, u8f):
        _nc, total, opid, oend = fn(halo, body, u8f, n_dev, dv_args,
                                    cap_c=cap_c, cap_m=cap_m)
        return total + opid[0] + oend[-1].astype(jnp.int32)

    chained = make_chained(jax, jnp, call, body_idx=1)
    per = slope_time(jax, chained, (ph.halo_a, ph.body, ph.u8f),
                     lambda r: None, r_hi=12, label=label)
    return len(hs) / per / 1e9


def bench_dict100k(jax, jnp):
    """100k-pattern dictionary on the cascade engine — the reference's
    signature build shape (src/ahocorasick.rs:46-55), which it runs on
    its bare dense DFA at ~0.8 GB/s (dfa.rs:218-226). Count AND
    extraction, parity vs the native C++ walk."""
    from ahocorasick_tpu import AhoCorasick
    from ahocorasick_tpu.ops.cascade import CascadeEngine, _cascade_jit

    pats = build_words(100_000, 99, NAME_SYLLABLES, capitalize=0.3)
    n = 1 << 26
    hs = build_dict_text(n, pats)
    ac = AhoCorasick(pats, ascii_case_insensitive=True,
                     device_threshold=1 << 62)  # force native walk
    want = ac.count_matches(hs)
    log(f"dict100k: native count = {want}")
    eng = CascadeEngine(pats, True)
    ph = eng.prepare(hs)
    got = eng.count_matches(ph)
    assert got == want, (got, want)
    cap_c, cap_e, _ = eng.last_caps
    t = eng.tables
    dv = t.device_args()
    n_dev = jnp.int32(ph.n)
    log(f"dict100k: K={t.coarse.k} prefixes={t.num_prefixes} "
        f"caps c={cap_c} e={cap_e}")
    fnc = _cascade_jit(t.coarse.baked_key(), t.meta_key(), t.coarse.k,
                       ph.L, ph.Lc, eng.halo, ph.tiles, False)
    chained_c = make_chained(
        jax, jnp, lambda halo, body, u8f:
        fnc(halo, body, u8f, n_dev, dv, cap_c=cap_c, cap_e=cap_e)[2],
        body_idx=1)
    per = slope_time(jax, chained_c, (ph.halo_a, ph.body, ph.u8f),
                     lambda r: want * r, r_hi=12, label="dict100k-count")
    count_gbps = n / per / 1e9

    gp, ge = eng.match_pairs(ph)
    assert len(gp) == want
    # Full TPU triple parity for the cascade extraction (not just the
    # length): element-wise (pid, end) equality vs the native walk's
    # overlapping enumeration, in the same report order.
    wp, we = native_overlapping_pairs(pats, hs, True)
    assert np.array_equal(gp, wp) and np.array_equal(ge, we), \
        "dict100k TPU extraction triple parity failure"
    log(f"dict100k: TPU triple parity OK ({len(wp)} matches)")
    _, _, cap_m = eng.last_caps
    fne = _cascade_jit(t.coarse.baked_key(), t.meta_key(), t.coarse.k,
                       ph.L, ph.Lc, eng.halo, ph.tiles, True)

    def call_e(halo, body, u8f):
        _nc, _ne, total, opid, oend = fne(
            halo, body, u8f, n_dev, dv,
            cap_c=cap_c, cap_e=cap_e, cap_m=cap_m)
        return total + opid[0] + oend[-1].astype(jnp.int32)

    chained_e = make_chained(jax, jnp, call_e, body_idx=1)
    per_e = slope_time(jax, chained_e, (ph.halo_a, ph.body, ph.u8f),
                       lambda r: None, r_hi=12, label="dict100k-extract")
    return count_gbps, n / per_e / 1e9


def native_overlapping_pairs(pats, hs, ci=False):
    """All overlapping (pid, 1-based end) pairs from the production
    native C++ DFA walk, in the reference's overlapping report order —
    the host truth large dictionaries are parity-checked against."""
    from ahocorasick_tpu import AhoCorasick

    ac = AhoCorasick(pats, ascii_case_insensitive=ci,
                     device_threshold=1 << 62)  # force native walk
    wp, we = [], []
    for m in ac.find_overlapping_iter(hs):
        wp.append(m.pattern)
        we.append(m.end)
    return np.asarray(wp, np.int64), np.asarray(we, np.int64)


def bench_sherlock_real(jax, jnp):
    """The reference's actual headline configuration: name-alt1
    (["Sherlock", "Street"]) over sherlock.txt, 594,915 bytes, count
    158 — its default engine's median is 11.67 us (51 GB/s)
    (benchmarks/record/x86_64/2023-09-17.csv). Small pinned corpus:
    baked kernel via prepare(baked=True)."""
    from ahocorasick_tpu.ops import bitap as B

    path = "/root/reference/benchmarks/haystacks/sherlock.txt"
    hay = open(path, "rb").read()
    patterns = [b"Sherlock", b"Street"]
    expect = host_count(patterns, hay)
    assert expect == 158, expect  # the reference's recorded count
    eng = B.BitapEngine(patterns, False)
    ph = eng.prepare(hay, baked=True)
    assert eng.count_matches(ph) == expect
    fn = B._baked_jit(eng.tables.baked_key(), eng.tables.k, ph.L,
                      ph.Lc, eng.halo, ph.tiles, False)

    # Sub-100us scans drown in the tunnel's ~25 ms dispatch jitter;
    # thousands of reps lift the measured span well above the noise.
    chained = make_chained(jax, jnp, fn, body_idx=1)
    r_lo, r_hi = 256, 4096
    for reps in (r_lo, r_hi):
        out = int(chained(ph.halo_a, ph.body, reps))
        assert out == expect * reps, (out, expect * reps)

    def t_once(reps):
        t0 = time.perf_counter()
        int(chained(ph.halo_a, ph.body, reps))
        return time.perf_counter() - t0

    slopes = []
    t_lo_min = t_hi_min = float("inf")
    for _ in range(5):
        t_lo = t_once(r_lo)
        t_hi = t_once(r_hi)
        slopes.append((t_hi - t_lo) / (r_hi - r_lo))
        t_lo_min = min(t_lo_min, t_lo)
        t_hi_min = min(t_hi_min, t_hi)
    per = (t_hi_min - t_lo_min) / (r_hi - r_lo)
    spread = (max(slopes) - min(slopes)) / per * 100.0
    SPREADS["sherlock"] = round(spread, 1)
    log(f"sherlock-real: L={ph.L} tiles={ph.tiles} "
        f"per-scan {per*1e6:.2f} us (spread {spread:.0f}%)")
    return per * 1e6, len(hay) / per / 1e9


ENGLISH_DICT = "/root/reference/benchmarks/regexes/dictionary/english"
EN_SAMPLED = ("/root/reference/benchmarks/haystacks/opensubtitles/"
              "en-sampled.txt")


def bench_dict_english(jax, jnp):
    """Real-data dictionary rows on the reference's own corpora.

    1. dict-english-123k: the FULL 123,115-word English dictionary
       (sorted.txt) over opensubtitles en-sampled. Measured boundary:
       1.31 overlapping matches PER BYTE of text (1,175,169 in 899,232
       bytes; 74% from the dictionary's 52 single-character words) and
       a 13.5% exact 4-byte-prefix candidate floor — the planner's
       saturation model (ops/fingerprint.py SATURATION) rejects every
       device plan, so production routes to the native C++ DFA walk,
       which this row measures. The reference's execution model for
       this shape is the same sequential walk (dfa.rs:218-226, one
       dependent table load per byte; no prefilter applies past 64
       patterns, teddy/builder.rs:113) — its recorded ~0.8 GB/s DFA
       rows are small automatons, while a 123k-word table (~100 MB of
       transitions) is DRAM-latency-bound on any host.
    2. dict-english-l10: the reference's real 43,029-pattern length-10
       dictionary (dictionary/english/length-10.txt, the curated.toml
       dictionary family) over real opensubtitles text tiled to 16 MiB
       — the cascade device engine, count + extraction with full
       triple parity vs the native walk.
    """
    from ahocorasick_tpu import AhoCorasick
    from ahocorasick_tpu.ops.cascade import CascadeEngine, _cascade_jit

    dic = [w for w in open(f"{ENGLISH_DICT}/sorted.txt", "rb")
           .read().split(b"\n") if w]
    hay = open(EN_SAMPLED, "rb").read()
    # The saturation boundary must hold (anything else means the model
    # regressed and a hostile workload would reach the device).
    assert not CascadeEngine.eligible(dic, False)
    ac = AhoCorasick(dic, device_threshold=1 << 62)
    want = ac.count_matches(hay)
    assert want == 1_175_169, want  # precomputed on this fixed corpus
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        ac.count_matches(hay)
        best = min(best, time.perf_counter() - t0)
    full_gbps = len(hay) / best / 1e9
    log(f"dict-english-123k: native walk {best*1e3:.2f} ms "
        f"({full_gbps:.2f} GB/s, {want} matches)")

    l10 = [w for w in open(f"{ENGLISH_DICT}/length-10.txt", "rb")
           .read().split(b"\n") if w]
    n = 1 << 24
    hs = (hay * (-(-n // len(hay))))[:n]
    # PRODUCTION routing check: this workload is candidate-dense on
    # real English text (3.1% coarse candidates > the n/64 hostile
    # bound), so the auto route must declare the cascade hostile and
    # use the native walk. The device timing below is therefore a
    # FORCED-engine row (bounds widened for the measurement) — it
    # documents the measured device-side bound, not the production
    # path.
    import ahocorasick_tpu.ops.cascade as C

    probe_eng = CascadeEngine(l10, False)
    probe_eng._caps = {"c": 1 << 19, "e": 1 << 20}
    # Pin the plan level so the hostility probe doesn't pay escalation
    # recompiles (finer plans don't reduce this workload's candidates —
    # measured 3.07% -> 2.94% across the whole ladder).
    for lvl in range(probe_eng.level + 1, len(C.CASCADE_LEVELS)):
        probe_eng._tables_cache[lvl] = None
    assert probe_eng.count_matches(hs) is None and probe_eng.hostile, \
        "l10 on English text should be cascade-hostile in production"
    old_bounds = C.CAND_SHIFT, C.EXP_SHIFT
    C.CAND_SHIFT = C.EXP_SHIFT = 2
    try:
        return _dict_l10_forced(jax, jnp, l10, hs, n, full_gbps)
    finally:
        # The widened bounds must never leak into later bench rows
        # (guarded() keeps running rows after a failure here).
        C.CAND_SHIFT, C.EXP_SHIFT = old_bounds


def _dict_l10_forced(jax, jnp, l10, hs, n, full_gbps):
    from ahocorasick_tpu import AhoCorasick
    from ahocorasick_tpu.ops.cascade import CascadeEngine, _cascade_jit

    eng = CascadeEngine(l10, False)
    # Pre-seed the adaptive caps (measured on this corpus: ~500k coarse
    # candidates at q=8, ~570k expansion rows, ~51k matches per 16 MiB)
    # so the first dispatch compiles at the settled shapes instead of
    # paying several cap-escalation recompiles through the tunnel.
    eng._caps = {"c": 1 << 19, "e": 1 << 20, "m": 1 << 18}
    ph = eng.prepare(hs)
    got = eng.count_matches(ph)
    # The production host alternative on the same shape, for context:
    # a 43k-word automaton is ~130 MB of transitions, so the walk is
    # DRAM-latency-bound like the 123k row.
    acn = AhoCorasick(l10, device_threshold=1 << 62)
    best_n = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acn.count_matches(hs)
        best_n = min(best_n, time.perf_counter() - t0)
    l10_native = n / best_n / 1e9
    log(f"dict-english-l10: native walk {best_n*1e3:.1f} ms "
        f"({l10_native:.3f} GB/s)")
    wp, we = native_overlapping_pairs(l10, hs, False)
    assert got == len(wp), (got, len(wp))
    gp, ge = eng.match_pairs(ph)
    assert np.array_equal(gp, wp) and np.array_equal(ge, we), \
        "dict-english-l10 TPU extraction triple parity failure"
    log(f"dict-english-l10: TPU triple parity OK ({len(wp)} matches)")
    cap_c, cap_e, cap_m = eng.last_caps
    t = eng.tables
    dv = t.device_args()
    n_dev = jnp.int32(ph.n)
    log(f"dict-english-l10: K={t.coarse.k} prefixes={t.num_prefixes} "
        f"caps c={cap_c} e={cap_e} m={cap_m}")
    fnc = _cascade_jit(t.coarse.baked_key(), t.meta_key(), t.coarse.k,
                       ph.L, ph.Lc, eng.halo, ph.tiles, False)
    chained_c = make_chained(
        jax, jnp, lambda halo, body, u8f:
        fnc(halo, body, u8f, n_dev, dv, cap_c=cap_c, cap_e=cap_e)[2],
        body_idx=1)
    per = slope_time(jax, chained_c, (ph.halo_a, ph.body, ph.u8f),
                     lambda r: got * r, r_hi=12, label="dict-l10-count")
    fne = _cascade_jit(t.coarse.baked_key(), t.meta_key(), t.coarse.k,
                       ph.L, ph.Lc, eng.halo, ph.tiles, True)

    def call_e(halo, body, u8f):
        _nc, _ne, total, opid, oend = fne(
            halo, body, u8f, n_dev, dv,
            cap_c=cap_c, cap_e=cap_e, cap_m=cap_m)
        return total + opid[0] + oend[-1].astype(jnp.int32)

    chained_e = make_chained(jax, jnp, call_e, body_idx=1)
    per_e = slope_time(jax, chained_e, (ph.halo_a, ph.body, ph.u8f),
                       lambda r: None, r_hi=12, label="dict-l10-extract")
    return full_gbps, n / per / 1e9, n / per_e / 1e9, l10_native


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
    ph = eng.prepare(hs)
    got = eng.count_matches(ph)
    assert got == expect, (got, expect)
    cap_c, _ = eng.last_caps
    # Bind the tables AFTER the adaptive count: candidate-dense inputs
    # escalate the plan level (dict15 goes K=6 -> 11), and timing the
    # pre-escalation tables at the settled cap overflows the candidate
    # select and undercounts.
    t = eng.tables
    log(f"{label}: buckets={t.num_buckets} K={t.k} level={eng.level} "
        f"W={eng.dv.W} cap_c={cap_c}")
    fn = F._fp_verified_jit(
        t.baked_key(), eng.dv.key(), t.k, ph.L, ph.Lc, eng.halo,
        ph.tiles, eng.dv.W, False,
    )
    dv_args = eng.dv.device_args()
    n_dev = jnp.int32(ph.n)
    chained = make_chained(
        jax, jnp, lambda halo, body, u8f:
        fn(halo, body, u8f, n_dev, dv_args, cap_c=cap_c)[1],
        body_idx=1)
    per = slope_time(jax, chained, (ph.halo_a, ph.body, ph.u8f),
                     lambda r: expect * r, label=label)
    return len(hs) / per / 1e9


def dict1k_corpus():
    """(patterns, haystack, native count) for the dict1k config
    (BASELINE.json config #3), built once and shared by the count and
    extraction rows."""
    pats = build_dictionary()
    n = 1 << 26
    hs = build_dict_text(n, pats)
    # Exact expectation from the native C++ DFA walk.
    from ahocorasick_tpu import AhoCorasick

    ac = AhoCorasick(pats, ascii_case_insensitive=True, engine="auto",
                     device_threshold=1 << 62)  # force native walk
    want = ac.count_matches(hs)
    log(f"dict1k: native count = {want}")
    return pats, hs, want


def bench_dict1k(jax, jnp, corpus=None):
    """Case-insensitive 1K-pattern dictionary, exact overlapping count
    (BASELINE.json config #3). The reference runs this workload class on
    its bare automaton at ~0.3-0.9 GB/s (no prefilter applies past 64
    patterns, teddy/builder.rs:113)."""
    pats, hs, want = corpus or dict1k_corpus()
    return bench_fp_count(jax, jnp, pats, hs, want, True, "dict1k")


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: kernels recompile only on first-ever
    # run; reruns (and anything this session already compiled) are warm.
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    def guarded(name, fn, *a):
        t0 = time.perf_counter()
        try:
            out = fn(*a)
            log(f"{name}: {out} (wall {time.perf_counter()-t0:.0f}s)")
            return out
        except Exception as e:  # a failing row must not kill the run
            log(f"{name} FAILED after {time.perf_counter()-t0:.0f}s: "
                f"{type(e).__name__}: {e}")
            return None

    t0 = time.perf_counter()
    bitap_gbps = bench_bitap(jax, jnp, patterns, haystack, expect)
    log(f"bitap single-pass: {bitap_gbps:.2f} GB/s "
        f"(wall {time.perf_counter()-t0:.0f}s)")
    t0 = time.perf_counter()
    staged_gbps = bench_staged(jax, jnp, patterns, haystack, expect)
    log(f"staged two-pass: {staged_gbps:.2f} GB/s "
        f"(wall {time.perf_counter()-t0:.0f}s)")
    extract_gbps = guarded(
        "5-pattern extract (fp fused)", bench_fp_extract,
        jax, jnp, patterns, haystack, expect, False, "extract-5pat",
        brute_pairs(patterns, haystack),
    )
    corpus1k = dict1k_corpus()
    t0 = time.perf_counter()
    dict1k_gbps = bench_dict1k(jax, jnp, corpus1k)
    log(f"dict1k fused count: {dict1k_gbps:.2f} GB/s "
        f"(wall {time.perf_counter()-t0:.0f}s)")
    dict1k_ext = guarded(
        "dict1k extract", bench_fp_extract,
        jax, jnp, corpus1k[0], corpus1k[1], corpus1k[2], True,
        "dict1k-extract",
    )
    d100k = guarded("dict100k", bench_dict100k, jax, jnp)
    deng = guarded("dict-english", bench_dict_english, jax, jnp)
    sher = guarded("sherlock-real", bench_sherlock_real, jax, jnp)

    gbps = max(staged_gbps, bitap_gbps)
    rnd = lambda x: None if x is None else round(x, 2)
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
                "extract_5pat_gbps": rnd(extract_gbps),
                "dict1k_case_insensitive_gbps": round(dict1k_gbps, 2),
                "dict1k_extract_gbps": rnd(dict1k_ext),
                "dict100k_count_gbps": rnd(d100k[0] if d100k else None),
                "dict100k_extract_gbps": rnd(d100k[1] if d100k else None),
                "dict_english_123k_native_gbps": rnd(
                    deng[0] if deng else None),
                "dict_english_l10_count_gbps": rnd(
                    deng[1] if deng else None),
                "dict_english_l10_extract_gbps": rnd(
                    deng[2] if deng else None),
                "dict_english_l10_native_gbps": rnd(
                    deng[3] if deng else None),
                "sherlock_realcorpus_us": rnd(sher[0] if sher else None),
                "sherlock_realcorpus_gbps": rnd(sher[1] if sher else None),
                "ref_sherlock_realcorpus_us": 11.67,
                "slope_spread_pct": SPREADS,
            }
        )
    )


if __name__ == "__main__":
    main()
