"""Bucketed fingerprint filter — the TPU engine for large pattern sets.

Pattern sets beyond the exact bit-parallel engine's bounds (> 2048 total
pattern bytes, e.g. a 1K-word dictionary) cannot carry one chain bit per
pattern byte. This engine generalizes the reference's Teddy design
(/root/reference/src/packed/teddy/builder.rs:122, generic.rs:228-379 —
bucketed fingerprint masks + verification) into the same gather-free
shift-AND Pallas kernel the exact engine uses (ops/bitap.py):

  1. *Filter.* Patterns are grouped into buckets of a few patterns each;
     a bucket contributes ONE chain of length ``m = min(len, 8)`` whose
     per-position charmask is the OR of its members' byte (nybble)
     masks. All bucket chains bin-pack into K = O(#buckets/4) limbs —
     for 1000 patterns K≈16 versus the ≈250 limbs exact chains would
     need. Unlike the reference's fixed N ≤ 4 fingerprint bytes
     (teddy/builder.rs:122), chains are variable-length per bucket (up
     to 8 bytes), and buckets are formed from a *sorted* pattern order
     so members share prefixes and the OR'd masks stay narrow.
  2. *Candidate bitmap.* The kernel emits one bit per haystack position
     ("some bucket's fingerprint ends here") — n/8 bytes of output
     regardless of K — plus a candidate count. Set words are compacted
     on device; only O(#candidates) data crosses the link.
  3. *Exact verification.* Candidate positions resolve to matches ON
     DEVICE (DeviceVerify): succinct rank/select turns the bitmap into
     positions (ops/compaction.py), each position extracts a window via
     one strided-row gather, per length class the fingerprint bytes
     hash into a cuckoo table whose slot holds the whole pattern group
     as one packed row (pattern bytes + pids + lens), and full-pattern
     byte compares confirm — so hash collisions and filter false
     positives cost time, never correctness. This is Teddy's verify64
     (generic.rs:820-870) rebuilt from ops a TPU is fast at: row
     gathers (~10 ns/row), element gathers (~3 ns), and wide vector
     compares — never jnp.nonzero/searchsorted/byte-gathers, which
     lower 1-2 orders of magnitude slower (measured; see
     experiments/gather_micro.py). Small inputs and oversized patterns
     verify on the host instead (VerifyIndex, vectorized numpy).

Plans adapt at runtime: the engine starts at the cheapest filter level
(PLAN_LEVELS limb budgets) and escalates to finer buckets only when the
measured candidate rate on real input demands it; candidate-dense
(hostile) inputs fall back to the native walk via the facade.

The output is the complete overlapping (pattern, end) match set in the
reference's report order — identical contract to BitapEngine.match_pairs,
so every match-semantics filter (semantics.py) works unchanged.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitap import (
    LANES,
    R,
    _emit_mux_const,
    _interpret,
    _mux16,
    _pow2,
    pack_chains,
)

FP_LEN = 8          # fingerprint bytes per bucket chain (cap)
FP_BAKED_MIN = 1 << 20  # bake tables into the kernel above this size
# Below this haystack size candidates verify on the host (numpy): the
# device-verify pipeline's jit is specialized per verify-table shape,
# which only pays off on large scans.
FP_DV_MIN = 1 << 18
K_TARGET = 16       # preferred limb budget (kernel cost is ~linear in K)
K_MAX = 64          # absolute limb bound (beyond: host-walk fallback)
# Candidate positions above max(CAND_FLOOR, n >> CAND_SHIFT) mark the
# workload filter-hostile: verification would dominate, so the facade
# falls back to the native walk for subsequent calls.
CAND_FLOOR = 1 << 16
CAND_SHIFT = 3


def _fold(p: bytes) -> bytes:
    return bytes(b | 0x20 if 0x41 <= b <= 0x5A else b for b in p)


def _fold_arr(a: np.ndarray) -> np.ndarray:
    return np.where((a >= 65) & (a <= 90), a | 32, a).astype(np.uint8)


def _mclass(n: int) -> int:
    """Fingerprint length class of a pattern of length n.

    Classes are {1, 2, 3, 4, 8}: patterns of length 4..7 share the
    4-byte class so verification probes at most two hash tables per
    candidate (per-class probes dominate the verify cost); length >= 8
    keeps the full 8-byte fingerprint for selectivity."""
    return n if n <= 4 else (4 if n < FP_LEN else FP_LEN)


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------
def strong_pad_byte(patterns: List[bytes],
                    case_insensitive: bool) -> Optional[int]:
    """A byte whose lo OR hi nybble no pattern byte uses: its charmask
    is zero under ANY bucketing, so one packed haystack (padded with
    it) serves every plan level."""
    vals = np.frombuffer(b"".join(patterns), np.uint8)
    if case_insensitive:
        alpha = (vals | 0x20)
        vals = np.concatenate([
            vals,
            np.where((alpha >= 0x61) & (alpha <= 0x7A),
                     vals ^ 0x20, vals),
        ])
    los = np.zeros(16, bool)
    his = np.zeros(16, bool)
    los[np.unique(vals & 15)] = True
    his[np.unique(vals >> 4)] = True
    for b in range(256):
        if not los[b & 15] or not his[b >> 4]:
            return b
    return None


class FingerprintTables:
    """Bucketed chain masks in the bitap kernel's (lo, hi, start, end)
    table format, plus the bucket plan used to pick K."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool,
                 k_budget: int = K_MAX, exact_classes: bool = False):
        assert patterns and all(len(p) > 0 for p in patterns)
        self.case_insensitive = case_insensitive
        plan = plan_buckets(patterns, case_insensitive, k_budget,
                            exact_classes)
        assert plan is not None, "caller must check eligibility"
        buckets, offsets, K = plan
        self.num_buckets = len(buckets)
        self.k = K
        self.max_chain = max(m for m, _ in buckets)
        lo = np.zeros((K, 16), np.uint32)
        hi = np.zeros((K, 16), np.uint32)
        start = np.zeros(K, np.uint32)
        end = np.zeros(K, np.uint32)
        for (m, pids), o in zip(buckets, offsets):
            start[o // 32] |= np.uint32(1 << (o % 32))
            e = o + m - 1
            end[e // 32] |= np.uint32(1 << (e % 32))
            for pid in pids:
                p = patterns[pid]
                for j in range(m):
                    ch = p[j]
                    g = o + j
                    if case_insensitive and 0x61 <= (ch | 0x20) <= 0x7A:
                        variants = {ch | 0x20, ch & ~0x20}
                    else:
                        variants = {ch}
                    for v in variants:
                        lo[g // 32, v & 15] |= np.uint32(1 << (g % 32))
                        hi[g // 32, v >> 4] |= np.uint32(1 << (g % 32))
        self.lo = lo.view(np.int32)
        self.hi = hi.view(np.int32)
        self.start = start.view(np.int32)
        self.end = end.view(np.int32)
        self.pad_byte: Optional[int] = None
        for b in range(256):
            if not (lo[:, b & 15] & hi[:, b >> 4]).any():
                self.pad_byte = b
                break

    def baked_key(self):
        return (
            tuple(map(tuple, self.lo.tolist())),
            tuple(map(tuple, self.hi.tolist())),
            tuple(self.start.tolist()),
            tuple(self.end.tolist()),
        )

    def device_args(self):
        return (
            jnp.asarray(self.lo),
            jnp.asarray(self.hi),
            jnp.asarray(self.start),
            jnp.asarray(self.end),
        )


# Selectivity model for bucket planning: the probability that a text
# byte passes a chain position's nybble-product mask is estimated as
# |product set ∩ text alphabet| / |text alphabet|, with the text
# alphabet modeled as the bytes the patterns themselves use (plus
# space) — dictionaries are searched in text drawn from the same
# alphabet. The planner keeps the estimated per-position candidate
# probability under CAND_BUDGET.
CAND_BUDGET = 0.003
# A plan whose FINEST affordable bucketing still passes more than this
# fraction of modeled positions is declared structurally filter-hostile
# (None): every candidate costs gather+probe work downstream, so a
# saturated filter would run BELOW the plain host walk. This is the
# measured boundary for the reference's full 123k-word English
# dictionary (18,038 distinct coarse prefixes, 1.31 true matches per
# byte on opensubtitles en-sampled — 74% of them from its 52
# single-character words), where no 2048-bit mask budget discriminates.
SATURATION = 0.5


def _model_alphabet(folded) -> np.ndarray:
    seen = {0x20}
    for p in folded:
        seen.update(p)
    return np.array(sorted(seen), np.uint8)


def _class_prob(folded, pids_sorted, m, b, case_insensitive,
                alphabet) -> float:
    """Estimated per-position candidate probability contributed by class
    m when sliced into buckets of ~b members (sorted order)."""
    nb = -(-len(pids_sorted) // b)
    total = 0.0
    alo = alphabet & 15
    ahi = alphabet >> 4
    asize = max(len(alphabet), 1)
    for chunk in np.array_split(np.asarray(pids_sorted, np.int64), nb):
        prob = 1.0
        for j in range(m):
            los, his = set(), set()
            for pid in chunk:
                ch = folded[pid][j]
                vs = {ch}
                if case_insensitive and 0x61 <= (ch | 0x20) <= 0x7A:
                    vs = {ch | 0x20, ch & ~0x20}
                for v in vs:
                    los.add(v & 15)
                    his.add(v >> 4)
            hits = int(np.sum(
                np.isin(alo, list(los)) & np.isin(ahi, list(his))
            ))
            prob *= min(1.0, max(hits, 1) / asize)
        total += prob
    return total


def plan_buckets(patterns: List[bytes], case_insensitive: bool,
                 k_budget: int = K_MAX, exact_classes: bool = False):
    """Group patterns into fingerprint buckets and pack their chains.

    Returns (buckets, offsets, K) with buckets = [(chain_len, [pid])],
    or None when every bucketing that fits the k_budget limb budget is
    modeled filter-saturated (SATURATION) — fit itself is always
    reachable by coarsening, so None now means "structurally hostile",
    not "too many patterns". Patterns
    are grouped by chain length class m (see _mclass) and sorted
    (folded) so bucket members share prefixes; per-class bucket sizes
    start coarse (cheapest kernel) and halve greedily — worst
    estimated-selectivity class first — until the modeled candidate
    probability fits CAND_BUDGET or the limb budget is exhausted.
    This is the planning analog of Teddy's bucket-quality heuristics
    (teddy/builder.rs:113-177, generic.rs:770-808) driven by an explicit
    false-positive model instead of fixed bucket counts. The engine
    holds a LADDER of plans (PLAN_LEVELS) and escalates to a finer,
    costlier filter only when the measured candidate rate on real input
    demands it."""
    folded = [_fold(p) if case_insensitive else p for p in patterns]
    classes = {}
    grouped = defaultdict(list)
    # exact_classes: chain length = full pattern length (the cascade's
    # coarse prefixes NEED end-position alignment at exactly len(p)-1;
    # _mclass would truncate a 6-byte prefix chain to 4 bytes and break
    # the probe geometry). The fingerprint engine keeps _mclass so its
    # verify probes stay at <= 2 tables per candidate.
    for pid, p in enumerate(folded):
        m = len(p) if exact_classes else _mclass(len(p))
        grouped[m].append(pid)
    for m, pids in grouped.items():
        classes[m] = sorted(pids, key=lambda i: folded[i][:m])

    bsize = {m: 64 for m in classes}

    def k_of(bs):
        lens = []
        for m, pids in classes.items():
            nb = -(-len(pids) // bs[m])
            lens += [m] * nb
        return pack_chains(lens, decollide=False)[1]

    # Coarsen until the limb budget fits: prefix-diverse sets (the
    # reference's real dictionaries run to 18k+ distinct 4-byte
    # prefixes) start over budget at bucket size 64, so the planner
    # doubles the heaviest class's bucket size until the chains pack —
    # the exact probes downstream absorb the extra false positives, and
    # the SATURATION test below rejects plans too coarse to be filters.
    while k_of(bsize) > k_budget:
        cands = [m for m in classes if bsize[m] < len(classes[m])]
        if not cands:
            return None
        m = max(
            cands, key=lambda m: -(-len(classes[m]) // bsize[m]) * m
        )
        bsize[m] *= 2
    alphabet = _model_alphabet(folded)
    probs = {
        m: _class_prob(folded, classes[m], m, bsize[m], case_insensitive,
                       alphabet)
        for m in classes
    }
    while sum(probs.values()) > CAND_BUDGET:
        # Halve the worst offender that still fits the limb budget.
        for m in sorted(probs, key=lambda m: -probs[m]):
            if bsize[m] == 1:
                continue
            trial = dict(bsize)
            trial[m] = bsize[m] // 2
            if k_of(trial) <= k_budget:
                bsize = trial
                probs[m] = _class_prob(
                    folded, classes[m], m, bsize[m], case_insensitive,
                    alphabet
                )
                break
        else:
            break  # budget exhausted: best effort, hostile guard covers
    if sum(probs.values()) > SATURATION:
        return None  # structurally filter-hostile (see SATURATION)
    buckets = []
    for m in sorted(classes):
        pids = classes[m]
        nb = -(-len(pids) // bsize[m])
        for chunk in np.array_split(np.asarray(pids, np.int64), nb):
            buckets.append((m, chunk.tolist()))
    offsets, K = pack_chains([m for m, _ in buckets], decollide=False)
    return buckets, offsets, K


# ---------------------------------------------------------------------------
# Kernels: candidate bitmap output (1 bit per position)
# ---------------------------------------------------------------------------
def _bitmap_step_wrapper(K, Wc, body_ref, bmp_ref, advance, pos_of, masked):
    """Shared body loop: advance per byte, OR any-bucket end hits into a
    32-position accumulator, flush to the bitmap every 8 words."""

    def step(w, carry):
        ms, accb, cnt = carry
        word = body_ref[w]
        for jj in range(4):
            b = lax.shift_right_logical(word, 8 * jj) & 255
            ms, anyhit = advance(ms, b)
            if anyhit is not None:
                hit01 = jnp.where(anyhit != 0, 1, 0)
                if masked is not None:
                    hit01 = jnp.where(masked(pos_of(w, jj)), hit01, 0)
                shift = (w % 8) * 4 + jj
                accb = accb | (hit01 << shift)
                cnt = cnt + hit01

        @pl.when(w % 8 == 7)
        def _flush():
            bmp_ref[0, w // 8] = accb

        accb = jnp.where(w % 8 == 7, 0, accb)
        return ms, accb, cnt

    return step


def _make_fp_kernel(K: int, L: int, Lc: int, H: int):
    """Table-generic (SMEM tables) bitmap kernel with position masking."""
    Wc = Lc // 4
    Hw = H // 4

    def kernel(lo_ref, hi_ref, sm_ref, em_ref, nn_ref,
               halo_ref, body_ref, cnt_ref, bmp_ref, ms_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        stream = (i * R + row) * 128 + col
        n0 = nn_ref[0]
        n = nn_ref[1]
        LO = [[lo_ref[k, v] for v in range(16)] for k in range(K)]
        HI = [[hi_ref[k, v] for v in range(16)] for k in range(K)]
        SM = [sm_ref[k] for k in range(K)]
        EM = [em_ref[k] for k in range(K)]

        def advance(ms, b):
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms = []
            anyhit = None
            carry = jnp.zeros((R, 128), jnp.int32)
            for k in range(K):
                cm = _mux16(bits[:4], LO[k]) & _mux16(bits[4:], HI[k])
                nm = ((ms[k] << 1) | carry | SM[k]) & cm
                carry = lax.shift_right_logical(ms[k], 31) & 1
                nms.append(nm)
                h = nm & EM[k]
                anyhit = h if anyhit is None else anyhit | h
            return nms, anyhit

        @pl.when(j == 0)
        def _warmup():
            def hstep(w, ms):
                word = halo_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms, _ = advance(ms, b)
                return ms
            z = [jnp.zeros((R, 128), jnp.int32)] * K
            ms = lax.fori_loop(0, Hw, hstep, z) if Hw else z
            first = stream == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        pos_base = stream * L + j * Lc

        step = _bitmap_step_wrapper(
            K, Wc, body_ref, bmp_ref, advance,
            pos_of=lambda w, jj: pos_base + (w * 4 + jj),
            masked=lambda pos: (pos >= n0) & (pos < n),
        )
        ms0 = [ms_ref[k] for k in range(K)]
        accb0 = jnp.zeros((R, 128), jnp.int32)
        ms, _, cnt = lax.fori_loop(0, Wc, step, (ms0, accb0, cnt_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = cnt

    return kernel


def _make_fp_baked_kernel(lo_c, hi_c, sm_c, em_c, K: int, Lc: int, H: int):
    """Constant-baked bitmap kernel (requires pad-byte padding)."""
    Wc = Lc // 4
    Hw = H // 4

    def _or_all(vals):
        acc = 0
        for v in vals:
            acc |= int(v) & 0xFFFFFFFF
        return acc

    carry_in = [False] + [
        bool(_or_all(lo_c[k]) & _or_all(hi_c[k]) & 1)
        and not (int(sm_c[k]) & 1)
        for k in range(1, K)
    ]

    def kernel(halo_ref, body_ref, cnt_ref, bmp_ref, ms_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def advance(ms, b):
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms = []
            anyhit = None
            carry = None
            for k in range(K):
                lo_t = _emit_mux_const(bits[:4], lo_c[k])
                hi_t = _emit_mux_const(bits[4:], hi_c[k])
                cm = None if lo_t is None or hi_t is None else lo_t & hi_t
                v = ms[k] << 1
                if carry_in[k] and carry is not None:
                    v = v | carry
                if int(sm_c[k]):
                    v = v | sm_c[k]
                nm = (v & cm) if cm is not None else jnp.zeros(
                    (R, 128), jnp.int32
                )
                if k + 1 < K and carry_in[k + 1]:
                    carry = lax.shift_right_logical(ms[k], 31) & 1
                else:
                    carry = None
                nms.append(nm)
                if em_c[k]:
                    h = nm & em_c[k]
                    anyhit = h if anyhit is None else anyhit | h
            return nms, anyhit

        @pl.when(j == 0)
        def _warmup():
            def hstep(w, ms):
                word = halo_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms, _ = advance(ms, b)
                return ms
            z = [jnp.zeros((R, 128), jnp.int32)] * K
            ms = lax.fori_loop(0, Hw, hstep, z) if Hw else z
            row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            first = ((i * R + row) * 128 + col) == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        step = _bitmap_step_wrapper(
            K, Wc, body_ref, bmp_ref, advance,
            pos_of=None, masked=None,
        )
        ms0 = [ms_ref[k] for k in range(K)]
        accb0 = jnp.zeros((R, 128), jnp.int32)
        ms, _, cnt = lax.fori_loop(0, Wc, step, (ms0, accb0, cnt_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = cnt

    return kernel


def _fp_pallas(kernel, generic_args, halo, body, K, L, Lc, tiles, Hw):
    nchunks = L // Lc
    Wc = Lc // 4
    in_specs = []
    if generic_args is not None:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
    in_specs += [
        pl.BlockSpec((max(Hw, 1), R, 128), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lc // 32, R, 128), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32),
        jax.ShapeDtypeStruct((tiles, L // 32, R, 128), jnp.int32),
    ]
    args = (*(generic_args or ()), halo, body)
    return pl.pallas_call(
        kernel,
        grid=(tiles, nchunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
        interpret=_interpret(),
    )(*args)


def _rank_select(bmp, L: int, cap: int):
    """Candidate positions = the first `cap` set bits of the bitmap
    (succinct rank/select, see ops/compaction.py — replaces
    jnp.nonzero, measured 18.9 ms vs ~2 ms for 2M words).

    Returns (total set bits, e_pos[cap] int32 positions, live[cap]).
    """
    from .compaction import select_set_bits

    ncand, widx, bitpos, live = select_set_bits(bmp.reshape(-1), cap)
    # Decode the flat [tiles, L//32, R, 128] word index to a position.
    c = widx % 128
    r = (widx // 128) % R
    t32 = (widx // (128 * R)) % (L // 32)
    tile = widx // (128 * R * (L // 32))
    stream = (tile * R + r) * 128 + c
    e_pos = stream * L + t32 * 32 + bitpos
    return ncand, e_pos, live


@functools.lru_cache(maxsize=64)
def _fp_baked_jit(tables_key, K: int, L: int, Lc: int, H: int, tiles: int):
    kernel = _make_fp_baked_kernel(*tables_key, K, Lc, H)

    def fn(halo, body, cap):
        cnt, bmp = _fp_pallas(kernel, None, halo, body,
                              K, L, Lc, tiles, H // 4)
        return _rank_select(bmp, L, cap)

    return jax.jit(fn, static_argnames=("cap",))


@functools.partial(
    jax.jit, static_argnames=("K", "L", "Lc", "H", "tiles", "cap")
)
def _fp_call(lo, hi, sm, em, halo, body, nn,
             K: int, L: int, Lc: int, H: int, tiles: int, cap: int):
    kernel = _make_fp_kernel(K, L, Lc, H)
    cnt, bmp = _fp_pallas(kernel, (lo, hi, sm, em, nn), halo, body,
                          K, L, Lc, tiles, H // 4)
    return _rank_select(bmp, L, cap)


# ---------------------------------------------------------------------------
# Device-side exact verification
# ---------------------------------------------------------------------------
W_MAX = 64      # device-verify window bytes (max pattern length it covers)
GMAX_CAP = 16   # max patterns sharing one fingerprint before host fallback


def _build_cuckoo(keys: List[int], rng) -> Tuple[int, int, int, np.ndarray]:
    """2-choice cuckoo placement of distinct uint32 keys.

    Returns (mult_a, mult_b, logT, slot_of_key[i]) — lookup probes the
    two slots ((h * mult) >> (32 - logT)) and compares stored keys, so a
    membership test is two 3ns element gathers instead of a binary
    search (searchsorted measured ~60ns/element on TPU).

    Placement is the vectorized peeling construction (the cuckoo graph
    at load 1/4 has an empty 2-core whp): repeatedly assign every key
    one of whose two slots is wanted by no other unassigned key, in
    O(rounds) bincount passes — 100k keys place in milliseconds where
    the sequential random-walk insertion took seconds."""
    n = max(len(keys), 1)
    nk = len(keys)
    logT = max((4 * n - 1).bit_length(), 4)
    karr = np.array(keys, np.uint64)
    for _ in range(64):
        T = 1 << logT
        a = int(rng.integers(1, 1 << 32)) | 1
        b = int(rng.integers(1, 1 << 32)) | 1
        s1 = (((karr * a) & 0xFFFFFFFF) >> (32 - logT)).astype(np.int64)
        s2 = (((karr * b) & 0xFFFFFFFF) >> (32 - logT)).astype(np.int64)
        slot = np.full(nk, -1, np.int64)
        alive = np.ones(nk, bool)
        self_double = s1 == s2  # one effective choice, counted twice
        while alive.any():
            occ = (np.bincount(s1[alive], minlength=T)
                   + np.bincount(s2[alive], minlength=T))
            one1 = occ[s1] == np.where(self_double, 2, 1)
            one2 = occ[s2] == np.where(self_double, 2, 1)
            pick = alive & (one1 | one2)
            if not pick.any():
                break  # nonempty 2-core: resample hashes
            slot[pick] = np.where(one1[pick], s1[pick], s2[pick])
            alive &= ~pick
        if not alive.any():
            return a, b, logT, slot
        logT += 1
    raise ValueError("cuckoo placement failed")


class DeviceVerify:
    """Device-resident candidate->match resolution tables.

    Each candidate position extracts a W-byte window anchored at its
    fingerprint start (two fast row gathers + a 5-bit shift-mux — TPU
    element gathers are ~400x slower than row gathers, measured); per
    length class the fingerprint bytes hash (32-bit polynomial,
    collision-free over the stored keys by build-time retry) into a
    cuckoo table whose entry lists the patterns sharing that
    fingerprint; each listed pattern is byte-compared against the
    window. The final compare covers the WHOLE pattern, so even a stray
    hash collision can only cost time, never correctness. This replaces
    the host verify loop with O(#candidates) pure-XLA work — the TPU
    analog of Teddy's verify64 (teddy/generic.rs:820-870).
    """

    @staticmethod
    def supports(patterns: List[bytes]) -> bool:
        return max(len(p) for p in patterns) <= W_MAX

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        assert self.supports(patterns)
        folded = [_fold(p) if case_insensitive else p for p in patterns]
        # A class-c pattern occupies window columns [FP_LEN - c,
        # FP_LEN - c + len): a length-6 pattern in class 4 reaches col 9,
        # so the window must cover FP_LEN - c + len, NOT just len —
        # max(FP_LEN, max_len) silently truncated the tail compare of
        # length 5-7 patterns whenever no longer pattern stretched the
        # window (caught on the reference's own name-alt1 set, where
        # "Street" matched "Streatham": cols 8-9 were never compared).
        self.W = max(
            FP_LEN,
            max(FP_LEN - _mclass(len(p)) + len(p) for p in patterns),
        )
        W = self.W
        plens = np.array([len(p) for p in patterns], np.int64)
        self.plens = plens
        m_arr = np.array([_mclass(int(x)) for x in plens], np.int64)
        # Per length class: hashed cuckoo table of class-c prefixes.
        # Each slot stores its whole pattern GROUP as one concatenated
        # row (gmax patterns x W bytes + masks + lens + pids), so
        # resolving a candidate costs ONE row gather per class
        # regardless of group size (TPU row gathers are ~10ns/row
        # independent of width).
        groups = defaultdict(list)
        for pid, p in enumerate(folded):
            groups[int(m_arr[pid])].append(pid)
        self.classes = {}
        rng = np.random.default_rng(0xAC)
        for c, pids in groups.items():
            keymap = defaultdict(list)
            for pid in pids:
                keymap[folded[pid][:c]].append(pid)
            keys = sorted(keymap)
            gmax = max(len(v) for v in keymap.values())
            if gmax > GMAX_CAP:
                raise ValueError("fingerprint group too large")
            for _ in range(64):
                mult = np.uint32(int(rng.integers(1, 1 << 32)) | 1)
                hs = np.zeros(len(keys), np.uint32)
                for j in range(c):
                    hs = hs * mult + np.array(
                        [k[j] for k in keys], np.uint32
                    )
                if len(np.unique(hs)) == len(keys):
                    break
            else:
                raise ValueError("no collision-free hash multiplier")
            a, b, logT, slot = _build_cuckoo(hs.tolist(), rng)
            T = 1 << logT
            tkeys = np.zeros(T, np.uint32)  # 0 never matches: see below
            # Packed group row: [gmax*W pattern bytes][gmax*4 pid LE]
            # [gmax*4 len LE]; dontcare masks derive from the lens on
            # device. ONE row gather resolves a candidate's whole group.
            grow = np.zeros((T, gmax * (W + 8)), np.uint8)
            gpid = np.full((T, gmax), -1, np.int32)
            glen = np.zeros((T, gmax), np.int32)
            off = FP_LEN - c  # pattern start offset within the window
            for i, key in enumerate(keys):
                si = slot[i]
                tkeys[si] = hs[i]
                for s, pid in enumerate(keymap[key]):
                    p = folded[pid]
                    gpid[si, s] = pid
                    glen[si, s] = len(p)
                    grow[si, s * W + off:s * W + off + len(p)] = (
                        np.frombuffer(p, np.uint8)
                    )
            grow[:, gmax * W:gmax * (W + 4)] = (
                gpid.astype("<i4").view(np.uint8).reshape(T, -1)
            )
            grow[:, gmax * (W + 4):] = (
                glen.astype("<i4").view(np.uint8).reshape(T, -1)
            )
            # Empty slots hold key 0; a real key hashing to 0 would
            # false-positive into pid -1, which the pid>=0 mask drops.
            self.classes[c] = (mult, np.uint32(a), np.uint32(b), logT,
                               tkeys, gmax, grow)
        self._dev = None

    def device_args(self):
        if self._dev is None:
            self._dev = {
                "classes": {
                    c: (jnp.uint32(m), jnp.uint32(a), jnp.uint32(b),
                        jnp.asarray(tk), jnp.asarray(gr))
                    for c, (m, a, b, logT, tk, gmax, gr)
                    in self.classes.items()
                },
            }
        return self._dev

    def key(self):
        """Hashable SHAPE identity for jit caching — values are traced
        (device_args), so one compile serves every pattern set with the
        same window and class-table shapes."""
        return (
            self.W,
            tuple(sorted(
                (c, logT, gmax)
                for c, (m, a, b, logT, tk, gmax, gr)
                in self.classes.items()
            )),
        )


def _device_verify(wnd, e_pos, live, n, dv_args, W, extract, cap_m,
                   meta):
    """Resolve candidate windows to matches on device.

    wnd: [C, W] uint8 windows anchored at e_pos - (FP_LEN - 1);
    live: [C] bool validity. Returns total match count and, in extract
    mode, compacted (flat_slot_index, pid, end) arrays of size cap_m.
    """
    total = jnp.int32(0)
    oks, pids_s, ends_s = [], [], []
    C = wnd.shape[0]
    for c, (mult, ha, hb, tkeys, grow) in sorted(
        dv_args["classes"].items()
    ):
        logT, gmax = meta[c]
        W = grow.shape[1] // gmax - 8
        h = jnp.zeros(C, jnp.uint32)
        for j in range(FP_LEN - c, FP_LEN):
            h = h * mult + wnd[:, j].astype(jnp.uint32)
        # Cuckoo membership: two element gathers + compares.
        sh = jnp.uint32(32 - logT)
        s1 = ((h * ha) >> sh).astype(jnp.int32)
        s2 = ((h * hb) >> sh).astype(jnp.int32)
        use1 = jnp.take(tkeys, s1) == h
        use2 = jnp.take(tkeys, s2) == h
        gi = jnp.where(use1, s1, s2)
        hit = (use1 | use2) & live
        sp = e_pos - (c - 1)  # candidate match start for this class
        # ONE row gather: the slot's packed pattern group.
        row = jnp.take(grow, gi, axis=0)
        rows_p = row[:, :gmax * W].reshape(C, gmax, W)

        def le32(seg):  # [C, gmax, 4] uint8 -> int32 little-endian
            s32 = seg.astype(jnp.int32)
            return (s32[..., 0] | (s32[..., 1] << 8)
                    | (s32[..., 2] << 16) | (s32[..., 3] << 24))

        pids = le32(row[:, gmax * W:gmax * (W + 4)].reshape(C, gmax, 4))
        lens = le32(row[:, gmax * (W + 4):].reshape(C, gmax, 4))
        # Compare window bytes inside [off, off+len); outside is
        # dontcare (derived, no mask table needed).
        off = FP_LEN - c
        jpos = jnp.arange(W, dtype=jnp.int32)
        care = (
            (jpos[None, None, :] >= off)
            & (jpos[None, None, :] < off + lens[:, :, None])
        )
        eq = jnp.all((wnd[:, None, :] == rows_p) | ~care, axis=2)
        ok = (
            hit[:, None] & (pids >= 0) & eq
            & (sp >= 0)[:, None] & (sp[:, None] + lens <= n)
        )
        total = total + jnp.sum(ok.astype(jnp.int32))
        if extract:
            oks.append(ok.reshape(-1))
            pids_s.append(pids.reshape(-1))
            ends_s.append((sp[:, None] + lens).reshape(-1))
    if not extract:
        return total, None, None, None
    okm = jnp.concatenate(oks)
    pidm = jnp.concatenate(pids_s)
    endm = jnp.concatenate(ends_s)
    pad = (-okm.shape[0]) % 128
    if pad:
        okm = jnp.concatenate([okm, jnp.zeros(pad, bool)])
        pidm = jnp.concatenate([pidm, jnp.zeros(pad, jnp.int32)])
        endm = jnp.concatenate([endm, jnp.zeros(pad, jnp.int32)])
    from .compaction import select_nonzero_words

    _, mi, _, mlive = select_nonzero_words(okm.astype(jnp.int32), cap_m)
    out_pid = jnp.where(mlive, jnp.take(pidm, mi), -1)
    out_end = jnp.where(mlive, jnp.take(endm, mi), -1)
    return total, total, out_pid, out_end


@functools.lru_cache(maxsize=64)
def _fp_verified_jit(tables_key, dv_key, K: int, L: int, Lc: int, H: int,
                     tiles: int, W: int, extract: bool):
    """Fused (baked kernel): bitmap kernel -> rank-select candidate
    positions -> windowed device verification. One dispatch; only
    scalars (count mode) or O(#matches) pairs (extract mode) leave the
    device. Compiled per pattern set (tables are constants) — used for
    large haystacks; small ones ride the table-generic variant below,
    whose compilation is shared across same-shaped pattern sets."""
    kernel = _make_fp_baked_kernel(*tables_key, K, Lc, H)
    meta = {c: (logT, gmax) for (c, logT, gmax) in dv_key[1]}

    def fn(halo, body, u8f, n, dv_args, cap_c, cap_m=None):
        cnt, bmp = _fp_pallas(kernel, None, halo, body,
                              K, L, Lc, tiles, H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        total, nmatch, out_pid, out_end = _device_verify(
            wnd, e_pos, live, n, dv_args, W, extract, cap_m, meta
        )
        if extract:
            return ncand, total, out_pid, out_end
        return ncand, total

    static = ("cap_c", "cap_m") if extract else ("cap_c",)
    return jax.jit(fn, static_argnames=static)


@functools.lru_cache(maxsize=64)
def _fp_verified_generic_jit(dv_key, K: int, L: int, Lc: int, H: int,
                             tiles: int, W: int, extract: bool):
    """Table-generic fused pipeline: masks in SMEM, verify tables as
    traced arrays — one compile serves every pattern set with the same
    (K, layout, verify-table shapes)."""

    meta = {c: (logT, gmax) for (c, logT, gmax) in dv_key[1]}

    def fn(lo, hi, sm, em, nn, halo, body, u8f, n, dv_args,
           cap_c, cap_m=None):
        kernel = _make_fp_kernel(K, L, Lc, H)
        cnt, bmp = _fp_pallas(kernel, (lo, hi, sm, em, nn), halo, body,
                              K, L, Lc, tiles, H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        total, nmatch, out_pid, out_end = _device_verify(
            wnd, e_pos, live, n, dv_args, W, extract, cap_m, meta
        )
        if extract:
            return ncand, total, out_pid, out_end
        return ncand, total

    static = ("cap_c", "cap_m") if extract else ("cap_c",)
    return jax.jit(fn, static_argnames=static)


class VerifyIndex:
    """Candidate-position -> exact match-set resolution tables.

    Per chain-length class c: sorted uint64 keys of every pattern's
    folded c-byte prefix with a CSR key->pids map; per pattern length
    > FP_LEN: a tail matrix for the vectorized suffix compare."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        self.ci = case_insensitive
        P = len(patterns)
        self.plens = np.array([len(p) for p in patterns], np.int64)
        folded = [
            _fold(p) if case_insensitive else p for p in patterns
        ]
        order = np.lexsort((np.arange(P), -self.plens))
        self.pid_rank = np.empty(P, np.int64)
        self.pid_rank[order] = np.arange(P)
        groups = defaultdict(list)
        for pid, p in enumerate(folded):
            groups[_mclass(len(p))].append(pid)
        self.classes = {}
        for c, pids in groups.items():
            keys = np.array(
                [int.from_bytes(folded[pid][:c], "big") for pid in pids],
                np.uint64,
            )
            o = np.argsort(keys, kind="stable")
            keys_s, pids_s = keys[o], np.array(pids, np.int64)[o]
            uniq, starts = np.unique(keys_s, return_index=True)
            csr_off = np.append(starts, len(keys_s)).astype(np.int64)
            self.classes[c] = (uniq, csr_off, pids_s)
        # Tail matrices for patterns longer than their class prefix,
        # grouped by (class, length); tail bytes start at offset c.
        self.tails = {}
        self.tail_row = np.full(P, -1, np.int64)
        bylen = defaultdict(list)
        for pid, p in enumerate(folded):
            c = _mclass(len(p))
            if len(p) > c:
                bylen[(c, len(p))].append(pid)
        for (c, ln), pids in bylen.items():
            mat = np.stack([
                np.frombuffer(folded[pid], np.uint8)[c:]
                for pid in pids
            ])
            self.tails[(c, ln)] = mat
            self.tail_row[pids] = np.arange(len(pids))

    def verify(
        self, a: np.ndarray, cand: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(pids, ends) of all true matches whose fingerprint ends at a
        candidate position. `a` is the (folded) haystack bytes."""
        n = len(a)
        out_p, out_e = [], []
        for c, (keys, csr_off, csr_pid) in self.classes.items():
            s = cand - (c - 1)
            ss = s[s >= 0]
            if not len(ss):
                continue
            w = a[ss[:, None] + np.arange(c)]
            key = np.zeros(len(ss), np.uint64)
            for j in range(c):
                key = (key << np.uint64(8)) | w[:, j].astype(np.uint64)
            pos = np.searchsorted(keys, key)
            pos_c = np.minimum(pos, max(len(keys) - 1, 0))
            found = keys[pos_c] == key if len(keys) else np.zeros(
                len(key), bool
            )
            gi, sf = pos_c[found], ss[found]
            if not len(gi):
                continue
            cnts = csr_off[gi + 1] - csr_off[gi]
            tot = int(cnts.sum())
            rep = np.repeat(np.arange(len(gi)), cnts)
            base = np.repeat(np.cumsum(cnts) - cnts, cnts)
            within = np.arange(tot) - base
            pid = csr_pid[csr_off[gi][rep] + within]
            st = sf[rep]
            plens = self.plens[pid]
            exact = plens == c
            out_p.append(pid[exact])
            out_e.append(st[exact] + c)
            pid_r, st_r, pl_r = pid[~exact], st[~exact], plens[~exact]
            for ln in np.unique(pl_r):
                ln = int(ln)
                m = pl_r == ln
                pids2, st2 = pid_r[m], st_r[m]
                okb = st2 + ln <= n
                pids2, st2 = pids2[okb], st2[okb]
                if not len(pids2):
                    continue
                mat = self.tails[(c, ln)]
                wt = a[st2[:, None] + np.arange(c, ln)]
                eq = (wt == mat[self.tail_row[pids2]]).all(axis=1)
                out_p.append(pids2[eq])
                out_e.append(st2[eq] + ln)
        if not out_p:
            z = np.zeros(0, np.int64)
            return z, z
        pids = np.concatenate(out_p)
        ends = np.concatenate(out_e)
        order = np.lexsort((self.pid_rank[pids], ends))
        return pids[order], ends[order]


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------
def _vrow(W: int) -> int:
    """Verify-buffer row granularity (window row-gather stride).

    The smallest power of two whose strided layout still covers a
    W-byte window with k <= 2 overlapped row copies: 16 halves both the
    gathered strip width and the shift-mux depth vs 32 for the common
    short-pattern dictionaries (W <= 17), at identical HBM cost (k = 2
    either way)."""
    return 16 if W <= 17 else 32


@functools.partial(jax.jit, static_argnames=("W", "fold"))
def _unpack_fold(x32, W: int, fold: bool):
    """Unpack the int32-packed haystack into the strided verify buffer.

    Layout: FP_LEN zero lead + (optionally case-folded) bytes + guard
    tail, as OVERLAPPING rows of width ceil((V-1+W)/V)*V at stride
    V = _vrow(W) — any W-byte window lies entirely inside the single
    row b0 // V, so window extraction is ONE row gather (TPU element
    gathers measured ~400x slower than row gathers). Costs k x haystack
    bytes of HBM (k = row width / V, typically 2)."""
    V = _vrow(W)
    b = (
        (x32[:, None] >> jnp.array([0, 8, 16, 24], jnp.int32)) & 255
    ).astype(jnp.uint8).reshape(-1)
    if fold:
        b = jnp.where((b >= 65) & (b <= 90), b | 32, b)
    total = b.shape[0]
    k = -(-(V - 1 + W) // V)
    nbase = -(-(FP_LEN + total + W) // V) + k
    buf = jnp.concatenate([
        jnp.zeros(FP_LEN, jnp.uint8), b,
        jnp.zeros(nbase * V - FP_LEN - total, jnp.uint8),
    ])
    base = buf.reshape(-1, V)
    nr = base.shape[0] - k + 1
    return jnp.concatenate(
        [base[t:nr + t] for t in range(k)], axis=1
    )


def _gather_windows(u8f, e_pos, W: int):
    """W-byte windows anchored at e_pos - (FP_LEN - 1): one row gather
    from the strided buffer + a log2(V)-bit shift mux over the in-row
    offset."""
    V = _vrow(W)
    b0 = e_pos + 1  # buffer coordinates (FP_LEN lead pad, -(FP_LEN-1))
    r = b0 // V
    o = b0 % V
    strip = jnp.take(u8f, r, axis=0)
    t = [strip[:, s:s + W] for s in range(V)]
    for bit in range(V.bit_length() - 1):
        onb = ((o >> bit) & 1).astype(bool)[:, None]
        t = [jnp.where(onb, t[2 * m + 1], t[2 * m])
             for m in range(len(t) // 2)]
    return t[0]


class FpHaystack:
    """Device-resident fingerprint-engine layout: upload once, search
    many times (kernel stream-major layout + the verify byte buffer)."""

    __slots__ = ("n", "L", "Lc", "tiles", "baked", "halo_a", "body",
                 "u8f", "hs")

    def __init__(self, n, L, Lc, tiles, baked, halo_a, body, u8f, hs):
        self.n = n
        self.L = L
        self.Lc = Lc
        self.tiles = tiles
        self.baked = baked
        self.halo_a = halo_a
        self.body = body
        self.u8f = u8f
        self.hs = hs


# Filter plan ladder: per-level limb budgets. The engine starts at the
# cheapest level and escalates only when the measured candidate rate on
# real input exceeds ESC (the runtime analog of the reference declaring
# a prefilter inert and re-routing, util/prefilter.rs:163-305 — but in
# the opposite direction: spend more filter only when needed).
# Level-0 starts CHEAP: the denser decollide=False packing lets the
# planner spend many more limbs inside one budget, and the extra
# selectivity is usually wasted (dict1k measured 7.9 GB/s at the K=7
# plan vs 6.8 at the K=11 plan the 12-limb budget now reaches) — the
# escalation ladder exists precisely so real candidate rates, not the
# prior model, buy the finer plans.
PLAN_LEVELS = (8, 12, 24, 48, K_MAX)
ESC_FLOOR = 1 << 14
ESC_SHIFT = 6  # escalate above ~1.6% candidate positions


class FingerprintEngine:
    """Facade-facing engine: complete overlapping match sets for pattern
    sets of arbitrary size (bounded by the K_MAX bucket budget).

    Verification runs on device (DeviceVerify) when every pattern fits
    the W_MAX window, fingerprint groups are small, and a universal pad
    byte exists; otherwise candidates fall back to the host
    VerifyIndex."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        self.patterns = patterns
        self.ci = case_insensitive
        self.pad_byte = strong_pad_byte(patterns, case_insensitive)
        self._tables_cache = {}
        self.level: Optional[int] = None
        for i in range(len(PLAN_LEVELS)):
            t = self._tables(i)
            if t is not None:
                self.level = i
                break
        assert self.level is not None, "caller must check eligibility"
        self.tables = self._tables(self.level)
        self._caps: Dict[str, int] = {}
        self.verif = VerifyIndex(patterns, case_insensitive)
        self.dv: Optional[DeviceVerify] = None
        if DeviceVerify.supports(patterns) and self.pad_byte is not None:
            try:
                self.dv = DeviceVerify(patterns, case_insensitive)
            except ValueError:
                self.dv = None  # oversized groups / no hash: host verify
        self._dev_args = None
        # Chains are at most FP_LEN bytes at every level.
        self.halo = max(_pow2(FP_LEN - 1), 4)
        self.max_pattern_len = int(self.verif.plens.max())
        self.hostile = False  # set when a scan came back candidate-dense

    def _tables(self, lvl: int) -> Optional[FingerprintTables]:
        if lvl not in self._tables_cache:
            if plan_buckets(self.patterns, self.ci,
                            PLAN_LEVELS[lvl]) is None:
                self._tables_cache[lvl] = None
            else:
                self._tables_cache[lvl] = FingerprintTables(
                    self.patterns, self.ci, PLAN_LEVELS[lvl]
                )
        return self._tables_cache[lvl]

    def _escalate(self) -> bool:
        """Move to the next finer plan level; False when maxed out."""
        for nxt in range(self.level + 1, len(PLAN_LEVELS)):
            t = self._tables(nxt)
            if t is not None and t.k > self.tables.k:
                self.level = nxt
                self.tables = t
                self._dev_args = None
                return True
        return False

    def _escalate_limit(self, n: int) -> int:
        return max(ESC_FLOOR, n >> ESC_SHIFT)

    @classmethod
    def eligible(cls, patterns: List[bytes],
                 case_insensitive: bool = False) -> bool:
        if not patterns or any(len(p) == 0 for p in patterns):
            return False
        return plan_buckets(patterns, case_insensitive, K_MAX) is not None

    # ------------------------------------------------------------------
    def _layout(self, n: int) -> Tuple[int, int, int]:
        """Bucketed (L, Lc, tiles); L >= 128 (pow2) so the bitmap flush
        cadence (32 positions) always divides a chunk, tiles rounded to
        <=4 significant bits (bitap._layout_search) to trim padding."""
        from .bitap import _layout_search

        L, tiles = _layout_search(n, self.halo)
        return L, min(L, 512), tiles

    def _pack(self, hs: bytes, L: int, tiles: int, pad: int) -> jax.Array:
        total = tiles * LANES * L
        buf = np.full(total, pad, np.uint8) if pad else np.zeros(
            total, np.uint8
        )
        buf[: len(hs)] = np.frombuffer(hs, np.uint8)
        return jnp.asarray(buf.view(np.int32))

    def _args(self):
        if self._dev_args is None:
            self._dev_args = self.tables.device_args()
        return self._dev_args

    # ------------------------------------------------------------------
    def prepare(self, hs: bytes) -> FpHaystack:
        """Upload a haystack into the device-resident engine layout."""
        from .bitap import _to_stream_major

        n = len(hs)
        L, Lc, tiles = self._layout(max(n, 1))
        # The universal pad byte is valid at every plan level, so one
        # upload serves escalations. Constant-baked kernels are only
        # worth their per-pattern-set compile above FP_BAKED_MIN;
        # smaller inputs share the table-generic compiles.
        baked = self.pad_byte is not None and n >= FP_BAKED_MIN
        x32 = jax.device_put(
            self._pack(hs, L, tiles, self.pad_byte or 0)
        )
        halo_a, body = _to_stream_major(x32, L, tiles, self.halo)
        u8f = None
        if self.dv is not None and n >= FP_DV_MIN:
            u8f = _unpack_fold(x32, self.dv.W, self.ci)
        return FpHaystack(n, L, Lc, tiles, baked, halo_a, body, u8f, hs)

    def _hostile_limit(self, n: int) -> int:
        return max(CAND_FLOOR, n >> CAND_SHIFT)

    def _verified(self, ph: FpHaystack, extract: bool):
        """Fused device pipeline; returns count or (pids, ends), or None
        when hostile. Caps adapt by re-dispatching with larger sizes;
        candidate-dense inputs escalate the filter plan level first."""
        n, L, Lc, tiles = ph.n, ph.L, ph.Lc, ph.tiles
        limit = self._hostile_limit(n)
        esc = self._escalate_limit(n)
        dv_args = self.dv.device_args()
        n_dev = jnp.int32(n)
        # Caps persist per engine instance (grown monotonically): once
        # the first scan settles them, repeated searches run one
        # dispatch — a match-dense input no longer pays 2-3 full scans
        # on every call. The STARTING floor scales with n: the
        # rank-select/window/verify stages cost ~29 ns per cap slot
        # whether or not the slot holds a real candidate (measured,
        # experiments/fp_floor.py: a fixed cap of 8192 put a 282 us
        # floor under every sub-MiB scan — 1.86 GB/s at 512 KiB where
        # cap 512 runs the same pipeline at 11.8 GB/s).
        floor = min(8192, max(512, _pow2(n >> 8)))
        cap_c = max(self._caps.get("c", 0), floor)
        cap_m = max(self._caps.get("m", 0), floor)
        nn = jnp.asarray([0, n], jnp.int32)
        while True:
            t = self.tables
            if ph.baked:
                fn = _fp_verified_jit(
                    t.baked_key(), self.dv.key(), t.k, L, Lc, self.halo,
                    tiles, self.dv.W, extract,
                )
                args = (ph.halo_a, ph.body, ph.u8f, n_dev, dv_args)
            else:
                fn = _fp_verified_generic_jit(
                    self.dv.key(), t.k, L, Lc, self.halo,
                    tiles, self.dv.W, extract,
                )
                args = (*self._args(), nn, ph.halo_a, ph.body, ph.u8f,
                        n_dev, dv_args)
            if extract:
                ncand, total, out_pid, out_end = fn(
                    *args, cap_c=cap_c, cap_m=cap_m,
                )
            else:
                ncand, total = fn(*args, cap_c=cap_c)
            if int(ncand) > esc and self._escalate():
                continue
            if int(ncand) > limit:
                self.hostile = True
                return None
            ok = True
            if int(ncand) > cap_c:
                cap_c = _pow2(int(ncand))
                ok = False
            if extract and int(total) > cap_m:
                cap_m = _pow2(int(total))
                ok = False
            if ok:
                break
        self._caps["c"] = max(self._caps.get("c", 0), cap_c)
        if extract:
            self._caps["m"] = max(self._caps.get("m", 0), cap_m)
        self.last_caps = (cap_c, cap_m if extract else None)
        if not extract:
            return int(total)
        pid = np.asarray(out_pid).astype(np.int64)
        end = np.asarray(out_end).astype(np.int64)
        real = pid >= 0
        pid, end = pid[real], end[real]
        order = np.lexsort((self.verif.pid_rank[pid], end))
        return pid[order], end[order]

    def candidates(self, hs) -> Optional[np.ndarray]:
        """0-based fingerprint-end candidate positions, or None when the
        workload is filter-hostile (caller should fall back)."""
        ph = hs if isinstance(hs, FpHaystack) else None
        if ph is None:
            if len(hs) == 0:
                return np.zeros(0, np.int64)
            ph = self.prepare(hs)
        n = len(ph.hs)
        if n == 0:
            return np.zeros(0, np.int64)
        L, Lc, tiles, baked = ph.L, ph.Lc, ph.tiles, ph.baked
        halo_a, body = ph.halo_a, ph.body
        limit = self._hostile_limit(n)
        esc = self._escalate_limit(n)
        cap = min(4096, max(512, _pow2(n >> 8)))
        while True:
            t = self.tables
            if baked:
                fn = _fp_baked_jit(t.baked_key(), t.k, L, Lc,
                                   self.halo, tiles)
                ncand, e_pos, live = fn(halo_a, body, cap=cap)
            else:
                ncand, e_pos, live = _fp_call(
                    *self._args(), halo_a, body,
                    jnp.asarray([0, n], jnp.int32),
                    K=t.k, L=L, Lc=Lc, H=self.halo, tiles=tiles, cap=cap,
                )
            if int(ncand) > esc and self._escalate():
                continue
            if int(ncand) > limit:
                self.hostile = True
                return None
            if int(ncand) <= cap:
                break
            cap = max(64, _pow2(int(ncand)))
        return np.asarray(e_pos).astype(np.int64)[np.asarray(live)]

    def match_pairs(
        self, hs
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """All overlapping matches as (pids, 1-based ends) in the
        reference's overlapping report order, or None (filter-hostile)."""
        ph = hs if isinstance(hs, FpHaystack) else None
        if ph is None:
            if len(hs) == 0:
                z = np.zeros(0, np.int64)
                return z, z
            ph = self.prepare(hs)
        if ph.n == 0:
            z = np.zeros(0, np.int64)
            return z, z
        if self.dv is not None and ph.u8f is not None:
            return self._verified(ph, extract=True)
        cand = self.candidates(ph)
        if cand is None:
            return None
        a = np.frombuffer(ph.hs, np.uint8)
        if self.ci:
            a = _fold_arr(a)
        return self.verif.verify(a, cand)

    def count_matches(self, hs) -> Optional[int]:
        ph = hs if isinstance(hs, FpHaystack) else None
        if ph is None:
            if len(hs) == 0:
                return 0
            ph = self.prepare(hs)
        if ph.n == 0:
            return 0
        if self.dv is not None and ph.u8f is not None:
            return self._verified(ph, extract=False)
        got = self.match_pairs(ph)
        if got is None:
            return None
        return len(got[0])
