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
  3. *Exact verification.* Every candidate position is resolved against
     per-length-class sorted prefix keys (the first min(len,8) bytes of
     every pattern, packed into uint64): an exact-prefix hit maps to the
     pattern IDs sharing that prefix (CSR), and patterns longer than 8
     bytes get a vectorized tail compare. This replaces Teddy's
     bucket-local memcmp loop (generic.rs:820-870) with batched
     column-compare passes, and makes the filter's nybble-product false
     positives (and bucket collisions) cost time only, never
     correctness.

The output is the complete overlapping (pattern, end) match set in the
reference's report order — identical contract to BitapEngine.match_pairs,
so every match-semantics filter (semantics.py) works unchanged.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import List, Optional, Tuple

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
class FingerprintTables:
    """Bucketed chain masks in the bitap kernel's (lo, hi, start, end)
    table format, plus the bucket plan used to pick K."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        assert patterns and all(len(p) > 0 for p in patterns)
        self.case_insensitive = case_insensitive
        plan = plan_buckets(patterns, case_insensitive)
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


# Selectivity model for bucket planning: a chain position whose nybble
# product set covers s byte values passes a text byte with probability
# ~ s / TEXT_ALPHABET (text bytes are concentrated, not uniform over
# 256). The planner keeps the estimated per-position candidate
# probability under CAND_BUDGET.
TEXT_ALPHABET = 48.0
CAND_BUDGET = 0.003


def _class_prob(folded, pids_sorted, m, b, case_insensitive) -> float:
    """Estimated per-position candidate probability contributed by class
    m when sliced into buckets of ~b members (sorted order)."""
    nb = -(-len(pids_sorted) // b)
    total = 0.0
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
            prob *= min(1.0, len(los) * len(his) / TEXT_ALPHABET)
        total += prob
    return total


def plan_buckets(patterns: List[bytes], case_insensitive: bool):
    """Group patterns into fingerprint buckets and pack their chains.

    Returns (buckets, offsets, K) with buckets = [(chain_len, [pid])],
    or None when no bucketing fits the K_MAX limb budget. Patterns are
    grouped by chain length class m = min(len, FP_LEN) and sorted
    (folded) so bucket members share prefixes; per-class bucket sizes
    start coarse (cheapest kernel) and halve greedily — worst
    estimated-selectivity class first — until the modeled candidate
    probability fits CAND_BUDGET or the K_MAX limb budget is exhausted.
    This is the planning analog of Teddy's bucket-quality heuristics
    (teddy/builder.rs:113-177, generic.rs:770-808) driven by an explicit
    false-positive model instead of fixed bucket counts."""
    folded = [_fold(p) if case_insensitive else p for p in patterns]
    classes = {}
    grouped = defaultdict(list)
    for pid, p in enumerate(folded):
        grouped[_mclass(len(p))].append(pid)
    for m, pids in grouped.items():
        classes[m] = sorted(pids, key=lambda i: folded[i][:m])

    bsize = {m: 64 for m in classes}

    def k_of(bs):
        lens = []
        for m, pids in classes.items():
            nb = -(-len(pids) // bs[m])
            lens += [m] * nb
        return pack_chains(lens)[1]

    if k_of(bsize) > K_MAX:
        return None
    probs = {
        m: _class_prob(folded, classes[m], m, bsize[m], case_insensitive)
        for m in classes
    }
    while sum(probs.values()) > CAND_BUDGET:
        # Halve the worst offender that still fits the limb budget.
        for m in sorted(probs, key=lambda m: -probs[m]):
            if bsize[m] == 1:
                continue
            trial = dict(bsize)
            trial[m] = bsize[m] // 2
            if k_of(trial) <= K_MAX:
                bsize = trial
                probs[m] = _class_prob(
                    folded, classes[m], m, bsize[m], case_insensitive
                )
                break
        else:
            break  # budget exhausted: best effort, hostile guard covers
    buckets = []
    for m in sorted(classes):
        pids = classes[m]
        nb = -(-len(pids) // bsize[m])
        for chunk in np.array_split(np.asarray(pids, np.int64), nb):
            buckets.append((m, chunk.tolist()))
    offsets, K = pack_chains([m for m, _ in buckets])
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


def _compact(cnt, bmp, cap):
    ncand = jnp.sum(cnt)
    flat = bmp.reshape(-1)
    nz = flat != 0
    nnzw = jnp.sum(nz.astype(jnp.int32))
    (idx,) = jnp.nonzero(nz, size=cap, fill_value=flat.shape[0])
    vals = jnp.take(flat, jnp.minimum(idx, flat.shape[0] - 1))
    return ncand, nnzw, idx, vals


@functools.lru_cache(maxsize=64)
def _fp_baked_jit(tables_key, K: int, L: int, Lc: int, H: int, tiles: int):
    kernel = _make_fp_baked_kernel(*tables_key, K, Lc, H)

    def fn(halo, body, cap):
        cnt, bmp = _fp_pallas(kernel, None, halo, body,
                              K, L, Lc, tiles, H // 4)
        return _compact(cnt, bmp, cap)

    return jax.jit(fn, static_argnames=("cap",))


@functools.partial(
    jax.jit, static_argnames=("K", "L", "Lc", "H", "tiles", "cap")
)
def _fp_call(lo, hi, sm, em, halo, body, nn,
             K: int, L: int, Lc: int, H: int, tiles: int, cap: int):
    kernel = _make_fp_kernel(K, L, Lc, H)
    cnt, bmp = _fp_pallas(kernel, (lo, hi, sm, em, nn), halo, body,
                          K, L, Lc, tiles, H // 4)
    return _compact(cnt, bmp, cap)


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
    search (searchsorted measured ~60ns/element on TPU)."""
    n = max(len(keys), 1)
    logT = max((4 * n - 1).bit_length(), 4)
    karr = np.array(keys, np.uint64)
    for _ in range(64):
        T = 1 << logT
        a = int(rng.integers(1, 1 << 32)) | 1
        b = int(rng.integers(1, 1 << 32)) | 1
        s1 = ((karr * a) & 0xFFFFFFFF) >> (32 - logT)
        s2 = ((karr * b) & 0xFFFFFFFF) >> (32 - logT)
        slot = np.full(len(keys), -1, np.int64)
        table = np.full(T, -1, np.int64)  # key index or -1
        ok = True
        for i in range(len(keys)):
            cur, side = i, 0
            for _ in range(256):
                s = int(s1[cur]) if side == 0 else int(s2[cur])
                prev = int(table[s])
                table[s] = cur
                slot[cur] = s
                if prev < 0:
                    break
                cur = prev
                side = 1 if int(s1[cur]) == s else 0
            else:
                ok = False
                break
        if ok:
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
        P = len(patterns)
        folded = [_fold(p) if case_insensitive else p for p in patterns]
        self.W = max(FP_LEN, max(len(p) for p in patterns))
        W = self.W
        plens = np.array([len(p) for p in patterns], np.int64)
        patmat = np.zeros((P, W), np.uint8)
        dontcare = np.ones((P, W), bool)
        m_arr = np.array([_mclass(int(x)) for x in plens], np.int64)
        for pid, p in enumerate(folded):
            off = FP_LEN - int(m_arr[pid])
            patmat[pid, off:off + len(p)] = np.frombuffer(p, np.uint8)
            dontcare[pid, off:off + len(p)] = False
        self.patmat = patmat
        self.dontcare = dontcare
        self.plens = plens
        # Per length class: hashed cuckoo table of class-c prefixes.
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
            tpids = np.full((T, gmax), -1, np.int32)
            for i, key in enumerate(keys):
                tkeys[slot[i]] = hs[i]
                for s, pid in enumerate(keymap[key]):
                    tpids[slot[i], s] = pid
            # Empty slots hold key 0; a real key hashing to 0 would
            # false-positive into pid -1, which the pid>=0 mask drops.
            self.classes[c] = (mult, np.uint32(a), np.uint32(b), logT,
                               tkeys, tpids)
        self._dev = None

    def device_args(self):
        if self._dev is None:
            self._dev = {
                "patmat": jnp.asarray(self.patmat),
                "dontcare": jnp.asarray(self.dontcare),
                "plens": jnp.asarray(self.plens.astype(np.int32)),
                "classes": {
                    c: (jnp.uint32(m), jnp.uint32(a), jnp.uint32(b),
                        logT, jnp.asarray(tk), jnp.asarray(tp))
                    for c, (m, a, b, logT, tk, tp)
                    in self.classes.items()
                },
            }
        return self._dev

    def key(self):
        """Hashable identity for jit caching."""
        return (
            self.W,
            tuple(self.plens.tolist()),
            tuple(sorted(
                (c, int(m), logT, tp.shape[1])
                for c, (m, a, b, logT, tk, tp)
                in self.classes.items()
            )),
        )


def _device_verify(wnd, e_pos, live, n, dv_args, W, extract, cap_m=None):
    """Resolve candidate windows to matches on device.

    wnd: [C, W] uint8 windows anchored at e_pos - (FP_LEN - 1);
    live: [C] bool validity. Returns total match count and, in extract
    mode, compacted (flat_slot_index, pid, end) arrays of size cap_m.
    """
    patmat = dv_args["patmat"]
    dontcare = dv_args["dontcare"]
    plens = dv_args["plens"]
    total = jnp.int32(0)
    oks, pids_s, ends_s = [], [], []
    for c, (mult, ha, hb, logT, tkeys, tpids) in sorted(
        dv_args["classes"].items()
    ):
        h = jnp.zeros(wnd.shape[0], jnp.uint32)
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
        for slot in range(tpids.shape[1]):
            pid = jnp.take(tpids[:, slot], gi)
            pidc = jnp.maximum(pid, 0)
            prow = jnp.take(patmat, pidc, axis=0)
            pmask = jnp.take(dontcare, pidc, axis=0)
            eq = jnp.all((wnd == prow) | pmask, axis=1)
            pl_ = jnp.take(plens, pidc)
            ok = (
                hit & (pid >= 0) & eq
                & (sp >= 0) & (sp + pl_ <= n)
            )
            total = total + jnp.sum(ok.astype(jnp.int32))
            if extract:
                oks.append(ok)
                pids_s.append(pidc)
                ends_s.append(sp + pl_)
    if not extract:
        return total, None, None, None
    okm = jnp.stack(oks).reshape(-1)
    pidm = jnp.stack(pids_s).reshape(-1)
    endm = jnp.stack(ends_s).reshape(-1)
    (mi,) = jnp.nonzero(okm, size=cap_m, fill_value=okm.shape[0])
    safe = jnp.minimum(mi, okm.shape[0] - 1)
    out_pid = jnp.where(mi < okm.shape[0], jnp.take(pidm, safe), -1)
    out_end = jnp.where(mi < okm.shape[0], jnp.take(endm, safe), -1)
    return total, total, out_pid, out_end


def _expand_candidates(idx_w, vals, words_size, L, cap_c):
    """Decode compacted bitmap words to candidate positions on device."""
    valid_w = idx_w < words_size
    idxc = jnp.minimum(idx_w, words_size - 1)
    cc = idxc % 128
    r = (idxc // 128) % R
    t32 = (idxc // (128 * R)) % (L // 32)
    tile = idxc // (128 * R * (L // 32))
    stream = (tile * R + r) * 128 + cc
    base = stream * L + t32 * 32
    bits = (
        (vals[:, None] >> jnp.arange(32, dtype=jnp.int32)) & 1
    ) != 0
    bits = bits & valid_w[:, None]
    posm = base[:, None] + jnp.arange(32, dtype=jnp.int32)
    flat_ok = bits.reshape(-1)
    nnzc = jnp.sum(flat_ok.astype(jnp.int32))
    (ci,) = jnp.nonzero(flat_ok, size=cap_c, fill_value=flat_ok.shape[0])
    live = ci < flat_ok.shape[0]
    safe = jnp.minimum(ci, flat_ok.shape[0] - 1)
    e_pos = jnp.take(posm.reshape(-1), safe)
    return e_pos, live, nnzc


@functools.lru_cache(maxsize=64)
def _fp_verified_jit(tables_key, dv_key, K: int, L: int, Lc: int, H: int,
                     tiles: int, W: int, extract: bool):
    """Fused: bitmap kernel -> word compaction -> candidate expansion ->
    windowed device verification. One dispatch; only scalars (count
    mode) or O(#matches) pairs (extract mode) leave the device."""
    kernel = _make_fp_baked_kernel(*tables_key, K, Lc, H)
    words_size = tiles * (L // 32) * LANES

    def fn(halo, body, u8f, n, dv_args, cap_w, cap_c, cap_m=None):
        cnt, bmp = _fp_pallas(kernel, None, halo, body,
                              K, L, Lc, tiles, H // 4)
        ncand, nnzw, idx_w, vals = _compact(cnt, bmp, cap_w)
        e_pos, live, nnzc = _expand_candidates(
            idx_w, vals, words_size, L, cap_c
        )
        wnd = _gather_windows(u8f, e_pos, W)
        total, nmatch, out_pid, out_end = _device_verify(
            wnd, e_pos, live, n, dv_args, W, extract, cap_m
        )
        if extract:
            return ncand, nnzw, nnzc, total, out_pid, out_end
        return ncand, nnzw, nnzc, total

    static = ("cap_w", "cap_c", "cap_m") if extract else ("cap_w", "cap_c")
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
VROW = 32  # verify-buffer row width (window row-gather granularity)


@functools.partial(jax.jit, static_argnames=("W", "fold"))
def _unpack_fold(x32, W: int, fold: bool):
    """Unpack the int32-packed haystack into the strided verify buffer.

    Layout: FP_LEN zero lead + (optionally case-folded) bytes + guard
    tail, as OVERLAPPING rows of width ceil((VROW-1+W)/VROW)*VROW at
    stride VROW — any W-byte window lies entirely inside the single row
    b0 // VROW, so window extraction is ONE row gather (TPU element
    gathers measured ~400x slower than row gathers). Costs k x haystack
    bytes of HBM (k = row width / VROW, typically 2)."""
    b = (
        (x32[:, None] >> jnp.array([0, 8, 16, 24], jnp.int32)) & 255
    ).astype(jnp.uint8).reshape(-1)
    if fold:
        b = jnp.where((b >= 65) & (b <= 90), b | 32, b)
    total = b.shape[0]
    k = -(-(VROW - 1 + W) // VROW)
    nbase = -(-(FP_LEN + total + W) // VROW) + k
    buf = jnp.concatenate([
        jnp.zeros(FP_LEN, jnp.uint8), b,
        jnp.zeros(nbase * VROW - FP_LEN - total, jnp.uint8),
    ])
    base = buf.reshape(-1, VROW)
    nr = base.shape[0] - k + 1
    return jnp.concatenate(
        [base[t:nr + t] for t in range(k)], axis=1
    )


def _gather_windows(u8f, e_pos, W: int):
    """W-byte windows anchored at e_pos - (FP_LEN - 1): one row gather
    from the strided buffer + a 5-bit shift mux over the in-row
    offset."""
    b0 = e_pos + 1  # buffer coordinates (FP_LEN lead pad, -(FP_LEN-1))
    r = b0 // VROW
    o = b0 % VROW
    strip = jnp.take(u8f, r, axis=0)
    slices = [strip[:, s:s + W] for s in range(VROW)]
    t = slices
    for bit in range(5):
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


class FingerprintEngine:
    """Facade-facing engine: complete overlapping match sets for pattern
    sets of arbitrary size (bounded by the K_MAX bucket budget).

    Verification runs on device (DeviceVerify) when every pattern fits
    the W_MAX window, fingerprint groups are small, and the table has a
    pad byte; otherwise candidates fall back to the host VerifyIndex."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        self.patterns = patterns
        self.ci = case_insensitive
        self.tables = FingerprintTables(patterns, case_insensitive)
        self.verif = VerifyIndex(patterns, case_insensitive)
        self.dv: Optional[DeviceVerify] = None
        if DeviceVerify.supports(patterns) and self.tables.pad_byte is not None:
            try:
                self.dv = DeviceVerify(patterns, case_insensitive)
            except ValueError:
                self.dv = None  # oversized groups / no hash: host verify
        self._dev_args = None
        self.halo = max(_pow2(self.tables.max_chain - 1), 4)
        self.max_pattern_len = int(self.verif.plens.max())
        self.hostile = False  # set when a scan came back candidate-dense

    @classmethod
    def eligible(cls, patterns: List[bytes],
                 case_insensitive: bool = False) -> bool:
        if not patterns or any(len(p) == 0 for p in patterns):
            return False
        return plan_buckets(patterns, case_insensitive) is not None

    # ------------------------------------------------------------------
    def _layout(self, n: int) -> Tuple[int, int, int]:
        """Power-of-two (L, Lc, tiles); L >= 128 so the bitmap flush
        cadence (32 positions) always divides a chunk."""
        L = max(self.halo, 128, min(2048, _pow2(-(-n // LANES))))
        tiles = max(1, _pow2(-(-n // (LANES * L))))
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
        t = self.tables
        L, Lc, tiles = self._layout(max(n, 1))
        baked = t.pad_byte is not None
        x32 = jax.device_put(
            self._pack(hs, L, tiles, t.pad_byte if baked else 0)
        )
        halo_a, body = _to_stream_major(x32, L, tiles, self.halo)
        u8f = None
        if self.dv is not None and baked:
            u8f = _unpack_fold(x32, self.dv.W, self.ci)
        return FpHaystack(n, L, Lc, tiles, baked, halo_a, body, u8f, hs)

    def _hostile_limit(self, n: int) -> int:
        return max(CAND_FLOOR, n >> CAND_SHIFT)

    def _verified(self, ph: FpHaystack, extract: bool):
        """Fused device pipeline; returns count or (pids, ends), or None
        when hostile. Caps adapt by re-dispatching with larger sizes."""
        t = self.tables
        n, L, Lc, tiles = ph.n, ph.L, ph.Lc, ph.tiles
        limit = self._hostile_limit(n)
        dv_args = self.dv.device_args()
        n_dev = jnp.int32(n)
        cap_w, cap_c, cap_m = 4096, 8192, 8192
        while True:
            fn = _fp_verified_jit(
                t.baked_key(), self.dv.key(), t.k, L, Lc, self.halo,
                tiles, self.dv.W, extract,
            )
            if extract:
                ncand, nnzw, nnzc, total, out_pid, out_end = fn(
                    ph.halo_a, ph.body, ph.u8f, n_dev, dv_args,
                    cap_w=cap_w, cap_c=cap_c, cap_m=cap_m,
                )
            else:
                ncand, nnzw, nnzc, total = fn(
                    ph.halo_a, ph.body, ph.u8f, n_dev, dv_args,
                    cap_w=cap_w, cap_c=cap_c,
                )
            if int(ncand) > limit:
                self.hostile = True
                return None
            ok = True
            if int(nnzw) > cap_w:
                cap_w = _pow2(int(nnzw))
                ok = False
            if int(nnzc) > cap_c:
                cap_c = _pow2(int(nnzc))
                ok = False
            if extract and int(total) > cap_m:
                cap_m = _pow2(int(total))
                ok = False
            if ok:
                break
        self.last_caps = (cap_w, cap_c, cap_m if extract else None)
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
        t = self.tables
        L, Lc, tiles, baked = ph.L, ph.Lc, ph.tiles, ph.baked
        halo_a, body = ph.halo_a, ph.body
        limit = self._hostile_limit(n)
        cap = 4096
        while True:
            if baked:
                fn = _fp_baked_jit(t.baked_key(), t.k, L, Lc,
                                   self.halo, tiles)
                ncand, nnzw, idx, vals = fn(halo_a, body, cap=cap)
            else:
                ncand, nnzw, idx, vals = _fp_call(
                    *self._args(), halo_a, body,
                    jnp.asarray([0, n], jnp.int32),
                    K=t.k, L=L, Lc=Lc, H=self.halo, tiles=tiles, cap=cap,
                )
            if int(ncand) > limit:
                self.hostile = True
                return None
            nnzw = int(nnzw)
            if nnzw <= cap:
                break
            cap = max(64, _pow2(nnzw))
        bmp_size = tiles * (L // 32) * LANES
        idx = np.asarray(idx).astype(np.int64)
        vals = np.asarray(vals).view(np.uint32)
        real = idx < bmp_size
        idx, vals = idx[real], vals[real]
        # Decode flat [tiles, L//32, R, 128] word indices to positions.
        c = idx % 128
        r = (idx // 128) % R
        t32 = (idx // (128 * R)) % (L // 32)
        tile = idx // (128 * R * (L // 32))
        stream = (tile * R + r) * 128 + c
        base = stream * L + t32 * 32
        pos_l = []
        for bit in range(32):
            rows = np.flatnonzero((vals >> np.uint32(bit)) & np.uint32(1))
            if len(rows):
                pos_l.append(base[rows] + bit)
        return (
            np.concatenate(pos_l) if pos_l else np.zeros(0, np.int64)
        )

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
