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


def plan_buckets(patterns: List[bytes], case_insensitive: bool):
    """Group patterns into fingerprint buckets and pack their chains.

    Returns (buckets, offsets, K) with buckets = [(chain_len, [pid])],
    or None when no bucketing fits the K_MAX limb budget. Patterns are
    grouped by chain length class m = min(len, FP_LEN), sorted (folded)
    so bucket members share prefixes, and sliced into the smallest
    per-bucket size whose packed chains fit K_TARGET limbs (falling
    back to K_MAX for very large sets)."""
    folded = [_fold(p) if case_insensitive else p for p in patterns]
    classes = defaultdict(list)
    for pid, p in enumerate(folded):
        classes[min(len(p), FP_LEN)].append(pid)
    best = None
    for per_bucket in (4, 8, 16, 32, 64):
        buckets = []
        for m in sorted(classes):
            pids = sorted(classes[m], key=lambda i: folded[i][:m])
            nb = -(-len(pids) // per_bucket)
            for chunk in np.array_split(np.array(pids, np.int64), nb):
                buckets.append((m, chunk.tolist()))
        offsets, K = pack_chains([m for m, _ in buckets])
        if K <= K_TARGET:
            return buckets, offsets, K
        if best is None and K <= K_MAX:
            best = (buckets, offsets, K)
    return best


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
# Exact verification
# ---------------------------------------------------------------------------
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
            groups[min(len(p), FP_LEN)].append(pid)
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
        self.tails = {}
        self.tail_row = np.full(P, -1, np.int64)
        bylen = defaultdict(list)
        for pid, p in enumerate(folded):
            if len(p) > FP_LEN:
                bylen[len(p)].append(pid)
        for ln, pids in bylen.items():
            mat = np.stack([
                np.frombuffer(folded[pid], np.uint8)[FP_LEN:]
                for pid in pids
            ])
            self.tails[ln] = mat
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
            if c < FP_LEN:
                # Chain length == pattern length: the key IS the pattern.
                out_p.append(pid)
                out_e.append(st + c)
                continue
            plens = self.plens[pid]
            exact = plens == FP_LEN
            out_p.append(pid[exact])
            out_e.append(st[exact] + FP_LEN)
            pid_r, st_r, pl_r = pid[~exact], st[~exact], plens[~exact]
            for ln in np.unique(pl_r):
                ln = int(ln)
                m = pl_r == ln
                pids2, st2 = pid_r[m], st_r[m]
                okb = st2 + ln <= n
                pids2, st2 = pids2[okb], st2[okb]
                if not len(pids2):
                    continue
                mat = self.tails[ln]
                wt = a[st2[:, None] + np.arange(FP_LEN, ln)]
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
class FingerprintEngine:
    """Facade-facing engine: complete overlapping match sets for pattern
    sets of arbitrary size (bounded by the K_MAX bucket budget)."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        self.patterns = patterns
        self.ci = case_insensitive
        self.tables = FingerprintTables(patterns, case_insensitive)
        self.verif = VerifyIndex(patterns, case_insensitive)
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
    def candidates(self, hs: bytes) -> Optional[np.ndarray]:
        """0-based fingerprint-end candidate positions, or None when the
        workload is filter-hostile (caller should fall back)."""
        n = len(hs)
        if n == 0:
            return np.zeros(0, np.int64)
        t = self.tables
        L, Lc, tiles = self._layout(n)
        baked = t.pad_byte is not None
        from .bitap import _to_stream_major

        x32 = jax.device_put(
            self._pack(hs, L, tiles, t.pad_byte if baked else 0)
        )
        halo_a, body = _to_stream_major(x32, L, tiles, self.halo)
        limit = max(CAND_FLOOR, n >> CAND_SHIFT)
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
        self, hs: bytes
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """All overlapping matches as (pids, 1-based ends) in the
        reference's overlapping report order, or None (filter-hostile)."""
        cand = self.candidates(hs)
        if cand is None:
            return None
        a = np.frombuffer(hs, np.uint8)
        if self.ci:
            a = _fold_arr(a)
        return self.verif.verify(a, cand)

    def count_matches(self, hs: bytes) -> Optional[int]:
        got = self.match_pairs(hs)
        if got is None:
            return None
        return len(got[0])
