"""Cascade engine: the device path for very large pattern sets (10k-100k+).

Pattern sets beyond the fingerprint planner's 64-limb bucket budget
(ops/fingerprint.py) cannot carry one selective filter chain per pattern
bucket — 2048 chain bits cannot discriminate 100k patterns (the
reference's signature build shape, /root/reference/src/ahocorasick.rs:46-55,
which it runs on its bare automaton at ~0.8 GB/s, dfa.rs:218-226). This
engine splits the discrimination across three device stages, each built
from ops a TPU is fast at:

  1. *Coarse prefix filter.* All patterns' Q-byte prefixes are
     DEDUPLICATED — a 100k-name dictionary typically has only a few
     thousand distinct prefixes — and the deduped prefix set is
     bucketed by the existing selectivity-modeled planner
     (plan_buckets, exact-length chains) into a small limb budget.
     Q adapts to the dictionary: min(8, shortest pattern), floor 4 —
     length-stratified sets (the reference's real 43k-word length-10
     dictionary) hit 10.2% of English-text positions with 4-byte
     prefixes (filter-hostile) but only 0.86% with 8-byte ones, at the
     same limb budget.
     The existing bitmap kernel runs unchanged (ops/fingerprint.py): one
     output bit per haystack position means "some deduped prefix chain
     ends here". Kernel cost is ~0.25 ms per limb per 64 MiB, so the
     whole coarse pass prices independently of pattern count.
  2. *Exact-membership probes from gathered windows.* Every candidate
     gathers one W-byte verify window (a row gather — TPU element
     gathers are ~100x slower than row DMAs, so ALL per-candidate state
     is packed into row records). Per distinct pattern length c <= 8,
     the candidate's c-byte window slice IS the full pattern: an exact
     64-bit key (two int32 words) probes a cuckoo table whose slots are
     (key_lo, key_hi, pid, dup_count) int32 records — a hit IS a match,
     no verification, no expansion. Patterns longer than 8 bytes probe a
     "long" table keyed by their exact first 8 bytes whose records hold
     CSR (group offset, count) over a prefix-sorted pid array.
  3. *Long-group expansion + tail verify.* Long-table hits expand to
     (candidate x group-member) compare rows with a scatter + running-
     max pass (profiled 2-6x cheaper than per-rank two-level select at
     these sizes), then each row does ONE row gather of a word-packed
     (pattern words, care masks, length) record and compares only the
     words BEYOND the 8 key bytes (the key already proved the first 8).
     The final compare covers the whole remaining pattern, so stage-1
     false positives cost time, never correctness.

Unlike DeviceVerify (fingerprint.py), the CSR expansion places NO bound
on how many patterns may share a prefix (GMAX_CAP): prefix-heavy
dictionaries expand to exactly as many compare rows as their long
groups hold, with an adaptive device-side cap.

Patterns longer than W_CASCADE ride a side exact bit-parallel engine
(ops/bitap.py) when their total size fits its limb budget; the two
match sets merge in report order. The output contract is identical to
BitapEngine.match_pairs / FingerprintEngine.match_pairs — the complete
overlapping (pattern, end) set in the reference's report order — so all
match-semantics filters (semantics.py) work unchanged.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import log
from .bitap import LANES, _pow2, _to_stream_major

from .fingerprint import (
    FP_LEN,
    FingerprintTables,
    _fold,
    _fp_pallas,
    _gather_windows,
    _make_fp_baked_kernel,
    _make_fp_kernel,
    _rank_select,
    _unpack_fold,
    plan_buckets,
    strong_pad_byte,
)

Q_COARSE = 4            # MINIMUM coarse prefix bytes (min(Q, len) per pattern).
# The engine's actual Q adapts upward to min(8, shortest main pattern):
# length-stratified dictionaries (the reference's real length-10 set,
# 43k patterns) have a 10.2% 4-byte-prefix hit rate on English text
# (hostile) but only 0.86% at 8 bytes — the longer coarse chains cost
# the same limb budget and make real-text workloads filterable.
W_CASCADE = 64          # max pattern length handled on-device
LONG = 0                # class id for patterns longer than KEY_LEN bytes
KEY_LEN = 8             # exact-key bytes (two int32 words)
# Coarse plan ladder: limb budgets; escalation refines prefix buckets.
CASCADE_LEVELS = (10, 16, 24, 32)
# Candidate / expansion hostility bounds (fractions of n). Measured on
# the reference's real 43k-word length-10 dictionary over opensubtitles
# text (3.1% coarse candidates, 3.4% expansion rows): the per-candidate
# probe/expand stages are gather-latency-bound at ~50-100 ns/candidate,
# which put the device pipeline at 0.23 GB/s where the native walk did
# 0.43 — so the bound sits at 1.6%, where the device path still wins
# by a wide margin, and denser workloads fall back to the host walk.
CAND_SHIFT = 6          # > n/64 candidates: filter-hostile
EXP_SHIFT = 6           # > n/64 expanded compare rows: group-hostile
CAND_FLOOR = 1 << 16
# Below this haystack size the facade's host paths win; the engine still
# functions (tests force it) but starts with small caps.
CAP0 = 1 << 14


def _qlen(c: int, q: int = Q_COARSE) -> int:
    """Coarse prefix length contributed by a pattern of length c."""
    return min(q, c)


def _q_of(main_lens) -> int:
    """The engine's coarse prefix length: as long as every main
    pattern supports (capped at KEY_LEN), never below Q_COARSE."""
    return min(KEY_LEN, max(Q_COARSE, min(main_lens)))


def _build_cuckoo64(lo: np.ndarray, hi: np.ndarray, rng):
    """2-choice cuckoo placement of distinct 64-bit (lo, hi) keys.

    Slot hashes mix both words with per-attempt random multipliers, so
    two distinct keys rarely share both slots; placement is the
    vectorized peeling construction (see fingerprint._build_cuckoo).
    Returns (a1, a2, b1, b2, logT, slot_of_key[i])."""
    n = max(len(lo), 1)
    nk = len(lo)
    logT = max((4 * n - 1).bit_length(), 4)
    lo64 = lo.astype(np.uint64)
    hi64 = hi.astype(np.uint64)
    for _ in range(64):
        T = 1 << logT
        a1 = int(rng.integers(1, 1 << 32)) | 1
        a2 = int(rng.integers(1, 1 << 32)) | 1
        b1 = int(rng.integers(1, 1 << 32)) | 1
        b2 = int(rng.integers(1, 1 << 32)) | 1
        s1 = ((((lo64 * a1) + (hi64 * a2)) & 0xFFFFFFFF)
              >> (32 - logT)).astype(np.int64)
        s2 = ((((lo64 * b1) + (hi64 * b2)) & 0xFFFFFFFF)
              >> (32 - logT)).astype(np.int64)
        slot = np.full(nk, -1, np.int64)
        alive = np.ones(nk, bool)
        self_double = s1 == s2
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
            return a1, a2, b1, b2, logT, slot
        logT += 1
    raise ValueError("cuckoo placement failed")


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------
class ClassTable:
    """Exact-key cuckoo for one pattern-length class.

    Records are int32 [T, 4] rows so a probe is TWO row gathers:
      exact class (c = pattern length <= 8): (lo, hi, rep_pid, dup_count)
      LONG class (length > 8, keyed by first 8 bytes): (lo, hi, group
      offset into the long pid CSR, group count)
    Construction is fully vectorized (a 100k-pattern build must stay in
    the reference's ~quarter-second class, src/ahocorasick.rs:46-55)."""

    def __init__(self, c: int, folded: List[bytes], pids: List[int],
                 rng) -> None:
        self.c = c
        pid_arr = np.asarray(pids, np.int64)
        kb = min(c, KEY_LEN) if c != LONG else KEY_LEN
        pmx = np.frombuffer(
            b"".join(folded[pid][:kb] for pid in pids), np.uint8
        ).reshape(-1, kb).astype(np.uint64)
        lo = np.zeros(len(pids), np.uint64)
        for j in range(min(kb, 4)):
            lo = (lo << np.uint64(8)) | pmx[:, j]
        hi = np.zeros(len(pids), np.uint64)
        for j in range(4, kb):
            hi = (hi << np.uint64(8)) | pmx[:, j]
        key1 = (lo << np.uint64(32)) | hi
        order = np.argsort(key1, kind="stable")
        key_s, pid_s = key1[order], pid_arr[order]
        uniq, starts, counts = np.unique(
            key_s, return_index=True, return_counts=True
        )
        ulo = (uniq >> np.uint64(32)).astype(np.uint32)
        uhi = (uniq & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        a1, a2, b1, b2, logT, slot = _build_cuckoo64(ulo, uhi, rng)
        T = 1 << logT
        self.mults = (np.uint32(a1), np.uint32(a2),
                      np.uint32(b1), np.uint32(b2))
        self.logT = logT
        rec = np.zeros((T, 4), np.int32)
        rec[slot, 0] = ulo.view(np.int32)
        rec[slot, 1] = uhi.view(np.int32)
        if c == LONG:
            rec[slot, 2] = starts.astype(np.int32)   # CSR offset
        else:
            rec[slot, 2] = pid_s[starts].astype(np.int32)  # rep pid
        rec[slot, 3] = counts.astype(np.int32)
        # Guard: an all-zero record row must never equal a real key.
        # (lo, hi) == (0, 0) is the key of the all-zero pattern, which
        # can exist; give empty slots an impossible count instead.
        self.rec = rec
        self.empty_mask = np.ones(T, bool)
        self.empty_mask[slot] = False
        rec[self.empty_mask, 3] = 0      # count 0 => no contribution
        rec[self.empty_mask, 0] = -1     # and a key no window produces
        rec[self.empty_mask, 1] = -1     # for c<8 (high bytes limited)
        self.pidlist = pid_s.astype(np.int32)


class CascadeTables:
    """All build products: coarse filter plan + class tables + verify
    records for the main (<= W_CASCADE) pattern set."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool,
                 k_budget: int, q: int = Q_COARSE):
        self.ci = case_insensitive
        self.q = q
        folded = [_fold(p) if case_insensitive else p for p in patterns]
        self.folded = folded
        P = len(patterns)
        plens = np.array([len(p) for p in patterns], np.int64)
        self.plens = plens
        # Coarse: dedup min(q, len)-byte prefixes (on folded bytes so
        # case pairs dedup together), then plan + mask them with the
        # existing machinery WITH the engine's case flag: the kernel
        # sees raw haystack bytes, so the charmasks must cover both
        # case variants (folding then re-expanding is exact for ASCII).
        # exact_classes: a q-byte prefix must contribute a chain of
        # exactly q bytes (probe geometry anchors at its end position).
        prefixes = sorted({p[:_qlen(len(p), q)] for p in folded})
        self.num_prefixes = len(prefixes)
        self.coarse = FingerprintTables(prefixes, case_insensitive,
                                        k_budget, exact_classes=True)
        # Classes: one exact-key table per distinct length <= KEY_LEN,
        # one LONG table for everything longer (keyed by first 8 bytes).
        rng = np.random.default_rng(0xCA5)
        groups = defaultdict(list)
        for pid, p in enumerate(folded):
            groups[len(p) if len(p) <= KEY_LEN else LONG].append(pid)
        self.classes = {
            c: ClassTable(c, folded, pids, rng)
            for c, pids in groups.items()
        }
        long_t = self.classes.get(LONG)
        self.pidarr = (long_t.pidlist if long_t is not None
                       else np.zeros(1, np.int32))
        # Host map for duplicate patterns in the exact classes: the
        # device emits the representative pid + its dup count; the host
        # expands. (The LONG CSR carries duplicate pids itself.)
        self.dups8: Dict[int, np.ndarray] = {}
        seen: Dict[bytes, List[int]] = defaultdict(list)
        for pid, p in enumerate(folded):
            if len(p) <= KEY_LEN:
                seen[p].append(pid)
        for pidlist in seen.values():
            if len(pidlist) > 1:
                self.dups8[pidlist[0]] = np.asarray(pidlist, np.int64)
        # Verify records (LONG rows only reference them, but they are
        # built over all main pids for direct indexing): word-packed
        # pattern bytes at the window-aligned column, care masks, and
        # length — one [2*Ww+1]-int32 row gather per compare row.
        # LONG patterns anchor at window column FP_LEN - q; the 8-byte
        # key covers columns FP_LEN - q .. FP_LEN - q + 7, so tail
        # verify starts at word tail_w0 (computed below).
        max_long = int(plens.max()) if long_t is not None else 1
        self.W = -(-int(FP_LEN - 1 + max(max_long, KEY_LEN + 1)) // 8) * 8
        self.Ww = self.W // 4
        # LONG patterns anchor where their q-byte coarse prefix starts.
        pcol = FP_LEN - q
        # First tail-verify word: everything before column
        # pcol + KEY_LEN is proven by the 8-byte key (word-rounded DOWN;
        # re-comparing key bytes inside a shared word is harmless
        # because the masks cover them too).
        self.tail_w0 = (pcol + KEY_LEN) // 4
        pmat = np.zeros((P, self.W), np.uint8)
        pmask = np.zeros((P, self.W), np.uint8)
        long_pids = np.flatnonzero(plens > KEY_LEN)
        if len(long_pids):
            lp = plens[long_pids]
            flat = np.frombuffer(
                b"".join(folded[i] for i in long_pids), np.uint8
            )
            rows = np.repeat(long_pids, lp)
            off = np.cumsum(lp) - lp
            within = (np.arange(len(flat), dtype=np.int64)
                      - np.repeat(off, lp))
            pmat[rows, within + pcol] = flat
            pmask[rows, within + pcol] = 0xFF
        self.pv = np.concatenate([
            np.ascontiguousarray(pmat).view("<i4"),
            np.ascontiguousarray(pmask).view("<i4"),
            plens.astype(np.int32)[:, None],
        ], axis=1)
        self._dev = None

    def memory_usage(self) -> int:
        total = self.pv.nbytes + self.pidarr.nbytes
        ct = self.coarse
        total += (ct.lo.nbytes + ct.hi.nbytes + ct.start.nbytes
                  + ct.end.nbytes)
        for t in self.classes.values():
            total += t.rec.nbytes
        return total

    def meta_key(self):
        """Static shape identity of the verify stages for jit caching."""
        return (
            self.W,
            self.q,
            tuple(sorted(
                (c, t.logT) for c, t in self.classes.items()
            )),
        )

    def device_args(self):
        if self._dev is None:
            self._dev = {
                "classes": {
                    c: ((jnp.uint32(t.mults[0]), jnp.uint32(t.mults[1]),
                         jnp.uint32(t.mults[2]), jnp.uint32(t.mults[3])),
                        jnp.asarray(t.rec))
                    for c, t in self.classes.items()
                },
                "pidarr": jnp.asarray(self.pidarr),
                "pv": jnp.asarray(self.pv),
            }
        return self._dev


# ---------------------------------------------------------------------------
# Fused device pipeline
# ---------------------------------------------------------------------------
def _class_key(wnd, c: int, Q: int):
    """(lo, hi) int32 key words of the class-c window slice.

    The window is anchored at e_pos - (FP_LEN - 1); a class-c pattern
    (coarse prefix q = min(Q, c)) starts at column FP_LEN - q, so its
    key bytes occupy columns FP_LEN - q .. FP_LEN - q + min(c, 8) - 1.
    """
    q = _qlen(c, Q) if c != LONG else Q
    kb = min(c, KEY_LEN) if c != LONG else KEY_LEN
    col0 = FP_LEN - q
    lo = jnp.zeros(wnd.shape[0], jnp.int32)
    for j in range(min(kb, 4)):
        lo = (lo << jnp.int32(8)) | wnd[:, col0 + j].astype(jnp.int32)
    hi = jnp.zeros(wnd.shape[0], jnp.int32)
    for j in range(4, kb):
        hi = (hi << jnp.int32(8)) | wnd[:, col0 + j].astype(jnp.int32)
    return lo, hi


def _probe(dv, meta, c: int, wnd, e_pos, live, n, Q: int):
    """One class probe: 2 record row gathers + key compares.

    Returns (hit, rec, sp) where rec is the winning [cap_c, 4] record
    and sp the candidate pattern-start position for this class."""
    mults, trec = dv["classes"][c]
    a1, a2, b1, b2 = mults
    logT = meta[c]
    lo, hi = _class_key(wnd, c, Q)
    q = _qlen(c, Q) if c != LONG else Q
    kb = min(c, KEY_LEN) if c != LONG else KEY_LEN
    sp = e_pos - (q - 1)
    ulo = lo.astype(jnp.uint32)
    uhi = hi.astype(jnp.uint32)
    sh = jnp.uint32(32 - logT)
    s1 = ((ulo * a1 + uhi * a2) >> sh).astype(jnp.int32)
    s2 = ((ulo * b1 + uhi * b2) >> sh).astype(jnp.int32)
    r1 = jnp.take(trec, s1, axis=0)
    r2 = jnp.take(trec, s2, axis=0)
    # A slot matches only when its key equals AND it is occupied
    # (count > 0): empty slots carry key (-1, -1), which an all-0xFF
    # window CAN produce — without the occupancy test such a window
    # would both fake-hit empty slots and shadow a real all-0xFF
    # pattern sitting in the other slot.
    h1 = (r1[:, 0] == lo) & (r1[:, 1] == hi) & (r1[:, 3] > 0)
    h2 = (r2[:, 0] == lo) & (r2[:, 1] == hi) & (r2[:, 3] > 0)
    rec = jnp.where(h1[:, None], r1, r2)
    valid = live & (sp >= 0) & (sp + kb <= n)
    return (h1 | h2) & valid, rec, sp


def _expand_gid(counts, cap_e: int):
    """Vectorized CSR expansion: group id per output row.

    counts [ng] -> (total, gid[cap_e], resid[cap_e], live[cap_e]).
    Scatter each live group's index at its exclusive-cumsum start, then
    a running max assigns every row its group — profiled 2-6x cheaper
    than the per-rank two-level select at 10^5..10^6 rows."""
    ends = jnp.cumsum(counts)
    total = ends[-1]
    starts = ends - counts
    ng = counts.shape[0]
    sidx = jnp.where(counts > 0, starts, cap_e)
    marker = jnp.zeros(cap_e + 1, jnp.int32).at[sidx].max(
        jnp.arange(ng, dtype=jnp.int32) + 1, mode="drop"
    )
    gid = jax.lax.associative_scan(jnp.maximum, marker[:cap_e]) - 1
    gid = jnp.maximum(gid, 0)
    j = jnp.arange(cap_e, dtype=jnp.int32)
    live = j < total
    resid = j - jnp.take(starts, gid)
    return total, gid, resid, live


def _pack_words(wnd):
    """[cap, W] uint8 windows -> [cap, W/4] int32 (little-endian, the
    numpy '<i4' view layout of the host-side pv records)."""
    w = wnd.astype(jnp.int32).reshape(wnd.shape[0], -1, 4)
    return (w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16)
            | (w[:, :, 3] << 24))


def _probe_expand_verify(e_pos, live, wnd, n, dv, meta,
                         extract: bool, cap_e: int, cap_m: int,
                         Q: int, tail_w0: int):
    """Stages 2+3 over gathered windows.

    Returns (long_expanded, total[, out_pid, out_end])."""
    cap_c = e_pos.shape[0]
    total = jnp.int32(0)
    ok_parts, pid_parts, end_parts = [], [], []
    long_hit = None
    for c in sorted(k for k in meta if k != LONG):
        hit, rec, sp = _probe(dv, meta, c, wnd, e_pos, live, n, Q)
        total = total + jnp.sum(jnp.where(hit, rec[:, 3], 0))
        if extract:
            ok_parts.append(hit)
            pid_parts.append(rec[:, 2])
            end_parts.append(sp + c)
    total_e = jnp.int32(0)
    if LONG in meta:
        hit, rec, sp = _probe(dv, meta, LONG, wnd, e_pos, live, n, Q)
        counts = jnp.where(hit, rec[:, 3], 0)
        grec = jnp.stack([rec[:, 2], sp], axis=1)        # [cap_c, 2]
        total_e, gid, resid, live_e = _expand_gid(counts, cap_e)
        g = jnp.take(grec, gid, axis=0)                  # row gather
        pidx = jnp.where(live_e, g[:, 0] + resid, 0)
        pid = jnp.take(dv["pidarr"], pidx)               # element gather
        sp_e = g[:, 1]
        wrow = _pack_words(jnp.take(wnd, gid, axis=0))   # [cap_e, Ww]
        pvrow = jnp.take(dv["pv"], pid, axis=0)          # [cap_e, 2Ww+1]
        Ww = wrow.shape[1]
        pw = pvrow[:, :Ww]
        pm = pvrow[:, Ww:2 * Ww]
        plen = pvrow[:, 2 * Ww]
        eq = jnp.ones(cap_e, bool)
        for w in range(tail_w0, Ww):
            eq = eq & ((wrow[:, w] & pm[:, w]) == pw[:, w])
        ok = live_e & eq & (sp_e >= 0) & (sp_e + plen <= n)
        total = total + jnp.sum(ok.astype(jnp.int32))
        if extract:
            ok_parts.append(ok)
            pid_parts.append(pid)
            end_parts.append(sp_e + plen)
    if not extract:
        return total_e, total
    okc = jnp.concatenate(ok_parts).astype(jnp.int32)
    pidc = jnp.concatenate(pid_parts)
    endc = jnp.concatenate(end_parts)
    # Select the set flags with the same scatter + running-max pass as
    # the CSR expansion (counts are 0/1 so gid IS the flag index) —
    # profiled cheaper than the per-rank two-level select at these
    # sizes.
    _, mi, _, mlive = _expand_gid(okc, cap_m)
    out_pid = jnp.where(mlive, jnp.take(pidc, mi), -1)
    out_end = jnp.where(mlive, jnp.take(endc, mi), -1)
    return total_e, total, out_pid, out_end


@functools.lru_cache(maxsize=32)
def _cascade_jit(coarse_key, meta_key, K: int, L: int, Lc: int, H: int,
                 tiles: int, extract: bool):
    """Fused baked pipeline: coarse bitmap kernel -> rank/select ->
    window gather -> probes -> long expansion -> tail verify. One
    dispatch; only scalars (count) or O(#matches) pairs (extract) leave
    the device."""
    kernel = _make_fp_baked_kernel(*coarse_key, K, Lc, H)
    W, q, cls = meta_key
    meta = dict(cls)
    tail_w0 = (FP_LEN - q + KEY_LEN) // 4

    def fn(halo, body, u8f, n, dv, cap_c, cap_e, cap_m=None):
        cnt, bmp = _fp_pallas(kernel, None, halo, body,
                              K, L, Lc, tiles, H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        out = _probe_expand_verify(e_pos, live, wnd, n, dv, meta,
                                   extract, cap_e, cap_m, q, tail_w0)
        return (ncand,) + out

    static = ("cap_c", "cap_e", "cap_m") if extract else ("cap_c", "cap_e")
    return jax.jit(fn, static_argnames=static)


@functools.lru_cache(maxsize=32)
def _cascade_generic_jit(meta_key, K: int, L: int, Lc: int, H: int,
                         tiles: int, extract: bool):
    """Table-generic variant (coarse masks in SMEM, position-masked):
    one compile serves every pattern set with the same shapes — used for
    small inputs and pattern sets without a strong pad byte."""
    W, q, cls = meta_key
    meta = dict(cls)
    tail_w0 = (FP_LEN - q + KEY_LEN) // 4

    def fn(lo, hi, sm, em, nn, halo, body, u8f, n, dv,
           cap_c, cap_e, cap_m=None):
        kernel = _make_fp_kernel(K, L, Lc, H)
        cnt, bmp = _fp_pallas(kernel, (lo, hi, sm, em, nn), halo, body,
                              K, L, Lc, tiles, H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        out = _probe_expand_verify(e_pos, live, wnd, n, dv, meta,
                                   extract, cap_e, cap_m, q, tail_w0)
        return (ncand,) + out

    static = ("cap_c", "cap_e", "cap_m") if extract else ("cap_c", "cap_e")
    return jax.jit(fn, static_argnames=static)


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------
class CascadeHaystack:
    """Device-resident cascade layout: upload once, search many times
    (packed kernel streams + verify strip)."""

    __slots__ = ("n", "L", "Lc", "tiles", "baked", "halo_a", "body",
                 "u8f", "hs", "side")

    def __init__(self, n, L, Lc, tiles, baked, halo_a, body, u8f,
                 hs, side):
        self.n = n
        self.L = L
        self.Lc = Lc
        self.tiles = tiles
        self.baked = baked
        self.halo_a = halo_a
        self.body = body
        self.u8f = u8f
        self.hs = hs
        self.side = side    # side BitapEngine PackedHaystack, or None


class CascadeEngine:
    """Facade-facing engine: complete overlapping match sets for pattern
    sets of (nearly) arbitrary size."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        self.patterns = patterns
        self.ci = case_insensitive
        P = len(patterns)
        plens = np.array([len(p) for p in patterns], np.int64)
        # Report-order rank over the FULL pattern set (length desc then
        # pid asc at equal end; noncontiguous.rs:1357 analog).
        order = np.lexsort((np.arange(P), -plens))
        self.pid_rank = np.empty(P, np.int64)
        self.pid_rank[order] = np.arange(P)
        self.max_pattern_len = int(plens.max())
        # Long patterns ride a side exact bit-parallel engine.
        self.long_pids = np.flatnonzero(plens > W_CASCADE)
        self.main_pids = np.flatnonzero(plens <= W_CASCADE)
        self._main_pats = [patterns[i] for i in self.main_pids]
        self.side = None
        if len(self.long_pids):
            from .bitap import BitapEngine

            self.side = BitapEngine(
                [patterns[i] for i in self.long_pids], case_insensitive
            )
        self.pad_byte = strong_pad_byte(patterns, case_insensitive)
        self.q = _q_of([len(p) for p in self._main_pats])
        self._tables_cache: Dict[int, Optional[CascadeTables]] = {}
        self.level: Optional[int] = None
        for i in range(len(CASCADE_LEVELS)):
            if self._tables(i) is not None:
                self.level = i
                break
        assert self.level is not None, "caller must check eligibility"
        self.tables = self._tables(self.level)
        self.halo = max(_pow2(FP_LEN - 1), 4)
        self.hostile = False
        self._caps: Dict[str, int] = {}
        log.debug(
            "cascade engine: %d patterns (%d long-side), %d deduped "
            "q=%d prefixes, K=%d, W=%d, classes=%s",
            P, len(self.long_pids), self.tables.num_prefixes, self.q,
            self.tables.coarse.k, self.tables.W,
            sorted(self.tables.classes),
        )

    @classmethod
    def eligible(cls, patterns: List[bytes],
                 case_insensitive: bool = False) -> bool:
        if not patterns or any(len(p) == 0 for p in patterns):
            return False
        main = [p for p in patterns if len(p) <= W_CASCADE]
        longs = [p for p in patterns if len(p) > W_CASCADE]
        if not main:
            return False
        if longs:
            from .bitap import BitapEngine

            if not BitapEngine.eligible(longs):
                return False
        folded = [_fold(p) if case_insensitive else p for p in main]
        q = _q_of([len(p) for p in main])
        prefixes = sorted({p[:_qlen(len(p), q)] for p in folded})
        return plan_buckets(prefixes, case_insensitive,
                            CASCADE_LEVELS[-1],
                            exact_classes=True) is not None

    def _tables(self, lvl: int) -> Optional[CascadeTables]:
        if lvl not in self._tables_cache:
            folded = [_fold(p) if self.ci else p for p in self._main_pats]
            prefixes = sorted({p[:_qlen(len(p), self.q)] for p in folded})
            if plan_buckets(prefixes, self.ci, CASCADE_LEVELS[lvl],
                            exact_classes=True) is None:
                self._tables_cache[lvl] = None
            else:
                self._tables_cache[lvl] = CascadeTables(
                    self._main_pats, self.ci, CASCADE_LEVELS[lvl],
                    self.q,
                )
        return self._tables_cache[lvl]

    def _escalate(self) -> bool:
        for nxt in range(self.level + 1, len(CASCADE_LEVELS)):
            t = self._tables(nxt)
            if t is not None and t.coarse.k > self.tables.coarse.k:
                self.level = nxt
                self.tables = t
                return True
        return False

    # ------------------------------------------------------------------
    def _layout(self, n: int) -> Tuple[int, int, int]:
        from .bitap import _layout_search

        L, tiles = _layout_search(n, self.halo)
        return L, min(L, 512), tiles

    def memory_usage(self) -> int:
        return self.tables.memory_usage()

    def prepare(self, hs: bytes) -> CascadeHaystack:
        """Upload a haystack into the device-resident cascade layout."""
        n = len(hs)
        L, Lc, tiles = self._layout(max(n, 1))
        total = tiles * LANES * L
        pad = self.pad_byte or 0
        buf = np.full(total, pad, np.uint8) if pad else np.zeros(
            total, np.uint8
        )
        buf[:n] = np.frombuffer(hs, np.uint8)
        x32 = jax.device_put(jnp.asarray(buf.view(np.int32)))
        halo_a, body = _to_stream_major(x32, L, tiles, self.halo)
        u8f = _unpack_fold(x32, self.tables.W, self.ci)
        baked = self.pad_byte is not None
        side_ph = self.side.prepare(hs) if self.side is not None else None
        return CascadeHaystack(n, L, Lc, tiles, baked, halo_a, body,
                               u8f, hs, side_ph)

    def _limits(self, n: int) -> Tuple[int, int]:
        lim = max(CAND_FLOOR, n >> CAND_SHIFT)
        return lim, max(CAND_FLOOR, n >> EXP_SHIFT)

    def _run(self, ph: CascadeHaystack, extract: bool):
        """Adaptive fused pipeline on the main pattern set. Returns the
        count or (pids, ends) ndarray pair, or None when hostile."""
        n, L, Lc, tiles = ph.n, ph.L, ph.Lc, ph.tiles
        cand_lim, exp_lim = self._limits(n)
        n_dev = jnp.int32(n)
        nn = jnp.asarray([0, n], jnp.int32)
        # Caps persist per engine instance (grown monotonically): after
        # the first scan settles them, repeated searches on similar
        # inputs run exactly one dispatch — no cap-overflow rescans.
        cap_c = max(self._caps.get("c", 0),
                    min(_pow2(max(n // 4, 1024)), CAP0))
        cap_e = max(self._caps.get("e", 0), cap_c)
        cap_m = max(self._caps.get("m", 0), max(cap_c // 2, 1024))
        while True:
            t = self.tables
            dv = t.device_args()
            mk = t.meta_key()
            if ph.baked:
                fn = _cascade_jit(
                    t.coarse.baked_key(), mk, t.coarse.k, L, Lc,
                    self.halo, tiles, extract,
                )
                args = (ph.halo_a, ph.body, ph.u8f, n_dev, dv)
            else:
                fn = _cascade_generic_jit(
                    mk, t.coarse.k, L, Lc, self.halo, tiles, extract,
                )
                args = (*t.coarse.device_args(), nn, ph.halo_a, ph.body,
                        ph.u8f, n_dev, dv)
            if extract:
                ncand, ne, total, out_pid, out_end = fn(
                    *args, cap_c=cap_c, cap_e=cap_e, cap_m=cap_m
                )
            else:
                ncand, ne, total = fn(*args, cap_c=cap_c, cap_e=cap_e)
            if ((int(ncand) > cand_lim or int(ne) > exp_lim)
                    and self._escalate()):
                continue
            if int(ncand) > cand_lim or int(ne) > exp_lim:
                self.hostile = True
                return None
            ok = True
            if int(ncand) > cap_c:
                cap_c = _pow2(int(ncand))
                ok = False
            if int(ne) > cap_e:
                cap_e = _pow2(int(ne))
                ok = False
            if extract and int(total) > cap_m:
                cap_m = _pow2(int(total))
                ok = False
            if ok:
                break
        self._caps["c"] = max(self._caps.get("c", 0), cap_c)
        self._caps["e"] = max(self._caps.get("e", 0), cap_e)
        if extract:
            self._caps["m"] = max(self._caps.get("m", 0), cap_m)
        self.last_caps = (cap_c, cap_e, cap_m if extract else None)
        if not extract:
            return int(total)
        pid = np.asarray(out_pid).astype(np.int64)
        end = np.asarray(out_end).astype(np.int64)
        real = pid >= 0
        pid, end = pid[real], end[real]
        # Expand duplicate exact-class patterns (the device emitted the
        # representative pid once per match site).
        dups = self.tables.dups8
        if dups:
            extra_p, extra_e = [], []
            for rep, group in dups.items():
                at = np.flatnonzero(pid == rep)
                if len(at):
                    extra_p.append(np.tile(group[1:], len(at)))
                    extra_e.append(np.repeat(end[at], len(group) - 1))
            if extra_p:
                pid = np.concatenate([pid] + extra_p)
                end = np.concatenate([end] + extra_e)
        # Map main-set pids back to the full pattern-set ids.
        return self.main_pids[pid], end

    # ------------------------------------------------------------------
    def count_matches(self, hs) -> Optional[int]:
        ph = hs if isinstance(hs, CascadeHaystack) else None
        if ph is None:
            if len(hs) == 0:
                return 0
            ph = self.prepare(hs)
        if ph.n == 0:
            return 0
        got = self._run(ph, extract=False)
        if got is None:
            return None
        if self.side is not None:
            got += self.side.count_matches(ph.side)
        return got

    def match_pairs(
        self, hs
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """All overlapping matches as (pids, 1-based ends) in the
        reference's overlapping report order, or None (hostile)."""
        ph = hs if isinstance(hs, CascadeHaystack) else None
        if ph is None:
            if len(hs) == 0:
                z = np.zeros(0, np.int64)
                return z, z
            ph = self.prepare(hs)
        if ph.n == 0:
            z = np.zeros(0, np.int64)
            return z, z
        got = self._run(ph, extract=True)
        if got is None:
            return None
        pids, ends = got
        if self.side is not None:
            spids, sends = self.side.match_pairs(ph.side)
            pids = np.concatenate([pids, self.long_pids[spids]])
            ends = np.concatenate([ends, sends])
        order = np.lexsort((self.pid_rank[pids], ends))
        return pids[order], ends[order]
