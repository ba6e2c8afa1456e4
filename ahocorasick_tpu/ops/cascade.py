"""Cascade engine: the device path for very large pattern sets (10k-100k+).

Pattern sets beyond the fingerprint planner's 64-limb bucket budget
(ops/fingerprint.py) cannot carry one selective filter chain per pattern
bucket — 2048 chain bits cannot discriminate 100k patterns (the
reference's signature build shape, /root/reference/src/ahocorasick.rs:46-55,
which it runs on its bare automaton at ~0.8 GB/s, dfa.rs:218-226). This
engine splits the discrimination across three device stages, each built
from ops a TPU is fast at:

  1. *Coarse prefix filter.* All patterns' Q-byte prefixes (Q = 4, or
     shorter for short patterns) are DEDUPLICATED — a 100k-name
     dictionary typically has only a few thousand distinct 4-byte
     prefixes — and the deduped prefix set is bucketed by the existing
     selectivity-modeled planner (plan_buckets) into a small limb budget.
     The existing bitmap kernel runs unchanged (ops/fingerprint.py): one
     output bit per haystack position means "some deduped prefix chain
     ends here". Kernel cost is ~0.25 ms per limb per 64 MiB, so the
     whole coarse pass prices independently of pattern count.
  2. *Exact-membership probes.* Dense rolling key arrays H_c (the c-byte
     window ending at each position: the exact bytes as an int32 key for
     c <= 4, a polynomial hash for c = 8) are computed elementwise in
     XLA at upload time. Each candidate position probes a per-length-
     class cuckoo table of the distinct class-c pattern prefixes — two
     ~3 ns element gathers per class replace the reference's
     per-candidate bucket memcmp loop (teddy/generic.rs:820-870).
  3. *CSR group expansion + full verify.* A cuckoo hit resolves to an
     (offset, count) range over a prefix-sorted pattern-id array;
     (candidate x group-member) pairs are expanded ON DEVICE with the
     rank/select machinery (ops/compaction.py `_select_units`), and each
     pair performs one padded-pattern-matrix row gather plus a wide byte
     compare against the candidate's window. The final compare covers
     the WHOLE pattern, so stage-1/2 false positives and h8 collisions
     cost time, never correctness.

Unlike DeviceVerify (fingerprint.py), the CSR expansion places NO bound
on how many patterns may share a fingerprint (GMAX_CAP): prefix-heavy
dictionaries expand to exactly as many compare rows as their groups
hold, with an adaptive device-side cap.

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
from .compaction import _select_units, select_nonzero_words
from .fingerprint import (
    FP_LEN,
    FingerprintTables,
    _build_cuckoo,
    _fold,
    _fold_arr,
    _fp_pallas,
    _gather_windows,
    _make_fp_baked_kernel,
    _make_fp_kernel,
    _mclass,
    _rank_select,
    _unpack_fold,
    plan_buckets,
    strong_pad_byte,
)

Q_COARSE = 4            # coarse dedup prefix bytes (min(Q, len) per pattern)
W_CASCADE = 64          # max pattern length handled on-device
H8_MULT = np.uint32(0x9E3779B1)   # polynomial base for the class-8 key
# Coarse plan ladder: limb budgets; escalation refines prefix buckets.
CASCADE_LEVELS = (10, 16, 24, 32)
# Candidate / expansion hostility bounds (fractions of n).
CAND_SHIFT = 4          # > n/16 candidates: filter-hostile
EXP_SHIFT = 4           # > n/16 expanded compare rows: group-hostile
CAND_FLOOR = 1 << 16
# Below this haystack size the facade's host paths win; the engine still
# functions (tests force it) but starts with small caps.
CAP0 = 1 << 14


def _qlen(c: int) -> int:
    """Coarse prefix length contributed by a class-c pattern."""
    return min(Q_COARSE, c)


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------
class ClassTable:
    """Exact-membership cuckoo + CSR pid groups for one length class.

    Construction is fully vectorized (a 100k-pattern build must stay in
    the reference's ~quarter-second class, src/ahocorasick.rs:46-55)."""

    def __init__(self, c: int, folded: List[bytes], pids: List[int],
                 rng) -> None:
        self.c = c
        pid_arr = np.asarray(pids, np.int64)
        pmx = np.frombuffer(
            b"".join(folded[pid][:c] for pid in pids), np.uint8
        ).reshape(-1, c).astype(np.uint32)
        key = np.zeros(len(pids), np.uint32)
        if c <= 4:
            for j in range(c):
                key = (key << np.uint32(8)) | pmx[:, j]
        else:
            for j in range(c):
                key = key * H8_MULT + pmx[:, j]
        order = np.argsort(key, kind="stable")
        key_s, pid_s = key[order], pid_arr[order]
        uniq, starts, counts = np.unique(
            key_s, return_index=True, return_counts=True
        )
        a, b, logT, slot = _build_cuckoo(uniq.tolist(), rng)
        T = 1 << logT
        self.mult_a = np.uint32(a)
        self.mult_b = np.uint32(b)
        self.logT = logT
        self.tkeys = np.zeros(T, np.uint32)
        self.goff = np.zeros(T, np.int32)
        self.gcnt = np.zeros(T, np.int32)
        self.tkeys[slot] = uniq
        self.goff[slot] = starts.astype(np.int32)
        self.gcnt[slot] = counts.astype(np.int32)
        self.pidlist = pid_s.astype(np.int32)


class CascadeTables:
    """All build products: coarse filter plan + class tables + verify
    matrices for the main (<= W_CASCADE) pattern set."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool,
                 k_budget: int):
        self.ci = case_insensitive
        folded = [_fold(p) if case_insensitive else p for p in patterns]
        self.folded = folded
        P = len(patterns)
        plens = np.array([len(p) for p in patterns], np.int64)
        self.plens = plens
        # Coarse: dedup min(Q, len)-byte prefixes (on folded bytes so
        # case pairs dedup together), then plan + mask them with the
        # existing machinery WITH the engine's case flag: the kernel
        # sees raw haystack bytes, so the charmasks must cover both
        # case variants (folding then re-expanding is exact for ASCII).
        prefixes = sorted({p[:_qlen(_mclass(len(p)))] for p in folded})
        self.num_prefixes = len(prefixes)
        self.coarse = FingerprintTables(prefixes, case_insensitive,
                                        k_budget)
        # Classes: exact-membership tables.
        rng = np.random.default_rng(0xCA5)
        groups = defaultdict(list)
        for pid, p in enumerate(folded):
            groups[_mclass(len(p))].append(pid)
        self.classes = {
            c: ClassTable(c, folded, pids, rng)
            for c, pids in groups.items()
        }
        # One global pid list: per-class CSR offsets get a base added.
        base = 0
        parts = []
        for c in sorted(self.classes):
            t = self.classes[c]
            t.goff = t.goff + base
            base += len(t.pidlist)
            parts.append(t.pidlist)
        self.pidarr = np.concatenate(parts) if parts else np.zeros(
            0, np.int32
        )
        # Verify matrices: pattern bytes at the window-aligned column.
        # The candidate window is anchored at e_pos - (FP_LEN - 1) where
        # e_pos is the coarse q-gram end, so a class-c pattern (coarse
        # prefix q = _qlen(c)) starts at column FP_LEN - q.
        self.W = -(-int(FP_LEN - 1 + plens.max()) // 8) * 8
        self.pmat = np.zeros((P, self.W), np.uint8)
        qarr = np.array([_qlen(_mclass(int(x))) for x in plens], np.int32)
        self.pcol = (FP_LEN - qarr).astype(np.int32)
        flat = np.frombuffer(b"".join(folded), np.uint8)
        rows = np.repeat(np.arange(P, dtype=np.int64), plens)
        off = np.cumsum(plens) - plens
        within = np.arange(len(flat), dtype=np.int64) - np.repeat(
            off, plens
        )
        self.pmat[rows, within + self.pcol[rows]] = flat
        self.plens32 = plens.astype(np.int32)
        self._dev = None

    def memory_usage(self) -> int:
        total = (self.pmat.nbytes + self.pcol.nbytes
                 + self.plens32.nbytes + self.pidarr.nbytes)
        ct = self.coarse
        total += (ct.lo.nbytes + ct.hi.nbytes + ct.start.nbytes
                  + ct.end.nbytes)
        for t in self.classes.values():
            total += t.tkeys.nbytes + t.goff.nbytes + t.gcnt.nbytes
        return total

    def meta_key(self):
        """Static shape identity of the verify stages for jit caching."""
        return (
            self.W,
            tuple(sorted(
                (c, t.logT) for c, t in self.classes.items()
            )),
        )

    def device_args(self):
        if self._dev is None:
            self._dev = {
                "classes": {
                    c: (jnp.uint32(t.mult_a), jnp.uint32(t.mult_b),
                        jnp.asarray(t.tkeys), jnp.asarray(t.goff),
                        jnp.asarray(t.gcnt))
                    for c, t in self.classes.items()
                },
                "pidarr": jnp.asarray(self.pidarr),
                "pmat": jnp.asarray(self.pmat),
                "pcol": jnp.asarray(self.pcol),
                "plens": jnp.asarray(self.plens32),
            }
        return self._dev


# ---------------------------------------------------------------------------
# Dense rolling key maps
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("classes", "fold"))
def _h_maps(x32, classes: Tuple[int, ...], fold: bool):
    """Per-class dense key arrays over the packed haystack: H[c][i] is
    the key of the c bytes ending at flat position i (folded when the
    engine is case-insensitive). Computed once at upload time — the keys
    depend only on the haystack, not the pattern set."""
    b = (
        (x32[:, None] >> jnp.array([0, 8, 16, 24], jnp.int32)) & 255
    ).astype(jnp.uint8).reshape(-1)
    if fold:
        b = jnp.where((b >= 65) & (b <= 90), b | 32, b)
    x = b.astype(jnp.uint32)
    out = {}
    for c in classes:
        if c <= 4:
            h = jnp.zeros_like(x)
            for s in range(c - 1, -1, -1):
                h = (h << jnp.uint32(8)) | jnp.roll(x, s)
        else:
            h = jnp.zeros_like(x)
            for s in range(c - 1, -1, -1):
                h = h * H8_MULT + jnp.roll(x, s)
        out[c] = h
    return out


# ---------------------------------------------------------------------------
# Fused device pipeline
# ---------------------------------------------------------------------------
def _probe_expand_verify(e_pos, live, hmaps, wnd, n, dv, meta,
                         extract: bool, cap_e: int, cap_m: int):
    """Stages 2+3: per-class cuckoo probes, CSR expansion, full verify.

    Returns (total_expanded, total_matches[, out_pid, out_end])."""
    cap_c = e_pos.shape[0]
    cls = sorted(meta)
    cnt_parts, off_parts, sp_parts = [], [], []
    for c in cls:
        logT = meta[c]
        ha, hb, tkeys, goff, gcnt = dv["classes"][c]
        ec = e_pos + (c - _qlen(c))
        valid = live & (ec >= c - 1) & (ec < n)
        ecc = jnp.clip(ec, 0, hmaps[c].shape[0] - 1)
        h = jnp.take(hmaps[c], ecc)
        sh = jnp.uint32(32 - logT)
        s1 = ((h * ha) >> sh).astype(jnp.int32)
        s2 = ((h * hb) >> sh).astype(jnp.int32)
        use1 = jnp.take(tkeys, s1) == h
        use2 = jnp.take(tkeys, s2) == h
        slot = jnp.where(use1, s1, s2)
        hit = (use1 | use2) & valid
        cnt_parts.append(
            jnp.where(hit, jnp.take(gcnt, slot), 0)
        )
        off_parts.append(jnp.take(goff, slot))
        sp_parts.append(ec - (c - 1))  # candidate pattern start
    counts = jnp.concatenate(cnt_parts)
    offs = jnp.concatenate(off_parts)
    sps = jnp.concatenate(sp_parts)
    # Device expansion: unit r of group src -> compare row.
    total_e, src, live_e, resid = _select_units(
        counts.reshape(-1, 128), cap_e
    )
    src = jnp.where(live_e, src, 0)
    pid = jnp.take(dv["pidarr"],
                   jnp.take(offs, src) + resid.astype(jnp.int32))
    pid = jnp.where(live_e, pid, 0)
    sp_e = jnp.take(sps, src)
    plen = jnp.take(dv["plens"], pid)
    pcol = jnp.take(dv["pcol"], pid)
    wrow = jnp.take(wnd, src % cap_c, axis=0)          # [cap_e, W]
    prow = jnp.take(dv["pmat"], pid, axis=0)           # [cap_e, W]
    colv = jnp.arange(wnd.shape[1], dtype=jnp.int32)[None, :]
    care = (colv >= pcol[:, None]) & (colv < (pcol + plen)[:, None])
    eq = jnp.all((wrow == prow) | ~care, axis=1)
    ok = (live_e & eq & (sp_e >= 0) & (sp_e + plen <= n))
    total = jnp.sum(ok.astype(jnp.int32))
    if not extract:
        return total_e, total
    endv = sp_e + plen
    okm = ok.astype(jnp.int32)
    _, mi, _, mlive = select_nonzero_words(okm, cap_m)
    out_pid = jnp.where(mlive, jnp.take(pid, mi), -1)
    out_end = jnp.where(mlive, jnp.take(endv, mi), -1)
    return total_e, total, out_pid, out_end


@functools.lru_cache(maxsize=32)
def _cascade_jit(coarse_key, meta_key, K: int, L: int, Lc: int, H: int,
                 tiles: int, extract: bool):
    """Fused baked pipeline: coarse bitmap kernel -> rank/select ->
    probes -> expansion -> verify. One dispatch; only scalars (count) or
    O(#matches) pairs (extract) leave the device."""
    kernel = _make_fp_baked_kernel(*coarse_key, K, Lc, H)
    W, cls = meta_key
    meta = dict(cls)

    def fn(halo, body, u8f, hmaps, n, dv, cap_c, cap_e, cap_m=None):
        cnt, bmp = _fp_pallas(kernel, None, halo, body,
                              K, L, Lc, tiles, H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        out = _probe_expand_verify(e_pos, live, hmaps, wnd, n, dv, meta,
                                   extract, cap_e, cap_m)
        return (ncand,) + out

    static = ("cap_c", "cap_e", "cap_m") if extract else ("cap_c", "cap_e")
    return jax.jit(fn, static_argnames=static)


@functools.lru_cache(maxsize=32)
def _cascade_generic_jit(meta_key, K: int, L: int, Lc: int, H: int,
                         tiles: int, extract: bool):
    """Table-generic variant (coarse masks in SMEM, position-masked):
    one compile serves every pattern set with the same shapes — used for
    small inputs and pattern sets without a strong pad byte."""
    W, cls = meta_key
    meta = dict(cls)

    def fn(lo, hi, sm, em, nn, halo, body, u8f, hmaps, n, dv,
           cap_c, cap_e, cap_m=None):
        kernel = _make_fp_kernel(K, L, Lc, H)
        cnt, bmp = _fp_pallas(kernel, (lo, hi, sm, em, nn), halo, body,
                              K, L, Lc, tiles, H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        out = _probe_expand_verify(e_pos, live, hmaps, wnd, n, dv, meta,
                                   extract, cap_e, cap_m)
        return (ncand,) + out

    static = ("cap_c", "cap_e", "cap_m") if extract else ("cap_c", "cap_e")
    return jax.jit(fn, static_argnames=static)


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------
class CascadeHaystack:
    """Device-resident cascade layout: upload once, search many times
    (packed kernel streams + verify strip + dense key maps)."""

    __slots__ = ("n", "L", "Lc", "tiles", "baked", "halo_a", "body",
                 "u8f", "hmaps", "hs", "side")

    def __init__(self, n, L, Lc, tiles, baked, halo_a, body, u8f, hmaps,
                 hs, side):
        self.n = n
        self.L = L
        self.Lc = Lc
        self.tiles = tiles
        self.baked = baked
        self.halo_a = halo_a
        self.body = body
        self.u8f = u8f
        self.hmaps = hmaps
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
            "prefixes, K=%d, W=%d, classes=%s",
            P, len(self.long_pids), self.tables.num_prefixes,
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
        prefixes = sorted({p[:_qlen(_mclass(len(p)))] for p in folded})
        return plan_buckets(prefixes, case_insensitive,
                            CASCADE_LEVELS[-1]) is not None

    def _tables(self, lvl: int) -> Optional[CascadeTables]:
        if lvl not in self._tables_cache:
            folded = [_fold(p) if self.ci else p for p in self._main_pats]
            prefixes = sorted({
                p[:_qlen(_mclass(len(p)))] for p in folded
            })
            if plan_buckets(prefixes, self.ci,
                            CASCADE_LEVELS[lvl]) is None:
                self._tables_cache[lvl] = None
            else:
                self._tables_cache[lvl] = CascadeTables(
                    self._main_pats, self.ci, CASCADE_LEVELS[lvl]
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
        L = max(self.halo, 128, min(2048, _pow2(-(-n // LANES))))
        tiles = max(1, _pow2(-(-n // (LANES * L))))
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
        hm = _h_maps(x32, tuple(sorted(self.tables.classes)), self.ci)
        baked = self.pad_byte is not None
        side_ph = self.side.prepare(hs) if self.side is not None else None
        return CascadeHaystack(n, L, Lc, tiles, baked, halo_a, body,
                               u8f, hm, hs, side_ph)

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
                args = (ph.halo_a, ph.body, ph.u8f, ph.hmaps, n_dev, dv)
            else:
                fn = _cascade_generic_jit(
                    mk, t.coarse.k, L, Lc, self.halo, tiles, extract,
                )
                args = (*t.coarse.device_args(), nn, ph.halo_a, ph.body,
                        ph.u8f, ph.hmaps, n_dev, dv)
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
