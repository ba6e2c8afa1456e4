"""Two-stage staged count: fingerprint prefilter + exact rescan on TPU.

The reference's headline throughput comes from prefilters that skip most
bytes and hand candidates to the automaton (util/prefilter.rs:33-94,
packed Teddy). The TPU translation of "skip" is *stream-granular
filtering*: a cheap stage-1 pass flags which of the thousands of
lane-parallel streams can possibly contain a match, and the exact
bit-parallel kernel (ops/bitap.py) rescans only those.

Stage 1 — fingerprint flags. Each pattern contributes its first
``min(4, len)`` bytes as an exact-prefix chain; all fingerprints pack
into ``Kf = ceil(sum/32)`` limbs (typically 1 vs the full set's K). One
baked bitap pass ORs fingerprint end-hits per stream — including the
halo warmup, so a full match ending just inside a stream's countable
region (whose fingerprint lands in the halo) still flags it. An absent
fingerprint hit PROVES the stream has no full-match end: a match of
pattern p ending at e contains p's fingerprint ending at
e - len + f <= e, and >= e - (H - 1) so it lies inside the stream's
scanned window (H >= max_pattern_len - 1 >= len - f).

Stage 2 — exact rescan of candidates. Candidate stream rows (plus their
halo rows) are gathered on device (row-wise DMA, no host roundtrip) and
the full-K masked kernel runs over the compacted set, with each lane
carrying its ORIGINAL stream id so position masking and counting are
unchanged. Stage 2 is the exact engine, so stage-1 false positives only
cost time.

Worst case (every stream flagged) degrades to ~stage1 + full cost; the
facade only routes large counts here, and the expected case —
match-sparse scans, the reference's own headline regime — runs at
roughly (1/Kf) : (K * hit_rate) of the full-kernel cost.

Extraction rides the same two stages (`_staged_extract_jit` /
`StagedEngine.match_pairs`): end-bit words are written for flagged
candidate streams only, so match-sparse extraction runs at ~count cost
instead of paying n * Ke * 4 bytes of HBM like the single-pass extract
kernel.
"""

from __future__ import annotations

import functools
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
    BitapTables,
    _emit_mux_const,
    _interpret,
    _pow2,
)

# Streams shorter than the full engine's: smaller blocks keep the
# per-stream candidate probability low on sparse inputs.
STAGED_L = 512
# Below this haystack size the single-pass engine wins (staging adds a
# fixed two-kernel + gather overhead).
STAGED_MIN = 1 << 22
FINGERPRINT_BYTES = 4


def _fingerprints(patterns: List[bytes]) -> List[bytes]:
    return [p[:FINGERPRINT_BYTES] for p in patterns]


# ---------------------------------------------------------------------------
# Stage 1: per-stream fingerprint flags (baked tables, halo hits counted)
# ---------------------------------------------------------------------------
def _make_flags_kernel(lo_c, hi_c, sm_c, em_c, K: int, Lc: int, H: int):
    Wc = Lc // 4
    Hw = H // 4

    def kernel(halo_ref, body_ref, flag_ref, ms_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def advance(ms, b):
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms, hit = [], None
            carry = jnp.zeros((R, 128), jnp.int32)
            for k in range(K):
                lo_t = _emit_mux_const(bits[:4], lo_c[k])
                hi_t = _emit_mux_const(bits[4:], hi_c[k])
                if lo_t is None or hi_t is None:
                    cm = jnp.zeros((R, 128), jnp.int32)
                else:
                    cm = lo_t & hi_t
                nm = ((ms[k] << 1) | carry | sm_c[k]) & cm
                carry = lax.shift_right_logical(ms[k], 31) & 1
                nms.append(nm)
                if em_c[k]:
                    h = nm & em_c[k]
                    hit = h if hit is None else (hit | h)
            return nms, hit

        @pl.when(j == 0)
        def _warmup():
            # Unlike the count kernel, halo hits are ORed into the flag:
            # a fingerprint that ends in the halo still marks the stream.
            def hstep(w, carry):
                ms, fl = carry
                word = halo_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms, hit = advance(ms, b)
                    if hit is not None:
                        fl = fl | hit
                return ms, fl
            z = [jnp.zeros((R, 128), jnp.int32)] * K
            fl0 = jnp.zeros((R, 128), jnp.int32)
            if Hw:
                ms, fl0 = lax.fori_loop(0, Hw, hstep, (z, fl0))
            else:
                ms = z
            row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            first = ((i * R + row) * 128 + col) == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            flag_ref[0] = jnp.where(first, 0, fl0)

        def step(w, carry):
            ms, fl = carry
            word = body_ref[w]
            for jj in range(4):
                b = lax.shift_right_logical(word, 8 * jj) & 255
                ms, hit = advance(ms, b)
                if hit is not None:
                    fl = fl | hit
            return ms, fl

        ms0 = [ms_ref[k] for k in range(K)]
        ms, fl = lax.fori_loop(0, Wc, step, (ms0, flag_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        flag_ref[0] = fl

    return kernel


# ---------------------------------------------------------------------------
# Stage 2: exact count over gathered candidate streams
# ---------------------------------------------------------------------------
def _make_gathered_kernel(lo_c, hi_c, sm_c, em_c, K: int, L: int, Lc: int,
                          H: int, extract: bool = False):
    """Baked exact kernel over compacted streams: lane (r, c) of tile i
    carries original stream id sid_ref[0, r, c] (-1 = padding lane); the
    count window is [n0, n) in ORIGINAL haystack coordinates.

    Extract mode additionally writes the end-bit words of end-bearing
    limbs per position (masked to the count window), the gathered analog
    of the single-pass extract kernel (bitap._make_baked_kernel)."""
    Wc = Lc // 4
    Hw = H // 4

    def kernel(nn_ref, sid_ref, halo_ref, body_ref, *out_and_scratch):
        if extract:
            cnt_ref, words_ref, ms_ref = out_and_scratch
        else:
            cnt_ref, ms_ref = out_and_scratch
        j = pl.program_id(1)
        sid = sid_ref[0]
        n0 = nn_ref[0]
        n = nn_ref[1]

        def advance(ms, b):
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms, hits = [], []
            carry = jnp.zeros((R, 128), jnp.int32)
            for k in range(K):
                lo_t = _emit_mux_const(bits[:4], lo_c[k])
                hi_t = _emit_mux_const(bits[4:], hi_c[k])
                if lo_t is None or hi_t is None:
                    cm = jnp.zeros((R, 128), jnp.int32)
                else:
                    cm = lo_t & hi_t
                nm = ((ms[k] << 1) | carry | sm_c[k]) & cm
                carry = lax.shift_right_logical(ms[k], 31) & 1
                nms.append(nm)
                hits.append(nm & em_c[k] if em_c[k] else None)
            return nms, hits

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
            first = sid == 0  # original stream 0: halo wraps, reset
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        pos_base = sid * L + j * Lc

        def step(w, carry):
            ms, acc = carry
            word = body_ref[w]
            for jj in range(4):
                b = lax.shift_right_logical(word, 8 * jj) & 255
                ms, hits = advance(ms, b)
                pos = pos_base + (w * 4 + jj)
                ok = (sid >= 0) & (pos >= n0) & (pos < n)
                ke = 0
                for k in range(K):
                    if hits[k] is None:
                        continue
                    masked = jnp.where(ok, hits[k], 0)
                    acc = acc + lax.population_count(masked)
                    if extract:
                        words_ref[0, w * 4 + jj, ke] = masked
                        ke += 1
            return ms, acc

        ms0 = [ms_ref[k] for k in range(K)]
        ms, acc = lax.fori_loop(0, Wc, step, (ms0, cnt_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = acc

    return kernel


@functools.lru_cache(maxsize=128)
def _staged_jit(fp_key, full_key, Kf: int, K: int, L: int, Lc: int,
                H: int, tiles: int, cap: int):
    """One fused jit: stage-1 flags -> device gather -> stage-2 count.

    Returns fn(rows, hrows, halo, body, nn) -> (total, n_candidates);
    `total` is only valid when n_candidates <= cap (the caller retries
    with a bigger cap, then falls back to the single-pass engine).
    rows/hrows/halo/body come from StagedEngine.prepare — the row and
    stream-major layouts are computed once at upload time, not per call.
    """
    flags_kernel = _make_flags_kernel(*fp_key[:2], fp_key[2], fp_key[3],
                                      Kf, Lc, H)
    gath_kernel = _make_gathered_kernel(*full_key[:2], full_key[2],
                                        full_key[3], K, L, Lc, H)
    ns = tiles * LANES
    Wb = L // 4
    Hw = H // 4
    nchunks = L // Lc
    Wc = Lc // 4
    tiles_c = cap // LANES

    def fn(rows, hrows, halo, body, nn):
        flags = pl.pallas_call(
            flags_kernel,
            grid=(tiles, nchunks),
            in_specs=[
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((Kf, R, 128), jnp.int32)],
            interpret=_interpret(),
        )(halo, body)
        # [tiles, R, 128] C-order flatten IS stream order:
        # stream s = (tile*R + row)*128 + col. Candidate compaction via
        # succinct rank/select (ops/compaction.py) — jnp.nonzero lowers
        # to ~10 ns/element scanned on TPU (1.3 ms for these ns streams,
        # measured), which alone halved the staged path's throughput.
        from .compaction import select_nonzero_words

        fl = flags[0].reshape(ns)
        ncand, widx, _, live = select_nonzero_words(fl, cap)
        cand = jnp.where(live, widx, -1)
        safe = jnp.maximum(cand, 0)
        grows = jnp.take(rows, safe, axis=0)
        ghalo = jnp.take(hrows, safe, axis=0)
        gbody = grows.T.reshape(Wb, cap // 128, 128)
        ghal = ghalo.T.reshape(Hw, cap // 128, 128)
        sid_t = cand.reshape(tiles_c, R, 128).astype(jnp.int32)
        counts = pl.pallas_call(
            gath_kernel,
            grid=(tiles_c, nchunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # nn [2]
                pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((tiles_c, R, 128), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
            interpret=_interpret(),
        )(nn, sid_t, ghal, gbody)
        return jnp.sum(counts[0]), ncand

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _staged_extract_jit(fp_key, full_key, Kf: int, K: int, L: int,
                        Lc: int, Lce: int, H: int, tiles: int, cap: int,
                        cap_w: int, Ke: int):
    """Fused extraction: stage-1 flags -> device gather -> stage-2
    extract kernel (end-bit words for candidate streams only) -> word
    compaction. The end-word HBM traffic scales with the candidate
    fraction, not the haystack — extraction at ~count cost on
    match-sparse inputs (the reference's own headline regime is
    find_iter, record/x86_64 sherlock rows).

    Returns fn(rows, hrows, halo, body, nn) ->
    (total, ncand, cand[cap], nnzw, widx[cap_w], vals[cap_w])."""
    flags_kernel = _make_flags_kernel(*fp_key[:2], fp_key[2], fp_key[3],
                                      Kf, Lc, H)
    gath_kernel = _make_gathered_kernel(*full_key[:2], full_key[2],
                                        full_key[3], K, L, Lce, H,
                                        extract=True)
    ns = tiles * LANES
    Wb = L // 4
    Hw = H // 4
    nchunks = L // Lc
    Wc = Lc // 4
    nchunks_e = L // Lce
    Wce = Lce // 4
    tiles_c = cap // LANES

    def fn(rows, hrows, halo, body, nn):
        from .compaction import select_nonzero_words

        flags = pl.pallas_call(
            flags_kernel,
            grid=(tiles, nchunks),
            in_specs=[
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((Kf, R, 128), jnp.int32)],
            interpret=_interpret(),
        )(halo, body)
        fl = flags[0].reshape(ns)
        ncand, widx, _, live = select_nonzero_words(fl, cap)
        cand = jnp.where(live, widx, -1)
        safe = jnp.maximum(cand, 0)
        grows = jnp.take(rows, safe, axis=0)
        ghalo = jnp.take(hrows, safe, axis=0)
        gbody = grows.T.reshape(Wb, cap // 128, 128)
        ghal = ghalo.T.reshape(Hw, cap // 128, 128)
        sid_t = cand.reshape(tiles_c, R, 128).astype(jnp.int32)
        counts, words = pl.pallas_call(
            gath_kernel,
            grid=(tiles_c, nchunks_e),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # nn [2]
                pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wce, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lce, Ke, R, 128),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((tiles_c, R, 128), jnp.int32),
                jax.ShapeDtypeStruct((tiles_c, L, Ke, R, 128),
                                     jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
            interpret=_interpret(),
        )(nn, sid_t, ghal, gbody)
        total = jnp.sum(counts)
        flat = words.reshape(-1)
        nnzw, wix, vals, wlive = select_nonzero_words(flat, cap_w)
        wix = jnp.where(wlive, wix, flat.shape[0])
        return total, ncand, cand, nnzw, wix, vals

    return jax.jit(fn)


class StagedHaystack:
    """Device-resident staged-engine layout: upload + transpose once,
    count many times (the production repeated-search path)."""

    __slots__ = ("n", "L", "Lc", "tiles", "rows", "hrows", "halo_a",
                 "body")

    def __init__(self, n, L, Lc, tiles, rows, hrows, halo_a, body):
        self.n = n
        self.L = L
        self.Lc = Lc
        self.tiles = tiles
        self.rows = rows        # [ns, Wb] int32 row-major (stage-2 gather)
        self.hrows = hrows      # [ns, Hw] halo rows
        self.halo_a = halo_a    # stream-major halo (stage-1)
        self.body = body        # stream-major body (stage-1)


@functools.partial(jax.jit, static_argnames=("L", "tiles", "H"))
def _staged_layouts(x32, L: int, tiles: int, H: int):
    ns = tiles * LANES
    Wb = L // 4
    Hw = H // 4
    rows = x32.reshape(ns, Wb)
    hrows = jnp.roll(x32, Hw).reshape(ns, Wb)[:, :Hw]
    body = rows.T.reshape(Wb, ns // 128, 128)
    halo = hrows.T.reshape(Hw, ns // 128, 128)
    return rows, hrows, halo, body


class StagedEngine:
    """Count-mode engine: fingerprint prefilter + exact rescan."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        self.patterns = patterns
        self.full = BitapTables(patterns, case_insensitive)
        self.fp = BitapTables(_fingerprints(patterns), case_insensitive)
        h = max(self.full.max_pattern_len - 1, 1)
        self.halo = max(_pow2(h), 4)
        # Extraction caps persist per engine instance: settled once,
        # repeated searches dispatch exactly one fused call.
        self._cap_s = 0
        self._cap_w = 0

    @classmethod
    def eligible(cls, patterns: List[bytes], n: int,
                 case_insensitive: bool = False) -> bool:
        from .bitap import BitapEngine

        if n < STAGED_MIN or not BitapEngine.eligible(patterns):
            return False
        fp = _fingerprints(patterns)
        # Staging pays off when fingerprints are materially cheaper.
        kf = (sum(len(p) for p in fp) + 31) // 32
        k = (sum(len(p) for p in patterns) + 31) // 32
        if kf * 2 > k:
            return False
        # Both stages run pad-padded (no position masking in stage 1).
        tables = BitapTables(patterns, case_insensitive)
        return tables.pad_byte is not None

    def _layout(self, n: int) -> Tuple[int, int, int]:
        from .bitap import _round_tiles

        L = max(self.halo, STAGED_L)
        tiles = max(1, _round_tiles(-(-n // (LANES * L))))
        Lc = min(L, 512)
        return L, Lc, tiles

    def prepare(self, hs: bytes) -> StagedHaystack:
        """Upload a haystack into the device-resident staged layout."""
        n = len(hs)
        L, Lc, tiles = self._layout(max(n, 1))
        ns = tiles * LANES
        pad = self.full.pad_byte
        assert pad is not None
        buf = np.full(ns * L, pad, np.uint8)
        buf[:n] = np.frombuffer(hs, np.uint8)
        x32 = jax.device_put(jnp.asarray(buf.view(np.int32)))
        rows, hrows, halo_a, body = _staged_layouts(
            x32, L, tiles, self.halo
        )
        return StagedHaystack(n, L, Lc, tiles, rows, hrows, halo_a, body)

    def count_fn(self, ph: StagedHaystack, cap: int):
        """The compiled count entry for a prepared layout (bench hook)."""
        fn = _staged_jit(self.fp.baked_key(), self.full.baked_key(),
                         self.fp.k, self.full.k, ph.L, ph.Lc, self.halo,
                         ph.tiles, cap)
        nn = jnp.asarray([0, ph.n], jnp.int32)
        return lambda: fn(ph.rows, ph.hrows, ph.halo_a, ph.body, nn)

    def match_pairs(self, hs):
        """All overlapping matches as (pids, ends), or None on candidate
        overflow (caller falls back).

        Extraction rides the same two-stage structure as counting: the
        end-bit words that the single-pass extract kernel would write
        for EVERY position (n * Ke * 4 bytes of HBM) are written only
        for flagged candidate streams — on match-sparse inputs the
        extract scan runs at ~count cost, which is what the reference's
        prefilter-accelerated find_iter headline measures."""
        from .bitap import decode_match_words

        ph = hs if isinstance(hs, StagedHaystack) else None
        if ph is None:
            if len(hs) == 0:
                return np.zeros(0, np.int64), np.zeros(0, np.int64)
            ph = self.prepare(hs)
        if ph.n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        t = self.full
        Ke = len(t.end_limbs)
        L = ph.L
        Lce = ph.Lc
        while Lce * Ke > 1024 and Lce > 4:
            Lce //= 2
        ns = ph.tiles * LANES
        nn = jnp.asarray([0, ph.n], jnp.int32)
        cap = max(self._cap_s, max(LANES, _pow2(ns // 8)))
        cap_w = max(self._cap_w, 4096)
        while cap <= ns:
            fn = _staged_extract_jit(
                self.fp.baked_key(), t.baked_key(), self.fp.k, t.k,
                L, ph.Lc, Lce, self.halo, ph.tiles, cap, cap_w, Ke,
            )
            total, ncand, cand, nnzw, wix, vals = fn(
                ph.rows, ph.hrows, ph.halo_a, ph.body, nn
            )
            if int(ncand) > cap:
                cap = max(cap * 2, _pow2(int(ncand)))
                continue
            if int(nnzw) > cap_w:
                cap_w = max(64, _pow2(int(nnzw)))
                continue
            break
        else:
            return None
        self._cap_s = max(self._cap_s, cap)
        self._cap_w = max(self._cap_w, cap_w)
        if int(total) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        words_size = (cap // LANES) * L * Ke * LANES
        return decode_match_words(
            t, np.asarray(wix).astype(np.int64),
            np.asarray(vals).view(np.uint32), L, Ke, words_size,
            end_limbs=t.end_limbs, stream_map=np.asarray(cand),
        )

    def count_matches(self, hs) -> Optional[int]:
        """Exact overlapping-match count, or None when the candidate set
        overflowed the gather capacity (caller falls back)."""
        ph = hs if isinstance(hs, StagedHaystack) else None
        if ph is None:
            if len(hs) == 0:
                return 0
            ph = self.prepare(hs)
        if ph.n == 0:
            return 0
        ns = ph.tiles * LANES
        # Start with an optimistic rescan budget and grow on overflow:
        # the gather + stage-2 cost is proportional to cap, and most
        # workloads flag well under an eighth of the streams.
        cap = max(LANES, _pow2(ns // 8))
        while cap <= ns:
            total, ncand = self.count_fn(ph, cap)()
            if int(ncand) <= cap:
                return int(total)
            cap = max(cap * 2, _pow2(int(ncand)))
        return None
