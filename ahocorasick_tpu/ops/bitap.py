"""Bit-parallel shift-AND multi-pattern engine — the TPU fast path.

Replaces the reference's dependent-gather DFA walk
(/root/reference/src/automaton.rs:1284-1420, one table lookup per byte,
~0.9 GB/s/core) with a formulation that maps onto the TPU VPU with *no
gathers at all* (measured: any gather inside a Pallas kernel is emulated at
~3.4 us/step on v5e, while plain vector ops retire at ~0.5 ns/op).

Algorithm (bitap / Baeza-Yates-Gonnet shift-AND, generalized to multiple
patterns): concatenate all pattern byte chains into one bit string — bit
``g`` means "the first ``i+1`` bytes of pattern ``p`` are a suffix of the
text read so far", where ``g = chain_offset[p] + i``. One step per byte:

    m' = ((m << 1) | start_mask) & charmask[byte]

A match of pattern ``p`` ends at a position exactly when its final chain
bit is set — the *complete overlapping match set* falls out directly, in
the same (pid, end) form the dense-DFA path derives from match states.
Chains are packed back to back with no guard bits: the bit leaking from
chain ``p`` into the first bit of chain ``p+1`` is absorbed because that
bit's value is forced to ``charmask & 1`` by the always-set start mask.

State is ``K = ceil(total_pattern_bytes / 32)`` int32 limbs. Each Pallas
kernel lane advances one *stream* (an L-byte block of the haystack, with an
H-byte halo warming up the state — the suffix property that powers the
reference's stream roll buffer, util/buffer.rs:113-123). A [8,128] tile of
lanes = 1024 streams per grid step; per input byte the kernel does

  - charmask lookup as two 16-entry *binary mux trees* over the byte's
    nybbles (15 lane-selects each, scalar leaves from SMEM) — exact, not a
    Teddy-style approximation, because every chain bit corresponds to one
    byte value (or an ASCII case pair, which shares its low nybble so the
    lo/hi factorization stays a product set);
  - the shift/or/and state update plus a popcount on the end-bit mask.

That is ~(18 + 39K) VPU ops per 1024 bytes, i.e. ~10+ GB/s/chip for the
reference's 5-pattern headline benchmark (K=3) versus 0.86 GB/s for its
x86_64 dense DFA.

Haystack layout: bytes are packed 4-per-int32 on the host (free), uploaded
once, and transposed on device so lane ``s`` reads stream ``s``'s words
down the time axis. The kernel grid is (stream-tiles, time-chunks) with
the per-lane state carried across time chunks in VMEM scratch.
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

R = 8            # sublanes per tile: [8, 128] int32 = one vreg
LANES = R * 128  # streams per grid tile

# Eligibility bounds for this engine (beyond them: dense-DFA fallback).
# Cost scales ~linearly in limbs: measured 83 GB/s at K=1, 8.4 GB/s at
# K=19 on v5e, so even K=64 comfortably beats the dense-DFA scan.
MAX_LIMBS = 64        # <= 2048 total pattern bytes
MAX_PATTERN_LEN = 2048
# Extraction processes at most this many haystack bytes per kernel launch
# (bounds the K-words-per-byte device output); count mode is unchunked.
MAX_EXTRACT_CHUNK = 1 << 23
# Haystacks at least this long use the constant-baked kernel variant
# (tables folded into the compiled kernel: pruned select trees + no
# position masking via a pad byte). Below it, the table-generic SMEM
# kernel amortizes one compile across all pattern sets of equal shape.
BAKED_MIN = 1 << 20


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _round_tiles(need: int) -> int:
    """Round a tile count up to <= 4 significant bits.

    Pallas grids are static, so every distinct tile count is a separate
    compile; pure power-of-two rounding bounded that diversity but cost
    up to 2x padding (the reference's own headline haystack, 595 KB,
    padded to 1 MiB and measured 12.4 us where ~8 us is the real scan).
    A 4-bit mantissa keeps padding waste under 1/8 with at most eight
    cached compiles per octave."""
    need = max(int(need), 1)
    if need <= 8:
        return need
    step = 1 << (need.bit_length() - 4)
    return -(-need // step) * step


def _layout_search(n: int, H: int, l_floor: int = 128,
                   l_cap: int = 2048) -> Tuple[int, int]:
    """(L, tiles) minimizing padded scan cost for an n-byte haystack.

    Cost model: every stream scans H halo bytes + L body bytes, so the
    total work is tiles * LANES * (L + H); small L trims pow2 padding
    (tiles need not be a power of two) while large L amortizes the halo
    warmup — 64 MiB still picks L=2048 (0.4% halo), 595 KB picks L=128
    x 5 tiles (10% padding instead of 76%)."""
    best = None
    L = _pow2(max(l_floor, H, 4))
    while L <= max(l_cap, _pow2(max(l_floor, H, 4))):
        tiles = _round_tiles(-(-n // (LANES * L)))
        cost = tiles * LANES * (L + H)
        if best is None or cost < best[0]:
            best = (cost, L, tiles)
        L *= 2
    return best[1], best[2]


def pack_chains(lens: List[int],
                decollide: bool = True) -> Tuple[List[int], int]:
    """Bin-pack chains into limbs so no chain crosses a 32-bit boundary.

    Returns (bit offset per chain, total limbs). A chain confined to one
    limb never needs the cross-limb carry (`(ms[k-1] >> 31) & 1`), which
    the baked kernel elides per limb — measured ~10% of the per-byte op
    budget on the 5-pattern headline set. Chains longer than 32 get
    dedicated consecutive limbs; only their internal boundaries carry.

    With ``decollide`` (the count kernel's layout), placement also
    de-collides end-bit positions mod 32 when slack allows, so counting
    can merge per-limb end-hit words into a single popcount (positions
    distinct across limbs => popcount(OR) is exact). The bitmap kernels
    (ops/fingerprint.py, ops/cascade.py) OR end hits into a single
    any-hit word instead, where the nudging would only waste limbs —
    they pack with ``decollide=False`` (measured: 67 same-length chains
    pack into 9 limbs instead of 42).

    First-fit-decreasing; padding bits are dead (their charmask is zero
    everywhere, so shifted-in garbage dies immediately).
    """
    order = sorted(range(len(lens)), key=lambda i: -lens[i])
    free: List[int] = []  # bits used so far in each open (partial) limb
    offsets = [0] * len(lens)
    used_ends = set()  # end-bit positions mod 32 taken so far

    def place(limb: int, off: int, ln: int) -> int:
        """Choose the in-limb start offset, nudging right (into padding)
        to keep end positions distinct mod 32 while it still fits."""
        if not decollide:
            return off
        end = off + ln - 1
        while end % 32 in used_ends and (off - limb * 32) + ln < 32:
            off += 1
            end += 1
        used_ends.add(end % 32)
        return off

    for i in order:
        ln = lens[i]
        if ln > 32:
            # Dedicated limbs; the remainder limb's tail is reusable.
            start_limb = len(free)
            free.extend([32] * (ln // 32))
            rem = ln % 32
            off = start_limb * 32
            used_ends.add((off + ln - 1) % 32)
            offsets[i] = off
            if rem:
                free.append(rem)
            continue
        for k, used in enumerate(free):
            if used + ln <= 32:
                off = place(k, k * 32 + used, ln)
                offsets[i] = off
                free[k] = off - k * 32 + ln
                break
        else:
            k = len(free)
            off = place(k, k * 32, ln)
            offsets[i] = off
            free.append(off - k * 32 + ln)
    return offsets, max(len(free), 1)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------
class BitapTables:
    """Host-side compiled tables for a pattern set.

    ``lo[k, v]`` / ``hi[k, v]``: bits of limb ``k`` whose chain byte has low
    (high) nybble ``v``; ``charmask[b] = lo[b & 15] & hi[b >> 4]`` exactly.
    """

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        assert patterns and all(len(p) > 0 for p in patterns)
        self.pattern_lens = np.array([len(p) for p in patterns], np.int64)
        self.max_pattern_len = int(self.pattern_lens.max())
        offsets, self.k = pack_chains([len(p) for p in patterns])
        self.nbits = self.k * 32
        K = self.k
        lo = np.zeros((K, 16), np.uint32)
        hi = np.zeros((K, 16), np.uint32)
        start = np.zeros(K, np.uint32)
        end = np.zeros(K, np.uint32)
        # end-bit -> pattern id (dense over all K*32 bits; -1 = not an end)
        self.endbit_pid = np.full(K * 32, -1, np.int64)
        for pid, p in enumerate(patterns):
            o = int(offsets[pid])
            start[o // 32] |= np.uint32(1 << (o % 32))
            e = o + len(p) - 1
            end[e // 32] |= np.uint32(1 << (e % 32))
            self.endbit_pid[e] = pid
            for i, ch in enumerate(p):
                g = o + i
                if case_insensitive and 0x61 <= (ch | 0x20) <= 0x7A:
                    variants = {ch | 0x20, ch & ~0x20}
                else:
                    variants = {ch}
                for v in variants:
                    lo[g // 32, v & 15] |= np.uint32(1 << (g % 32))
                    hi[g // 32, v >> 4] |= np.uint32(1 << (g % 32))
        # Exactness check of the lo/hi product factorization: for a case
        # pair the two byte values share a low nybble, so reconstructing
        # charmask[b] from the factors adds no false bits. Verify anyway.
        self.lo = lo.view(np.int32)
        self.hi = hi.view(np.int32)
        self.start = start.view(np.int32)
        self.end = end.view(np.int32)
        # Limbs holding at least one chain-end bit; the baked extract
        # kernel emits match words only for these (dense ke index).
        self.end_limbs = [k for k in range(K) if end[k]]
        # Canonical reference report order at equal end: length desc then
        # pattern id asc (match lists are own-match-first then
        # failure-copied, i.e. decreasing length; noncontiguous.rs:1357).
        order = np.lexsort(
            (np.arange(len(patterns)), -self.pattern_lens)
        )
        self.pid_rank = np.empty(len(patterns), np.int64)
        self.pid_rank[order] = np.arange(len(patterns))
        # A pad byte whose charmask is zero in every limb: padding the
        # haystack with it kills all chain bits, so the baked kernel can
        # count/extract with no position masking at all. None if the
        # pattern set touches every byte value (then the masked generic
        # kernel is used instead).
        self.pad_byte: Optional[int] = None
        lo_u, hi_u = lo, hi
        for b in range(256):
            if not (lo_u[:, b & 15] & hi_u[:, b >> 4]).any():
                self.pad_byte = b
                break

    def baked_key(self):
        """Hashable identity of the tables for the baked-kernel cache."""
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


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------
def _mux16(bits, leaves):
    """4-level binary select tree: leaves[v] for v = the nybble whose bits
    (LSB-first boolean tiles) are ``bits``. 15 selects, scalar leaves."""
    t = leaves
    for b in bits:
        t = [jnp.where(b, t[2 * m + 1], t[2 * m]) for m in range(len(t) // 2)]
    return t[0]


def _make_kernel(K: int, L: int, Lc: int, H: int, extract: bool):
    Wc = Lc // 4
    Hw = H // 4
    nchunks = L // Lc

    def kernel(lo_ref, hi_ref, sm_ref, em_ref, nn_ref,
               halo_ref, body_ref, *out_and_scratch):
        if extract:
            cnt_ref, words_ref, ms_ref = out_and_scratch
        else:
            cnt_ref, ms_ref = out_and_scratch
        i = pl.program_id(0)
        j = pl.program_id(1)
        row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        stream = (i * R + row) * 128 + col
        # Count window [n0, n): positions below n0 (a left halo owned by a
        # neighboring shard) and at/after n (padding) are not counted.
        n0 = nn_ref[0]
        n = nn_ref[1]
        LO = [[lo_ref[k, v] for v in range(16)] for k in range(K)]
        HI = [[hi_ref[k, v] for v in range(16)] for k in range(K)]
        SM = [sm_ref[k] for k in range(K)]
        EM = [em_ref[k] for k in range(K)]

        def advance(ms, b):
            """One byte step; returns (new_ms, per-limb end-bit words)."""
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms = []
            hits = []
            carry = jnp.zeros((R, 128), jnp.int32)
            for k in range(K):
                cm = _mux16(bits[:4], LO[k]) & _mux16(bits[4:], HI[k])
                nm = ((ms[k] << 1) | carry | SM[k]) & cm
                carry = lax.shift_right_logical(ms[k], 31) & 1
                nms.append(nm)
                hits.append(nm & EM[k])
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
            # Stream 0's halo wraps the buffer end (garbage): reset. The
            # facade guarantees L >= H so only stream 0 lacks real history.
            first = stream == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        pos_base = stream * L + j * Lc

        def step(w, carry):
            ms, acc = carry
            word = body_ref[w]
            accw = acc
            for jj in range(4):
                b = lax.shift_right_logical(word, 8 * jj) & 255
                ms, hits = advance(ms, b)
                pos = pos_base + (w * 4 + jj)
                ok = (pos >= n0) & (pos < n)
                mc = jnp.zeros((R, 128), jnp.int32)
                for k in range(K):
                    h = jnp.where(ok, hits[k], 0)
                    mc = mc + lax.population_count(h)
                    if extract:
                        words_ref[0, w * 4 + jj, k] = h
                accw = accw + mc
            return ms, accw

        ms0 = [ms_ref[k] for k in range(K)]
        ms, acc = lax.fori_loop(0, Wc, step, (ms0, cnt_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = acc

    return kernel


def _emit_mux_const(bits, leaves):
    """Pruned 4-level select tree over constant leaves.

    Builds the tree structure host-side, merging subtrees whose leaves
    are all equal (typically zero — byte values absent from the pattern
    set), then emits only the surviving selects. Returns None when every
    leaf is zero."""
    t = [("c", int(v)) for v in leaves]
    for b_i in range(len(bits)):
        nxt = []
        for m in range(len(t) // 2):
            lo_n, hi_n = t[2 * m], t[2 * m + 1]
            nxt.append(lo_n if lo_n == hi_n else ("s", b_i, lo_n, hi_n))
        t = nxt

    def emit(node):
        if node[0] == "c":
            return None if node[1] == 0 else jnp.int32(np.int32(node[1]))
        _, b_i, lo_n, hi_n = node
        lo_e, hi_e = emit(lo_n), emit(hi_n)
        if lo_e is None and hi_e is None:
            return None
        return jnp.where(
            bits[b_i],
            jnp.int32(0) if hi_e is None else hi_e,
            jnp.int32(0) if lo_e is None else lo_e,
        )

    return emit(t[0])


def _make_baked_kernel(lo_c, hi_c, sm_c, em_c,
                       K: int, Lc: int, H: int, extract: bool):
    """Kernel with tables folded in as constants (see BAKED_MIN).

    Requires pad-byte padding: no position masking is emitted, so every
    position of the padded buffer must be scanned safely (charmask of the
    pad byte is zero in every limb => no hits in padding).

    Bake-time structure analysis (all derivable from the constants):
      - cross-limb carry is emitted only into limbs whose bit 0 is a
        live chain *continuation* (charmask support at bit 0 and no
        start bit there) — the bin-packed layout (`pack_chains`) makes
        that rare, eliding the carry chain entirely for most sets;
      - the `| start_mask` OR is skipped for limbs without chain starts;
      - per-limb end-hit popcounts merge into one popcount of the OR
        when end-bit positions are distinct mod 32 (the packer nudges
        placements to make them so)."""
    Wc = Lc // 4
    Hw = H // 4

    def _or_all(vals):
        acc = 0
        for v in vals:
            acc |= int(v) & 0xFFFFFFFF
        return acc

    # Limb k receives a carry iff bit 0 is in its charmask support and is
    # not a chain start (start-mask OR makes a carried bit redundant).
    carry_in = [False] + [
        bool(_or_all(lo_c[k]) & _or_all(hi_c[k]) & 1)
        and not (int(sm_c[k]) & 1)
        for k in range(1, K)
    ]
    endpos = []
    for k in range(K):
        e = int(em_c[k]) & 0xFFFFFFFF
        endpos += [b for b in range(32) if (e >> b) & 1]
    merge_pop = len(endpos) == len(set(endpos))

    def kernel(halo_ref, body_ref, *out_and_scratch):
        if extract:
            cnt_ref, words_ref, ms_ref = out_and_scratch
        else:
            cnt_ref, ms_ref = out_and_scratch
        i = pl.program_id(0)
        j = pl.program_id(1)

        def advance(ms, b):
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms = []
            hits = []
            carry = None
            for k in range(K):
                lo_t = _emit_mux_const(bits[:4], lo_c[k])
                hi_t = _emit_mux_const(bits[4:], hi_c[k])
                if lo_t is None or hi_t is None:
                    cm = None
                else:
                    cm = lo_t & hi_t
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
            row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            first = ((i * R + row) * 128 + col) == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        def step(w, carry):
            ms, acc = carry
            word = body_ref[w]
            for jj in range(4):
                b = lax.shift_right_logical(word, 8 * jj) & 255
                ms, hits = advance(ms, b)
                live = [h for h in hits if h is not None]
                if merge_pop and live:
                    anyh = live[0]
                    for h in live[1:]:
                        anyh = anyh | h
                    acc = acc + lax.population_count(anyh)
                else:
                    for h in live:
                        acc = acc + lax.population_count(h)
                if extract:
                    # Words are written for end-bearing limbs only (dense
                    # ke index); limbs without end bits would otherwise
                    # leave garbage in the (uninitialized) output.
                    ke = 0
                    for k in range(K):
                        if hits[k] is not None:
                            words_ref[0, w * 4 + jj, ke] = hits[k]
                            ke += 1
            return ms, acc

        ms0 = [ms_ref[k] for k in range(K)]
        ms, acc = lax.fori_loop(0, Wc, step, (ms0, cnt_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("L", "tiles", "H"))
def _to_stream_major(x32, L: int, tiles: int, H: int):
    """Transpose packed words to the kernel's stream-major layout.

    Done ONCE at upload time (see PackedHaystack): the transpose reads
    and writes the whole buffer, which measurably halved the baked
    kernel's effective throughput when it ran inside every scan call.
    """
    Bp = tiles * LANES
    Wb = L // 4
    Hw = H // 4
    body = x32.reshape(Bp, Wb).T.reshape(Wb, Bp // 128, 128)
    halo = jnp.roll(x32, Hw).reshape(Bp, Wb)[:, :Hw].T
    halo = halo.reshape(Hw, Bp // 128, 128)
    return halo, body


class PackedHaystack:
    """A haystack resident in HBM in kernel layout: upload once, search
    many times. Production deployments keep the corpus device-resident;
    engine entry points accept either raw bytes (packed + uploaded per
    call) or a PackedHaystack."""

    __slots__ = ("n", "L", "Lc", "tiles", "baked", "halo_a", "body", "hs")

    def __init__(self, n, L, Lc, tiles, baked, halo_a, body, hs=None):
        self.n = n
        self.L = L
        self.Lc = Lc
        self.tiles = tiles
        self.baked = baked      # packed with the engine's pad byte
        self.halo_a = halo_a    # [Hw, tiles*R, 128] int32, stream-major
        self.body = body        # [Wb, tiles*R, 128] int32, stream-major
        self.hs = hs            # original bytes (chunked-extract fallback)


@functools.lru_cache(maxsize=256)
def _baked_jit(tables_key, K: int, L: int, Lc: int, H: int, tiles: int,
               extract: bool):
    """Jitted entry for one (pattern set, layout) pair, cached.

    Count mode: fn(halo, body) -> total. Extract mode: fn(halo, body,
    cap) -> (total, nnzw, idx, vals) with the word compaction fused into
    the same dispatch. halo/body are stream-major (_to_stream_major)."""
    lo_c, hi_c, sm_c, em_c = tables_key
    kernel = _make_baked_kernel(lo_c, hi_c, sm_c, em_c, K, Lc, H, extract)
    Ke = sum(1 for e in em_c if e)
    Hw = H // 4
    nchunks = L // Lc
    Wc = Lc // 4

    def fn(halo, body, cap=None):
        out_shapes = [jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32)]
        out_specs = [pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        if extract:
            out_shapes.append(
                jax.ShapeDtypeStruct((tiles, L, Ke, R, 128), jnp.int32)
            )
            out_specs.append(
                pl.BlockSpec((1, Lc, Ke, R, 128),
                             lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
        res = pl.pallas_call(
            kernel,
            grid=(tiles, nchunks),
            in_specs=[
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
            interpret=_interpret(),
        )(halo, body)
        total = jnp.sum(res[0])
        if not extract:
            return total
        from .compaction import select_nonzero_words

        flat = res[1].reshape(-1)
        nnzw, widx, vals, live = select_nonzero_words(flat, cap)
        idx = jnp.where(live, widx, flat.shape[0])
        return total, nnzw, idx, vals

    if extract:
        return jax.jit(fn, static_argnames=("cap",))
    return jax.jit(fn)


@functools.partial(
    jax.jit,
    static_argnames=("K", "L", "Lc", "H", "tiles", "extract"),
)
def _bitap_call(lo, hi, sm, em, halo, body, n,
                K: int, L: int, Lc: int, H: int, tiles: int,
                extract: bool):
    """Device entry: run the table-generic kernel over stream-major words.

    halo/body come from `_to_stream_major` (hoisted to upload time).
    Returns (total_count, words or None).
    """
    Hw = H // 4
    nchunks = L // Lc
    Wc = Lc // 4
    kernel = _make_kernel(K, L, Lc, H, extract)
    out_shapes = [jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32)]
    out_specs = [pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if extract:
        out_shapes.append(
            jax.ShapeDtypeStruct((tiles, L, K, R, 128), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec((1, Lc, K, R, 128),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
        kernel,
        grid=(tiles, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lo [K,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # hi [K,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # start [K]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # end [K]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n [1]
            pl.BlockSpec((max(Hw, 1), R, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
        interpret=_interpret(),
    )(lo, hi, sm, em, n, halo, body)
    counts = res[0]
    total = jnp.sum(counts)
    return (total, res[1]) if extract else (total, None)


@functools.partial(
    jax.jit,
    static_argnames=("K", "L", "Lc", "H", "tiles", "cap"),
)
def _extract_compact(lo, hi, sm, em, halo, body, n,
                     K: int, L: int, Lc: int, H: int, tiles: int,
                     cap: int):
    """Single-dispatch extraction: kernel + on-device word compaction.

    Returns (total_match_events, nonzero_word_count, word_indices[cap],
    word_values[cap]); indices beyond the nonzero count are filled with
    the (out-of-range) word array size. One device roundtrip total — the
    full words array never leaves the device.
    """
    from .compaction import select_nonzero_words

    total, words = _bitap_call(lo, hi, sm, em, halo, body, n,
                               K=K, L=L, Lc=Lc, H=H, tiles=tiles,
                               extract=True)
    flat = words.reshape(-1)
    nnzw, widx, vals, live = select_nonzero_words(flat, cap)
    idx = jnp.where(live, widx, flat.shape[0])
    return total, nnzw, idx, vals


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------
class BitapEngine:
    """Facade-facing engine: counts and full overlapping match sets."""

    def __init__(self, patterns: List[bytes], case_insensitive: bool):
        self.tables = BitapTables(patterns, case_insensitive)
        self._dev_args = None
        # Halo: enough history for the longest chain (suffix property
        # needs max_pattern_len - 1 bytes), word-aligned.
        h = max(self.tables.max_pattern_len - 1, 1)
        self.halo = max(_pow2(h), 4)

    @classmethod
    def eligible(cls, patterns: List[bytes]) -> bool:
        if not patterns or any(len(p) == 0 for p in patterns):
            return False
        total = sum(len(p) for p in patterns)
        if total > 32 * MAX_LIMBS:
            return False
        if max(len(p) for p in patterns) > MAX_PATTERN_LEN:
            return False
        return True

    # ------------------------------------------------------------------
    def _layout(self, n: int) -> Tuple[int, int, int]:
        """(L, Lc, tiles) for an n-byte haystack, bucketed (pow2 L,
        <=3-significant-bit tiles) so compiled kernels are shared across
        calls while padding waste stays under 1/8 (see _layout_search)."""
        H = self.halo
        base = _pow2(-(-n // LANES))
        if base < 128:
            # Sub-128K haystacks fit one tile with a sub-128 L.
            L = max(H, base, 4)
            return L, min(L, 512), 1
        L, tiles = _layout_search(n, H)
        return L, min(L, 512), tiles

    def _pack(self, hs: bytes, L: int, tiles: int,
              pad: int = 0) -> jax.Array:
        total = tiles * LANES * L
        buf = np.full(total, pad, np.uint8) if pad else np.zeros(
            total, np.uint8
        )
        buf[: len(hs)] = np.frombuffer(hs, np.uint8)
        return jnp.asarray(buf.view(np.int32))

    def _use_baked(self, n: int) -> bool:
        return n >= BAKED_MIN and self.tables.pad_byte is not None

    def _args(self):
        if self._dev_args is None:
            self._dev_args = self.tables.device_args()
        return self._dev_args

    # ------------------------------------------------------------------
    def prepare(self, hs: bytes,
                baked: Optional[bool] = None) -> PackedHaystack:
        """Upload a haystack into the device-resident kernel layout.

        Packing and the stream-major transpose happen once here; every
        subsequent count/extract call on the PackedHaystack dispatches
        the scan kernel directly (the production repeated-search path).

        ``baked`` overrides the size heuristic: small haystacks default
        to the table-generic kernel (one compile shared across pattern
        sets), but a caller pinning a small corpus for many searches can
        pass ``baked=True`` to pay the per-pattern-set compile for the
        faster constant-folded kernel (requires a pad byte).
        """
        n = len(hs)
        L, Lc, tiles = self._layout(max(n, 1))
        if baked is None:
            baked = self._use_baked(n)
        else:
            baked = bool(baked) and self.tables.pad_byte is not None
        pad = self.tables.pad_byte if baked else 0
        x32 = jax.device_put(self._pack(hs, L, tiles, pad=pad))
        halo_a, body = _to_stream_major(x32, L, tiles, self.halo)
        return PackedHaystack(n, L, Lc, tiles, baked, halo_a, body, hs)

    def count_matches(self, hs) -> int:
        ph = hs if isinstance(hs, PackedHaystack) else self.prepare(hs)
        if ph.n == 0:
            return 0
        if ph.baked:
            fn = _baked_jit(self.tables.baked_key(), self.tables.k,
                            ph.L, ph.Lc, self.halo, ph.tiles, False)
            return int(fn(ph.halo_a, ph.body))
        lo, hi, sm, em = self._args()
        total, _ = _bitap_call(
            lo, hi, sm, em, ph.halo_a, ph.body,
            jnp.asarray([0, ph.n], jnp.int32),
            K=self.tables.k, L=ph.L, Lc=ph.Lc, H=self.halo, tiles=ph.tiles,
            extract=False,
        )
        return int(total)

    def match_pairs(self, hs) -> Tuple[np.ndarray, np.ndarray]:
        """All overlapping matches as (pids, ends) host arrays, in the
        reference's overlapping report order (end asc, length desc,
        pid asc). ``ends`` are 1-based end offsets."""
        ph = hs if isinstance(hs, PackedHaystack) else None
        if ph is not None:
            hs = ph.hs
        n = len(hs)
        t = self.tables
        if n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        # For extraction, bound the per-launch words output (n * 4K bytes).
        max_chunk = MAX_EXTRACT_CHUNK
        if n > max_chunk:
            all_pids, all_ends = [], []
            step = max_chunk
            ov = t.max_pattern_len - 1
            base = 0
            while base < n:
                hi_ = min(base + step, n)
                lo_ = max(0, base - ov)
                pids, ends = self.match_pairs(hs[lo_:hi_])
                keep = ends > (base - lo_)
                all_pids.append(pids[keep])
                all_ends.append(ends[keep] + lo_)
                base = hi_
            return (np.concatenate(all_pids), np.concatenate(all_ends))
        if ph is None:
            ph = self.prepare(hs)
        L, tiles, baked = ph.L, ph.tiles, ph.baked
        Lc = ph.Lc
        kdim = len(t.end_limbs) if baked else t.k
        # Cap extraction VMEM: words block is Lc*kdim*4 KiB.
        while Lc * kdim > 1024 and Lc > 4:
            Lc //= 2
        if baked:
            fn = _baked_jit(t.baked_key(), t.k, L, Lc, self.halo,
                            tiles, True)
        else:
            lo, hi, sm, em = self._args()
            nn = jnp.asarray([0, n], jnp.int32)
        words_size = tiles * L * kdim * LANES
        cap = 4096
        while True:
            if baked:
                total, nnzw, idx, vals = fn(ph.halo_a, ph.body, cap=cap)
            else:
                total, nnzw, idx, vals = _extract_compact(
                    lo, hi, sm, em, ph.halo_a, ph.body, nn,
                    K=t.k, L=L, Lc=Lc, H=self.halo, tiles=tiles,
                    cap=cap,
                )
            nnzw = int(nnzw)
            if nnzw <= cap:
                break
            cap = max(64, _pow2(nnzw))
        if int(total) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return decode_match_words(
            t, np.asarray(idx).astype(np.int64),
            np.asarray(vals).view(np.uint32), L, kdim, words_size,
            end_limbs=t.end_limbs if baked else None,
        )


def decode_match_words(t: BitapTables, idx: np.ndarray, vals: np.ndarray,
                       L: int, kdim: int, words_size: int,
                       end_limbs=None,
                       stream_map=None) -> Tuple[np.ndarray, np.ndarray]:
    """Decode compacted nonzero end-bit words into (pids, ends).

    ``idx`` are flat indices into a [tiles, L, kdim, R, 128] word array
    (entries >= words_size are compaction fill and dropped); ``vals`` the
    corresponding uint32 words. ``end_limbs`` maps the dense word axis
    back to limb ids (baked kernels emit end-bearing limbs only).
    ``stream_map`` maps compacted lane order back to original stream ids
    (gathered-candidate layouts, ops/staged.py). Returns 1-based end
    offsets in the row buffer's coordinates, sorted in the reference's
    overlapping report order (end asc, length desc, pid asc).
    """
    real = idx < words_size
    idx, vals = idx[real], vals[real]
    c = idx % 128
    r = (idx // 128) % R
    k = (idx // (128 * R)) % kdim
    tt = (idx // (128 * R * kdim)) % L
    tile = idx // (128 * R * kdim * L)
    if end_limbs is not None:
        k = np.asarray(end_limbs, np.int64)[k]
    stream = (tile * R + r) * 128 + c
    if stream_map is not None:
        stream = np.asarray(stream_map, np.int64)[stream]
    pos = stream * L + tt  # 0-based byte index of the match end
    pids_l, ends_l = [], []
    for bit in range(32):
        m = (vals >> np.uint32(bit)) & np.uint32(1)
        rows = np.flatnonzero(m)
        if len(rows) == 0:
            continue
        g = k[rows] * 32 + bit
        pid = t.endbit_pid[g]
        pids_l.append(pid)
        ends_l.append(pos[rows] + 1)
    if not pids_l:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    pids = np.concatenate(pids_l)
    ends = np.concatenate(ends_l)
    order = np.lexsort((t.pid_rank[pids], ends))
    return pids[order], ends[order]
