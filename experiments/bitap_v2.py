"""Kernel v2 prototype: const-baked, pruned mux, pad-byte, fused shifts.

Variants measured against the production v1 kernel (26 GB/s):
  v2a: const leaves + pruned trees + no position masking (pad byte)
  v2b: v2a + 4-byte fused state update (m_j from m0 directly)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ahocorasick_tpu.ops import bitap as B

R = 8
LANES = 1024

PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]
N = 1 << 26
rng = np.random.default_rng(1234)
hay = bytearray(rng.integers(97, 123, size=N, dtype=np.uint8).tobytes())
for p in rng.integers(0, N - 32, size=2000):
    pat = PATS[int(rng.integers(len(PATS)))]
    hay[p:p + len(pat)] = pat
hay = bytes(hay)
EXPECT = 1999

eng = B.BitapEngine(PATS, False)
T = eng.tables
K = T.k
L, Lc, tiles = eng._layout(N)
H = eng.halo
x32 = jax.device_put(eng._pack(hay, L, tiles))
NB = [int(x) for x in np.asarray(jnp.arange(0))]  # noqa


def mux_pruned(bits, leaves):
    """Select tree with constant leaves; prunes equal-constant subtrees."""
    t = [("c", int(v)) for v in leaves]

    def node(b, lo_n, hi_n):
        if lo_n == hi_n:
            return lo_n
        return ("s", b, lo_n, hi_n)

    for b in range(len(bits)):
        t = [node(b, t[2 * m], t[2 * m + 1]) for m in range(len(t) // 2)]

    def emit(n):
        if n[0] == "c":
            return None if n[1] == 0 else jnp.int32(np.int32(n[1]))
        _, b, lo_n, hi_n = n
        lo_e, hi_e = emit(lo_n), emit(hi_n)
        if lo_e is None and hi_e is None:
            return None
        if lo_e is None:
            lo_e = jnp.int32(0)
        if hi_e is None:
            hi_e = jnp.int32(0)
        return jnp.where(bits[b], hi_e, lo_e)

    out = emit(t[0])
    return jnp.zeros((R, 128), jnp.int32) if out is None else out


LOc = T.lo.astype(np.int64)   # [K,16] as python ints via int()
HIc = T.hi.astype(np.int64)
SMc = [int(np.int32(x)) for x in T.start]
EMc = [int(np.int32(x)) for x in T.end]


def make_v2(fused: bool):
    Wc = Lc // 4
    Hw = H // 4

    def charmasks(b, bits):
        out = []
        for k in range(K):
            lo = mux_pruned(bits[:4], LOc[k])
            hi = mux_pruned(bits[4:], HIc[k])
            out.append(lo & hi)
        return out

    def kernel(halo_ref, body_ref, cnt_ref, ms_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def bits_of(b):
            return [(b & (1 << t)) != 0 for t in range(8)]

        def advance(ms, b):
            bits = bits_of(b)
            cs = charmasks(b, bits)
            nms = []
            carry = jnp.zeros((R, 128), jnp.int32)
            for k in range(K):
                nm = ((ms[k] << 1) | carry | SMc[k]) & cs[k]
                carry = lax.shift_right_logical(ms[k], 31) & 1
                nms.append(nm)
            return nms

        @pl.when(j == 0)
        def _warm():
            def hstep(w, ms):
                word = halo_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms = advance(ms, b)
                return ms
            z = [jnp.zeros((R, 128), jnp.int32)] * K
            ms = lax.fori_loop(0, Hw, hstep, z)
            row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            first = ((i * R + row) * 128 + col) == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        if not fused:
            def step(w, carry):
                ms, acc = carry
                word = body_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms = advance(ms, b)
                    for k in range(K):
                        if EMc[k]:
                            acc = acc + lax.population_count(ms[k] & EMc[k])
                return ms, acc
        else:
            def step(w, carry):
                ms, acc = carry
                word = body_ref[w]
                # charmasks for all 4 bytes (independent of state)
                CS = []
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    CS.append(charmasks(b, bits_of(b)))
                # D_j chains per limb: D1=C1; D_{j+1} = ((D_j<<1)|s)&C_{j+1}
                # with cross-limb D carry
                D = [CS[0]]
                for jj in range(1, 4):
                    prev = D[-1]
                    cur = []
                    dc = jnp.zeros((R, 128), jnp.int32)
                    for k in range(K):
                        d = (((prev[k] << 1) | dc | SMc[k]) & CS[jj][k])
                        dc = lax.shift_right_logical(prev[k], 31) & 1
                        cur.append(d)
                    D.append(cur)
                # S_j constants (computed in unsigned 32-bit arithmetic)
                SMu = [x & 0xFFFFFFFF for x in SMc]
                Sj = []
                s_acc = [0] * K
                for jj in range(4):
                    ns = []
                    c = 0
                    for k in range(K):
                        v = ((s_acc[k] << 1) | c | SMu[k]) & 0xFFFFFFFF
                        c = (s_acc[k] >> 31) & 1
                        ns.append(v)
                    s_acc = ns
                    Sj.append([int(np.uint32(v).view(np.int32)) for v in ns])
                # m_j = ((m0 << j) | S_j) & D_j  (cross-limb m0 carries)
                new_ms = ms
                for jj in range(4):
                    sh = jj + 1
                    mj = []
                    for k in range(K):
                        lowbits = (
                            lax.shift_right_logical(ms[k - 1], 32 - sh)
                            if k else jnp.int32(0)
                        )
                        v = ((ms[k] << sh) | lowbits | Sj[jj][k]) & D[jj][k]
                        mj.append(v)
                    for k in range(K):
                        if EMc[k]:
                            acc = acc + lax.population_count(mj[k] & EMc[k])
                    new_ms = mj
                return new_ms, acc

        ms0 = [ms_ref[k] for k in range(K)]
        ms, acc = lax.fori_loop(0, Wc, step, (ms0, cnt_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("fused", "reps"))
def run_v2(x32, fused, reps):
    Bp = tiles * LANES
    Wb = L // 4
    Hw = H // 4
    total = jnp.int32(0)
    x = x32
    kern = make_v2(fused)
    for _ in range(reps):
        body = x.reshape(Bp, Wb).T.reshape(Wb, Bp // 128, 128)
        halo = jnp.roll(x, Hw).reshape(Bp, Wb)[:, :Hw].T
        halo = halo.reshape(Hw, Bp // 128, 128)
        counts = pl.pallas_call(
            kern,
            grid=(tiles, L // Lc),
            in_specs=[
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Lc // 4, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
        )(halo, body)
        total = total + jnp.sum(counts)
        x, total = jax.lax.optimization_barrier((x, total))
    return total


def slope(fn, expect_one):
    out = int(fn(4))
    assert out == expect_one * 4, (out, expect_one * 4)
    def t_at(r, iters=3):
        int(fn(r))
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            int(fn(r))
            best = min(best, time.perf_counter() - t0)
        return best
    t4, t20 = t_at(4), t_at(20)
    per = (t20 - t4) / 16
    return per


# NOTE: haystack is lowercase+patterns; pad byte 0 is not in any pattern,
# so unmasked counting is exact here (the production version will verify
# pad-byte safety host-side).
for fused in (False, True):
    per = slope(lambda r: run_v2(x32, fused, r), EXPECT)
    print(f"v2 fused={fused}: {per*1e3:.3f} ms/scan = {N/per/1e9:.2f} GB/s",
          flush=True)
