"""Ablate the shift-AND kernel to find the per-step cost driver.

Variants:
  V0: full kernel, uint8 cw     (baseline from micro_kernels: ~6us/step)
  V1: int32 cw                  (uint8 sub-tile slicing suspect)
  V2: int32 packed 4B/word cw   (quarter traffic, bitshift unpack)
  V3: V2 minus gather           (constant charmask)
  V4: V2 minus popcount         (bit-OR accumulate)
  V5: V2 with [32,128] tiles    (4x work per step)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from micro_kernels import (PATS, K, start_l, end_l, CM, HAY, HOST_COUNT, N,
                           build_haystack)

H = 32
L = 2048
CMi = CM.astype(np.int32)


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], out


def make_kernel(R, use_gather=True, use_popcount=True):
    """Packed-int32 shift-AND kernel over [R,128] stream tiles."""
    LANES = R * 128

    def kern(cmlo_ref, cmhi_ref, cw_ref, n_ref, cnt_ref):
        i = pl.program_id(0)
        words = cw_ref.shape[0]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        stream = i * LANES + row_ids * 128 + col_ids
        n = n_ref[0]
        first = (stream == 0)
        start_c = [jnp.int32(int(start_l[k])) for k in range(K)]
        end_c = [jnp.int32(int(end_l[k])) for k in range(K)]

        def body(w, carry):
            ms, acc = carry
            word = cw_ref[w]
            mcs = jnp.zeros((R, 128), jnp.int32)

            def substep(ms, b, t):
                blo = b & 127
                hi = b >= 128
                nms = []
                carry_bit = jnp.zeros((R, 128), jnp.int32)
                for k in range(K):
                    if use_gather:
                        cmk = jnp.where(
                            hi,
                            jnp.take_along_axis(cmhi_ref[k], blo, axis=1),
                            jnp.take_along_axis(cmlo_ref[k], blo, axis=1),
                        )
                    else:
                        cmk = b * 0 - 1
                    nm = ((ms[k] << 1) | carry_bit | start_c[k]) & cmk
                    carry_bit = lax.shift_right_logical(ms[k], 31)
                    nms.append(nm)
                pos = stream * L + (t - H)
                ok = (t >= H) & (pos < n)
                mc = jnp.zeros((R, 128), jnp.int32)
                for k in range(K):
                    if use_popcount:
                        mc = mc + lax.population_count(nms[k] & end_c[k])
                    else:
                        mc = mc | (nms[k] & end_c[k])
                mc = jnp.where(ok, mc, 0)
                reset = first & (t == H - 1)
                nms = [jnp.where(reset, 0, m) for m in nms]
                return tuple(nms), mc

            for j in range(4):
                b = (word >> (8 * j)) & 255
                ms, mc = substep(ms, b, w * 4 + j)
                mcs = mcs + mc
            return (ms, acc + mcs)

        m0 = tuple(jnp.zeros((R, 128), jnp.int32) for _ in range(K))
        acc0 = jnp.zeros((R, 128), jnp.int32)
        _, acc = lax.fori_loop(0, words, body, (m0, acc0))
        cnt_ref[0] = acc

    return kern


def prepare_packed(hay, L, H, R):
    LANES = R * 128
    n = len(hay)
    B = -(-n // L)
    Bp = -(-B // LANES) * LANES
    buf = np.zeros(Bp * L, np.uint8)
    buf[:n] = np.frombuffer(hay, np.uint8)
    x = jnp.asarray(buf)
    body = x.reshape(Bp, L).T
    halo = jnp.roll(x, H).reshape(Bp, L)[:, :H].T
    cw = jnp.concatenate([halo, body], axis=0)          # [L+H, Bp] uint8
    w = (L + H) // 4
    cw = cw.reshape(w, 4, Bp).astype(jnp.int32)
    packed = (cw[:, 0] | (cw[:, 1] << 8) | (cw[:, 2] << 16) | (cw[:, 3] << 24))
    return packed.reshape(w, Bp // 128, 128), n, Bp      # int32 [w, Bp/128, 128]


def run(R, use_gather=True, use_popcount=True, label=""):
    LANES = R * 128
    kern = make_kernel(R, use_gather, use_popcount)
    cw, n, Bp = prepare_packed(HAY, L, H, R)
    tiles = Bp // LANES
    cmlo = jnp.asarray(np.broadcast_to(CMi[:128].T[:, None, :], (K, R, 128)).copy())
    cmhi = jnp.asarray(np.broadcast_to(CMi[128:].T[:, None, :], (K, R, 128)).copy())
    words = (L + H) // 4

    @jax.jit
    def go(cw):
        counts = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((K, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((words, R, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )(cmlo, cmhi, cw, jnp.asarray([n], jnp.int32))
        return jnp.sum(counts)

    med, out = bench(go, cw, iters=5)
    tag = "OK " if (not use_gather or not use_popcount or int(out) == HOST_COUNT) else f"BAD({int(out)})"
    print(f"{label:34s} {tag} {N/med/1e9:8.2f} GB/s ({med*1e3:7.2f} ms)", flush=True)


run(8, label="V2 packed R=8 full")
run(8, use_gather=False, label="V3 packed R=8 no-gather")
run(8, use_popcount=False, label="V4 packed R=8 no-popcount")
run(32, label="V5 packed R=32 full")
run(64, label="V6 packed R=64 full")
