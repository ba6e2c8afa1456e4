"""Feed-forward shifted-compare match kernel (no state, no gather).

match_p[t] = AND_j ( bytes[t - (m-1-j)] == p[j] )

Streams x time layout: cw [T, R, 128]; shifted byte = cw_ref[t - o] (static
slice per offset). Count mode accumulates matches.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from micro_kernels import PATS, HAY, HOST_COUNT, N

R = 8
LANES = R * 128


def bench(fn, *args, iters=7):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], out


def prepare(hay, L, H):
    n = len(hay)
    B = -(-n // L)
    Bp = -(-B // LANES) * LANES
    buf = np.zeros(Bp * L, np.uint8)
    buf[:n] = np.frombuffer(hay, np.uint8)
    x = jnp.asarray(buf)
    body = x.reshape(Bp, L).T
    halo = jnp.roll(x, H).reshape(Bp, L)[:, :H].T
    cw = jnp.concatenate([halo, body], axis=0).astype(jnp.int32)
    return cw.reshape(L + H, Bp // 128, 128), n, Bp


def make_kernel(L, H, pats):
    def kern(cw_ref, n_ref, cnt_ref):
        i = pl.program_id(0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        stream = i * LANES + row_ids * 128 + col_ids
        n = n_ref[0]

        def body(t, acc):
            pos = stream * L + (t - H)          # match END position (0-based)
            ok = pos < n
            mc = jnp.zeros((R, 128), jnp.int32)
            for p in pats:
                m = len(p)
                eq = None
                for j, ch in enumerate(p):
                    e = (cw_ref[t - (m - 1 - j)] == ch)
                    eq = e if eq is None else (eq & e)
                # match only valid if start >= 0 i.e. pos-m+1 >= 0:
                # streams start at stream*L; halo supplies previous bytes,
                # stream 0's halo is wrapped garbage -> require pos-m+1 >= 0
                valid = eq & ok & (pos - m + 1 >= 0)
                mc = mc + valid.astype(jnp.int32)
            return acc + mc

        acc0 = jnp.zeros((R, 128), jnp.int32)
        acc = lax.fori_loop(H, L + H, body, acc0)
        cnt_ref[0] = acc

    return kern


def run(L, H):
    cw, n, Bp = prepare(HAY, L, H)
    tiles = Bp // LANES
    kern = make_kernel(L, H, PATS)

    @jax.jit
    def go(cw):
        counts = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((L + H, R, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )(cw, jnp.asarray([n], jnp.int32))
        return jnp.sum(counts)

    med, out = bench(go, cw)
    tag = "OK " if int(out) == HOST_COUNT else f"BAD({int(out)} vs {HOST_COUNT})"
    print(f"ffand L={L:5d} {tag} {N/med/1e9:8.2f} GB/s ({med*1e3:7.2f} ms)", flush=True)


run(1024, 32)
run(2048, 32)
run(4096, 32)
