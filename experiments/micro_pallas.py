"""Probe Mosaic gather support + candidate Pallas inner loops."""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


S, A = 128, 32
rng = np.random.default_rng(0)
TRANS = rng.integers(0, 70, size=(S, A)).astype(np.int32)
T_dev = jnp.asarray(TRANS)
N = 1 << 23  # 8 MiB
CLS = jnp.asarray((rng.integers(0, 256, size=N) % A).astype(np.int32))


def probe(name, fn):
    try:
        r = fn()
        jax.block_until_ready(r)
        print(f"PROBE {name}: OK {np.asarray(r).reshape(-1)[:4]}", flush=True)
        return True
    except Exception as e:
        print(f"PROBE {name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return False


# --- probe 1: take_along_axis axis=1 (gather along lanes), idx per row
def k1(r_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(r_ref[:], i_ref[:], axis=1)

def p1():
    R = jnp.asarray(rng.standard_normal((1024, 128)).astype(np.float32))
    I = jnp.asarray(rng.integers(0, 128, size=(1024, 1)).astype(np.int32))
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((1024, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(R, I)

probe("take_along_axis axis=1 [1024,128] idx[1024,1]", p1)


# --- probe 1b: axis=1 int32 values
def p1b():
    R = jnp.asarray(rng.integers(0, 70, size=(1024, 128)).astype(np.int32))
    I = jnp.asarray(rng.integers(0, 128, size=(1024, 1)).astype(np.int32))
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((1024, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(R, I)

probe("take_along_axis axis=1 int32", p1b)


# --- probe 2: take_along_axis axis=0 (gather along sublanes), broadcast idx
def k2(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

def p2():
    I = jnp.asarray(rng.integers(0, S, size=(1024, A)).astype(np.int32))
    return pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((1024, A), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(T_dev, I)

probe("take_along_axis axis=0 src[128,32] idx[1024,32]", p2)


# --- probe 2b: axis=0 from a [256,128] table
def p2b():
    TT = jnp.asarray(rng.integers(0, 100, size=(256, 128)).astype(np.int32))
    I = jnp.asarray(rng.integers(0, 256, size=(1024, 128)).astype(np.int32))
    return pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(TT, I)

probe("take_along_axis axis=0 src[256,128] idx[1024,128]", p2b)


# --- probe 3: flat 1D-style via [1, T] and idx [1, B]? (axis=1 gather, one row)
def p3():
    flat = jnp.asarray(TRANS.reshape(1, -1))  # [1, 4096]
    I = jnp.asarray(rng.integers(0, S * A, size=(1, 128)).astype(np.int32))
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(flat, I)

probe("take_along_axis axis=1 src[1,4096] idx[1,128]", p3)


# --- probe 3b: src [8, 4096] idx [8, 128]
def p3b():
    flat = jnp.asarray(np.tile(TRANS.reshape(1, -1), (8, 1)))
    I = jnp.asarray(rng.integers(0, S * A, size=(8, 128)).astype(np.int32))
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(flat, I)

probe("take_along_axis axis=1 src[8,4096] idx[8,128]", p3b)


# --- probe 3c: big: src [8, 4096] idx [8, 4096]
def p3c():
    flat = jnp.asarray(np.tile(TRANS.reshape(1, -1), (8, 1)))
    I = jnp.asarray(rng.integers(0, S * A, size=(8, 4096)).astype(np.int32))
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, 4096), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(flat, I)

probe("take_along_axis axis=1 src[8,4096] idx[8,4096]", p3c)

print("---- timing candidates ----", flush=True)

# ================= E2: scan kernel: states [8,128] per tile? use [BT] rows
# Layout: per grid tile, classes block [L, BT] in VMEM; states [BTr, 128]
# where BT = BTr*128 lanes ... simpler: states as [8,128]=1024 lanes per tile,
# inner loop L steps.

BT_R, BT_C = 8, 128   # state tile rows x cols = 1024 lanes
BT = BT_R * BT_C

def e2_kernel(t_ref, cw_ref, o_ref):
    # t_ref: [S*A] flat table as [8, S*A//8]? need 2D for gather
    L = cw_ref.shape[0]
    def body(i, s):
        cl = cw_ref[i].reshape(BT_R, BT_C)
        idx = s * A + cl
        nxt = jnp.take_along_axis(t_ref[:], idx, axis=1)  # src [8, 4096]? idx [8,128]
        return nxt
    s0 = jnp.full((BT_R, BT_C), 2, dtype=jnp.int32)
    o_ref[:] = lax.fori_loop(0, L, body, s0)

def e2(cw, tab8):
    L, B = cw.shape
    return pl.pallas_call(
        e2_kernel,
        out_shape=jax.ShapeDtypeStruct((BT_R, B // BT_C * BT_C // BT_R), jnp.int32),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT_R, S * A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, BT), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT_R, BT_C), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(tab8, cw)

try:
    B = 32768
    L = N // B
    cw3 = CLS.reshape(B // BT, BT, L).transpose(0, 2, 1)  # [tiles, L, BT]
    tab8 = jnp.asarray(np.tile(TRANS.reshape(1, -1), (8, 1)))
    f = jax.jit(functools.partial(e2, tab8=tab8))
    med, _ = bench(f, cw3, iters=3)
    print(f"E2 pallas dyngather flat-table B={B}: {N/med/1e9:8.2f} GB/s ({med*1e3:.2f} ms)", flush=True)
except Exception as e:
    print(f"E2 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
