"""Isolate Pallas fori_loop / per-step costs on v5e."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8
W = 512
TILES = 16
DATA = jnp.asarray(np.random.default_rng(0).integers(0, 1000, size=(W, TILES * R, 128)).astype(np.int32))
NBYTES = W * TILES * R * 128 * 4


def bench(go, iters=7):
    out = go(DATA); jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); out = go(DATA); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts)//2]
    return med


def call(kern):
    @jax.jit
    def go(cw):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((TILES, R, 128), jnp.int32),
            grid=(TILES,),
            in_specs=[pl.BlockSpec((W, R, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )(cw)
    return go


# L1: loop of load+add
def k1(cw_ref, o_ref):
    def body(t, acc):
        return acc + cw_ref[t]
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))

med = bench(call(k1))
print(f"L1 loop load+add      : {med*1e3:7.2f} ms  {W*TILES} steps  {med/(W*TILES)*1e9:7.0f} ns/step  {NBYTES/med/1e9:6.1f} GB/s")

# L2: unroll 8 loads per iteration
def k2(cw_ref, o_ref):
    def body(t, acc):
        for j in range(8):
            acc = acc + cw_ref[t * 8 + j]
        return acc
    o_ref[0] = lax.fori_loop(0, W // 8, body, jnp.zeros((R, 128), jnp.int32))

med = bench(call(k2))
print(f"L2 loop unroll8       : {med*1e3:7.2f} ms  {W*TILES//8} steps  {med/(W*TILES//8)*1e9:7.0f} ns/step  {NBYTES/med/1e9:6.1f} GB/s")

# L3: no loop, full reduce
def k3(cw_ref, o_ref):
    o_ref[0] = jnp.sum(cw_ref[:], axis=0)

med = bench(call(k3))
print(f"L3 vector sum         : {med*1e3:7.2f} ms  {NBYTES/med/1e9:6.1f} GB/s")

# L4: loop with 16 elementwise ops, single load
def k4(cw_ref, o_ref):
    def body(t, acc):
        x = cw_ref[t]
        for _ in range(16):
            x = (x << 1) ^ acc
        return acc + x
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))

med = bench(call(k4))
print(f"L4 loop 16 ops        : {med*1e3:7.2f} ms  {W*TILES} steps  {med/(W*TILES)*1e9:7.0f} ns/step")

# L5: loop with 5-array carry (like shift-AND masks + acc)
def k5(cw_ref, o_ref):
    def body(t, carry):
        m0, m1, m2, acc = carry
        x = cw_ref[t]
        m0 = (m0 << 1) & x
        m1 = (m1 << 1) & x
        m2 = (m2 << 1) & x
        return (m0, m1, m2, acc + (m0 | m1 | m2))
    z = jnp.zeros((R, 128), jnp.int32)
    _, _, _, acc = lax.fori_loop(0, W, body, (z, z - 1, z - 2, z))
    o_ref[0] = acc

med = bench(call(k5))
print(f"L5 loop carry4        : {med*1e3:7.2f} ms  {W*TILES} steps  {med/(W*TILES)*1e9:7.0f} ns/step")

# L6: gather in loop
TAB = jnp.asarray(np.random.default_rng(1).integers(0, 99, size=(R, 128)).astype(np.int32))
def k6(tab_ref, cw_ref, o_ref):
    def body(t, acc):
        idx = cw_ref[t] & 127
        return acc + jnp.take_along_axis(tab_ref[:], idx, axis=1)
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))

@jax.jit
def go6(cw):
    return pl.pallas_call(
        k6,
        out_shape=jax.ShapeDtypeStruct((TILES, R, 128), jnp.int32),
        grid=(TILES,),
        in_specs=[pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((W, R, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(TAB, cw)

med = bench(go6)
print(f"L6 loop gather        : {med*1e3:7.2f} ms  {W*TILES} steps  {med/(W*TILES)*1e9:7.0f} ns/step")
