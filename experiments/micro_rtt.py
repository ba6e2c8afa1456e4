"""Separate tunnel roundtrip latency from true kernel cost."""
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
DATA = jnp.asarray(np.random.default_rng(0).integers(
    0, 1000, size=(W, TILES * R, 128)).astype(np.int32))
NBYTES = W * TILES * R * 128 * 4

# 1) pure roundtrip: tiny computation
small = jnp.arange(8, dtype=jnp.int32)
f_small = jax.jit(lambda x: jnp.sum(x))
int(f_small(small))
t0 = time.perf_counter()
for _ in range(20):
    int(f_small(small))
rtt = (time.perf_counter() - t0) / 20
print(f"scalar roundtrip: {rtt*1e3:.2f} ms", flush=True)


def k1(cw_ref, o_ref):
    def body(t, acc):
        return acc + cw_ref[t]
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))


def kheavy(cw_ref, o_ref):
    def body(t, acc):
        x = cw_ref[t]
        for _ in range(256):
            x = (x << 1) ^ acc
        return acc + x
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))


def chain(kern, reps):
    """reps sequential kernel invocations, one scalar out."""
    @jax.jit
    def go(cw):
        acc = jnp.int32(0)
        for r in range(reps):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((TILES, R, 128), jnp.int32),
                grid=(TILES,),
                in_specs=[pl.BlockSpec((W, R, 128), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(cw + acc)  # serialize: next call depends on previous
            acc = acc + jnp.sum(out)
        return acc
    return go


for kern, name in [(k1, "k1   "), (kheavy, "k256 ")]:
    for reps in (1, 4, 16):
        go = chain(kern, reps)
        int(go(DATA))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            int(go(DATA))
        dt = (time.perf_counter() - t0) / iters
        per = (dt - rtt) / reps
        print(f"{name} reps={reps:2d}: total {dt*1e3:7.2f} ms  "
              f"per-kernel {per*1e3:7.2f} ms  "
              f"{NBYTES/per/1e9:6.1f} GB/s", flush=True)
