"""Re-run Pallas per-step cost isolation with STRICT host-roundtrip sync."""
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


def bench(go, steps, label):
    out = int(jnp.sum(go(DATA)))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        int(jnp.sum(go(DATA)))
    med = (time.perf_counter() - t0) / iters
    print(f"{label}: {med*1e3:7.2f} ms  {steps} steps  "
          f"{med/steps*1e9:7.0f} ns/step  {NBYTES/med/1e9:6.1f} GB/s",
          flush=True)


def call(kern):
    @jax.jit
    def go(cw):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((TILES, R, 128), jnp.int32),
            grid=(TILES,),
            in_specs=[pl.BlockSpec((W, R, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(cw)
    return go


def k1(cw_ref, o_ref):
    def body(t, acc):
        return acc + cw_ref[t]
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))


def k4(cw_ref, o_ref):
    def body(t, acc):
        x = cw_ref[t]
        for _ in range(16):
            x = (x << 1) ^ acc
        return acc + x
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))


def k64(cw_ref, o_ref):
    def body(t, acc):
        x = cw_ref[t]
        for _ in range(64):
            x = (x << 1) ^ acc
        return acc + x
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))


def ksel(cw_ref, o_ref):
    # 16 selects with scalar leaves per step (mux-tree-like load)
    def body(t, acc):
        x = cw_ref[t]
        bits = [(x & (1 << b)) != 0 for b in range(4)]
        v = [jnp.int32(3 * m + 1) for m in range(16)]
        t_ = v
        for b in bits:
            t_ = [jnp.where(b, t_[2 * m + 1], t_[2 * m])
                  for m in range(len(t_) // 2)]
        return acc + t_[0]
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))


def kpop(cw_ref, o_ref):
    def body(t, acc):
        return acc + lax.population_count(cw_ref[t])
    o_ref[0] = lax.fori_loop(0, W, body, jnp.zeros((R, 128), jnp.int32))


bench(call(k1), W * TILES, "load+add          ")
bench(call(k4), W * TILES, "load+16ops        ")
bench(call(k64), W * TILES, "load+64ops        ")
bench(call(ksel), W * TILES, "load+15sel(4bits) ")
bench(call(kpop), W * TILES, "load+popcount     ")
