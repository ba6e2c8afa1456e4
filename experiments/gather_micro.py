"""Microbenchmark the candidate-resolution ops on TPU.

Measures (chained-slope, CSE defeated by rotated inputs):
  - element take: [C] int32 gather from a flat [M] array
  - nonzero(size=C) over [M] bools
  - row take: [C, 32] uint8 rows from [M/32, 32]
  - searchsorted: [C] keys in [U] table
  - eq-matrix match: h[:,None] == table[None,:] + argmax
  - window extract: 2 row-takes + 5-bit mux shift select
  - byte-level take: [C, W] uint8 element gather (the slow suspect)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(chained, args, r_lo=4, r_hi=36, iters=3):
    jax.block_until_ready(chained(*args, r_lo))
    def t_at(reps):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(*args, reps))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t_at(r_hi) - t_at(r_lo)) / (r_hi - r_lo)


def main():
    M = 1 << 26          # 64M bytes / 16M int32
    C = 16384
    U = 1024
    W = 18
    rng = np.random.default_rng(0)
    flat_i32 = jnp.asarray(rng.integers(0, 1 << 30, M // 4, np.int32))
    u8 = jnp.asarray(rng.integers(0, 256, M, np.uint8).astype(np.uint8))
    u8_2d = u8.reshape(-1, 32)
    bools = jnp.asarray(rng.random(M // 32) < 0.001)
    idx0 = jnp.asarray(
        np.sort(rng.integers(0, M // 4 - 64, C)).astype(np.int32))
    keys0 = jnp.asarray(rng.integers(0, 1 << 31, C).astype(np.uint32))
    table = jnp.asarray(np.sort(
        rng.integers(0, 1 << 31, U).astype(np.uint32)))

    def mk(body):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(reps):
            acc = jnp.int32(0)
            for i in range(reps):
                acc = acc + body(jnp.int32(i))
                acc = lax.optimization_barrier(acc)
            return acc
        return chained

    tests = []

    tests.append(("elem-take[C]i32", mk(
        lambda i: jnp.sum(jnp.take(flat_i32, (idx0 + i) % (M // 4))))))

    tests.append(("nonzero[M/32]", mk(
        lambda i: jnp.nonzero(
            bools != (i < 0), size=C, fill_value=0)[0][0])))

    tests.append(("row-take[C,32]u8", mk(
        lambda i: jnp.sum(jnp.take(
            u8_2d, (idx0 + i) % (M // 32 - 2), axis=0
        ).astype(jnp.int32)))))

    tests.append(("searchsorted[C in U]", mk(
        lambda i: jnp.sum(jnp.searchsorted(
            table, keys0 + i.astype(jnp.uint32)).astype(jnp.int32)))))

    def eqmatch(i):
        h = keys0 + i.astype(jnp.uint32)
        eq = h[:, None] == table[None, :]
        return jnp.sum(jnp.argmax(eq, axis=1).astype(jnp.int32))
    tests.append(("eq-matrix[CxU]", mk(eqmatch)))

    def window_mux(i):
        b0 = (idx0 + i) % (M - 96)
        r = b0 // 32
        o = b0 % 32
        a = jnp.take(u8_2d, r, axis=0)
        b = jnp.take(u8_2d, r + 1, axis=0)
        strip = jnp.concatenate([a, b], axis=1)  # [C, 64]
        slices = [strip[:, s:s + W] for s in range(32)]
        t = slices
        for bit in range(5):
            onb = ((o >> bit) & 1).astype(bool)[:, None]
            t = [jnp.where(onb, t[2 * m + 1], t[2 * m])
                 for m in range(len(t) // 2)]
        return jnp.sum(t[0].astype(jnp.int32))
    tests.append(("window-mux[C,18]", mk(window_mux)))

    def byte_take(i):
        b0 = (idx0 + i) % (M - 96)
        wnd = jnp.take(u8, b0[:, None] + jnp.arange(W, dtype=jnp.int32))
        return jnp.sum(wnd.astype(jnp.int32))
    tests.append(("byte-take[C,18]", mk(byte_take)))

    for name, fn in tests:
        per = slope(fn, ())
        log(f"{name:22s} {per*1e6:9.1f} us/call")


if __name__ == "__main__":
    main()
