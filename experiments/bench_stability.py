"""Is the 2x bench variance within-process or across-process?"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu.ops import bitap as B
from bench import build_haystack, host_count

patterns = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
            b"Inspector Lestrade", b"Professor Moriarty"]
n = 1 << 26
hay = build_haystack(n)
eng = B.BitapEngine(patterns, False)
L, Lc, tiles = eng._layout(n)
fn = B._baked_jit(eng.tables.baked_key(), eng.tables.k, L, Lc,
                  eng.halo, tiles, False)
x32 = jax.device_put(eng._pack(hay, L, tiles, pad=eng.tables.pad_byte))


@functools.partial(jax.jit, static_argnames=("reps",))
def chained(x, reps):
    total = jnp.int32(0)
    for _ in range(reps):
        total = total + fn(x)
        x, total = jax.lax.optimization_barrier((x, total))
    return total


def t_at(reps, iters=4):
    int(chained(x32, reps))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        int(chained(x32, reps))
        best = min(best, time.perf_counter() - t0)
    return best


for trial in range(6):
    t4, t20 = t_at(4), t_at(20)
    per = (t20 - t4) / 16
    print(f"trial {trial}: t4={t4*1e3:6.1f} t20={t20*1e3:6.1f} "
          f"per={per*1e3:6.3f} ms  {n/per/1e9:6.1f} GB/s", flush=True)
    time.sleep(2)
