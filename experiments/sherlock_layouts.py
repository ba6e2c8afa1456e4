"""Layout sweep for the name-alt1 flagship row: slope-time the baked
K=1 count kernel over sherlock.txt at several (L, tiles) packings.

The scan cost model says padded_bytes * (1 + H/L) / 85GBps; this sweeps
the candidates around the model's optimum to catch any per-grid-step
overhead the model misses.  Run on TPU.
"""

import sys, time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import make_chained
from ahocorasick_tpu.ops import bitap as B


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    hay = open("/root/reference/benchmarks/haystacks/sherlock.txt",
               "rb").read()
    pats = [b"Sherlock", b"Street"]
    n = len(hay)
    eng = B.BitapEngine(pats, False)
    t = eng.tables
    pad = t.pad_byte
    for L, tiles in ((128, 5), (128, 6), (256, 3), (512, 2)):
        total = tiles * B.LANES * L
        if total < n:
            continue
        buf = np.full(total, pad, np.uint8)
        buf[:n] = np.frombuffer(hay, np.uint8)
        x32 = jax.device_put(jnp.asarray(buf.view(np.int32)))
        halo_a, body = B._to_stream_major(x32, L, tiles, eng.halo)
        Lc = min(L, 512)
        fn = B._baked_jit(t.baked_key(), t.k, L, Lc, eng.halo, tiles,
                          False)
        chained = make_chained(jax, jnp, fn, body_idx=1)
        assert int(chained(halo_a, body, 2)) == 158 * 2

        def t_at(reps, iters=4):
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                int(chained(halo_a, body, reps))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (t_at(4096) - t_at(256)) / (4096 - 256)
        log(f"L={L:4d} tiles={tiles} padded={total:8d} "
            f"per-scan {per*1e6:6.2f} us  {n/per/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
