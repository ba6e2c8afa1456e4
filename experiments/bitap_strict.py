"""Strict-sync timing: force a host roundtrip per iteration."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu.ops.bitap import BitapEngine, _bitap_call

PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]
N = 1 << 26
rng = np.random.default_rng(1234)
hay = bytearray(rng.integers(97, 123, size=N, dtype=np.uint8).tobytes())
for p in rng.integers(0, N - 32, size=2000):
    pat = PATS[int(rng.integers(len(PATS)))]
    hay[p:p + len(pat)] = pat
hay = bytes(hay)

eng = BitapEngine(PATS, False)
L, Lc, tiles = eng._layout(N)
lo, hi, sm, em = eng._args()
nn = jnp.asarray([N], jnp.int32)
x32 = jax.device_put(eng._pack(hay, L, tiles))


def run():
    t, _ = _bitap_call(lo, hi, sm, em, x32, nn, K=eng.tables.k,
                       L=L, Lc=Lc, H=eng.halo, tiles=tiles,
                       extract=False)
    return t


c0 = int(run())
print(f"count={c0}", flush=True)

# strict: int() every iteration
for rep in range(3):
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        assert int(run()) == c0
    dt = (time.perf_counter() - t0) / iters
    print(f"strict per-call: {N/dt/1e9:7.2f} GB/s ({dt*1e3:.2f} ms)",
          flush=True)

# pipelined: launch 10, then block on all
for rep in range(3):
    t0 = time.perf_counter()
    outs = [run() for _ in range(10)]
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"pipelined per-call: {N/dt/1e9:7.2f} GB/s ({dt*1e3:.2f} ms)",
          flush=True)
