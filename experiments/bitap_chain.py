"""True bitap kernel throughput: chain reps inside one jit, subtract RTT."""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu.ops import bitap as B

PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]
N = 1 << 26
rng = np.random.default_rng(1234)
hay = bytearray(rng.integers(97, 123, size=N, dtype=np.uint8).tobytes())
for p in rng.integers(0, N - 32, size=2000):
    pat = PATS[int(rng.integers(len(PATS)))]
    hay[p:p + len(pat)] = pat
hay = bytes(hay)

eng = B.BitapEngine(PATS, False)
L, Lc, tiles = eng._layout(N)
K = eng.tables.k
lo, hi, sm, em = eng._args()
nn = jnp.asarray([N], jnp.int32)
x32 = jax.device_put(eng._pack(hay, L, tiles))

# RTT baseline
f_small = jax.jit(lambda x: jnp.sum(x))
sm_arr = jnp.arange(8, dtype=jnp.int32)
int(f_small(sm_arr))
t0 = time.perf_counter()
for _ in range(20):
    int(f_small(sm_arr))
RTT = (time.perf_counter() - t0) / 20
print(f"RTT {RTT*1e3:.1f} ms", flush=True)

@functools.partial(jax.jit, static_argnames=("reps",))
def chained(lo, hi, sm, em, x32, nn, reps):
    total = jnp.int32(0)
    x = x32
    for r in range(reps):
        t, _ = B._bitap_call(lo, hi, sm, em, x, nn, K=K, L=L, Lc=Lc,
                             H=eng.halo, tiles=tiles, extract=False)
        total = total + t
        # prevent CSE of identical calls and enforce ordering
        x, total = jax.lax.optimization_barrier((x, total))
    return total


def t_at(reps, iters=3):
    out = int(chained(lo, hi, sm, em, x32, nn, reps))
    assert out == 1999 * reps, out
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        int(chained(lo, hi, sm, em, x32, nn, reps))
        best = min(best, time.perf_counter() - t0)
    return best


t8 = t_at(8)
t32 = t_at(32)
t64 = t_at(64)
print(f"t8={t8*1e3:.1f} ms t32={t32*1e3:.1f} ms t64={t64*1e3:.1f} ms",
      flush=True)
per = (t64 - t8) / 56
print(f"slope per-scan: {per*1e3:.3f} ms -> {N/per/1e9:.2f} GB/s",
      flush=True)
per2 = (t64 - t32) / 32
print(f"slope(64,32):   {per2*1e3:.3f} ms -> {N/per2/1e9:.2f} GB/s",
      flush=True)
