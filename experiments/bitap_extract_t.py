"""True extract-kernel throughput via chained slope method."""
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
N = 1 << 23  # 8 MiB
rng = np.random.default_rng(1234)
hay = bytearray(rng.integers(97, 123, size=N, dtype=np.uint8).tobytes())
for p in rng.integers(0, N - 32, size=256):
    pat = PATS[int(rng.integers(len(PATS)))]
    hay[p:p + len(pat)] = pat
hay = bytes(hay)

eng = B.BitapEngine(PATS, False)
L, Lc, tiles = eng._layout(N)
K = eng.tables.k
while Lc * K > 1024 and Lc > 4:
    Lc //= 2
lo, hi, sm, em = eng._args()
nn = jnp.asarray([N], jnp.int32)
x32 = jax.device_put(eng._pack(hay, L, tiles))
print(f"L={L} Lc={Lc} tiles={tiles} K={K}", flush=True)


@functools.partial(jax.jit, static_argnames=("reps",))
def chained(x32, reps):
    total = jnp.int32(0)
    x = x32
    for r in range(reps):
        t, w = B._bitap_call(lo, hi, sm, em, x, nn, K=K, L=L, Lc=Lc,
                             H=eng.halo, tiles=tiles, extract=True)
        total = total + t + (w[0, 0, 0, 0, 0] & 0)
        x, total = jax.lax.optimization_barrier((x, total))
    return total


def t_at(reps, iters=3):
    int(chained(x32, reps))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        int(chained(x32, reps))
        best = min(best, time.perf_counter() - t0)
    return best


t2 = t_at(2)
t8 = t_at(8)
per = (t8 - t2) / 6
print(f"t2={t2*1e3:.1f} t8={t8*1e3:.1f} -> per-scan {per*1e3:.2f} ms "
      f"= {N/per/1e9:.2f} GB/s", flush=True)

# end-to-end match_pairs (includes tunnel dispatches)
eng.match_pairs(hay)
t0 = time.perf_counter()
pids, ends = eng.match_pairs(hay)
print(f"match_pairs e2e: {time.perf_counter()-t0:.3f}s "
      f"({len(pids)} matches)", flush=True)
