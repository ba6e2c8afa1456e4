"""A/B: same kernel, sherlock-text vs random haystack, one process."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu.ops.bitap import BitapEngine, _bitap_call
from bitap_perf import build_haystack, PATS, N

hay_s = build_haystack(N)
rng = np.random.default_rng(0)
hay_r = rng.integers(65, 91, size=N, dtype=np.uint8).tobytes()
# also: random lowercase (pattern chars mostly lowercase -> live states)
hay_l = rng.integers(97, 123, size=N, dtype=np.uint8).tobytes()

eng = BitapEngine(PATS, False)
L, Lc, tiles = eng._layout(N)
lo, hi, sm, em = eng._args()
nn = jnp.asarray([N], jnp.int32)


def timed(x32, tag):
    def run():
        t, _ = _bitap_call(lo, hi, sm, em, x32, nn, K=eng.tables.k,
                           L=L, Lc=Lc, H=eng.halo, tiles=tiles,
                           extract=False)
        return t
    out = run(); out.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(); out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{tag}: count={int(out):6d}  {N/med/1e9:7.2f} GB/s "
          f"({med*1e3:7.2f} ms)", flush=True)


xs = jax.device_put(eng._pack(hay_s, L, tiles))
xr = jax.device_put(eng._pack(hay_r, L, tiles))
xl = jax.device_put(eng._pack(hay_l, L, tiles))
for rep in range(2):
    timed(xs, "sherlock ")
    timed(xr, "random AZ")
    timed(xl, "random az")
