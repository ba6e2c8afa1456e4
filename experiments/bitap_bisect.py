"""Bisect the 300x count-mode discrepancy between processes."""
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
# sherlock-like haystack with planted matches (cheap version)
hay = bytearray(rng.integers(97, 123, size=N, dtype=np.uint8).tobytes())
np_pos = rng.integers(0, N - 32, size=2000)
for p in np_pos:
    pat = PATS[int(rng.integers(len(PATS)))]
    hay[p:p + len(pat)] = pat
hay = bytes(hay)

eng = BitapEngine(PATS, False)
L, Lc, tiles = eng._layout(N)
lo, hi, sm, em = eng._args()
nn = jnp.asarray([N], jnp.int32)
x32 = jax.device_put(eng._pack(hay, L, tiles))


def timed(tag):
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
    print(f"{tag}: count={int(out)}  {N/med/1e9:7.2f} GB/s ({med*1e3:.2f} ms)",
          flush=True)


timed("baseline               ")
# now compile+run the EXTRACT kernel on a small slice, then re-time
sl = hay[: 1 << 23]
pids, ends = eng.match_pairs(sl)
print(f"extract ran: {len(pids)} matches", flush=True)
timed("after extract          ")
