"""Bitap engine throughput on TPU: count mode on the 64MiB haystack."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu.ops.bitap import BitapEngine, _bitap_call, LANES

PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]
N = 1 << 26


def build_haystack(n):
    rng = np.random.default_rng(1234)
    words = ("the quick brown fox jumps over lazy dog time of day "
             "it was best worst epoch belief incredulity season").split()
    parts, size = [], 0
    while size < n:
        if rng.random() < 0.001:
            w = PATS[int(rng.integers(len(PATS)))]
        else:
            w = words[int(rng.integers(len(words)))].encode()
        parts.append(w)
        size += len(w) + 1
    return b" ".join(parts)[:n]


hay = build_haystack(N)


def host_count(hay):
    total = 0
    for p in PATS:
        st = 0
        while True:
            i = hay.find(p, st)
            if i < 0:
                break
            total += 1
            st = i + 1
    return total


HC = host_count(hay)
print(f"host count = {HC}", flush=True)

eng = BitapEngine(PATS, False)
print(f"K={eng.tables.k} halo={eng.halo}", flush=True)
L, Lc, tiles = eng._layout(N)
print(f"L={L} Lc={Lc} tiles={tiles}", flush=True)
x32 = eng._pack(hay, L, tiles)
x32 = jax.device_put(x32)
lo, hi, sm, em = eng._args()
nn = jnp.asarray([N], jnp.int32)


def run():
    total, _ = _bitap_call(lo, hi, sm, em, x32, nn,
                           K=eng.tables.k, L=L, Lc=Lc, H=eng.halo,
                           tiles=tiles, extract=False)
    return total


t0 = time.perf_counter()
c = int(run())
print(f"first run {time.perf_counter()-t0:.1f}s count={c} "
      f"({'OK' if c == HC else 'BAD'})", flush=True)

ts = []
for _ in range(7):
    t0 = time.perf_counter()
    out = run()
    out.block_until_ready()
    ts.append(time.perf_counter() - t0)
med = sorted(ts)[len(ts) // 2]
print(f"count mode: {N/med/1e9:8.2f} GB/s ({med*1e3:.2f} ms)", flush=True)

# extraction mode on an 8MiB slice
sl = hay[: 1 << 23]
t0 = time.perf_counter()
pids, ends = eng.match_pairs(sl)
print(f"extract first {time.perf_counter()-t0:.1f}s "
      f"({len(pids)} matches)", flush=True)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    pids, ends = eng.match_pairs(sl)
    ts.append(time.perf_counter() - t0)
med = sorted(ts)[len(ts) // 2]
print(f"extract (end-to-end incl. upload+decode): "
      f"{len(sl)/med/1e9:8.2f} GB/s ({med*1e3:.2f} ms)", flush=True)
