"""Measure count-mode cost vs K (limb count) to locate the bottleneck."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu.ops.bitap import BitapEngine, _bitap_call

N = 1 << 26
rng = np.random.default_rng(0)
hay = rng.integers(65, 91, size=N, dtype=np.uint8).tobytes()

SETS = {
    1: [b"Sherlock Holmes", b"John Watson"],                      # 26 -> K=1
    3: [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"],            # K=3
    6: [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty",
        b"Baker Street Irregulars", b"Mycroft Holmes",
        b"Mrs Hudson goes home", b"Scotland Yard detectives"],    # ~K=6
    12: None,
}
SETS[12] = SETS[6] + [p[::-1] for p in SETS[6]]

for k_want, pats in SETS.items():
    eng = BitapEngine(pats, False)
    L, Lc, tiles = eng._layout(N)
    x32 = jax.device_put(eng._pack(hay, L, tiles))
    lo, hi, sm, em = eng._args()
    nn = jnp.asarray([N], jnp.int32)

    def run():
        t, _ = _bitap_call(lo, hi, sm, em, x32, nn, K=eng.tables.k,
                           L=L, Lc=Lc, H=eng.halo, tiles=tiles,
                           extract=False)
        return t
    run().block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        run().block_until_ready()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    steps = tiles * (L // Lc) * (Lc // 4)
    print(f"K={eng.tables.k:2d} L={L} tiles={tiles}: {N/med/1e9:6.2f} GB/s "
          f"({med*1e3:7.2f} ms, {med/steps*1e9:6.0f} ns/word-step)",
          flush=True)
