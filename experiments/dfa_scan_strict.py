"""Honest slope-timed throughput of the blocked dense-DFA scan fallback."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu import AhoCorasick
from ahocorasick_tpu.ops.block_scan import (
    _count_matches_jit, choose_block_len, _round_up,
)

rng = np.random.default_rng(0)
# a >2048-byte pattern set (bitap-ineligible): 400 random words
pats = [
    bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz"),
                     size=int(rng.integers(5, 14))).astype(np.uint8))
    for _ in range(400)
]
N = 1 << 24  # 16 MiB
hay = rng.integers(97, 123, size=N, dtype=np.uint8).tobytes()

ac = AhoCorasick(pats, engine="dfa-scan")
dev = ac._device_automaton()
halo = dev.halo
block_len = choose_block_len(N, halo)
n_pad = _round_up(N, block_len)
buf = np.zeros(n_pad, np.uint8)
buf[:N] = np.frombuffer(hay, np.uint8)
x = jax.device_put(jnp.asarray(buf))
print(f"states={dev.num_states} A={dev.alphabet_len} "
      f"block_len={block_len}", flush=True)


@functools.partial(jax.jit, static_argnames=("reps",))
def chained(x, reps):
    total = jnp.int32(0)
    for _ in range(reps):
        t = _count_matches_jit.__wrapped__(
            dev.trans_flat, dev.classes, dev.match_count, x,
            jnp.int32(N), jnp.int32(dev.alphabet_len),
            jnp.int32(dev.start_id), block_len, halo,
        )
        total = total + t
        x, total = jax.lax.optimization_barrier((x, total))
    return total


def t_at(reps, iters=3):
    int(chained(x, reps))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        int(chained(x, reps))
        best = min(best, time.perf_counter() - t0)
    return best


t1, t4 = t_at(1), t_at(4)
per = (t4 - t1) / 3
print(f"t1={t1*1e3:.1f} t4={t4*1e3:.1f} -> per-scan {per*1e3:.2f} ms "
      f"= {N/per/1e9:.3f} GB/s", flush=True)
