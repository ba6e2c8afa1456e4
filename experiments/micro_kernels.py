"""Prototype Pallas kernels: shift-AND engine and DFA A-select engine."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], out


# ---------------------------------------------------------------- patterns
PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]

# bit layout: consecutive chains, 1 guard bit after each pattern
chains = []
bit = 0
starts, ends = [], []
for p in PATS:
    starts.append(bit)
    chains.extend(p)
    bit += len(p)
    ends.append(bit - 1)          # bit index of last char
    chains.append(-1)             # guard (never matches)
    bit += 1
NBITS = bit
K = (NBITS + 31) // 32
print(f"NBITS={NBITS} K={K}")

start_l = np.zeros(K, np.uint32)
end_l = np.zeros(K, np.uint32)
for s in starts:
    start_l[s // 32] |= np.uint32(1 << (s % 32))
for e in ends:
    end_l[e // 32] |= np.uint32(1 << (e % 32))

# charmask tables: CM[v, k] = bits j in limb k with chains[j] == v
CM = np.zeros((256, K), np.uint32)
for j, ch in enumerate(chains):
    if ch >= 0:
        CM[ch, j // 32] |= np.uint32(1 << (j % 32))

# chain-continuation mask: bit j can receive a shifted-in bit iff j-1 is in
# the same chain (handled implicitly: guard bits have CM=0 so they die).
# cross-limb carry: bit 32k comes from bit 32k-1 of limb k-1.

CMi = CM.astype(np.int32)  # bit-identical reinterpret
CMLO = np.broadcast_to(CMi[:128].T[:, None, :], (K, 8, 128)).copy()   # [K,8,128]
CMHI = np.broadcast_to(CMi[128:].T[:, None, :], (K, 8, 128)).copy()

N = 1 << 23  # 8 MiB


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


HAY = build_haystack(N)


def host_count(hay):
    """Naive overlapping match count."""
    total = 0
    for p in PATS:
        start = 0
        while True:
            i = hay.find(p, start)
            if i < 0:
                break
            total += 1
            start = i + 1
    return total


HOST_COUNT = host_count(HAY)
print(f"host count = {HOST_COUNT}")

# ---------------------------------------------------------------- layout
H = 32          # halo (max pattern len 18 -> 32)
L = 2048        # per-stream block length
LANES = 1024    # streams per kernel tile (8 x 128)


def prepare(hay, L, H):
    n = len(hay)
    B = -(-n // L)                      # number of streams
    Bp = -(-B // LANES) * LANES         # pad streams to tile multiple
    buf = np.zeros(Bp * L, np.uint8)
    buf[:n] = np.frombuffer(hay, np.uint8)
    x = jnp.asarray(buf)
    body = x.reshape(Bp, L).T           # [L, Bp]
    halo = jnp.roll(x, H).reshape(Bp, L)[:, :H].T  # [H, Bp]
    cw = jnp.concatenate([halo, body], axis=0)     # [L+H, Bp]
    return cw.reshape(L + H, Bp // 128, 128), n, Bp


# ---------------------------------------------------------------- shift-AND
def sa_kernel(cmlo_ref, cmhi_ref, cw_ref, n_ref, cnt_ref):
    i = pl.program_id(0)
    steps = cw_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    stream = i * LANES + row_ids * 128 + col_ids        # [8,128]
    n = n_ref[0]
    first = (stream == 0)

    start_c = [jnp.full((8, 128), np.int32(start_l[k].view(np.int32) if hasattr(start_l[k], 'view') else start_l[k]), jnp.int32) for k in range(K)]
    end_c = [jnp.int32(np.int32(end_l[k].astype(np.int32))) for k in range(K)]

    def body(t, carry):
        ms, acc = carry
        b = cw_ref[t].astype(jnp.int32)                 # [8,128]
        blo = b & 127
        hi = b >= 128
        nms = []
        carry_bit = jnp.zeros((8, 128), jnp.int32)
        for k in range(K):
            cmk = jnp.where(
                hi,
                jnp.take_along_axis(cmhi_ref[k], blo, axis=1),
                jnp.take_along_axis(cmlo_ref[k], blo, axis=1),
            )
            nm = ((ms[k] << 1) | carry_bit | start_c[k]) & cmk
            carry_bit = lax.shift_right_logical(ms[k], 31)
            nms.append(nm)
        # count matches at this position (only for t >= H and pos < n)
        pos = stream * L + (t - H)
        ok = (t >= H) & (pos < n)
        mc = jnp.zeros((8, 128), jnp.int32)
        for k in range(K):
            mc = mc + lax.population_count(nms[k] & end_c[k])
        acc = acc + jnp.where(ok, mc, 0)
        # stream 0 halo is wrapped garbage: clear masks when warmup ends
        reset = first & (t == H - 1)
        nms = [jnp.where(reset, 0, m) for m in nms]
        return (tuple(nms), acc)

    m0 = tuple(jnp.zeros((8, 128), jnp.int32) for _ in range(K))
    acc0 = jnp.zeros((8, 128), jnp.int32)
    _, acc = lax.fori_loop(0, steps, body, (m0, acc0))
    cnt_ref[0] = acc


def sa_count(cw, n, Bp):
    tiles = Bp // LANES
    counts = pl.pallas_call(
        sa_kernel,
        out_shape=jax.ShapeDtypeStruct((tiles, 8, 128), jnp.int32),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((K, 8, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L + H, 8, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(jnp.asarray(CMLO), jnp.asarray(CMHI), cw, jnp.asarray([n], jnp.int32))
    return jnp.sum(counts)


@jax.jit
def sa_full(x_cw, n):
    return sa_count(x_cw, n, x_cw.shape[1] * 128)


try:
    cw, n, Bp = prepare(HAY, L, H)
    f = jax.jit(functools.partial(sa_count))
    med, out = bench(lambda c: sa_count(c, n, Bp), cw, iters=5)
    print(f"shift-AND count={int(out)} (host {HOST_COUNT}) "
          f"{N/med/1e9:8.2f} GB/s ({med*1e3:.2f} ms)", flush=True)
except Exception as e:
    import traceback; traceback.print_exc()
