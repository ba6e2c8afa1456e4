"""Microbenchmarks for the blocked DFA scan inner loop on TPU v5e.

Candidates:
  A. current: lax.scan with jnp.take (data-dependent gather)  [known: ~43M/s]
  B. parallel gather throughput (outside scan)
  C. MXU R-formulation: per step  R = onehotA @ T^T (MXU), next = sum(onehotS*R)
  D. bit-parallel shift-AND over trie chains (no state gather)
  E. pallas kernel with jnp.take from VMEM table
  F. pallas kernel with R-formulation fused in VMEM
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def bench(fn, *args, iters=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    return med, out


# ---------------------------------------------------------------- setup
S, A = 128, 32        # padded states, padded classes
rng = np.random.default_rng(0)
TRANS = rng.integers(0, 70, size=(S, A)).astype(np.int32)
TRANS_FLAT = jnp.asarray(TRANS.reshape(-1))
Tt_bf = jnp.asarray(TRANS.T.astype(np.float32)).astype(jnp.bfloat16)  # [A,S], ids<256 exact

N = 1 << 23  # 8 MiB
BYTES = rng.integers(0, 256, size=N).astype(np.uint8)
CLS = (BYTES % A).astype(np.int32)


def reshape_blocks(c, B):
    L = c.size // B
    return jnp.asarray(c.reshape(B, L).T)  # [L, B]


# ---------------------------------------------------------------- B: parallel gather
@jax.jit
def par_gather(idx):
    return jnp.take(TRANS_FLAT, idx)

idx = jnp.asarray(rng.integers(0, S * A, size=N).astype(np.int32))
med, _ = bench(par_gather, idx)
print(f"B  parallel gather   : {N/med/1e9:8.2f} G elem/s  ({med*1e3:.2f} ms)", flush=True)


# ---------------------------------------------------------------- A: take-scan
@functools.partial(jax.jit, static_argnames=())
def take_scan(cw):
    def step(s, cl):
        s2 = jnp.take(TRANS_FLAT, s * A + cl)
        return s2, ()
    s0 = jnp.full((cw.shape[1],), 2, dtype=jnp.int32)
    sf, _ = lax.scan(step, s0, cw)
    return sf

for B in (8192, 32768):
    cw = reshape_blocks(CLS, B)
    med, _ = bench(take_scan, cw, iters=3)
    print(f"A  take-scan B={B:6d}: {N/med/1e9:8.2f} GB/s      ({med*1e3:.2f} ms)", flush=True)


# ---------------------------------------------------------------- C: MXU R-form
iota_s = jnp.arange(S, dtype=jnp.int32)
iota_a = jnp.arange(A, dtype=jnp.int32)

@jax.jit
def mxu_scan(cw):
    def step(s, cl):
        ohA = (cl[:, None] == iota_a[None, :]).astype(jnp.bfloat16)      # [B,A]
        R = jnp.dot(ohA, Tt_bf, preferred_element_type=jnp.float32)      # [B,S]
        ohS = (s[:, None] == iota_s[None, :])
        nxt = jnp.sum(jnp.where(ohS, R, 0.0), axis=1).astype(jnp.int32)  # [B]
        return nxt, ()
    s0 = jnp.full((cw.shape[1],), 2, dtype=jnp.int32)
    sf, _ = lax.scan(step, s0, cw)
    return sf

for B in (8192, 32768, 131072):
    cw = reshape_blocks(CLS, B)
    med, _ = bench(mxu_scan, cw, iters=3)
    print(f"C  mxu-scan  B={B:6d}: {N/med/1e9:8.2f} GB/s      ({med*1e3:.2f} ms)", flush=True)


# ---------------------------------------------------------------- D: shift-AND
# 5 sherlock-ish patterns, total ~73 chars -> 3 limbs of 32.
PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]
chars = []
for p in PATS:
    chars.extend(p)
    chars.append(256)  # guard bit (never matches)
NBITS = len(chars)
K = (NBITS + 31) // 32
start_limbs = np.zeros(K, np.int32)
bit = 0
starts = []
for p in PATS:
    starts.append(bit)
    bit += len(p) + 1
for s0_ in starts:
    start_limbs[s0_ // 32] |= np.int32(1 << (s0_ % 32))
char_arr = np.array(chars + [256] * (K * 32 - NBITS), np.int32).reshape(K, 32)
CH = jnp.asarray(char_arr)  # [K,32]
SL = jnp.asarray(start_limbs)

@jax.jit
def shiftand_scan(bw):
    # bw: [L, B] int32 byte values
    def step(m, b):
        # m: [K, B] int32 masks
        # charmask: cm[k, b] = sum_j (b==CH[k,j])<<j
        eq = (b[None, None, :] == CH[:, :, None])                      # [K,32,B]
        w = jnp.left_shift(jnp.int32(1), jnp.arange(32, dtype=jnp.int32))
        cm = jnp.sum(jnp.where(eq, w[None, :, None], 0), axis=1)       # [K,B]
        m2 = ((m << 1) | SL[:, None]) & cm
        return m2, ()
    m0 = jnp.zeros((K, bw.shape[1]), dtype=jnp.int32)
    mf, _ = lax.scan(step, m0, bw)
    return mf

BY = BYTES.astype(np.int32)
for B in (8192, 32768, 131072):
    bw = reshape_blocks(jnp.asarray(BY), B)
    med, _ = bench(shiftand_scan, bw, iters=3)
    print(f"D  shiftand  B={B:6d}: {N/med/1e9:8.2f} GB/s      ({med*1e3:.2f} ms)", flush=True)


# ---------------------------------------------------------------- E/F: pallas
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def pallas_take_kernel(tab_ref, cw_ref, out_ref):
    L = cw_ref.shape[0]
    Bt = cw_ref.shape[1]
    def body(i, s):
        cl = cw_ref[i, :]
        return jnp.take(tab_ref[:], s * A + cl)
    s0 = jnp.full((Bt,), 2, dtype=jnp.int32)
    out_ref[0, :] = lax.fori_loop(0, L, body, s0)

def pallas_take(cw):
    L, B = cw.shape
    BT = 1024
    return pl.pallas_call(
        pallas_take_kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((S * A,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BT), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(TRANS_FLAT, cw)

try:
    B = 32768
    L = N // B
    cw = reshape_blocks(CLS, B)
    f = jax.jit(pallas_take)
    med, _ = bench(f, cw, iters=3)
    print(f"E  pallas-take B={B}: {N/med/1e9:8.2f} GB/s      ({med*1e3:.2f} ms)", flush=True)
except Exception as e:
    print(f"E  pallas-take FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
