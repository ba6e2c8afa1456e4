"""Does a wider stream tile (R=16/32) speed up the baked kernel?"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ahocorasick_tpu.ops import bitap as B
from ahocorasick_tpu.ops.bitap import _emit_mux_const

PATS = [b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty"]
N = 1 << 26
rng = np.random.default_rng(1234)
hay = bytearray(rng.integers(97, 123, size=N, dtype=np.uint8).tobytes())
for p in rng.integers(0, N - 32, size=2000):
    pat = PATS[int(rng.integers(len(PATS)))]
    hay[p:p + len(pat)] = pat
hay = bytes(hay)
EXPECT = 1999

eng = B.BitapEngine(PATS, False)
T = eng.tables
K = T.k
H = eng.halo
lo_c = T.lo.tolist()
hi_c = T.hi.tolist()
sm_c = T.start.tolist()
em_c = T.end.tolist()


def make_kernel(R, Lc):
    Wc = Lc // 4
    Hw = H // 4

    def kernel(halo_ref, body_ref, cnt_ref, ms_ref):
        j = pl.program_id(1)

        def advance(ms, b):
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms, hits = [], []
            carry = jnp.zeros((R, 128), jnp.int32)
            for k in range(K):
                lo_t = _emit_mux_const(bits[:4], lo_c[k])
                hi_t = _emit_mux_const(bits[4:], hi_c[k])
                cm = (lo_t & hi_t) if lo_t is not None and hi_t is not None \
                    else jnp.zeros((R, 128), jnp.int32)
                nm = ((ms[k] << 1) | carry | sm_c[k]) & cm
                carry = lax.shift_right_logical(ms[k], 31) & 1
                nms.append(nm)
                hits.append(nm & em_c[k] if em_c[k] else None)
            return nms, hits

        @pl.when(j == 0)
        def _warm():
            def hstep(w, ms):
                word = halo_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms, _ = advance(ms, b)
                return ms
            z = [jnp.zeros((R, 128), jnp.int32)] * K
            ms = lax.fori_loop(0, Hw, hstep, z)
            i = pl.program_id(0)
            row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            first = ((i * R + row) * 128 + col) == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        def step(w, carry):
            ms, acc = carry
            word = body_ref[w]
            for jj in range(4):
                b = lax.shift_right_logical(word, 8 * jj) & 255
                ms, hits = advance(ms, b)
                for k in range(K):
                    if hits[k] is not None:
                        acc = acc + lax.population_count(hits[k])
            return ms, acc

        ms0 = [ms_ref[k] for k in range(K)]
        ms, acc = lax.fori_loop(0, Wc, step, (ms0, cnt_ref[0]))
        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = acc

    return kernel


def run_cfg(R, L, Lc):
    LANES_ = R * 128
    tiles = max(1, -(-N // (LANES_ * L)))
    tiles = 1 << (tiles - 1).bit_length()
    Bp = tiles * LANES_
    total = Bp * L
    buf = np.zeros(total, np.uint8)
    buf[:N] = np.frombuffer(hay, np.uint8)
    x32 = jax.device_put(jnp.asarray(buf.view(np.int32)))
    Wb = L // 4
    Hw = H // 4
    kern = make_kernel(R, Lc)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(x, reps):
        total = jnp.int32(0)
        for _ in range(reps):
            body = x.reshape(Bp, Wb).T.reshape(Wb, Bp // 128, 128)
            halo = jnp.roll(x, Hw).reshape(Bp, Wb)[:, :Hw].T
            halo = halo.reshape(Hw, Bp // 128, 128)
            counts = pl.pallas_call(
                kern,
                grid=(tiles, L // Lc),
                in_specs=[
                    pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Lc // 4, R, 128), lambda i, j: (j, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32),
                scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
            )(halo, body)
            total = total + jnp.sum(counts)
            x, total = jax.lax.optimization_barrier((x, total))
        return total

    def t_at(reps, iters=3):
        out = int(chained(x32, reps))
        assert out == EXPECT * reps, (out, EXPECT * reps)
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained(x32, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_at(16) - t_at(4)) / 12
    print(f"R={R:2d} L={L} Lc={Lc} tiles={tiles}: {per*1e3:6.3f} ms "
          f"= {N/per/1e9:6.1f} GB/s", flush=True)


run_cfg(8, 2048, 512)
run_cfg(16, 2048, 512)
run_cfg(32, 1024, 512)
run_cfg(16, 1024, 1024)
