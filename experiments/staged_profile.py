"""Profile the staged count pipeline stage by stage on the TPU.

CSE-proof methodology: every chained iteration consumes a DISTINCT
input (rotated index vectors / per-iteration halo buffers), so XLA
cannot collapse the chain; slope timing then isolates per-stage cost.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from ahocorasick_tpu.ops import staged as S
from ahocorasick_tpu.ops.bitap import LANES, R, _interpret
from bench import build_haystack, host_count


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(chained, args, r_lo=4, r_hi=20, iters=3):
    jax.block_until_ready(chained(*args, r_lo))
    def t_at(reps):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(*args, reps))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t_at(r_hi) - t_at(r_lo)) / (r_hi - r_lo)


def main():
    patterns = [
        b"Sherlock Holmes", b"John Watson", b"Irene Adler",
        b"Inspector Lestrade", b"Professor Moriarty",
    ]
    n = 1 << 26
    hs = build_haystack(n)
    eng = S.StagedEngine(patterns, False)
    ph = eng.prepare(hs)
    ns = ph.tiles * LANES
    cap = 16384
    Wb = ph.L // 4
    Hw = eng.halo // 4
    log(f"L={ph.L} tiles={ph.tiles} ns={ns} Kf={eng.fp.k} K={eng.full.k}")

    fpk = eng.fp.baked_key()
    flags_kernel = S._make_flags_kernel(fpk[0], fpk[1], fpk[2], fpk[3],
                                        eng.fp.k, ph.Lc, eng.halo)
    nchunks = ph.L // ph.Lc
    Wc = ph.Lc // 4
    tiles = ph.tiles
    NREP = 24

    def flags_only(halo, body):
        return pl.pallas_call(
            flags_kernel,
            grid=(tiles, nchunks),
            in_specs=[
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((eng.fp.k, R, 128), jnp.int32)],
            interpret=_interpret(),
        )(halo, body)[0]

    # Distinct halo per iteration => no CSE of the flags kernel.
    halos = jnp.stack([ph.halo_a + i for i in range(NREP)])

    @functools.partial(jax.jit, static_argnames=("reps",))
    def c_flags(halos, body, reps):
        acc = jnp.int32(0)
        for i in range(reps):
            fl = flags_only(halos[i], body)
            acc = acc + jnp.sum(fl)
            body, acc = lax.optimization_barrier((body, acc))
        return acc

    @functools.partial(jax.jit, static_argnames=("reps",))
    def c_compact(halos, body, reps):
        acc = jnp.int32(0)
        for i in range(reps):
            fl = flags_only(halos[i], body).reshape(ns)
            is_c = fl != 0
            ncand = jnp.sum(is_c.astype(jnp.int32))
            (cand,) = jnp.nonzero(is_c, size=cap, fill_value=-1)
            acc = acc + ncand + cand[0]
            body, acc = lax.optimization_barrier((body, acc))
        return acc

    # Gather-only: rotated index vectors (distinct per iteration).
    base_idx = jnp.arange(cap, dtype=jnp.int32) * (ns // cap)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def c_gather_only(rows, hrows, reps):
        acc = jnp.int32(0)
        for i in range(reps):
            safe = (base_idx + i) % ns
            grows = jnp.take(rows, safe, axis=0)
            ghalo = jnp.take(hrows, safe, axis=0)
            acc = acc + grows[0, 0] + ghalo[0, 0]
            acc = lax.optimization_barrier(acc)
        return acc

    @functools.partial(jax.jit, static_argnames=("reps",))
    def c_gather_T(rows, hrows, reps):
        acc = jnp.int32(0)
        for i in range(reps):
            safe = (base_idx + i) % ns
            grows = jnp.take(rows, safe, axis=0)
            ghalo = jnp.take(hrows, safe, axis=0)
            gbody = grows.T.reshape(Wb, cap // 128, 128)
            ghal = ghalo.T.reshape(Hw, cap // 128, 128)
            acc = acc + gbody[0, 0, 0] + ghal[0, 0, 0]
            acc = lax.optimization_barrier(acc)
        return acc

    # Stage-2 kernel on fixed pre-gathered data, distinct nn per iter.
    fullk = eng.full.baked_key()
    gath_kernel = S._make_gathered_kernel(fullk[0], fullk[1], fullk[2],
                                          fullk[3], eng.full.k, ph.L,
                                          ph.Lc, eng.halo)
    tiles_c = cap // LANES
    safe0 = jnp.arange(cap, dtype=jnp.int32) * (ns // cap)
    grows0 = jnp.take(ph.rows, safe0, axis=0)
    ghalo0 = jnp.take(ph.hrows, safe0, axis=0)
    gbody0 = grows0.T.reshape(Wb, cap // 128, 128)
    ghal0 = ghalo0.T.reshape(Hw, cap // 128, 128)
    sid0 = safe0.reshape(tiles_c, R, 128)

    def stage2(nn, sid, ghal, gbody):
        return pl.pallas_call(
            gath_kernel,
            grid=(tiles_c, nchunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((tiles_c, R, 128), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((eng.full.k, R, 128), jnp.int32)],
            interpret=_interpret(),
        )(nn, sid, ghal, gbody)[0]

    nns = jnp.stack([jnp.asarray([0, ph.n - i], jnp.int32)
                     for i in range(NREP)])

    @functools.partial(jax.jit, static_argnames=("reps",))
    def c_stage2(gbody, ghal, reps):
        acc = jnp.int32(0)
        for i in range(reps):
            cnt = stage2(nns[i], sid0, ghal, gbody)
            acc = acc + jnp.sum(cnt)
            acc = lax.optimization_barrier(acc)
        return acc

    fn = S._staged_jit(eng.fp.baked_key(), eng.full.baked_key(),
                       eng.fp.k, eng.full.k, ph.L, ph.Lc, eng.halo,
                       ph.tiles, cap)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def c_full(rows, hrows, halos, body, reps):
        acc = jnp.int32(0)
        for i in range(reps):
            t, nc = fn(rows, hrows, halos[i], body,
                       nns[i])
            acc = acc + t + nc
            body, acc = lax.optimization_barrier((body, acc))
        return acc

    for name, chained, args in [
        ("flags", c_flags, (halos, ph.body)),
        ("flags+compact", c_compact, (halos, ph.body)),
        ("gather-only", c_gather_only, (ph.rows, ph.hrows)),
        ("gather+transpose", c_gather_T, (ph.rows, ph.hrows)),
        ("stage2-kernel", c_stage2, (gbody0, ghal0)),
        ("full", c_full, (ph.rows, ph.hrows, halos, ph.body)),
    ]:
        per = slope(chained, args)
        log(f"{name:20s} per-scan {per*1e3:7.3f} ms  "
            f"({n/per/1e9:8.1f} GB/s-equiv)")


if __name__ == "__main__":
    main()
