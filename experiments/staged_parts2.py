"""Decompose staged pipeline cost: stage1 kernel / plumbing / stage2."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ahocorasick_tpu.ops import staged as S
from experiments.staged_perf import PATS, build_haystack, host_count

N = 1 << 26
hay = build_haystack(N)
n = len(hay)
st = S.StagedEngine(PATS, False)
L, Lc, tiles = st._layout(N)
ns = tiles * S.LANES
cap = 16384
Wb = L // 4
Hw = st.halo // 4
buf = np.full(ns * L, st.full.pad_byte, np.uint8)
buf[:n] = np.frombuffer(hay, np.uint8)
xs = jax.device_put(jnp.asarray(buf.view(np.int32)))
nn = jnp.asarray([0, n], jnp.int32)

flags_kernel = S._make_flags_kernel(*st.fp.baked_key()[:2],
                                    st.fp.baked_key()[2],
                                    st.fp.baked_key()[3],
                                    st.fp.k, Lc, st.halo)
gath_kernel = S._make_gathered_kernel(*st.full.baked_key()[:2],
                                      st.full.baked_key()[2],
                                      st.full.baked_key()[3],
                                      st.full.k, L, Lc, st.halo)
nchunks = L // Lc
Wc = Lc // 4
tiles_c = cap // S.LANES
R = S.R


@jax.jit
def stage1(x32):
    rows = x32.reshape(ns, Wb)
    hrows = jnp.roll(x32, Hw).reshape(ns, Wb)[:, :Hw]
    body = rows.T.reshape(Wb, ns // 128, 128)
    halo = hrows.T.reshape(Hw, ns // 128, 128)
    (flags,) = pl.pallas_call(
        flags_kernel, grid=(tiles, nchunks),
        in_specs=[
            pl.BlockSpec((Hw, R, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, R, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, R, 128), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((tiles, R, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((st.fp.k, R, 128), jnp.int32)],
    )(halo, body)
    return flags


@jax.jit
def plumbing(x32, flags):
    rows = x32.reshape(ns, Wb)
    hrows = jnp.roll(x32, Hw).reshape(ns, Wb)[:, :Hw]
    fl = flags.reshape(ns)
    is_cand = fl != 0
    ncand = jnp.sum(is_cand.astype(jnp.int32))
    (cand,) = jnp.nonzero(is_cand, size=cap, fill_value=-1)
    safe = jnp.maximum(cand, 0)
    grows = jnp.take(rows, safe, axis=0)
    ghalo = jnp.take(hrows, safe, axis=0)
    gbody = grows.T.reshape(Wb, cap // 128, 128)
    ghal = ghalo.T.reshape(Hw, cap // 128, 128)
    sid_t = cand.reshape(tiles_c, R, 128).astype(jnp.int32)
    return ncand, gbody, ghal, sid_t


@jax.jit
def stage2(gbody, ghal, sid_t):
    (counts,) = pl.pallas_call(
        gath_kernel, grid=(tiles_c, nchunks),
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
        scratch_shapes=[pltpu.VMEM((st.full.k, R, 128), jnp.int32)],
    )(nn, sid_t, ghal, gbody)
    return jnp.sum(counts)


def bench(fn, args, name, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.3f} ms (incl dispatch)", flush=True)
    return out


flags = bench(stage1, (xs,), "stage1")
ncand, gbody, ghal, sid_t = bench(plumbing, (xs, flags), "plumbing")
print("ncand =", int(ncand), flush=True)
total = bench(stage2, (gbody, ghal, sid_t), "stage2")
print("count =", int(total), "expect", host_count(hay), flush=True)


def slope(fn_one, args, name):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(reps, *a):
        acc = jnp.int32(0)
        for _ in range(reps):
            out = fn_one(*a)
            leaves = jax.tree.leaves(out)
            acc = acc + jnp.int32(leaves[0].reshape(-1)[0])
            acc, *a = jax.lax.optimization_barrier((acc, *a))
        return acc

    def t_at(reps, iters=4):
        int(chained(reps, *args))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained(reps, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t_at(20) - t_at(4)) / 16
    print(f"{name}: {per*1e3:.3f} ms/rep  ({N/per/1e9:.1f} GB/s-equiv)",
          flush=True)


slope(stage1.__wrapped__, (xs,), "stage1 (slope)")
slope(plumbing.__wrapped__, (xs, flags), "plumbing (slope)")
slope(stage2.__wrapped__, (gbody, ghal, sid_t), "stage2 (slope)")


def composed(x32):
    flags = stage1.__wrapped__(x32)
    ncand, gbody, ghal, sid_t = plumbing.__wrapped__(x32, flags)
    total = stage2.__wrapped__(gbody, ghal, sid_t)
    return total + 0 * ncand


slope(composed, (xs,), "composed one-jit (slope)")
fused = S._staged_jit(st.fp.baked_key(), st.full.baked_key(),
                      st.fp.k, st.full.k, L, Lc, st.halo, tiles, cap)
slope(lambda x: fused(x, nn)[0], (xs,), "production fused (slope)")


def plumb_real(x32, flags):
    nc, gbody, ghal, sid_t = plumbing.__wrapped__(x32, flags)
    # consume everything so nothing is DCE'd
    return (nc + jnp.sum(gbody[:, 0, :1]) + jnp.sum(ghal[:, 0, :1])
            + jnp.sum(sid_t[:, 0, :1]))


slope(plumb_real, (xs, flags), "plumbing REAL (slope)")


def plumb_nonzero_only(flags):
    fl = flags.reshape(ns)
    (cand,) = jnp.nonzero(fl != 0, size=cap, fill_value=-1)
    return jnp.sum(cand[:8])


slope(plumb_nonzero_only, (flags,), "nonzero only (slope)")


def plumb_cumsum(flags):
    fl = (flags.reshape(ns) != 0)
    return jnp.cumsum(fl.astype(jnp.int32))[-1:]


slope(plumb_cumsum, (flags,), "cumsum only (slope)")


def plumb_gather_only(x32, flags):
    rows = x32.reshape(ns, Wb)
    # fixed stride gather of cap rows (no nonzero)
    safe = (jnp.arange(cap, dtype=jnp.int32) * (ns // cap))
    grows = jnp.take(rows, safe, axis=0)
    return jnp.sum(grows[:, :1])


slope(plumb_gather_only, (xs, flags), "gather only (slope)")


def plumb_scatter(flags):
    fl = flags.reshape(ns) != 0
    pos = jnp.cumsum(fl.astype(jnp.int32)) - 1
    dest = jnp.where(fl, pos, cap)
    cand = jnp.full(cap, -1, jnp.int32).at[dest].set(
        jnp.arange(ns, dtype=jnp.int32), mode="drop"
    )
    return jnp.sum(cand[:8])


slope(plumb_scatter, (flags,), "cumsum+scatter compaction (slope)")


def plumb_topk(flags):
    fl = flags.reshape(ns) != 0
    keys = jnp.where(fl, ns - jnp.arange(ns, dtype=jnp.int32), 0)
    vals, _ = jax.lax.top_k(keys, cap)
    cand = jnp.where(vals > 0, ns - vals, -1)
    return jnp.sum(cand[:8])


slope(plumb_topk, (flags,), "top_k compaction (slope)")
