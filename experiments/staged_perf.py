"""Staged (fingerprint -> gather -> exact) vs single-pass count on TPU."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ahocorasick_tpu.ops import bitap as B
from ahocorasick_tpu.ops import staged as S

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


def main():
    hay = build_haystack(N)
    n = len(hay)
    expect = host_count(hay)
    print(f"host count = {expect}", flush=True)

    # --- single-pass baseline
    eng = B.BitapEngine(PATS, False)
    L, Lc, tiles = eng._layout(N)
    K = eng.tables.k
    base_fn = B._baked_jit(eng.tables.baked_key(), K, L, Lc, eng.halo,
                           tiles, False)
    xb = jax.device_put(eng._pack(hay, L, tiles,
                                  pad=eng.tables.pad_byte))

    # --- staged
    st = S.StagedEngine(PATS, False)
    Ls, Lcs, tiles_s = st._layout(N)
    ns = tiles_s * S.LANES
    cap = max(S.LANES, S._pow2(ns // 4))
    print(f"single: K={K} L={L} tiles={tiles} | staged: Kf={st.fp.k} "
          f"K={st.full.k} L={Ls} tiles={tiles_s} ns={ns} cap={cap}",
          flush=True)
    buf = np.full(ns * Ls, st.full.pad_byte, np.uint8)
    buf[:n] = np.frombuffer(hay, np.uint8)
    xs = jax.device_put(jnp.asarray(buf.view(np.int32)))
    staged_fn = S._staged_jit(st.fp.baked_key(), st.full.baked_key(),
                              st.fp.k, st.full.k, Ls, Lcs, st.halo,
                              tiles_s, cap)
    nn = jnp.asarray([0, n], jnp.int32)

    @functools.partial(jax.jit, static_argnames=("reps", "which"))
    def chained(x, reps, which):
        total = jnp.int32(0)
        for _ in range(reps):
            if which == "single":
                total = total + base_fn(x)
            else:
                t, nc = staged_fn(x, nn)
                total = total + t + 0 * nc
            x, total = jax.lax.optimization_barrier((x, total))
        return total

    t, nc = staged_fn(xs, nn)
    print(f"staged: count={int(t)} ncand={int(nc)}/{ns} "
          f"({'OK' if int(t) == expect else 'BAD'})", flush=True)
    assert int(nc) <= cap

    def t_at(x, reps, which, iters=4):
        out = int(chained(x, reps, which))
        assert out == expect * reps, (which, out)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained(x, reps, which))
            best = min(best, time.perf_counter() - t0)
        return best

    for which, x in [("single", xb), ("staged", xs)]:
        per = (t_at(x, 20, which) - t_at(x, 4, which)) / 16
        print(f"{which}: {N/per/1e9:7.2f} GB/s ({per*1e3:.3f} ms/scan)",
              flush=True)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def profile_parts():
    """Time stage-1, gather plumbing, and stage-2 separately."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    hay = build_haystack(N)
    n = len(hay)
    st = S.StagedEngine(PATS, False)
    Ls, Lcs, tiles_s = st._layout(N)
    ns = tiles_s * S.LANES
    for capdiv in (4, 8):
        cap = max(S.LANES, S._pow2(ns // capdiv))
        buf = np.full(ns * Ls, st.full.pad_byte, np.uint8)
        buf[:n] = np.frombuffer(hay, np.uint8)
        xs = jax.device_put(jnp.asarray(buf.view(np.int32)))
        nn = jnp.asarray([0, n], jnp.int32)
        fn = S._staged_jit(st.fp.baked_key(), st.full.baked_key(),
                           st.fp.k, st.full.k, Ls, Lcs, st.halo,
                           tiles_s, cap)
        t, nc = fn(xs, nn)
        print(f"capdiv={capdiv}: count={int(t)} ncand={int(nc)}", flush=True)
        import functools, time
        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(x, reps):
            total = jnp.int32(0)
            for _ in range(reps):
                t, nc = fn(x, nn)
                total = total + t + 0 * nc
                x, total = jax.lax.optimization_barrier((x, total))
            return total
        def t_at(reps, iters=4):
            int(chained(xs, reps))
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                int(chained(xs, reps))
                best = min(best, time.perf_counter() - t0)
            return best
        per = (t_at(20) - t_at(4)) / 16
        print(f"  staged capdiv={capdiv}: {N/per/1e9:7.2f} GB/s "
              f"({per*1e3:.3f} ms/scan)", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "parts":
    profile_parts()
