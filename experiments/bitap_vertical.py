"""A/B: per-byte popcount vs vertical bit-column counters in count mode.

Hypothesis: lax.population_count per end-limb per byte is a significant
slice of the baked count kernel; accumulating raw hit words into bit-column
counters (flushed every F bytes, F bounded by the min gap between end bits
within a limb) replaces it with one add per end-limb per byte.

Modes:
  pop      — current production kernel (popcount per byte)
  vert     — acc += hits per byte; flush counters every F-byte group
"""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ahocorasick_tpu.ops import bitap as B
from ahocorasick_tpu.ops.bitap import R, LANES, _emit_mux_const

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


def make_kernel(lo_c, hi_c, sm_c, em_c, K, Lc, H, mode, flush_words):
    Wc = Lc // 4
    Hw = H // 4
    # Per-limb end-bit field extraction plan for vertical counters:
    # counter for end bit b occupies [b, next_b); width = gap.
    fields = []
    for k in range(K):
        bits = [b for b in range(32) if (em_c[k] >> b) & 1]
        fs = []
        for i, b in enumerate(bits):
            nxt = bits[i + 1] if i + 1 < len(bits) else 32
            fs.append((b, (1 << (nxt - b)) - 1))
        fields.append(fs)

    def kernel(halo_ref, body_ref, cnt_ref, ms_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def advance(ms, b):
            bits = [(b & (1 << t)) != 0 for t in range(8)]
            nms, hits = [], []
            carry = jnp.zeros((R, 128), jnp.int32)
            for k in range(K):
                lo_t = _emit_mux_const(bits[:4], lo_c[k])
                hi_t = _emit_mux_const(bits[4:], hi_c[k])
                if lo_t is None or hi_t is None:
                    cm = jnp.zeros((R, 128), jnp.int32)
                else:
                    cm = lo_t & hi_t
                nm = ((ms[k] << 1) | carry | sm_c[k]) & cm
                carry = lax.shift_right_logical(ms[k], 31) & 1
                nms.append(nm)
                hits.append(nm & em_c[k] if em_c[k] else None)
            return nms, hits

        @pl.when(j == 0)
        def _warmup():
            def hstep(w, ms):
                word = halo_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms, _ = advance(ms, b)
                return ms
            z = [jnp.zeros((R, 128), jnp.int32)] * K
            ms = lax.fori_loop(0, Hw, hstep, z) if Hw else z
            row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            first = ((i * R + row) * 128 + col) == 0
            for k in range(K):
                ms_ref[k] = jnp.where(first, 0, ms[k])
            cnt_ref[0] = jnp.zeros((R, 128), jnp.int32)

        if mode == "pop":
            def step(w, carry):
                ms, acc = carry
                word = body_ref[w]
                for jj in range(4):
                    b = lax.shift_right_logical(word, 8 * jj) & 255
                    ms, hits = advance(ms, b)
                    for k in range(K):
                        if hits[k] is None:
                            continue
                        acc = acc + lax.population_count(hits[k])
                return ms, acc

            ms0 = [ms_ref[k] for k in range(K)]
            ms, acc = lax.fori_loop(0, Wc, step, (ms0, cnt_ref[0]))
        else:
            # group = flush_words words; flush bit-column counters at end
            ngroups = Wc // flush_words

            def group(g, carry):
                ms, acc = carry
                vcs = [jnp.zeros((R, 128), jnp.int32) for _ in range(K)]

                def step(w, c2):
                    ms, vcs = c2
                    word = body_ref[g * flush_words + w]
                    for jj in range(4):
                        b = lax.shift_right_logical(word, 8 * jj) & 255
                        ms, hits = advance(ms, b)
                        vcs = [
                            vcs[k] + hits[k] if hits[k] is not None
                            else vcs[k]
                            for k in range(K)
                        ]
                    return ms, vcs

                ms, vcs = lax.fori_loop(0, flush_words, step, (ms, vcs))
                for k in range(K):
                    for b, m in fields[k]:
                        acc = acc + (
                            lax.shift_right_logical(vcs[k], b) & m
                        )
                return ms, acc

            ms0 = [ms_ref[k] for k in range(K)]
            ms, acc = lax.fori_loop(0, ngroups, group, (ms0, cnt_ref[0]))

        for k in range(K):
            ms_ref[k] = ms[k]
        cnt_ref[0] = acc

    return kernel


@functools.lru_cache(maxsize=64)
def jit_variant(tables_key, K, L, Lc, H, tiles, mode, flush_words):
    lo_c, hi_c, sm_c, em_c = tables_key
    kernel = make_kernel(lo_c, hi_c, sm_c, em_c, K, Lc, H, mode,
                         flush_words)
    Bp = tiles * LANES
    Wb = L // 4
    Hw = H // 4
    nchunks = L // Lc
    Wc = Lc // 4

    def fn(x32):
        body = x32.reshape(Bp, Wb).T.reshape(Wb, Bp // 128, 128)
        halo = jnp.roll(x32, Hw).reshape(Bp, Wb)[:, :Hw].T
        halo = halo.reshape(Hw, Bp // 128, 128)
        res = pl.pallas_call(
            kernel,
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
            scratch_shapes=[pltpu.VMEM((K, R, 128), jnp.int32)],
        )(halo, body)
        return jnp.sum(res[0])

    return jax.jit(fn)


def main():
    hay = build_haystack(N)
    expect = host_count(hay)
    print(f"host count = {expect}", flush=True)
    eng = B.BitapEngine(PATS, False)
    t = eng.tables
    L, Lc, tiles = eng._layout(N)
    K = t.k
    print(f"K={K} L={L} Lc={Lc} tiles={tiles} halo={eng.halo}", flush=True)
    x32 = jax.device_put(eng._pack(hay, L, tiles, pad=t.pad_byte))

    # max safe flush period from end-bit gaps (bytes)
    em = t.end.view(np.uint32)
    min_gap = 32
    for k in range(K):
        bits = [b for b in range(32) if (int(em[k]) >> b) & 1]
        for i, b in enumerate(bits):
            nxt = bits[i + 1] if i + 1 < len(bits) else 32
            min_gap = min(min_gap, nxt - b)
    safe_bytes = (1 << min_gap) - 1
    print(f"min end-bit gap = {min_gap} -> safe flush <= {safe_bytes} B",
          flush=True)

    @functools.partial(jax.jit, static_argnames=("reps", "mode", "fw"))
    def chained(x32, reps, mode, fw):
        fn = jit_variant(t.baked_key(), K, L, Lc, eng.halo, tiles,
                         mode, fw)
        total = jnp.int32(0)
        x = x32
        for _ in range(reps):
            total = total + fn(x)
            x, total = jax.lax.optimization_barrier((x, total))
        return total

    def t_at(reps, mode, fw, iters=4):
        out = int(chained(x32, reps, mode, fw))
        assert out == expect * reps, (mode, out, expect * reps)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            int(chained(x32, reps, mode, fw))
            best = min(best, time.perf_counter() - t0)
        return best

    for mode, fw in [("pop", 1), ("vert", 16), ("vert", 32),
                     ("vert", 64)]:
        if mode == "vert" and fw * 4 > safe_bytes:
            print(f"{mode} fw={fw}: UNSAFE, skipped", flush=True)
            continue
        if Lc // 4 % fw:
            continue
        per = (t_at(20, mode, fw) - t_at(4, mode, fw)) / 16
        print(f"{mode:5s} fw={fw:3d}: {N/per/1e9:7.2f} GB/s "
              f"({per*1e3:.3f} ms/scan)", flush=True)


if __name__ == "__main__":
    main()
