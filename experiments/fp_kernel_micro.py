"""Isolate the fp fused pipeline stages on TPU: bitmap kernel alone,
+compaction, +expansion, +windows, +verify."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from ahocorasick_tpu.ops import fingerprint as F
from ahocorasick_tpu.ops.bitap import LANES
from bench import build_haystack, host_count


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(chained, args, r_lo=2, r_hi=8, iters=4):
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
    import os
    n = 1 << 26
    if os.environ.get("DICT"):
        from bench import build_dictionary, build_dict_text
        patterns = build_dictionary()
        hs = build_dict_text(n, patterns)
        eng = F.FingerprintEngine(patterns, True)
    else:
        patterns = [
            b"Sherlock Holmes", b"John Watson", b"Irene Adler",
            b"Inspector Lestrade", b"Professor Moriarty",
        ]
        hs = build_haystack(n)
        eng = F.FingerprintEngine(patterns, False)
    t = eng.tables
    ph = eng.prepare(hs)
    got = eng.count_matches(ph)
    cap_c, _ = eng.last_caps
    cap_w = cap_c
    log(f"K={t.k} count={got} caps={cap_w},{cap_c} L={ph.L} "
        f"tiles={ph.tiles}")
    kernel = F._make_fp_baked_kernel(*t.baked_key(), t.k, ph.Lc, eng.halo)
    words_size = ph.tiles * (ph.L // 32) * LANES
    dv_args = eng.dv.device_args()
    W = eng.dv.W
    n_dev = jnp.int32(ph.n)

    def stage(upto):
        meta = {c: (logT, gmax) for (c, logT, gmax) in eng.dv.key()[1]}

        def body(halo, body_, u8f):
            cnt, bmp = F._fp_pallas(kernel, None, halo, body_,
                                    t.k, ph.L, ph.Lc, ph.tiles,
                                    eng.halo // 4)
            if upto == 0:
                return jnp.sum(cnt) + bmp[0, 0, 0, 0]
            nc, e_pos, live = F._rank_select(bmp, ph.L, cap_c)
            if upto in (1, 2):
                return nc + e_pos[0]
            wnd = F._gather_windows(u8f, e_pos, W)
            if upto == 3:
                return nc + jnp.sum(wnd[:, 0].astype(jnp.int32))
            total, _, _, _ = F._device_verify(
                wnd, e_pos, live, n_dev, dv_args, W, False, None, meta)
            return total

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(halo, body_, u8f, reps):
            acc = jnp.int32(0)
            for _ in range(reps):
                acc = acc + body(halo, body_, u8f)
                body_, acc = lax.optimization_barrier((body_, acc))
            return acc
        return chained

    import os
    stages = [int(s) for s in os.environ.get("STAGES", "0,4").split(",")]
    names = {0: "bitmap-kernel", 1: "+compact", 2: "+expand", 3: "+windows", 4: "+verify"}
    for upto in stages:
        name = names[upto]
        per = slope(stage(upto), (ph.halo_a, ph.body, ph.u8f))
        log(f"{name:16s} per-scan {per*1e3:8.3f} ms "
            f"({n/per/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    main()
