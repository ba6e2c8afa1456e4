"""Stage-by-stage slope timing of the dict1k fused fingerprint pipeline.

Breaks the 17 ms/scan (BENCH_r02) into: bitmap kernel | +rank-select |
+window gather | +device verify, each timed by the chained-slope method
bench.py uses, so we know what to optimize for the >=5 GB/s north star.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_dictionary, build_dict_text, slope_time
from ahocorasick_tpu.ops import fingerprint as F


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    pats = build_dictionary()
    n = 1 << 26
    hs = build_dict_text(n, pats)
    eng = F.FingerprintEngine(pats, True)
    assert eng.dv is not None
    ph = eng.prepare(hs)
    want = eng.count_matches(ph)  # settles plan level + caps
    cap_c, _ = eng.last_caps
    t = eng.tables
    log(f"K={t.k} buckets={t.num_buckets} W={eng.dv.W} cap_c={cap_c} "
        f"level={eng.level} count={want}")
    L, Lc, tiles = ph.L, ph.Lc, ph.tiles
    kernel = F._make_fp_baked_kernel(*t.baked_key(), t.k, Lc, eng.halo)
    dv_args = eng.dv.device_args()
    meta = {c: (logT, gmax)
            for (c, logT, gmax) in eng.dv.key()[1]}
    n_dev = jnp.int32(ph.n)
    W = eng.dv.W

    def stage_kernel(halo, body):
        cnt, bmp = F._fp_pallas(kernel, None, halo, body, t.k, L, Lc,
                                tiles, eng.halo // 4)
        return jnp.sum(cnt), bmp

    def stage_rank(halo, body):
        s, bmp = stage_kernel(halo, body)
        ncand, e_pos, live = F._rank_select(bmp, L, cap_c)
        return s + ncand + jnp.sum(e_pos) + jnp.sum(live), bmp

    def stage_window(halo, body, u8f):
        s, bmp = stage_kernel(halo, body)
        ncand, e_pos, live = F._rank_select(bmp, L, cap_c)
        wnd = F._gather_windows(u8f, e_pos, W)
        return s + jnp.sum(wnd.astype(jnp.int32)), bmp

    def stage_full(halo, body, u8f):
        s, bmp = stage_kernel(halo, body)
        ncand, e_pos, live = F._rank_select(bmp, L, cap_c)
        wnd = F._gather_windows(u8f, e_pos, W)
        total, _, _, _ = F._device_verify(
            wnd, e_pos, live, n_dev, dv_args, W, False, None, meta)
        return s + total, bmp

    def chain(stage, with_u8f):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(halo, body, u8f, reps):
            acc = jnp.int32(0)
            for _ in range(reps):
                if with_u8f:
                    r, bmp = stage(halo, body, u8f)
                else:
                    r, bmp = stage(halo, body)
                acc = acc + r
                body, acc = jax.lax.optimization_barrier((body, acc))
            return acc

        return chained

    def run(name, stage, with_u8f):
        c = chain(stage, with_u8f)
        args = (ph.halo_a, ph.body, ph.u8f)

        def t_at(reps):
            int(c(*args, reps=reps))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                int(c(*args, reps=reps))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = t_at(4), t_at(12)
        per = (hi - lo) / 8
        log(f"{name:14s} per-scan {per*1e3:7.3f} ms "
            f"({n/per/1e9:6.2f} GB/s)")
        return per

    run("kernel", stage_kernel, False)
    run("+rank-select", stage_rank, False)
    run("+window", stage_window, True)
    run("+verify", stage_full, True)


if __name__ == "__main__":
    main()
