"""Small-scale fingerprint-pipeline floor: stage-by-stage slope timing
at the teddysweep shape (512 KiB, table-generic kernel), with a cap
sweep.

Round-4 teddysweep recorded a flat ~1.86 GB/s (282 us per 512 KiB scan)
regardless of pattern count — a fixed pipeline floor. This experiment
splits that time into: bitmap kernel | +rank-select | +window gather |
+device verify at the STATIC caps the engine uses (cap_c=8192), then
re-times the tail stages at smaller caps to see whether the floor is
cap-sized work or per-op dispatch overhead.

Run on TPU:  python experiments/fp_floor.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_chained
from ahocorasick_tpu.ops import fingerprint as F


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(21)
    n = 1 << 19
    from benchmarks.run import english_haystack

    hay = english_haystack(n)
    base = bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz"),
                            size=4096).astype(np.uint8))
    pats = sorted({base[i * 53:i * 53 + 8] for i in range(32)})
    eng = F.FingerprintEngine(pats, False)
    assert eng.dv is not None
    import ahocorasick_tpu.ops.fingerprint as FF

    FF.FP_DV_MIN = 0  # force the device-verify pipeline at 512 KiB
    ph = eng.prepare(hay)
    want = eng.count_matches(ph)
    cap_settled, _ = eng.last_caps
    t = eng.tables
    L, Lc, tiles = ph.L, ph.Lc, ph.tiles
    W = eng.dv.W
    dv_args = eng.dv.device_args()
    meta = {c: (logT, gmax) for (c, logT, gmax) in eng.dv.key()[1]}
    n_dev = jnp.int32(ph.n)
    args_t = eng._args()
    nn = jnp.asarray([0, ph.n], jnp.int32)
    log(f"n={n} K={t.k} buckets={t.num_buckets} W={W} "
        f"settled_cap={cap_settled} count={want} L={L} tiles={tiles}")

    def stage_kernel(halo, body, u8f, cap):
        kernel = F._make_fp_kernel(t.k, L, Lc, eng.halo)
        cnt, bmp = F._fp_pallas(kernel, (*args_t, nn), halo, body,
                                t.k, L, Lc, tiles, eng.halo // 4)
        return jnp.sum(cnt), bmp

    def stage_rank(halo, body, u8f, cap):
        s, bmp = stage_kernel(halo, body, u8f, cap)
        ncand, e_pos, live = F._rank_select(bmp, L, cap)
        return s + ncand + e_pos[0] + e_pos[-1], bmp

    def stage_window(halo, body, u8f, cap):
        s, bmp = stage_kernel(halo, body, u8f, cap)
        ncand, e_pos, live = F._rank_select(bmp, L, cap)
        wnd = F._gather_windows(u8f, e_pos, W)
        return s + wnd[0, 0].astype(jnp.int32) + jnp.sum(
            wnd[-1].astype(jnp.int32)), bmp

    def stage_full(halo, body, u8f, cap):
        s, bmp = stage_kernel(halo, body, u8f, cap)
        ncand, e_pos, live = F._rank_select(bmp, L, cap)
        wnd = F._gather_windows(u8f, e_pos, W)
        total, _, _, _ = F._device_verify(
            wnd, e_pos, live, n_dev, dv_args, W, False, None, meta)
        return s + total, bmp

    def run(name, stage, cap):
        call = lambda halo, body, u8f: stage(halo, body, u8f, cap)[0]
        c = make_chained(jax, jnp, call, body_idx=1)
        argv = (ph.halo_a, ph.body, ph.u8f)

        def t_at(reps):
            int(c(*argv, reps))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                int(c(*argv, reps))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = t_at(64), t_at(512)
        per = (hi - lo) / (512 - 64)
        log(f"{name:14s} cap={cap:5d} per-scan {per*1e6:8.1f} us "
            f"({n/per/1e9:6.2f} GB/s)")
        return per

    for cap in (8192, 2048, 512):
        run("kernel", stage_kernel, cap)
        run("+rank-select", stage_rank, cap)
        run("+window", stage_window, cap)
        run("+verify", stage_full, cap)


if __name__ == "__main__":
    main()
