"""Stage-by-stage profile of the cascade pipeline on the real TPU.

Variants (each a jit, chained slope timing, 100k-pattern dict, 64 MiB):
  A. coarse kernel + rank/select
  B. A + window gather
  C. B + per-class probes (sum of counts only)
  D. C + CSR expansion + pid/row gathers (no compare)
  E. full count pipeline (what bench measures)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_words, build_dict_text, NAME_SYLLABLES


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, r_lo=2, r_hi=8, iters=3):
    def t_at(reps):
        fn(reps)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(reps)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = t_at(r_lo), t_at(r_hi)
    per = (t_hi - t_lo) / (r_hi - r_lo)
    log(f"  t({r_lo})={t_lo*1e3:.1f} t({r_hi})={t_hi*1e3:.1f} "
        f"-> {per*1e3:.3f} ms/scan")
    return per


def main():
    npats = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n = 1 << 26
    pats = build_words(npats, 99, NAME_SYLLABLES, capitalize=0.3)
    hs = build_dict_text(n, pats)

    from ahocorasick_tpu.ops.cascade import (
        CascadeEngine, _probe_expand_verify,
    )
    from ahocorasick_tpu.ops.fingerprint import (
        _fp_pallas, _gather_windows, _make_fp_baked_kernel, _rank_select,
    )
    from ahocorasick_tpu.ops.compaction import _select_units

    eng = CascadeEngine(pats, True)
    ph = eng.prepare(hs)
    got = eng.count_matches(ph)  # settle caps
    cap_c, cap_e, _ = eng.last_caps
    log(f"count={got} caps c={cap_c} e={cap_e} K={eng.tables.coarse.k}")

    t = eng.tables
    dv = t.device_args()
    meta = dict(t.meta_key()[1])
    W = t.meta_key()[0]
    K, L, Lc, H, tiles = (t.coarse.k, ph.L, ph.Lc, eng.halo, ph.tiles)
    kernel = _make_fp_baked_kernel(*t.coarse.baked_key(), K, Lc, H)
    n_dev = jnp.int32(ph.n)

    def stageA(halo, body, u8f, hmaps):
        cnt, bmp = _fp_pallas(kernel, None, halo, body, K, L, Lc, tiles,
                              H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        return ncand + e_pos[0] + live[-1].astype(jnp.int32)

    def stageB(halo, body, u8f, hmaps):
        cnt, bmp = _fp_pallas(kernel, None, halo, body, K, L, Lc, tiles,
                              H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        return ncand + wnd[0, 0].astype(jnp.int32) + e_pos[-1]

    def probes(e_pos, live, hmaps):
        cls = sorted(meta)
        cnt_parts, off_parts, sp_parts = [], [], []
        from ahocorasick_tpu.ops.cascade import _qlen
        for c in cls:
            logT = meta[c]
            ha, hb, tkeys, goff, gcnt = dv["classes"][c]
            ec = e_pos + (c - _qlen(c))
            valid = live & (ec >= c - 1) & (ec < n_dev)
            ecc = jnp.clip(ec, 0, hmaps[c].shape[0] - 1)
            h = jnp.take(hmaps[c], ecc)
            sh = jnp.uint32(32 - logT)
            s1 = ((h * ha) >> sh).astype(jnp.int32)
            s2 = ((h * hb) >> sh).astype(jnp.int32)
            use1 = jnp.take(tkeys, s1) == h
            use2 = jnp.take(tkeys, s2) == h
            slot = jnp.where(use1, s1, s2)
            hit = (use1 | use2) & valid
            cnt_parts.append(jnp.where(hit, jnp.take(gcnt, slot), 0))
            off_parts.append(jnp.take(goff, slot))
            sp_parts.append(ec - (c - 1))
        return (jnp.concatenate(cnt_parts), jnp.concatenate(off_parts),
                jnp.concatenate(sp_parts))

    def stageC(halo, body, u8f, hmaps):
        cnt, bmp = _fp_pallas(kernel, None, halo, body, K, L, Lc, tiles,
                              H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        counts, offs, sps = probes(e_pos, live, hmaps)
        return jnp.sum(counts) + wnd[0, 0].astype(jnp.int32)

    def stageD(halo, body, u8f, hmaps):
        cnt, bmp = _fp_pallas(kernel, None, halo, body, K, L, Lc, tiles,
                              H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        counts, offs, sps = probes(e_pos, live, hmaps)
        total_e, src, live_e, resid = _select_units(
            counts.reshape(-1, 128), cap_e)
        src = jnp.where(live_e, src, 0)
        pid = jnp.take(dv["pidarr"],
                       jnp.take(offs, src) + resid.astype(jnp.int32))
        pid = jnp.where(live_e, pid, 0)
        sp_e = jnp.take(sps, src)
        wrow = jnp.take(wnd, src % cap_c, axis=0)
        prow = jnp.take(dv["pmat"], pid, axis=0)
        return (total_e + wrow[0, 0].astype(jnp.int32)
                + prow[0, 0].astype(jnp.int32) + sp_e[0])

    def stageE(halo, body, u8f, hmaps):
        cnt, bmp = _fp_pallas(kernel, None, halo, body, K, L, Lc, tiles,
                              H // 4)
        ncand, e_pos, live = _rank_select(bmp, L, cap_c)
        wnd = _gather_windows(u8f, e_pos, W)
        out = _probe_expand_verify(e_pos, live, hmaps, wnd, n_dev, dv,
                                   meta, False, cap_e, None)
        return out[1]

    for name, fn in (("A kern+select", stageA), ("B +windows", stageB),
                     ("C +probes", stageC), ("D +expand", stageD),
                     ("E full", stageE)):
        jf = jax.jit(fn)

        @functools.partial(jax.jit, static_argnames=("reps",))
        def chained(halo, body, u8f, hmaps, reps, jf=jf):
            acc = jnp.int32(0)
            for _ in range(reps):
                acc = acc + jf(halo, body, u8f, hmaps)
                body, acc = jax.lax.optimization_barrier((body, acc))
            return acc

        def run(reps):
            int(chained(ph.halo_a, ph.body, ph.u8f, ph.hmaps, reps))

        per = slope(run)
        log(f"{name}: {per*1e3:.3f} ms/scan ({n/per/1e9:.2f} GB/s)")


if __name__ == "__main__":
    main()
