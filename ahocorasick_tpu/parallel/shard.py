"""Multi-chip data-parallel search: shard_map over a device mesh.

The reference is single-threaded; its stream decomposition (roll buffer
carrying max_pattern_len bytes of overlap, util/buffer.rs:107-123) proves
search state is carried across chunk boundaries. This module scales that
decomposition across a TPU mesh:

  - the haystack is sharded data-parallel with a ``halo`` byte overlap
    (the suffix property makes per-position states exact once the walk has
    consumed >= max_pattern_len bytes, see ops/block_scan.py),
  - automaton tables are replicated to every device,
  - per-shard match counts are reduced with ``psum`` over ICI,
  - compacted per-shard match positions can be gathered for full triples.

All collectives are XLA collectives inserted by shard_map sharding
annotations — no explicit point-to-point communication is required
because the halo bytes are materialized host-side into the sharded
layout (each shard's leading halo duplicates its left neighbor's tail).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.block_scan import DeviceAutomaton, _round_up, choose_block_len


def _pvary(x, axis_name):
    """Mark x as varying over a shard_map mesh axis (pcast on newer jax,
    pvary on older)."""
    if hasattr(lax, "pcast"):
        return lax.pcast(x, axis_name, to="varying")
    return lax.pvary(x, (axis_name,))


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("d",))


def _shard_layout(n: int, ndev: int, halo: int) -> Tuple[int, int]:
    """Per-device shard length (excluding halo), rounded for blocking."""
    shard = _round_up(-(-n // ndev), 128)
    return shard, halo


def build_sharded_input(
    haystack: bytes, ndev: int, halo: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Materialize the halo'd [ndev, halo + shard] byte layout plus the
    per-shard count of valid (haystack) positions."""
    n = len(haystack)
    shard, halo = _shard_layout(max(n, 1), ndev, halo)
    buf = np.frombuffer(haystack, dtype=np.uint8)
    rows = np.zeros((ndev, halo + shard), dtype=np.uint8)
    n_valid = np.zeros((ndev, 1), dtype=np.int32)
    for i in range(ndev):
        g0 = i * shard
        lo = max(0, g0 - halo)
        seg = buf[lo:g0 + shard]
        rows[i, halo - (g0 - lo):halo - (g0 - lo) + len(seg)] = seg
        n_valid[i, 0] = max(0, min(n - g0, shard))
    return rows, n_valid, shard


def count_kernel(
    trans_flat: jax.Array,
    classes: jax.Array,
    match_count: jax.Array,
    row: jax.Array,      # uint8 [halo + shard] (local shard w/ leading halo)
    n_valid: jax.Array,  # int32 [1] — valid positions within the shard
    alphabet_len: jax.Array,
    start_id: jax.Array,
    block_len: int,
    halo: int,
    axis_name=None,
) -> jax.Array:
    """Count matches ending inside this shard's own (non-halo) positions.

    Same blocked-walk structure as ops/block_scan.py, applied to one
    shard: the leading ``halo`` bytes warm up the automaton state but
    their matches belong to the left neighbor.
    """
    c = classes[row.astype(jnp.int32)]
    total = c.shape[0]
    shard = total - halo
    num_blocks = shard // block_len
    starts = jnp.arange(num_blocks, dtype=jnp.int32) * block_len + halo
    offs = jnp.arange(-halo, block_len, dtype=jnp.int32)
    idx = starts[None, :] + offs[:, None]
    cw = jnp.take(c, jnp.clip(idx, 0, total - 1))
    # Positions in [halo, halo + n_valid) are countable.
    counted = (offs >= 0)[:, None] & (idx < halo + n_valid[0])

    def step(carry, xs):
        s, acc = carry
        cl, cnt_ok = xs
        s2 = jnp.take(trans_flat, s * alphabet_len + cl).astype(jnp.int32)
        acc = (
            acc + jnp.where(cnt_ok, jnp.take(match_count, s2), 0)
        ).astype(jnp.int32)
        return (s2, acc), None

    s0 = jnp.full((num_blocks,), start_id, dtype=jnp.int32)
    acc0 = jnp.zeros((num_blocks,), dtype=jnp.int32)
    if axis_name is not None:
        # Inside shard_map the carry must be marked as varying over the
        # mesh axis (it mixes with per-shard data on the first step).
        s0 = _pvary(s0, axis_name)
        acc0 = _pvary(acc0, axis_name)
    (_, acc), _ = lax.scan(step, (s0, acc0), (cw, counted))
    return jnp.sum(acc)


def sharded_count_matches(
    dev: DeviceAutomaton,
    haystack: bytes,
    mesh: Optional[Mesh] = None,
) -> int:
    """Total overlapping-match count, sharded across the mesh.

    The per-device partial counts are psum-reduced on device; only one
    scalar returns to the host.
    """
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    halo = max(dev.halo, 0)
    rows, n_valid, shard = build_sharded_input(haystack, ndev, halo)
    block_len = choose_block_len(shard, halo)
    # shard must be a multiple of block_len for the blocked walk.
    if shard % block_len:
        pad = _round_up(shard, block_len) - shard
        rows = np.pad(rows, ((0, 0), (0, pad)))
        shard += pad

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("d", None), P("d", None)),
        out_specs=P(),
    )
    def run(trans_flat, classes, match_count, rows, n_valid):
        cnt = count_kernel(
            trans_flat,
            classes,
            match_count,
            rows[0],
            n_valid[0],
            jnp.int32(dev.alphabet_len),
            jnp.int32(dev.start_id),
            block_len,
            halo,
            axis_name="d",
        )
        return lax.psum(cnt, "d")

    total = jax.jit(run)(
        dev.trans_flat,
        dev.classes,
        dev.match_count,
        jax.device_put(rows, NamedSharding(mesh, P("d", None))),
        jax.device_put(n_valid, NamedSharding(mesh, P("d", None))),
    )
    extra = 0
    # Start-state matches at position 0 (empty pattern).
    if 2 <= dev.start_id <= dev.max_match_id:
        extra = int(
            dev.dfa.match_starts[dev.start_id + 1]
            - dev.dfa.match_starts[dev.start_id]
        )
    return int(total) + extra


def sharded_bitap_count(
    eng,  # ops.bitap.BitapEngine
    haystack: bytes,
    mesh: Optional[Mesh] = None,
) -> int:
    """Mesh-parallel overlapping-match count on the bit-parallel engine.

    Data-parallel over the haystack: every device gets a contiguous shard
    prefixed by a ``halo`` of its left neighbor's tail (state warmup —
    the reference's roll-buffer carry, util/buffer.rs:107-123, across
    chips instead of across read() calls). Each device runs the Pallas
    shift-AND kernel on its shard with the count window set to exclude
    the halo; partial counts psum over ICI, one scalar returns.
    """
    from ..ops.bitap import LANES, _bitap_call, _to_stream_major

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    n = len(haystack)
    if n == 0:
        return 0
    t = eng.tables
    halo = eng.halo
    shard = _round_up(-(-n // ndev), 4)
    # Per-shard bitap layout for halo + shard bytes.
    L, Lc, tiles = eng._layout(halo + shard)
    row_bytes = tiles * LANES * L
    rows = np.zeros((ndev, row_bytes), dtype=np.uint8)
    nn = np.zeros((ndev, 2), dtype=np.int32)
    buf = np.frombuffer(haystack, dtype=np.uint8)
    for i in range(ndev):
        g0 = i * shard
        lo_ = max(0, g0 - halo)
        seg = buf[lo_:min(g0 + shard, n)]
        off = halo - (g0 - lo_)
        rows[i, off:off + len(seg)] = seg
        nn[i, 0] = halo                                   # count from
        nn[i, 1] = halo + max(0, min(n - g0, shard))      # count to
    rows32 = rows.view(np.int32)
    lo, hi, sm, em = eng._args()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("d", None), P("d", None)),
        out_specs=P(),
        # pallas_call outputs carry no varying-mesh-axis metadata; the
        # psum below makes the result replicated explicitly.
        check_vma=False,
    )
    def run(lo, hi, sm, em, rows32, nn):
        halo_a, body = _to_stream_major(rows32[0], L, tiles, halo)
        total, _ = _bitap_call(
            lo, hi, sm, em, halo_a, body, nn[0],
            K=t.k, L=L, Lc=Lc, H=halo, tiles=tiles, extract=False,
        )
        return lax.psum(total, "d")

    total = jax.jit(run)(
        lo, hi, sm, em,
        jax.device_put(rows32, NamedSharding(mesh, P("d", None))),
        jax.device_put(nn, NamedSharding(mesh, P("d", None))),
    )
    return int(total)


def sharded_staged_count(
    eng,  # ops.staged.StagedEngine
    haystack: bytes,
    mesh: Optional[Mesh] = None,
) -> Optional[int]:
    """Mesh-parallel two-stage count: per shard, the fingerprint flags
    kernel + candidate-stream gather + exact rescan (ops/staged.py),
    partial counts psum'd over ICI.

    This keeps the sharded large-count path on the SAME engine the
    single-chip facade prefers for large counts, instead of silently
    devolving to the single-pass kernel. The per-shard rescan cap is
    shared (shard_map is SPMD); a pmax over per-shard candidate counts
    grows it until every shard fits, exactly like the single-chip
    adaptive loop."""
    from ..ops.staged import LANES, _staged_jit, _staged_layouts

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    n = len(haystack)
    if n == 0:
        return 0
    halo = eng.halo
    pad = eng.full.pad_byte
    assert pad is not None  # StagedEngine.eligible requires it
    shard = _round_up(-(-n // ndev), 4)
    L, Lc, tiles = eng._layout(halo + shard)
    row_bytes = tiles * LANES * L
    rows = np.full((ndev, row_bytes), pad, dtype=np.uint8)
    nn = np.zeros((ndev, 2), dtype=np.int32)
    buf = np.frombuffer(haystack, dtype=np.uint8)
    for i in range(ndev):
        g0 = i * shard
        lo_ = max(0, g0 - halo)
        seg = buf[lo_:min(g0 + shard, n)]
        off = halo - (g0 - lo_)
        rows[i, off:off + len(seg)] = seg
        nn[i, 0] = halo
        nn[i, 1] = halo + max(0, min(n - g0, shard))
    rows32 = rows.view(np.int32)
    rows32_d = jax.device_put(
        rows32, NamedSharding(mesh, P("d", None)))
    nn_d = jax.device_put(nn, NamedSharding(mesh, P("d", None)))
    ns = tiles * LANES
    cap = max(LANES, 1 << (max(ns // 8, 1) - 1).bit_length())
    while cap <= ns:
        fn = _staged_jit(eng.fp.baked_key(), eng.full.baked_key(),
                         eng.fp.k, eng.full.k, L, Lc, halo, tiles, cap)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P("d", None), P("d", None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run(rows32, nn):
            srows, shrows, shalo, sbody = _staged_layouts(
                rows32[0], L, tiles, halo
            )
            total, ncand = fn(srows, shrows, shalo, sbody, nn[0])
            return lax.psum(total, "d"), lax.pmax(ncand, "d")

        total, worst = jax.jit(run)(rows32_d, nn_d)
        if int(worst) <= cap:
            return int(total)
        cap = max(cap * 2, 1 << (int(worst) - 1).bit_length())
    # Every stream of some shard flagged: the single-pass kernel is the
    # better engine at that density — caller falls back (None), exactly
    # like the single-chip StagedEngine.count_matches contract.
    return None


def sharded_bitap_match_pairs(
    eng,  # ops.bitap.BitapEngine
    haystack: bytes,
    mesh: Optional[Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-parallel match extraction: the full overlapping (pid, end)
    set, gathered across the device mesh.

    Each device runs the extract-mode shift-AND kernel on its halo'd
    shard and *compacts its own match words on device* (nonzero +
    gather), so only O(#matches) data leaves each chip — the multi-chip
    generalization of the single-chip extraction path, with per-shard
    results stitched in shard order (ends are globally monotone across
    shards, preserving the reference's report order,
    util/search.rs:824-860). The halo window masking guarantees each
    match is reported by exactly one shard (the one owning its end).
    """
    from ..ops.bitap import (
        LANES,
        MAX_EXTRACT_CHUNK,
        _bitap_call,
        _pow2,
        _to_stream_major,
        decode_match_words,
    )

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    n = len(haystack)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # Bound each shard's extraction words output (tiles*L*K*LANES int32,
    # ~4*K bytes per haystack byte) exactly as the single-chip
    # BitapEngine.match_pairs does: slab the haystack so each device's
    # shard stays within MAX_EXTRACT_CHUNK, with a max_pattern_len-1
    # overlap between slabs; matches are deduped by end ownership.
    max_total = MAX_EXTRACT_CHUNK * ndev
    if n > max_total:
        ov = eng.tables.max_pattern_len - 1
        all_pids, all_ends = [], []
        base = 0
        while base < n:
            hi_ = min(base + max_total, n)
            lo_ = max(0, base - ov)
            pids, ends = sharded_bitap_match_pairs(
                eng, haystack[lo_:hi_], mesh
            )
            keep = ends > (base - lo_)
            all_pids.append(pids[keep])
            all_ends.append(ends[keep] + lo_)
            base = hi_
        return np.concatenate(all_pids), np.concatenate(all_ends)
    t = eng.tables
    halo = eng.halo
    shard = _round_up(-(-n // ndev), 4)
    L, Lc, tiles = eng._layout(halo + shard)
    # Extraction VMEM bound (words block is Lc*K*4 KiB per grid step).
    while Lc * t.k > 1024 and Lc > 4:
        Lc //= 2
    row_bytes = tiles * LANES * L
    rows = np.zeros((ndev, row_bytes), dtype=np.uint8)
    nn = np.zeros((ndev, 2), dtype=np.int32)
    buf = np.frombuffer(haystack, dtype=np.uint8)
    for i in range(ndev):
        g0 = i * shard
        lo_ = max(0, g0 - halo)
        seg = buf[lo_:min(g0 + shard, n)]
        off = halo - (g0 - lo_)
        rows[i, off:off + len(seg)] = seg
        nn[i, 0] = halo
        nn[i, 1] = halo + max(0, min(n - g0, shard))
    rows32 = rows.view(np.int32)
    lo, hi, sm, em = eng._args()
    words_size = tiles * L * t.k * LANES

    def run_for_cap(cap: int):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("d", None), P("d", None)),
            out_specs=(P("d"), P("d"), P("d", None), P("d", None)),
            check_vma=False,
        )
        def run(lo, hi, sm, em, rows32, nn):
            from ..ops.compaction import select_nonzero_words

            halo_a, body = _to_stream_major(rows32[0], L, tiles, halo)
            total, words = _bitap_call(
                lo, hi, sm, em, halo_a, body, nn[0],
                K=t.k, L=L, Lc=Lc, H=halo, tiles=tiles, extract=True,
            )
            flat = words.reshape(-1)
            nnzw, widx, vals, live = select_nonzero_words(flat, cap)
            idx = jnp.where(live, widx, flat.shape[0])
            return (total[None], nnzw[None], idx[None], vals[None])

        return jax.jit(run)(
            lo, hi, sm, em,
            jax.device_put(rows32, NamedSharding(mesh, P("d", None))),
            jax.device_put(nn, NamedSharding(mesh, P("d", None))),
        )

    cap = 4096
    while True:
        totals, nnzws, idxs, valss = run_for_cap(cap)
        worst = int(np.max(np.asarray(nnzws)))
        if worst <= cap:
            break
        cap = max(64, _pow2(worst))
    all_pids, all_ends = [], []
    idxs = np.asarray(idxs).astype(np.int64)
    valss = np.asarray(valss).view(np.uint32)
    for i in range(ndev):
        pids, ends = decode_match_words(
            t, idxs[i], valss[i], L, t.k, words_size
        )
        # Row coordinate -> absolute: row position p covers global byte
        # (i*shard - halo) + p.
        all_pids.append(pids)
        all_ends.append(ends + i * shard - halo)
    return np.concatenate(all_pids), np.concatenate(all_ends)


def sharded_fp_match_pairs(
    eng,  # ops.fingerprint.FingerprintEngine
    haystack: bytes,
    mesh: Optional[Mesh] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Mesh-parallel fingerprint filtering: each device runs the bitmap
    kernel over its halo'd shard (candidate window masked to the
    shard's own positions) and compacts its candidate words on device;
    the gathered candidate positions verify exactly against the full
    haystack. Returns None when the workload is filter-hostile."""
    from ..ops.bitap import LANES, _to_stream_major, _pow2
    from ..ops import fingerprint as F

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    n = len(haystack)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z
    t = eng.tables
    halo = eng.halo
    shard = _round_up(-(-n // ndev), 4)
    L, Lc, tiles = eng._layout(halo + shard)
    row_bytes = tiles * LANES * L
    pad = t.pad_byte if t.pad_byte is not None else 0
    rows = np.full((ndev, row_bytes), pad, dtype=np.uint8)
    nn = np.zeros((ndev, 2), dtype=np.int32)
    buf = np.frombuffer(haystack, dtype=np.uint8)
    for i in range(ndev):
        g0 = i * shard
        lo_ = max(0, g0 - halo)
        seg = buf[lo_:min(g0 + shard, n)]
        off = halo - (g0 - lo_)
        rows[i, off:off + len(seg)] = seg
        nn[i, 0] = halo
        nn[i, 1] = halo + max(0, min(n - g0, shard))
    rows32 = rows.view(np.int32)
    lo, hi, sm, em = eng._args()

    def run_for_cap(cap: int):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("d", None), P("d", None)),
            out_specs=(P("d"), P("d", None), P("d", None)),
            check_vma=False,
        )
        def run(lo, hi, sm, em, rows32, nn):
            halo_a, body = _to_stream_major(rows32[0], L, tiles, halo)
            kernel = F._make_fp_kernel(t.k, L, Lc, halo)
            cnt, bmp = F._fp_pallas(
                kernel, (lo, hi, sm, em, nn[0]), halo_a, body,
                t.k, L, Lc, tiles, halo // 4,
            )
            nc, e_pos, live = F._rank_select(bmp, L, cap)
            return nc[None], e_pos[None], live[None]

        return jax.jit(run)(
            lo, hi, sm, em,
            jax.device_put(rows32, NamedSharding(mesh, P("d", None))),
            jax.device_put(nn, NamedSharding(mesh, P("d", None))),
        )

    cap = 4096
    while True:
        ncands, e_poss, lives = run_for_cap(cap)
        if int(np.sum(np.asarray(ncands))) > eng._hostile_limit(n):
            eng.hostile = True
            return None
        worst = int(np.max(np.asarray(ncands)))
        if worst <= cap:
            break
        cap = max(64, _pow2(worst))
    # Per-shard candidate positions -> absolute coordinates.
    e_poss = np.asarray(e_poss).astype(np.int64)
    lives = np.asarray(lives)
    cands = [
        e_poss[i][lives[i]] + i * shard - halo for i in range(ndev)
    ]
    cand = np.concatenate(cands) if cands else np.zeros(0, np.int64)
    if not len(cand):
        z = np.zeros(0, np.int64)
        return z, z
    a = np.frombuffer(haystack, np.uint8)
    if eng.ci:
        a = F._fold_arr(a)
    return eng.verif.verify(a, cand)


def sharded_cascade_match_pairs(
    eng,  # ops.cascade.CascadeEngine
    haystack: bytes,
    mesh: Optional[Mesh] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Mesh-parallel cascade search: the very-large-dictionary engine
    (10k-100k+ patterns) over a device mesh.

    Unlike the bitap/fingerprint shards (backward halo: state warms up
    over the previous shard's tail), cascade candidates anchor at the
    COARSE PREFIX END — near the match *start* — and verification reads
    up to W bytes forward. Each shard therefore carries a small backward
    halo (kernel warmup) plus a W-byte FORWARD halo (its right
    neighbor's head), owns the candidates whose prefix ends inside its
    own region, and runs the full probe/expand/verify pipeline locally;
    the host concatenates per-shard (pid, end) pairs (absolute offsets)
    and sorts into report order. Returns None when hostile.

    Long-side patterns (> W_CASCADE bytes) are searched with the
    sharded bit-parallel path and merged in, mirroring the single-chip
    engine.
    """
    from ..ops.bitap import LANES, _pow2, _to_stream_major
    from ..ops import cascade as C
    from ..ops import fingerprint as F

    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    n = len(haystack)
    z = np.zeros(0, np.int64)
    if n == 0:
        return z, z
    t = eng.tables
    halo = eng.halo
    W = t.W
    shard = _round_up(-(-n // ndev), 4)
    seg_bytes = halo + shard + _round_up(W, 4)
    L, Lc, tiles = eng._layout(seg_bytes)
    row_bytes = tiles * LANES * L
    pad = eng.pad_byte or 0
    rows = np.full((ndev, row_bytes), pad, dtype=np.uint8)
    nn = np.zeros((ndev, 2), dtype=np.int32)   # kernel count window
    nv = np.zeros((ndev, 1), dtype=np.int32)   # real bytes in buffer
    buf = np.frombuffer(haystack, dtype=np.uint8)
    for i in range(ndev):
        g0 = i * shard
        lo_ = max(0, g0 - halo)
        hi_ = min(g0 + shard + W, n)
        seg = buf[lo_:hi_]
        off = halo - (g0 - lo_)
        rows[i, off:off + len(seg)] = seg
        nn[i, 0] = halo
        nn[i, 1] = halo + max(0, min(n - g0, shard))
        nv[i, 0] = off + len(seg)
    rows32 = rows.view(np.int32)
    dv = t.device_args()
    mk = t.meta_key()
    meta = dict(mk[2])
    q = mk[1]
    tail_w0 = (C.FP_LEN - q + C.KEY_LEN) // 4
    coarse_args = t.coarse.device_args()

    def run_for_caps(cap_c: int, cap_e: int, cap_m: int):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(),
                      P("d", None), P("d", None), P("d", None)),
            out_specs=(P("d"), P("d"), P("d"),
                       P("d", None), P("d", None)),
            check_vma=False,
        )
        def run(lo, hi, sm, em, rows32, nn, nv):
            x32 = rows32[0]
            halo_a, body = _to_stream_major(x32, L, tiles, halo)
            u8f = F._unpack_fold(x32, W, eng.ci)
            kernel = F._make_fp_kernel(t.coarse.k, L, Lc, halo)
            cnt, bmp = F._fp_pallas(
                kernel, (lo, hi, sm, em, nn[0]), halo_a, body,
                t.coarse.k, L, Lc, tiles, halo // 4,
            )
            ncand, e_pos, live = F._rank_select(bmp, L, cap_c)
            wnd = F._gather_windows(u8f, e_pos, W)
            ne, total, out_pid, out_end = C._probe_expand_verify(
                e_pos, live, wnd, nv[0, 0], dv, meta, True,
                cap_e, cap_m, q, tail_w0,
            )
            return (ncand[None], ne[None], total[None],
                    out_pid[None], out_end[None])

        return jax.jit(run)(
            *coarse_args,
            jax.device_put(rows32, NamedSharding(mesh, P("d", None))),
            jax.device_put(nn, NamedSharding(mesh, P("d", None))),
            jax.device_put(nv, NamedSharding(mesh, P("d", None))),
        )

    cand_lim, exp_lim = eng._limits(n)
    cap_c = min(_pow2(max(seg_bytes // 4, 1024)), C.CAP0)
    cap_e, cap_m = cap_c, max(cap_c // 2, 1024)
    while True:
        ncands, nes, totals, pids, ends = run_for_caps(cap_c, cap_e,
                                                       cap_m)
        ncands = np.asarray(ncands)
        nes = np.asarray(nes)
        totals = np.asarray(totals)
        if (int(ncands.sum()) > cand_lim or int(nes.sum()) > exp_lim):
            eng.hostile = True
            return None
        ok = True
        if int(ncands.max()) > cap_c:
            cap_c = _pow2(int(ncands.max()))
            ok = False
        if int(nes.max()) > cap_e:
            cap_e = _pow2(int(nes.max()))
            ok = False
        if int(totals.max()) > cap_m:
            cap_m = _pow2(int(totals.max()))
            ok = False
        if ok:
            break
    pids = np.asarray(pids).astype(np.int64)
    ends = np.asarray(ends).astype(np.int64)
    all_p, all_e = [], []
    for i in range(ndev):
        real = pids[i] >= 0
        all_p.append(pids[i][real])
        all_e.append(ends[i][real] + i * shard - halo)
    pid = np.concatenate(all_p) if all_p else z
    end = np.concatenate(all_e) if all_e else z
    # Duplicate exact-class patterns: expand via the host map, exactly
    # as the single-chip engine does.
    dups = t.dups8
    if dups:
        extra_p, extra_e = [], []
        for rep, group in dups.items():
            at = np.flatnonzero(pid == rep)
            if len(at):
                extra_p.append(np.tile(group[1:], len(at)))
                extra_e.append(np.repeat(end[at], len(group) - 1))
        if extra_p:
            pid = np.concatenate([pid] + extra_p)
            end = np.concatenate([end] + extra_e)
    pid = eng.main_pids[pid]
    if eng.side is not None:
        got = sharded_bitap_match_pairs(eng.side, haystack, mesh)
        spids, sends = got
        pid = np.concatenate([pid, eng.long_pids[spids]])
        end = np.concatenate([end, sends])
    order = np.lexsort((eng.pid_rank[pid], end))
    return pid[order], end[order]


class ShardedSearcher:
    """A facade adapter that computes match sets across a device mesh.

    Implements the minimal surface the stream machinery (stream.py)
    consumes — `_match_set` plus introspection — so sharded stream
    search/replace is the single-chip code path running over
    mesh-gathered match sets (the reference's stream contract,
    automaton.rs:1036-1244, with the roll-buffer carry generalized to
    shard halos)."""

    def __init__(self, ac, mesh: Optional[Mesh] = None):
        from ..utils.errors import MatchError

        self.ac = ac
        self.mesh = mesh if mesh is not None else make_mesh()
        self._eng = ac._bitap_engine()
        self._fp_eng = None
        if self._eng is None:
            # Pattern sets beyond the exact engine's bounds shard via
            # the fingerprint filter (verification host-side).
            self._fp_eng = ac._fingerprint_engine(1 << 62)
            if self._fp_eng is None:
                raise MatchError(
                    "unsupported-stream",
                    "sharded stream search requires a pattern set within"
                    " the bit-parallel or fingerprint engine's bounds",
                )

    # Introspection delegation (what stream.py consults).
    def match_kind(self):
        return self.ac.match_kind()

    def start_kind(self):
        return self.ac.start_kind()

    def max_pattern_len(self):
        return self.ac.max_pattern_len()

    def min_pattern_len(self):
        return self.ac.min_pattern_len()

    def patterns_len(self):
        return self.ac.patterns_len()

    def _match_set(self, input):
        from .. import semantics

        hs = input.haystack[input.start:input.end]
        if self._eng is not None:
            pids, ends = sharded_bitap_match_pairs(
                self._eng, hs, self.mesh
            )
        else:
            got = sharded_fp_match_pairs(self._fp_eng, hs, self.mesh)
            if got is None:  # filter-hostile: single-chip fallback
                return self.ac._match_set(input)
            pids, ends = got
        starts = ends - self.ac._dfa.pattern_lens[pids].astype(np.int64)
        return semantics.MatchSet(pids, starts, ends, input.start)

    def count_matches(self, input) -> int:
        from ..ops.staged import StagedEngine
        from ..utils.search import to_input

        input = to_input(input)
        if self._eng is None:
            return len(self._match_set(input).pids)
        hs = input.haystack[input.start:input.end]
        # Same engine preference as the single-chip facade: the staged
        # two-stage count leads when the PER-SHARD size clears its
        # floor, so sharded large counts do not silently run a
        # different engine than single-chip ones.
        ndev = self.mesh.devices.size
        per_shard = -(-len(hs) // max(ndev, 1))
        if StagedEngine.eligible(self.ac._patterns, per_shard,
                                 self.ac._case_insensitive):
            staged = self.ac._staged_engine(per_shard)
            if staged is not None:
                got = sharded_staged_count(staged, hs, self.mesh)
                if got is not None:
                    return got
        return sharded_bitap_count(self._eng, hs, self.mesh)


def sharded_stream_replace_all(
    ac, reader, writer, replace_with, mesh: Optional[Mesh] = None,
    chunk_size: int = 1 << 20,
) -> None:
    """Stream replacement with the scan fanned out over the mesh.

    Chunks stream through ShardedSearcher's mesh-parallel extraction
    with the standard stream carry (tail + cursor); output is written
    in order, identical to the single-chip stream_replace_all."""
    from ..stream import stream_replace_all

    stream_replace_all(
        ShardedSearcher(ac, mesh), reader, writer, replace_with,
        chunk_size,
    )
