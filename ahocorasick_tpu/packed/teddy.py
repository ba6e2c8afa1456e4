"""Teddy re-imagined for the TPU: fingerprint via one-hot nybble matmuls.

The reference's Teddy (src/packed/teddy/README.md, generic.rs) fingerprints
each position with per-nybble PSHUFB lookups ANDed across 1-4 fingerprint
bytes, mapping patterns into 8 (Slim) or 16 (Fat) buckets; candidate
positions are then verified against the patterns in the flagged bucket
(generic.rs:820-870).

On TPU the natural form of a 16-entry nybble lookup producing per-bucket
bits is a one-hot matmul on the MXU:

    candidate[i, b] = AND over fingerprint bytes j of
        (onehot(lo_nybble(h[i+j])) @ M_lo[j])[b] AND
        (onehot(hi_nybble(h[i+j])) @ M_hi[j])[b]

where M_lo[j] is a [16, BUCKETS] 0/1 mask: M_lo[j][v, b] = 1 iff some
pattern in bucket b has low nybble v at offset j (or is shorter than j,
mirroring the reference's mask construction, teddy/builder.rs:~450+).
Each term is one [n, 16] x [16, B] matmul in bf16 (exact: values are 0/1
sums < 256), so the fingerprint costs 4 * F matmul-FLOPs per byte per
bucket — MXU territory — and the AND is an elementwise min on the VPU.

Candidate positions are compacted on-device (count + bounded nonzero) and
verified on the host with vectorized window compares; verified matches
feed the same leftmost selection filters as the core engine, which
reproduces the reference's match-kind semantics exactly.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BUCKETS = 8
MAX_FINGERPRINT = 4


class TeddyTables:
    """Host-built mask tables + bucket assignment."""

    def __init__(self, patterns: Sequence[bytes]):
        assert patterns and all(len(p) > 0 for p in patterns)
        self.patterns = list(patterns)
        self.min_len = min(len(p) for p in patterns)
        self.max_len = max(len(p) for p in patterns)
        self.mask_len = min(MAX_FINGERPRINT, self.min_len)
        # Bucket assignment: the reference groups patterns sharing a low
        # nybble of their first fingerprint byte (required there to keep
        # intra-bucket priority); our verification recovers exact
        # semantics via the leftmost filters, so buckets only affect
        # performance. Group by first-byte low nybble mod BUCKETS to keep
        # the masks sparse.
        self.buckets: List[List[int]] = [[] for _ in range(BUCKETS)]
        for pid, p in enumerate(patterns):
            self.buckets[(p[0] & 0xF) % BUCKETS].append(pid)
        # Masks [F, 16, BUCKETS] for low and high nybbles.
        f = self.mask_len
        m_lo = np.zeros((f, 16, BUCKETS), dtype=np.float32)
        m_hi = np.zeros((f, 16, BUCKETS), dtype=np.float32)
        for b, pids in enumerate(self.buckets):
            for pid in pids:
                p = patterns[pid]
                for j in range(f):
                    m_lo[j, p[j] & 0xF, b] = 1.0
                    m_hi[j, p[j] >> 4, b] = 1.0
        self.m_lo = m_lo
        self.m_hi = m_hi


def _bucket(n: int) -> int:
    return 1 << max(int(max(n, 1) - 1).bit_length(), 12)


@functools.partial(jax.jit, static_argnames=("f",))
def _fingerprint_jit(
    h: jax.Array,      # uint8 [n_pad]
    m_lo: jax.Array,   # [f, 16, B] bf16
    m_hi: jax.Array,   # [f, 16, B] bf16
    n: jax.Array,      # valid length
    f: int,
) -> jax.Array:
    """Per-position candidate mask: any bucket whose fingerprint matches
    at start position i. Returns bool [n_pad]."""
    hb = h.astype(jnp.int32)
    lo = jax.nn.one_hot(hb & 0xF, 16, dtype=jnp.bfloat16)   # [n, 16]
    hi = jax.nn.one_hot(hb >> 4, 16, dtype=jnp.bfloat16)
    n_pad = h.shape[0]
    cand = None
    for j in range(f):
        # Window shifted by j: position i looks at byte i+j.
        lo_j = jnp.roll(lo, -j, axis=0)
        hi_j = jnp.roll(hi, -j, axis=0)
        s_lo = jnp.dot(lo_j, m_lo[j], preferred_element_type=jnp.float32)
        s_hi = jnp.dot(hi_j, m_hi[j], preferred_element_type=jnp.float32)
        hit = (s_lo > 0) & (s_hi > 0)  # [n, B]
        cand = hit if cand is None else (cand & hit)
    any_bucket = jnp.any(cand, axis=1)
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    return any_bucket & (idx < n)


@jax.jit
def _count_true(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k",))
def _compact_true(mask: jax.Array, k: int):
    (pos,) = jnp.nonzero(mask, size=k, fill_value=mask.shape[0])
    return pos.astype(jnp.int32)


class TeddySearcher:
    """Fingerprint-then-verify multi-substring searcher."""

    def __init__(self, patterns: Sequence[bytes]):
        self.tables = TeddyTables(patterns)
        t = self.tables
        self._m_lo = jnp.asarray(t.m_lo.astype(np.float32)).astype(
            jnp.bfloat16
        )
        self._m_hi = jnp.asarray(t.m_hi.astype(np.float32)).astype(
            jnp.bfloat16
        )
        # Host verification tables: padded pattern matrix [K, max_len].
        k = len(t.patterns)
        self._plens = np.array([len(p) for p in t.patterns], dtype=np.int64)
        self._pmat = np.zeros((k, t.max_len), dtype=np.uint8)
        self._pmask = np.zeros((k, t.max_len), dtype=bool)
        for i, p in enumerate(t.patterns):
            self._pmat[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
            self._pmask[i, : len(p)] = True

    @property
    def minimum_len(self) -> int:
        # Like the reference, the vector engine needs a minimum haystack
        # (teddy/builder.rs minimum_len); ours is the fingerprint length
        # (roll wraparound is masked via the n bound).
        return self.tables.mask_len

    def candidates(self, haystack: bytes) -> np.ndarray:
        """Candidate match-start positions (ascending)."""
        n = len(haystack)
        if n < self.tables.mask_len:
            return np.zeros(0, dtype=np.int64)
        n_pad = _bucket(n)
        buf = np.zeros(n_pad, dtype=np.uint8)
        buf[:n] = np.frombuffer(haystack, dtype=np.uint8)
        mask = _fingerprint_jit(
            jnp.asarray(buf),
            self._m_lo,
            self._m_hi,
            jnp.int32(n - self.tables.mask_len + 1),
            self.tables.mask_len,
        )
        cnt = int(_count_true(mask))
        if cnt == 0:
            return np.zeros(0, dtype=np.int64)
        k = 1 << max(int(cnt - 1).bit_length(), 6)
        pos = np.asarray(_compact_true(mask, k))[:cnt]
        return pos.astype(np.int64)

    def verify(
        self, haystack: bytes, starts: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Exact window compare of every pattern at every candidate start.

        Returns (pids, starts, ends) of true matches, sorted by
        (start, pid). Vectorized host compare: candidates are sparse in
        realistic inputs (that is the point of the fingerprint).
        """
        if len(starts) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        h = np.frombuffer(haystack, dtype=np.uint8)
        n = len(h)
        ml = self.tables.max_len
        # Gather candidate windows [C, max_len] (clip + mask tail).
        idx = starts[:, None] + np.arange(ml)[None, :]
        win = h[np.clip(idx, 0, n - 1)]
        in_range = idx < n
        # [C, K, max_len] compare (bool); K<=128, C sparse.
        eq = (win[:, None, :] == self._pmat[None, :, :]) & in_range[:, None, :]
        ok = np.all(eq | ~self._pmask[None, :, :], axis=2)
        ci, ki = np.nonzero(ok)
        pids = ki.astype(np.int64)
        ss = starts[ci]
        ends = ss + self._plens[ki]
        order = np.lexsort((pids, ss))
        return pids[order], ss[order], ends[order]

    def find_matches(self, haystack: bytes) -> Tuple[np.ndarray, ...]:
        """All (pid, start, end) matches of any pattern (sorted by
        (start, pid))."""
        return self.verify(haystack, self.candidates(haystack))
