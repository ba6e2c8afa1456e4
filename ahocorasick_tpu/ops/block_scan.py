"""Blocked parallel DFA scan — the TPU workhorse.

Re-casts the reference's inherently sequential byte-at-a-time DFA walk
(/root/reference/src/automaton.rs:1284-1420, one dependent table gather per
byte) as a lane-parallel blocked scan:

The unanchored Aho-Corasick automaton has the *suffix property*: the state
after scanning ``h[0..i]`` from the start state equals the state after
scanning only the last ``D`` bytes (``D = max_pattern_len``), because a
state is exactly the longest suffix of the scanned text that is a trie
path, and trie paths are at most ``D`` long. (This is the same property
that makes the reference's stream search possible with a roll buffer of
``max_pattern_len`` bytes, util/buffer.rs:113-123.)

Therefore the haystack is split into B blocks of L bytes; each block's
per-position states are computed independently by walking from the start
state over the block plus a ``D``-byte left halo. All B walks advance in
lockstep: one ``lax.scan`` over ``L + D`` steps carrying a ``[B]`` state
vector, with each step doing a single vectorized gather
``trans_flat[state * A + class]``.

Honest performance note: XLA's data-dependent gather lowers to an
emulated sequence on TPU (~0.03 GB/s measured with strict timing), so
this engine is a *correctness* backend — kept for the forced
``dfa-scan``/``device-only`` modes and as the sharded-scan reference.
Production traffic uses the gather-free bit-parallel kernel
(ops/bitap.py, 8-80 GB/s) for pattern sets within its bounds and the
native interleaved C++ walk (automata/native.py, ~0.6 GB/s) beyond
them; see ARCHITECTURE.md.

The output is the full per-position state sequence, from which the *entire*
overlapping match set is derived (states index CSR match lists). All match
semantics (standard / leftmost-first / leftmost-longest, overlapping,
non-overlapping) are then O(#matches) filters — see semantics.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..automata.dfa import DenseDFA


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _size_bucket(n: int) -> int:
    """Bucket haystack lengths to bound jit recompiles: next power of two,
    minimum 4 KiB. (Power-of-two padding keeps block/lane splits exact.)"""
    n = max(n, 4096)
    return 1 << (n - 1).bit_length()


def choose_block_len(n: int, halo: int) -> int:
    """Pick the serial block length L for an n-byte (power-of-two) buffer.

    The lane count B = n / L must be a power of two and ideally a
    multiple of 1024 (8 sublanes x 128 lanes of int32): misaligned lane
    counts measured ~100x slower on v5e. Among aligned options, prefer
    more lanes (smaller L) until the halo overhead (halo/L) passes ~12%.
    """
    n = _size_bucket(n)
    lanes = 1024
    while lanes * 2 <= n // 128 and n // (lanes * 2) >= 8 * halo:
        lanes *= 2
    lanes = min(lanes, 8192)
    return max(n // lanes, 128)


def scan_states_host(dfa: DenseDFA, haystack: bytes) -> np.ndarray:
    """Host scalar reference walk over the dense table.

    Used for haystacks below the device dispatch threshold and as a test
    oracle for the blocked device scan. Returns the same per-position
    states as `DeviceAutomaton.scan_states`.
    """
    classes = dfa.classes.astype(np.int64)
    trans = dfa.trans
    n = len(haystack)
    out = np.empty(n, dtype=np.int32)
    s = dfa.special.start_unanchored_id
    c = classes[np.frombuffer(haystack, dtype=np.uint8)] if n else None
    for i in range(n):
        s = trans[s, c[i]]
        out[i] = s
    return out


class DeviceAutomaton:
    """Device-resident dense DFA tables + the compiled scan."""

    def __init__(self, dfa: DenseDFA):
        self.dfa = dfa
        self.alphabet_len = dfa.alphabet_len
        self.num_states = dfa.num_states
        self.start_id = dfa.special.start_unanchored_id
        self.max_match_id = dfa.special.max_match_id
        # Round the halo up to a power of two: a larger halo is still
        # correct (the suffix property needs *at least* max_pattern_len
        # bytes) and bucketing keeps the jit cache small.
        h = int(dfa.max_pattern_len)
        self.halo = h if h == 0 else 1 << (h - 1).bit_length()
        # Pad device arrays to power-of-two sizes so different pattern sets
        # share compiled kernels (shapes are part of the jit cache key).
        flat = dfa.trans.reshape(-1).astype(np.int32)
        pad = (1 << max(int(flat.size - 1).bit_length(), 12)) - flat.size
        self.trans_flat = jnp.asarray(
            np.pad(flat, (0, pad)) if pad else flat
        )
        self.classes = jnp.asarray(dfa.classes.astype(np.int32))
        mc = (dfa.match_starts[1:] - dfa.match_starts[:-1]).astype(np.int32)
        pad = (1 << max(int(mc.size - 1).bit_length(), 10)) - mc.size
        self.match_count = jnp.asarray(np.pad(mc, (0, pad)) if pad else mc)

    # ------------------------------------------------------------------
    def _prepare(self, haystack: bytes):
        """Pad the haystack into a bucketed device buffer; returns
        (buf, n, block_len, halo)."""
        n = len(haystack)
        padded = _size_bucket(n)
        halo = min(self.halo, padded)
        block_len = choose_block_len(padded, halo)
        padded = _round_up(padded, block_len)
        buf = np.zeros(padded, dtype=np.uint8)
        buf[:n] = np.frombuffer(haystack, dtype=np.uint8)
        return buf, n, block_len, halo

    def match_positions(self, haystack: bytes):
        """Compacted match positions: (ends, state_ids) as host arrays.

        Runs the blocked scan on device, reduces to the number of
        match-state positions, then compacts (position, state) pairs on
        device so only O(#matches) data is transferred back — the full
        per-position state array never leaves the device. ``ends`` are
        1-based match end offsets (the start-state row at end 0 is the
        caller's concern).
        """
        n = len(haystack)
        if n == 0:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        buf, n, block_len, halo = self._prepare(haystack)
        states = _scan_states_jit(
            self.trans_flat,
            self.classes,
            jnp.asarray(buf),
            jnp.int32(self.alphabet_len),
            jnp.int32(self.start_id),
            block_len,
            halo,
        )  # device-resident [n_pad]
        cnt = int(
            _count_match_positions_jit(
                states, jnp.int32(n), jnp.int32(self.max_match_id)
            )
        )
        if cnt == 0:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        k = 1 << max(int(cnt - 1).bit_length(), 6)
        pos, sids = _compact_matches_jit(
            states, jnp.int32(n), jnp.int32(self.max_match_id), k
        )
        pos = np.asarray(pos)[:cnt].astype(np.int64)
        sids = np.asarray(sids)[:cnt].astype(np.int64)
        return pos + 1, sids

    def scan_states(self, haystack: bytes) -> np.ndarray:
        """Per-position automaton states for an unanchored scan.

        Returns int32 array of length ``len(haystack)`` where entry ``i`` is
        the state after consuming byte ``i`` (the state "at position i+1").
        The state at position 0 is the start state (known statically).
        """
        n = len(haystack)
        if n == 0:
            return np.zeros(0, dtype=np.int32)
        padded = _size_bucket(n)
        buf = np.zeros(padded, dtype=np.uint8)
        buf[:n] = np.frombuffer(haystack, dtype=np.uint8)
        halo = min(self.halo, padded)
        block_len = choose_block_len(padded, halo)
        padded2 = _round_up(padded, block_len)
        if padded2 != padded:
            b2 = np.zeros(padded2, dtype=np.uint8)
            b2[:n] = buf[:n]
            buf = b2
        states = _scan_states_jit(
            self.trans_flat,
            self.classes,
            jnp.asarray(buf),
            jnp.int32(self.alphabet_len),
            jnp.int32(self.start_id),
            block_len,
            halo,
        )
        return np.asarray(states)[:n]

    def count_matches(self, haystack: bytes) -> int:
        """Total number of matches (overlapping semantics), device-reduced."""
        n = len(haystack)
        extra = 0
        # position 0 (start state) contributes when the empty pattern matches
        if 2 <= self.start_id <= self.max_match_id:
            extra = int(self.dfa.match_starts[self.start_id + 1]
                        - self.dfa.match_starts[self.start_id])
        if n == 0:
            return extra
        padded = _size_bucket(n)
        buf = np.zeros(padded, dtype=np.uint8)
        buf[:n] = np.frombuffer(haystack, dtype=np.uint8)
        halo = min(self.halo, padded)
        block_len = choose_block_len(padded, halo)
        padded2 = _round_up(padded, block_len)
        if padded2 != padded:
            b2 = np.zeros(padded2, dtype=np.uint8)
            b2[:n] = buf[:n]
            buf = b2
        total = _count_matches_jit(
            self.trans_flat,
            self.classes,
            self.match_count,
            jnp.asarray(buf),
            jnp.int32(n),
            jnp.int32(self.alphabet_len),
            jnp.int32(self.start_id),
            block_len,
            halo,
        )
        return int(total) + extra


@functools.partial(
    jax.jit, static_argnames=("block_len", "halo")
)
def _scan_states_jit(
    trans_flat: jax.Array,
    classes: jax.Array,
    haystack: jax.Array,  # uint8 [n_padded], multiple of block_len
    alphabet_len: jax.Array,
    start_id: jax.Array,
    block_len: int,
    halo: int,
) -> jax.Array:
    c = classes[haystack.astype(jnp.int32)]  # [n] int32
    n = c.shape[0]
    num_blocks = n // block_len
    # Windows [halo + L, B] built from pure layout ops (reshape /
    # transpose / roll) — an arbitrary-index gather of the same windows
    # compiled and ran orders of magnitude slower on TPU.
    body = c.reshape(num_blocks, block_len).T  # [L, B]
    if halo:
        # halo rows: block b, step t<halo reads c[b*L - halo + t]; that is
        # roll(c, halo) reshaped, first `halo` columns of each row. Block
        # 0's halo (wrapped bytes) is masked via `valid`.
        halo_part = jnp.roll(c, halo).reshape(num_blocks, block_len)
        halo_part = halo_part[:, :halo].T  # [halo, B]
        cw = jnp.concatenate([halo_part, body], axis=0)
        first_block = (
            jnp.arange(num_blocks, dtype=jnp.int32) == 0
        )  # [B]
        offs = jnp.arange(-halo, block_len, dtype=jnp.int32)
        valid = ~((offs < 0)[:, None] & first_block[None, :])
    else:
        cw = body
        valid = jnp.ones(cw.shape, dtype=bool)

    def step(s, xs):
        cl, ok = xs
        s2 = jnp.take(trans_flat, s * alphabet_len + cl)
        s2 = jnp.where(ok, s2, s)
        return s2, s2

    s0 = jnp.full((num_blocks,), start_id, dtype=jnp.int32)
    _, ys = lax.scan(step, s0, (cw, valid))  # ys: [halo+L, B]
    states = ys[halo:]  # [L, B]
    return states.T.reshape(-1)  # [n]


@functools.partial(
    jax.jit, static_argnames=("block_len", "halo")
)
def _count_matches_jit(
    trans_flat: jax.Array,
    classes: jax.Array,
    match_count: jax.Array,
    haystack: jax.Array,
    n: jax.Array,
    alphabet_len: jax.Array,
    start_id: jax.Array,
    block_len: int,
    halo: int,
) -> jax.Array:
    c = classes[haystack.astype(jnp.int32)]
    n_pad = c.shape[0]
    num_blocks = n_pad // block_len
    starts = jnp.arange(num_blocks, dtype=jnp.int32) * block_len
    offs = jnp.arange(-halo, block_len, dtype=jnp.int32)
    idx = starts[None, :] + offs[:, None]
    valid = idx >= 0
    # Only a block's own positions (not its halo, which belongs to the
    # previous block) and only real (non-padding) positions contribute.
    counted = (offs >= 0)[:, None] & (idx < n)
    # Layout-op window construction (see _scan_states_jit).
    body = c.reshape(num_blocks, block_len).T
    if halo:
        halo_part = jnp.roll(c, halo).reshape(num_blocks, block_len)
        halo_part = halo_part[:, :halo].T
        cw = jnp.concatenate([halo_part, body], axis=0)
    else:
        cw = body

    def step(carry, xs):
        s, acc = carry
        cl, ok, cnt_ok = xs
        s2 = jnp.take(trans_flat, s * alphabet_len + cl)
        s2 = jnp.where(ok, s2, s)
        acc = acc + jnp.where(cnt_ok, jnp.take(match_count, s2), 0)
        return (s2, acc), None

    s0 = jnp.full((num_blocks,), start_id, dtype=jnp.int32)
    acc0 = jnp.zeros((num_blocks,), dtype=jnp.int32)
    (sf, acc), _ = lax.scan(step, (s0, acc0), (cw, valid, counted))
    # int32 total: callers chunk haystacks well below 2^31 matches per call.
    return jnp.sum(acc)


@jax.jit
def _count_match_positions_jit(
    states: jax.Array, n: jax.Array, max_match_id: jax.Array
) -> jax.Array:
    idx = jnp.arange(states.shape[0], dtype=jnp.int32)
    mask = (states >= 2) & (states <= max_match_id) & (idx < n)
    return jnp.sum(mask.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k",))
def _compact_matches_jit(
    states: jax.Array, n: jax.Array, max_match_id: jax.Array, k: int
):
    idx = jnp.arange(states.shape[0], dtype=jnp.int32)
    mask = (states >= 2) & (states <= max_match_id) & (idx < n)
    (pos,) = jnp.nonzero(mask, size=k, fill_value=0)
    return pos.astype(jnp.int32), states[pos]
