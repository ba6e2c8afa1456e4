"""Benchmark: dense-DFA scan throughput per chip.

Measures the blocked parallel DFA scan (count mode: scan + device-side
match-count reduction, nothing but a scalar leaves the device) on the
reference's headline configuration: the sherlock/name-alt1 pattern set
(5 literals) over English-like text.

Reference baseline (BASELINE.md): forced dense DFA on x86_64 runs
~0.86 GB/s (one dependent table gather per byte). The TPU blocked scan
replaces the sequential walk with thousands of lane-parallel walks.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_DFA_GBPS = 0.86  # BASELINE.md: sherlock/name-alt1 forced DFA


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_haystack(n: int) -> bytes:
    """English-like text with occasional pattern hits, deterministic."""
    rng = np.random.default_rng(1234)
    words = (
        "the quick brown fox jumps over lazy dog time of day it was best "
        "worst epoch belief incredulity season light darkness hope despair"
    ).split()
    names = [
        b"Sherlock Holmes",
        b"John Watson",
        b"Irene Adler",
        b"Inspector Lestrade",
        b"Professor Moriarty",
    ]
    parts = []
    size = 0
    while size < n:
        if rng.random() < 0.001:
            w = names[int(rng.integers(len(names)))]
        else:
            w = words[int(rng.integers(len(words)))].encode()
        parts.append(w)
        size += len(w) + 1
    return b" ".join(parts)[:n]


def main():
    import jax
    import jax.numpy as jnp

    from ahocorasick_tpu import AhoCorasick
    from ahocorasick_tpu.ops.block_scan import (
        _count_matches_jit,
        choose_block_len,
        _round_up,
        scan_states_host,
    )

    dev_kind = jax.devices()[0].platform
    log(f"device: {jax.devices()[0]}")

    patterns = [
        "Sherlock Holmes",
        "John Watson",
        "Irene Adler",
        "Inspector Lestrade",
        "Professor Moriarty",
    ]
    n = 1 << 26  # 64 MiB
    haystack = build_haystack(n)
    ac = AhoCorasick(patterns, device_threshold=0)
    dev = ac._device_automaton()
    halo = dev.halo
    block_len = choose_block_len(n, halo)
    n_pad = _round_up(n, block_len)
    buf = np.zeros(n_pad, dtype=np.uint8)
    buf[:n] = np.frombuffer(haystack, dtype=np.uint8)
    buf_dev = jax.device_put(jnp.asarray(buf))  # staged once in HBM

    def run():
        return _count_matches_jit(
            dev.trans_flat,
            dev.classes,
            dev.match_count,
            buf_dev,
            jnp.int32(n),
            jnp.int32(dev.alphabet_len),
            jnp.int32(dev.start_id),
            block_len,
            halo,
        )

    log("compiling...")
    t0 = time.perf_counter()
    count = int(run())
    log(f"first run {time.perf_counter() - t0:.1f}s, count={count}")

    # Correctness spot check vs host scalar walk on a slice.
    sl = haystack[: 1 << 17]
    s_host = scan_states_host(ac._dfa, sl)
    host_count = int(
        np.sum(
            (s_host >= 2) & (s_host <= ac._dfa.special.max_match_id)
        )
    )
    # count matches in slice via match_count lookup
    mc = (ac._dfa.match_starts[1:] - ac._dfa.match_starts[:-1])
    host_matches = int(mc[s_host].sum())
    dev_slice = dev.count_matches(sl)
    assert dev_slice == host_matches, (dev_slice, host_matches)
    log(f"slice check ok ({host_matches} matches in 128KiB slice)")

    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        c = run()
        c.block_until_ready()
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    gbps = n / med / 1e9
    log(f"median {med * 1e3:.2f} ms over {n / 2**20:.0f} MiB")

    print(
        json.dumps(
            {
                "metric": f"dense-DFA scan throughput ({dev_kind})",
                "value": round(gbps, 2),
                "unit": "GB/s/chip",
                "vs_baseline": round(gbps / BASELINE_DFA_GBPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
