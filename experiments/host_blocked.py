"""Numpy lane-parallel blocked DFA walk on host — fallback candidate."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from ahocorasick_tpu import AhoCorasick

rng = np.random.default_rng(0)
for npat, tag in ((400, "400 pats"), (100_000, "100k pats")):
    pats = [
        bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz"),
                         size=int(rng.integers(5, 14))).astype(np.uint8))
        for _ in range(npat)
    ]
    N = 1 << 24
    hay = rng.integers(97, 123, size=N, dtype=np.uint8).tobytes()
    ac = AhoCorasick(pats, engine="dfa-scan")
    dfa = ac._dfa
    trans = dfa.trans  # [S, A]
    classes = dfa.classes.astype(np.int32)
    mc = (dfa.match_starts[1:] - dfa.match_starts[:-1]).astype(np.int64)
    halo = 1 << max(int(dfa.max_pattern_len - 1).bit_length(), 2)
    L = 4096
    lanes = -(-N // L)
    buf = np.zeros((lanes, L), np.uint8)
    buf.reshape(-1)[:N] = np.frombuffer(hay, np.uint8)
    c = classes[buf]                      # [lanes, L]
    chalo = classes[
        np.roll(np.frombuffer(hay, np.uint8), halo)[
            : lanes * L].reshape(lanes, L)[:, :halo]]
    flat = trans.reshape(-1).astype(np.int32)
    A = dfa.alphabet_len

    t0 = time.perf_counter()
    s = np.full(lanes, dfa.special.start_unanchored_id, np.int32)
    for t in range(halo):
        s = flat[s * A + chalo[:, t]]
    s[0] = dfa.special.start_unanchored_id
    total = 0
    counts = np.zeros(lanes, np.int64)
    for t in range(L):
        s = flat[s * A + c[:, t]]
        counts += mc[s]
    # mask padding lanes' tail contributions (approx: count check only)
    dt = time.perf_counter() - t0
    print(f"{tag}: states={dfa.num_states} A={A} lanes={lanes} "
          f"host blocked: {dt:.2f}s = {N/dt/1e9:.3f} GB/s "
          f"(count~{counts.sum()})", flush=True)
