"""Sanity-check the bitap engine against naive matching (CPU interpret)."""
import os
import sys

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
import numpy as np
from ahocorasick_tpu.ops.bitap import BitapEngine


def naive_pairs(pats, hay, ci=False):
    out = []
    h = hay.lower() if ci else hay
    for pid, p in enumerate(pats):
        q = p.lower() if ci else p
        st = 0
        while True:
            i = h.find(q, st)
            if i < 0:
                break
            out.append((pid, i + len(p)))
            st = i + 1
    lens = np.array([len(p) for p in pats])
    order = np.lexsort((np.arange(len(pats)), -lens))
    rank = np.empty(len(pats), np.int64)
    rank[order] = np.arange(len(pats))
    out.sort(key=lambda t: (t[1], rank[t[0]]))
    return out


CASES = [
    (["apple", "maple", "Snapple"],
     b"Nobody likes maple in their apple flavored Snapple.", False),
    (["a"], b"aaaa", False),
    (["abba", "b", "ba"], b"abbabba", False),
    (["Sherlock Holmes", "John Watson"],
     b"x" * 5000 + b"Sherlock Holmes meets John Watson" + b"y" * 3000, False),
    (["aBc"], b"AbC abc ABC xbc", True),
    (["xyz"], b"", False),
    (["q"] * 3, b"qq", False),  # duplicate patterns
]

rng = np.random.default_rng(7)
# random case: random patterns over tiny alphabet, random haystack
pats = ["".join(rng.choice(list("abc"), size=rng.integers(1, 6)))
        for _ in range(12)]
hay = "".join(rng.choice(list("abc"), size=20000)).encode()
CASES.append((pats, hay, False))

for pats, hay, ci in CASES:
    pb = [p.encode() if isinstance(p, str) else p for p in pats]
    eng = BitapEngine(pb, ci)
    want = naive_pairs(pb, hay, ci)
    got_c = eng.count_matches(hay)
    pids, ends = eng.match_pairs(hay)
    got = list(zip(pids.tolist(), ends.tolist()))
    ok1 = got_c == len(want)
    ok2 = got == want
    print(f"pats={len(pb)} n={len(hay)} count={'OK' if ok1 else f'BAD {got_c} vs {len(want)}'}"
          f" pairs={'OK' if ok2 else 'BAD'}")
    if not ok2:
        print("  want", want[:12])
        print("  got ", got[:12])
        sys.exit(1)
print("all ok")
