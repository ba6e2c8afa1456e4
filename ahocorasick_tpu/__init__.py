"""ahocorasick_tpu — a TPU-native multi-pattern string search framework.

A from-scratch re-design of the capabilities of the `aho-corasick` crate
(BurntSushi/aho-corasick v1.1.3) for TPU hardware with JAX/XLA/Pallas:

  - Host-side trie + BFS failure-link construction compiles pattern sets
    into flat int32 automaton tables (automata/; optional native C++
    builder in native/).
  - The primary device engine is a gather-free bit-parallel shift-AND
    Pallas kernel — 1024 haystack streams per grid tile, charmask lookup
    as pruned nybble select trees — driver-measured 52 GB/s/chip on the
    reference's headline 5-pattern benchmark (BENCH_r03) vs its
    0.86 GB/s dense DFA (ops/bitap.py). Larger pattern sets ride the
    bucketed fingerprint engine (ops/fingerprint.py).
  - Standard / leftmost-first / leftmost-longest semantics, overlapping
    search, anchored search, ASCII case folding, replacement and stream
    search/replace all reproduce the reference's (pattern, start, end)
    output exactly (semantics.py, oracle.py).
  - A packed SIMD-style sub-engine (Teddy re-imagined as one-hot matmuls
    on the MXU) lives in packed/ and data-parallel multi-chip sharding in
    parallel/.

Quick start::

    from ahocorasick_tpu import AhoCorasick
    ac = AhoCorasick(["apple", "maple", "Snapple"])
    for m in ac.find_iter("Nobody likes maple in their apple flavored Snapple."):
        print(m.pattern, m.start, m.end)
"""

from . import transducer
from .ahocorasick import AhoCorasick, AhoCorasickBuilder, AhoCorasickKind
from .oracle import OverlappingState
from .utils.errors import BuildError, MatchError
from .utils.search import (
    Anchored,
    Input,
    Match,
    MatchKind,
    Span,
    StartKind,
)

__version__ = "0.1.0"

__all__ = [
    "AhoCorasick",
    "AhoCorasickBuilder",
    "AhoCorasickKind",
    "Anchored",
    "BuildError",
    "Input",
    "Match",
    "MatchError",
    "MatchKind",
    "OverlappingState",
    "Span",
    "StartKind",
    "transducer",
    "__version__",
]
