"""Checkpoint/restore of compiled searchers (TPU-native extension).

The reference has no automaton serialization (SURVEY §5: no serde); its
resumability is search-granular. Here every automaton is a set of flat
numpy arrays (the property the device engines are built on), so a
compiled `AhoCorasick` round-trips through one ``.npz`` file: patterns,
builder configuration, and the compiled NFA/DFA tables — load() restores
a ready searcher without re-running trie construction or the BFS failure
fill. Device/bitap tables are re-derived lazily on first use (they are
cheap projections of the saved arrays).
"""

from __future__ import annotations

import numpy as np

from .automata.dfa import DenseDFA
from .automata.noncontiguous import NFA, Special
from .utils.search import MatchKind, StartKind

_KINDS = [MatchKind.STANDARD, MatchKind.LEFTMOST_FIRST,
          MatchKind.LEFTMOST_LONGEST]
_STARTS = [StartKind.BOTH, StartKind.UNANCHORED, StartKind.ANCHORED]

_NFA_ARRAYS = (
    "pattern_lens", "fail", "match_starts", "match_pids",
    "trans_starts", "trans_bytes", "trans_next", "depth", "classes",
)
_NFA_SCALARS = (
    "min_pattern_len", "max_pattern_len", "num_states", "alphabet_len",
    "start_loop_open",
)
_DFA_ARRAYS = (
    "trans", "classes", "match_starts", "match_pids", "pattern_lens",
)


def _pack_nfa(prefix: str, nfa: NFA, out: dict) -> None:
    for name in _NFA_ARRAYS:
        out[f"{prefix}{name}"] = getattr(nfa, name)
    sc = [int(getattr(nfa, name)) for name in _NFA_SCALARS]
    sp = nfa.special
    sc += [sp.max_match_id, sp.start_unanchored_id, sp.start_anchored_id,
           _KINDS.index(nfa.match_kind), int(nfa.ascii_case_insensitive)]
    out[f"{prefix}scalars"] = np.asarray(sc, np.int64)


def _unpack_nfa(prefix: str, z) -> NFA:
    nfa = NFA()
    for name in _NFA_ARRAYS:
        setattr(nfa, name, z[f"{prefix}{name}"])
    sc = z[f"{prefix}scalars"]
    for i, name in enumerate(_NFA_SCALARS):
        setattr(
            nfa, name,
            bool(sc[i]) if name == "start_loop_open" else int(sc[i]),
        )
    nfa.special = Special(int(sc[5]), int(sc[6]), int(sc[7]))
    nfa.match_kind = _KINDS[int(sc[8])]
    nfa.ascii_case_insensitive = bool(sc[9])
    return nfa


def save(ac, path: str) -> None:
    """Serialize a compiled AhoCorasick searcher to ``path`` (.npz)."""
    out = {}
    pats = ac._patterns
    # Patterns as one byte blob + offsets (npz has no ragged arrays).
    blob = b"".join(pats)
    out["pat_blob"] = np.frombuffer(blob, np.uint8).copy()
    out["pat_offsets"] = np.cumsum(
        [0] + [len(p) for p in pats]
    ).astype(np.int64)
    from .ahocorasick import AhoCorasickKind

    out["config"] = np.asarray(
        [
            _KINDS.index(ac._match_kind),
            _STARTS.index(ac._start_kind),
            int(ac._case_insensitive),
            int(ac._prefilter_enabled),
            int(ac._byte_classes),
            int(ac._device_threshold),
            list(AhoCorasickKind).index(ac._kind),
            int(ac._dense_depth),
        ],
        np.int64,
    )
    out["engine_mode"] = np.frombuffer(
        ac._engine_mode.encode(), np.uint8
    ).copy()
    _pack_nfa("nfa_", ac._nfa, out)
    if ac._match_nfa is not ac._nfa:
        _pack_nfa("mnfa_", ac._match_nfa, out)
    d = ac._dfa
    for name in _DFA_ARRAYS:
        out[f"dfa_{name}"] = getattr(d, name)
    out["dfa_scalars"] = np.asarray(
        [d.alphabet_len, d.num_states, d.min_pattern_len,
         d.max_pattern_len, _KINDS.index(d.match_kind),
         d.special.max_match_id, d.special.start_unanchored_id,
         d.special.start_anchored_id],
        np.int64,
    )
    np.savez_compressed(path, **out)


def load(path: str):
    """Restore a searcher saved with `save` — no recompilation."""
    from .ahocorasick import AhoCorasick, AhoCorasickKind

    z = np.load(path)
    offs = z["pat_offsets"]
    blob = z["pat_blob"].tobytes()
    patterns = [
        blob[int(offs[i]):int(offs[i + 1])]
        for i in range(len(offs) - 1)
    ]
    cfg = z["config"]
    ac = object.__new__(AhoCorasick)
    ac._patterns = patterns
    ac._match_kind = _KINDS[int(cfg[0])]
    ac._start_kind = _STARTS[int(cfg[1])]
    ac._case_insensitive = bool(cfg[2])
    ac._prefilter_enabled = bool(cfg[3])
    ac._byte_classes = bool(cfg[4])
    ac._device_threshold = int(cfg[5])
    ac._engine_mode = z["engine_mode"].tobytes().decode()
    ac._nfa = _unpack_nfa("nfa_", z)
    if "mnfa_scalars" in z:
        ac._match_nfa = _unpack_nfa("mnfa_", z)
    else:
        ac._match_nfa = ac._nfa
    sc = z["dfa_scalars"]
    ac._dfa = DenseDFA(
        trans=z["dfa_trans"],
        classes=z["dfa_classes"],
        alphabet_len=int(sc[0]),
        num_states=int(sc[1]),
        special=Special(int(sc[5]), int(sc[6]), int(sc[7])),
        match_starts=z["dfa_match_starts"],
        match_pids=z["dfa_match_pids"],
        pattern_lens=z["dfa_pattern_lens"],
        min_pattern_len=int(sc[2]),
        max_pattern_len=int(sc[3]),
        match_kind=_KINDS[int(sc[4])],
    )
    ac._device = None
    ac._bitap = None
    ac._bitap_checked = False
    ac._staged = None
    ac._fp = None
    ac._fp_checked = False
    ac._cascade = None
    ac._cascade_checked = False
    ac._pre = None
    ac._pre_checked = False
    ac._dense_depth = int(cfg[7])
    ac._contig = None
    ac._has_empty = bool(
        len(ac._nfa.pattern_lens)
        and int(ac._nfa.pattern_lens.min()) == 0
    )
    ac._kind = list(AhoCorasickKind)[int(cfg[6])]
    return ac
