// Native Aho-Corasick construction: trie + BFS failure fill.
//
// C++ twin of the Python builder in
// ahocorasick_tpu/automata/noncontiguous.py — bit-for-bit identical
// output arrays (same host-ID allocation order, same BFS byte-sorted
// child order, same match-copy timing, same final ID remapping), so the
// two builders are interchangeable and cross-checked in tests. This
// plays the role of the reference's native construction path
// (/root/reference/src/nfa/noncontiguous.rs, which builds 100k-pattern
// automatons in ~240ms): pattern-set compilation is host-side, scalar,
// and branchy — exactly what native code is for. The compiled tables are
// then uploaded to the TPU by the Python layer.
//
// Exposed via a C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

constexpr int32_t HOST_DEAD = -1;
constexpr int kMatchStandard = 0;
constexpr int kMatchLeftmostFirst = 1;
constexpr int kMatchLeftmostLongest = 2;

inline uint8_t OppositeAsciiCase(uint8_t b) {
  if (b >= 0x41 && b <= 0x5A) return b + 32;
  if (b >= 0x61 && b <= 0x7A) return b - 32;
  return b;
}

struct State {
  // Byte-sorted edges (byte, next) — mirrors the reference's sorted
  // transition lists (noncontiguous.rs:381-423).
  std::vector<std::pair<uint8_t, int32_t>> edges;
  std::vector<int32_t> matches;
  int32_t fail = 0;
  int32_t depth = 0;

  int32_t Find(uint8_t b) const {
    size_t lo = 0, hi = edges.size();
    while (lo < hi) {
      size_t mid = (lo + hi) / 2;
      if (edges[mid].first < b)
        lo = mid + 1;
      else
        hi = mid;
    }
    if (lo < edges.size() && edges[lo].first == b) return edges[lo].second;
    return -1;
  }
  void Insert(uint8_t b, int32_t next) {
    size_t lo = 0, hi = edges.size();
    while (lo < hi) {
      size_t mid = (lo + hi) / 2;
      if (edges[mid].first < b)
        lo = mid + 1;
      else
        hi = mid;
    }
    if (lo < edges.size() && edges[lo].first == b) {
      edges[lo].second = next;
    } else {
      edges.insert(edges.begin() + lo, {b, next});
    }
  }
};

struct BuildResult {
  int32_t num_states = 0;
  int32_t alphabet_len = 0;
  int32_t max_match_id = 0;
  int32_t start_unanchored_id = 0;
  int32_t start_anchored_id = 0;
  int32_t start_loop_open = 1;
  int32_t min_pattern_len = 0;
  int32_t max_pattern_len = 0;
  std::vector<int32_t> fail;
  std::vector<int32_t> depth;
  std::vector<int32_t> match_starts;
  std::vector<int32_t> match_pids;
  std::vector<int32_t> trans_starts;
  std::vector<uint8_t> trans_bytes;
  std::vector<int32_t> trans_next;
  std::vector<uint8_t> classes;  // 256
  std::vector<int32_t> pattern_lens;
};

BuildResult* Compile(const uint8_t* pat_bytes, const int64_t* pat_offsets,
                     int64_t n_patterns, int match_kind,
                     int case_insensitive) {
  const bool leftmost = match_kind != kMatchStandard;
  const bool leftmost_first = match_kind == kMatchLeftmostFirst;

  std::vector<State> st(1);  // 0 = root (unanchored start)
  bool boundary[256] = {false};
  bool any_boundary = false;
  auto set_class_boundary = [&](uint8_t b) {
    any_boundary = true;
    if (b > 0) boundary[b - 1] = true;
    boundary[b] = true;
  };

  auto* out = new BuildResult();
  out->pattern_lens.resize(n_patterns);
  int64_t min_len = INT32_MAX, max_len = 0;

  // --- trie build (matches Python compile_nfa) ---------------------
  for (int64_t pid = 0; pid < n_patterns; ++pid) {
    const uint8_t* p = pat_bytes + pat_offsets[pid];
    const int64_t plen = pat_offsets[pid + 1] - pat_offsets[pid];
    out->pattern_lens[pid] = static_cast<int32_t>(plen);
    if (plen < min_len) min_len = plen;
    if (plen > max_len) max_len = plen;
    int32_t prev = 0;
    bool saw_match = false;
    bool pruned = false;
    for (int64_t d = 0; d < plen; ++d) {
      uint8_t b = p[d];
      saw_match = saw_match || !st[prev].matches.empty();
      if (leftmost_first && saw_match) {
        pruned = true;
        break;
      }
      set_class_boundary(b);
      if (case_insensitive) set_class_boundary(OppositeAsciiCase(b));
      int32_t next = st[prev].Find(b);
      if (next < 0) {
        next = static_cast<int32_t>(st.size());
        st.emplace_back();
        st.back().depth = static_cast<int32_t>(d + 1);
        st[prev].Insert(b, next);
        if (case_insensitive) st[prev].Insert(OppositeAsciiCase(b), next);
      }
      prev = next;
    }
    if (!pruned) st[prev].matches.push_back(static_cast<int32_t>(pid));
  }
  if (n_patterns == 0) min_len = 0;
  out->min_pattern_len = static_cast<int32_t>(min_len);
  out->max_pattern_len = static_cast<int32_t>(max_len);

  // --- byte classes ------------------------------------------------
  out->classes.resize(256, 0);
  if (any_boundary) {
    uint8_t cls = 0;
    for (int b = 0; b < 256; ++b) {
      out->classes[b] = cls;
      if (boundary[b] && b < 255) ++cls;
    }
    out->alphabet_len = out->classes[255] + 1;
  } else {
    out->alphabet_len = 1;
  }

  // --- BFS failure fill (matches Python compile_nfa) ---------------
  const int64_t n_host = static_cast<int64_t>(st.size());
  std::vector<int32_t> fail(n_host, 0);
  std::deque<int32_t> queue;
  std::unordered_set<int32_t> seen;
  const bool use_seen = case_insensitive != 0;

  auto follow_host = [&](int32_t sid, uint8_t b) -> int32_t {
    int32_t next = st[sid].Find(b);
    if (next >= 0) return next;
    if (sid == 0) return 0;  // root self-loop
    return -2;               // FAIL
  };

  for (const auto& e : st[0].edges) {  // byte-sorted
    int32_t next = e.second;
    if (next == 0 || (use_seen && seen.count(next))) continue;
    queue.push_back(next);
    if (use_seen) seen.insert(next);
    if (leftmost && !st[next].matches.empty()) fail[next] = HOST_DEAD;
  }
  while (!queue.empty()) {
    int32_t sid = queue.front();
    queue.pop_front();
    for (const auto& e : st[sid].edges) {
      int32_t next = e.second;
      uint8_t b = e.first;
      if (use_seen && seen.count(next)) continue;
      queue.push_back(next);
      if (use_seen) seen.insert(next);
      if (leftmost && !st[next].matches.empty()) {
        fail[next] = HOST_DEAD;
        continue;
      }
      int32_t f = fail[sid];
      if (f == HOST_DEAD) {
        fail[next] = HOST_DEAD;
        continue;
      }
      int32_t nf;
      while (true) {
        nf = follow_host(f, b);
        if (nf != -2) break;
        f = fail[f];
        if (f == HOST_DEAD) {
          nf = HOST_DEAD;
          break;
        }
      }
      fail[next] = nf;
      if (nf != HOST_DEAD) {
        auto& dst = st[next].matches;
        const auto& src = st[nf].matches;
        dst.insert(dst.end(), src.begin(), src.end());
      }
    }
    if (!leftmost) {
      auto& dst = st[sid].matches;
      const auto& src = st[0].matches;
      dst.insert(dst.end(), src.begin(), src.end());
    }
  }

  const bool root_is_match = !st[0].matches.empty();
  out->start_loop_open = !(leftmost && root_is_match);

  // --- final ID remapping (matches Python flatten) -----------------
  std::vector<int32_t> remap(n_host, 0);
  int32_t next_id = 2;
  int32_t n_match_nonroot = 0;
  for (int64_t s_i = 0; s_i < n_host; ++s_i) {
    if (s_i != 0 && !st[s_i].matches.empty()) {
      remap[s_i] = next_id++;
      ++n_match_nonroot;
    }
  }
  remap[0] = next_id;
  const int32_t su = next_id, sa = next_id + 1;
  next_id += 2;
  out->max_match_id = root_is_match ? sa : 1 + n_match_nonroot;
  for (int64_t s_i = 1; s_i < n_host; ++s_i) {
    if (st[s_i].matches.empty()) remap[s_i] = next_id++;
  }
  const int32_t num_states = next_id;
  out->num_states = num_states;
  out->start_unanchored_id = su;
  out->start_anchored_id = sa;

  out->fail.assign(num_states, 0);
  out->depth.assign(num_states, 0);
  for (int64_t s_i = 0; s_i < n_host; ++s_i) {
    int32_t f = fail[s_i];
    out->fail[remap[s_i]] = (f == HOST_DEAD) ? 0 : remap[f];
    out->depth[remap[s_i]] = st[s_i].depth;
  }
  out->fail[su] = out->start_loop_open ? su : 0;
  out->fail[sa] = 0;

  // match CSR (anchored start shares root's matches)
  out->match_starts.assign(num_states + 1, 0);
  for (int64_t s_i = 0; s_i < n_host; ++s_i)
    out->match_starts[remap[s_i] + 1] =
        static_cast<int32_t>(st[s_i].matches.size());
  out->match_starts[sa + 1] = static_cast<int32_t>(st[0].matches.size());
  for (int32_t i = 0; i < num_states; ++i)
    out->match_starts[i + 1] += out->match_starts[i];
  out->match_pids.assign(out->match_starts[num_states], 0);
  for (int64_t s_i = 0; s_i < n_host; ++s_i) {
    int32_t lo = out->match_starts[remap[s_i]];
    for (size_t k = 0; k < st[s_i].matches.size(); ++k)
      out->match_pids[lo + k] = st[s_i].matches[k];
  }
  {
    int32_t lo = out->match_starts[sa];
    for (size_t k = 0; k < st[0].matches.size(); ++k)
      out->match_pids[lo + k] = st[0].matches[k];
  }

  // transition CSR: root materialized as a full 256-row with the
  // self-loop (or DEAD-closed) entries; anchored start = root's trie
  // edges only.
  out->trans_starts.assign(num_states + 1, 0);
  for (int64_t s_i = 0; s_i < n_host; ++s_i)
    out->trans_starts[remap[s_i] + 1] =
        (s_i == 0) ? 256 : static_cast<int32_t>(st[s_i].edges.size());
  out->trans_starts[sa + 1] = static_cast<int32_t>(st[0].edges.size());
  for (int32_t i = 0; i < num_states; ++i)
    out->trans_starts[i + 1] += out->trans_starts[i];
  const int64_t nnz = out->trans_starts[num_states];
  out->trans_bytes.assign(nnz, 0);
  out->trans_next.assign(nnz, 0);
  for (int64_t s_i = 0; s_i < n_host; ++s_i) {
    int32_t lo = out->trans_starts[remap[s_i]];
    if (s_i == 0) {
      const int32_t loop_target = out->start_loop_open ? su : 0;
      int32_t row[256];
      for (int b = 0; b < 256; ++b) row[b] = loop_target;
      for (const auto& e : st[0].edges) row[e.first] = remap[e.second];
      for (int b = 0; b < 256; ++b) {
        out->trans_bytes[lo + b] = static_cast<uint8_t>(b);
        out->trans_next[lo + b] = row[b];
      }
    } else {
      for (size_t k = 0; k < st[s_i].edges.size(); ++k) {
        out->trans_bytes[lo + k] = st[s_i].edges[k].first;
        out->trans_next[lo + k] = remap[st[s_i].edges[k].second];
      }
    }
  }
  {
    int32_t lo = out->trans_starts[sa];
    for (size_t k = 0; k < st[0].edges.size(); ++k) {
      out->trans_bytes[lo + k] = st[0].edges[k].first;
      out->trans_next[lo + k] = remap[st[0].edges[k].second];
    }
  }
  return out;
}

}  // namespace

extern "C" {

struct AcSizes {
  int32_t num_states;
  int32_t alphabet_len;
  int32_t max_match_id;
  int32_t start_unanchored_id;
  int32_t start_anchored_id;
  int32_t start_loop_open;
  int32_t min_pattern_len;
  int32_t max_pattern_len;
  int64_t match_nnz;
  int64_t trans_nnz;
};

void* ac_compile(const uint8_t* pat_bytes, const int64_t* pat_offsets,
                 int64_t n_patterns, int match_kind, int case_insensitive,
                 AcSizes* sizes) {
  BuildResult* r =
      Compile(pat_bytes, pat_offsets, n_patterns, match_kind,
              case_insensitive);
  sizes->num_states = r->num_states;
  sizes->alphabet_len = r->alphabet_len;
  sizes->max_match_id = r->max_match_id;
  sizes->start_unanchored_id = r->start_unanchored_id;
  sizes->start_anchored_id = r->start_anchored_id;
  sizes->start_loop_open = r->start_loop_open;
  sizes->min_pattern_len = r->min_pattern_len;
  sizes->max_pattern_len = r->max_pattern_len;
  sizes->match_nnz = static_cast<int64_t>(r->match_pids.size());
  sizes->trans_nnz = static_cast<int64_t>(r->trans_next.size());
  return r;
}

void ac_copy(void* handle, int32_t* fail, int32_t* depth,
             int32_t* match_starts, int32_t* match_pids,
             int32_t* trans_starts, uint8_t* trans_bytes,
             int32_t* trans_next, uint8_t* classes,
             int32_t* pattern_lens) {
  auto* r = static_cast<BuildResult*>(handle);
  std::memcpy(fail, r->fail.data(), r->fail.size() * 4);
  std::memcpy(depth, r->depth.data(), r->depth.size() * 4);
  std::memcpy(match_starts, r->match_starts.data(),
              r->match_starts.size() * 4);
  if (!r->match_pids.empty())
    std::memcpy(match_pids, r->match_pids.data(), r->match_pids.size() * 4);
  std::memcpy(trans_starts, r->trans_starts.data(),
              r->trans_starts.size() * 4);
  if (!r->trans_bytes.empty()) {
    std::memcpy(trans_bytes, r->trans_bytes.data(), r->trans_bytes.size());
    std::memcpy(trans_next, r->trans_next.data(), r->trans_next.size() * 4);
  }
  std::memcpy(classes, r->classes.data(), 256);
  if (!r->pattern_lens.empty())
    std::memcpy(pattern_lens, r->pattern_lens.data(),
                r->pattern_lens.size() * 4);
}

void ac_free(void* handle) { delete static_cast<BuildResult*>(handle); }

// ---------------------------------------------------------------------
// Native dense-DFA search: the host fallback engine for pattern sets
// beyond the bit-parallel kernel's bounds. This is the reference's hot
// loop shape (one dependent table load per byte, automaton.rs:1284-1420
// / dfa.rs:218-226) running at native speed (~1 GB/s), used when the
// TPU formulations cannot help (very large automatons are gather-bound
// and TPUs have no fast gather).

// Overlapping-match count: sum of match_count[state] over the walk.
//
// The walk is one dependent table load per byte; a single chain is
// latency-bound, so the haystack is split into `kLanes` segments walked
// in one interleaved loop (independent dependency chains hide the load
// latency — the same trick the blocked TPU scan uses with 1024 lanes).
// Each segment after the first warms up over a `halo` of preceding
// bytes (the suffix property; util/buffer.rs:113-123).
static int64_t DfaCountRange(const int32_t* trans, const uint8_t* classes,
                             const int32_t* match_count, const uint8_t* hay,
                             int64_t b, int64_t e, int64_t a,
                             int32_t start_id, int64_t halo) {
  constexpr int kLanes = 8;
  const int64_t len = e - b;
  if (len <= 0) return 0;
  if (len < kLanes * (halo + 64)) {  // tiny range: single chain
    int64_t total = 0;
    int32_t s = start_id;
    for (int64_t i = std::max<int64_t>(0, b - halo); i < b; ++i) {
      s = trans[static_cast<int64_t>(s) * a + classes[hay[i]]];
    }
    for (int64_t i = b; i < e; ++i) {
      s = trans[static_cast<int64_t>(s) * a + classes[hay[i]]];
      total += match_count[s];
    }
    return total;
  }
  const int64_t seg = (len + kLanes - 1) / kLanes;
  int64_t begin[kLanes], end[kLanes];
  int32_t s[kLanes];
  int64_t total = 0;
  for (int lane = 0; lane < kLanes; ++lane) {
    begin[lane] = b + lane * seg;
    end[lane] = std::min(e, begin[lane] + seg);
    // Halo warmup (not counted; a segment at the true start of the
    // haystack gets no warmup and starts at the unanchored start state).
    int32_t st = start_id;
    for (int64_t i = std::max<int64_t>(0, begin[lane] - halo);
         i < begin[lane]; ++i) {
      st = trans[static_cast<int64_t>(st) * a + classes[hay[i]]];
    }
    s[lane] = st;
  }
  for (int64_t off = 0; off < seg; ++off) {
    for (int lane = 0; lane < kLanes; ++lane) {
      const int64_t i = begin[lane] + off;
      if (i < end[lane]) {
        s[lane] =
            trans[static_cast<int64_t>(s[lane]) * a + classes[hay[i]]];
        total += match_count[s[lane]];
      }
    }
  }
  return total;
}

int64_t ac_dfa_count(const int32_t* trans, const uint8_t* classes,
                     const int32_t* match_count, const uint8_t* hay,
                     int64_t n, int32_t alphabet_len, int32_t start_id,
                     int64_t halo) {
  return DfaCountRange(trans, classes, match_count, hay, 0, n,
                       alphabet_len, start_id, halo);
}

// Multithreaded count: contiguous haystack shards, one per thread, each
// warmed up over `halo` preceding bytes — the host-core analog of the
// multi-chip shard_map path (parallel/shard.py), with the same stitching
// contract as the stream roll buffer (util/buffer.rs:113-123).
int64_t ac_dfa_count_mt(const int32_t* trans, const uint8_t* classes,
                        const int32_t* match_count, const uint8_t* hay,
                        int64_t n, int32_t alphabet_len, int32_t start_id,
                        int64_t halo, int32_t n_threads) {
  if (n_threads > n / (halo + 4096) + 1) {
    n_threads = static_cast<int32_t>(n / (halo + 4096) + 1);
  }
  if (n_threads <= 1) {
    return DfaCountRange(trans, classes, match_count, hay, 0, n,
                         alphabet_len, start_id, halo);
  }
  std::vector<int64_t> totals(n_threads, 0);
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min(n, b + chunk);
    threads.emplace_back([=, &totals] {
      totals[t] = DfaCountRange(trans, classes, match_count, hay, b, e,
                                alphabet_len, start_id, halo);
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (int64_t v : totals) total += v;
  return total;
}

// Compacted match positions: writes 1-based end offsets and state IDs
// for every position whose state is a match state (2 <= s <=
// max_match_id). Returns the total number of match positions; only the
// first `cap` are written (caller re-calls with a larger cap if
// needed).
int64_t ac_dfa_positions(const int32_t* trans, const uint8_t* classes,
                         const uint8_t* hay, int64_t n,
                         int32_t alphabet_len, int32_t start_id,
                         int32_t max_match_id, int64_t* out_pos,
                         int32_t* out_sid, int64_t cap) {
  int64_t cnt = 0;
  int32_t s = start_id;
  const int64_t a = alphabet_len;
  for (int64_t i = 0; i < n; ++i) {
    s = trans[static_cast<int64_t>(s) * a + classes[hay[i]]];
    if (s >= 2 && s <= max_match_id) {
      if (cnt < cap) {
        out_pos[cnt] = i + 1;
        out_sid[cnt] = s;
      }
      ++cnt;
    }
  }
  return cnt;
}

// Multithreaded positions: per-thread shards with halo warmup collect
// into local buffers, merged in haystack order. Returns the total match
// position count; only the first `cap` pairs are written.
int64_t ac_dfa_positions_mt(const int32_t* trans, const uint8_t* classes,
                            const uint8_t* hay, int64_t n,
                            int32_t alphabet_len, int32_t start_id,
                            int32_t max_match_id, int64_t halo,
                            int64_t* out_pos, int32_t* out_sid,
                            int64_t cap, int32_t n_threads) {
  if (n_threads > n / (halo + 4096) + 1) {
    n_threads = static_cast<int32_t>(n / (halo + 4096) + 1);
  }
  if (n_threads <= 1) {
    return ac_dfa_positions(trans, classes, hay, n, alphabet_len,
                            start_id, max_match_id, out_pos, out_sid,
                            cap);
  }
  const int64_t a = alphabet_len;
  struct Local {
    std::vector<int64_t> pos;
    std::vector<int32_t> sid;
  };
  std::vector<Local> locals(n_threads);
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min(n, b + chunk);
    threads.emplace_back([=, &locals] {
      Local& lc = locals[t];
      int32_t s = start_id;
      for (int64_t i = std::max<int64_t>(0, b - halo); i < b; ++i) {
        s = trans[static_cast<int64_t>(s) * a + classes[hay[i]]];
      }
      for (int64_t i = b; i < e; ++i) {
        s = trans[static_cast<int64_t>(s) * a + classes[hay[i]]];
        if (s >= 2 && s <= max_match_id) {
          lc.pos.push_back(i + 1);
          lc.sid.push_back(s);
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  int64_t cnt = 0;
  for (const Local& lc : locals) {
    for (size_t i = 0; i < lc.pos.size(); ++i) {
      if (cnt < cap) {
        out_pos[cnt] = lc.pos[i];
        out_sid[cnt] = lc.sid[i];
      }
      ++cnt;
    }
  }
  return cnt;
}

}  // extern "C"
