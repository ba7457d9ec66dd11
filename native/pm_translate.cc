// Native translate core: delta entries -> profile coordinates.
//
// The reference's production translate is C++ (lib/m_translate/
// m_translate.cc) because the coordinate walk is the merge hot path.
// This implementation executes the same column-space semantics as
// paramugsy_tpu/profiles/translate.py (which is the behavioral spec,
// tested by a matched-pair oracle): walk the overlap window of a delta
// entry against one (left, right) profile pair, advance profile indices
// incrementally past profile gaps, split output entries at index jumps,
// trim to match columns, and emit gap runs.
//
// Data marshalling is flat arrays over ctypes; profiles are referenced by
// their input order.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct GapList {
  const int32_t* start;
  const int32_t* end;
  int32_t n;
};

// Direction-carrying range.
struct Rng {
  int64_t s, e;
  bool fwd() const { return s <= e; }
  int64_t lo() const { return std::min(s, e); }
  int64_t hi() const { return std::max(s, e); }
  int64_t len() const { return hi() - lo() + 1; }
};

// profile_idx_of_seq_idx for a gapped interval: offset = |start - si| + 1,
// then accumulate gaps with gap_start <= offset + consumed.
int64_t profile_idx_of_seq_idx(const Rng& range, const GapList& gaps, int64_t si) {
  int64_t offset = std::llabs(range.s - si) + 1;
  int64_t acc = 0;
  for (int32_t g = 0; g < gaps.n; ++g) {
    if (gaps.start[g] <= offset + acc) {
      acc += gaps.end[g] - gaps.start[g] + 1;
    } else {
      break;
    }
  }
  return offset + acc;
}

struct OutBuf {
  int32_t* lp;
  int32_t* rp;
  int32_t* ref_start;
  int32_t* ref_end;
  int32_t* query_start;
  int32_t* query_end;
  int32_t* gap_off;   // [cap_entries + 1]
  int32_t* gap_side;  // 0 ref, 1 query
  int32_t* gap_s;
  int32_t* gap_e;
  int32_t cap_entries;
  int32_t cap_gaps;
  int32_t n_entries = 0;
  int32_t n_gaps = 0;
  bool overflow = false;

  void emit(int32_t lpi, int32_t rpi, int64_t rs, int64_t re, int64_t qs,
            int64_t qe, const std::vector<int32_t>& runs) {
    if (n_entries >= cap_entries || n_gaps + (int32_t)(runs.size() / 3) > cap_gaps) {
      overflow = true;
      return;
    }
    lp[n_entries] = lpi;
    rp[n_entries] = rpi;
    ref_start[n_entries] = (int32_t)rs;
    ref_end[n_entries] = (int32_t)re;
    query_start[n_entries] = (int32_t)qs;
    query_end[n_entries] = (int32_t)qe;
    gap_off[n_entries] = n_gaps;
    for (size_t k = 0; k < runs.size(); k += 3) {
      gap_side[n_gaps] = runs[k];
      gap_s[n_gaps] = runs[k + 1];
      gap_e[n_gaps] = runs[k + 2];
      ++n_gaps;
    }
    ++n_entries;
    gap_off[n_entries] = n_gaps;
  }
};

// Incremental profile-index walker: starts at a profile idx, advances one
// sequence position at a time, skipping profile gaps.
struct IdxWalker {
  const GapList* gaps;
  int32_t g = 0;        // next gap not yet consumed
  int64_t pi = 0;       // current profile idx (on a non-gap column)
  int64_t jump = 0;     // gap columns skipped on the last advance

  void init(const GapList* gl, int64_t start_pi) {
    gaps = gl;
    pi = start_pi;
    // position gap pointer past gaps before start_pi
    g = 0;
    while (g < gl->n && gl->end[g] < start_pi) ++g;
  }

  void advance() {  // move to the next consumed position
    int64_t next = pi + 1;
    jump = 0;
    while (g < gaps->n && gaps->start[g] <= next) {
      int64_t glen = gaps->end[g] - gaps->start[g] + 1;
      next += glen;
      jump += glen;
      ++g;
    }
    pi = next;
  }
};

// One (delta, lp, rp) combination.
void translate_one(
    const Rng& de_ref, const Rng& de_query,
    const GapList& de_rgaps, const GapList& de_qgaps,
    int32_t lp_i, const Rng& lp_range, const GapList& lp_gaps, int64_t lp_len,
    int32_t rp_i, const Rng& rp_range, const GapList& rp_gaps, int64_t rp_len,
    OutBuf& out) {
  // seq-space overlaps
  int64_t ro_s = std::max(de_ref.lo(), lp_range.lo());
  int64_t ro_e = std::min(de_ref.hi(), lp_range.hi());
  if (ro_s > ro_e) return;
  int64_t qo_s = std::max(de_query.lo(), rp_range.lo());
  int64_t qo_e = std::min(de_query.hi(), rp_range.hi());
  if (qo_s > qo_e) return;

  // Reverse the delta if its ref direction differs from lp's.
  bool rev = de_ref.fwd() != lp_range.fwd();
  int64_t alen = de_ref.len();
  for (int32_t g = 0; g < de_rgaps.n; ++g)
    alen += de_rgaps.end[g] - de_rgaps.start[g] + 1;

  Rng ref2 = de_ref, query2 = de_query;
  std::vector<int32_t> rg_s, rg_e, qg_s, qg_e;
  GapList rgaps = de_rgaps, qgaps = de_qgaps;
  if (rev) {
    ref2 = {de_ref.e, de_ref.s};
    query2 = {de_query.e, de_query.s};
    rg_s.resize(de_rgaps.n); rg_e.resize(de_rgaps.n);
    for (int32_t g = 0; g < de_rgaps.n; ++g) {
      rg_s[de_rgaps.n - 1 - g] = (int32_t)(alen - de_rgaps.end[g] + 1);
      rg_e[de_rgaps.n - 1 - g] = (int32_t)(alen - de_rgaps.start[g] + 1);
    }
    qg_s.resize(de_qgaps.n); qg_e.resize(de_qgaps.n);
    for (int32_t g = 0; g < de_qgaps.n; ++g) {
      qg_s[de_qgaps.n - 1 - g] = (int32_t)(alen - de_qgaps.end[g] + 1);
      qg_e[de_qgaps.n - 1 - g] = (int32_t)(alen - de_qgaps.start[g] + 1);
    }
    rgaps = {rg_s.data(), rg_e.data(), de_rgaps.n};
    qgaps = {qg_s.data(), qg_e.data(), de_qgaps.n};
  }

  // Overlap window in delta-column space.
  int64_t dr_a = profile_idx_of_seq_idx(ref2, rgaps, ro_s);
  int64_t dr_b = profile_idx_of_seq_idx(ref2, rgaps, ro_e);
  if (dr_a > dr_b) std::swap(dr_a, dr_b);
  int64_t dq_a = profile_idx_of_seq_idx(query2, qgaps, qo_s);
  int64_t dq_b = profile_idx_of_seq_idx(query2, qgaps, qo_e);
  if (dq_a > dq_b) std::swap(dq_a, dq_b);
  int64_t w0 = std::max(dr_a, dq_a), w1 = std::min(dr_b, dq_b);
  if (w0 > w1) return;

  bool reversed_mp = rp_range.fwd() != query2.fwd();

  // Column walk state.
  int32_t rgi = 0, qgi = 0;  // delta gap pointers
  while (rgi < rgaps.n && rgaps.end[rgi] < w0) ++rgi;
  while (qgi < qgaps.n && qgaps.end[qgi] < w0) ++qgi;

  // Current seq positions BEFORE the window (so first consumption lands
  // on the right value): count consuming columns before w0.
  auto consumed_before = [](const Rng& r, const GapList& gl, int64_t col) {
    // number of consuming columns in [1, col)
    int64_t gaps_before = 0;
    for (int32_t g = 0; g < gl.n; ++g) {
      if (gl.end[g] < col) gaps_before += gl.end[g] - gl.start[g] + 1;
      else if (gl.start[g] < col) gaps_before += col - gl.start[g];
      else break;
    }
    return (col - 1) - gaps_before;
  };
  int64_t r_cons = consumed_before(ref2, rgaps, w0);
  int64_t q_cons = consumed_before(query2, qgaps, w0);
  int64_t r_dir = ref2.fwd() ? 1 : -1;
  int64_t q_dir = query2.fwd() ? 1 : -1;
  int64_t r_seq = ref2.s + r_dir * (r_cons - 1);  // last consumed (may be before range: handled on first advance)
  int64_t q_seq = query2.s + q_dir * (q_cons - 1);

  // lp / rp profile-index walkers (meta space for rp when reversed).
  IdxWalker lw, rw;
  bool lw_init = false, rw_init = false;
  std::vector<int32_t> rp_meta_s, rp_meta_e;
  GapList rp_walk_gaps = rp_gaps;
  if (reversed_mp) {
    rp_meta_s.resize(rp_gaps.n); rp_meta_e.resize(rp_gaps.n);
    for (int32_t g = 0; g < rp_gaps.n; ++g) {
      rp_meta_s[rp_gaps.n - 1 - g] = (int32_t)(rp_len - rp_gaps.end[g] + 1);
      rp_meta_e[rp_gaps.n - 1 - g] = (int32_t)(rp_len - rp_gaps.start[g] + 1);
    }
    rp_walk_gaps = {rp_meta_s.data(), rp_meta_e.data(), rp_gaps.n};
  }

  // Segment accumulation (trimmed to match columns).
  struct Seg {
    bool open = false;
    int64_t ref_a = 0, ref_b = 0, meta_a = 0, meta_b = 0;
    int64_t col_of_last_match = 0;  // local column count at last match
    int64_t cols = 0;               // columns since first match (trimmed)
    std::vector<int32_t> runs;      // (side, start, end)*
    int64_t run_side = -1, run_start = 0;
  } seg;

  auto close_run = [&](int64_t at_col) {
    if (seg.run_side >= 0) {
      seg.runs.push_back((int32_t)seg.run_side);
      seg.runs.push_back((int32_t)seg.run_start);
      seg.runs.push_back((int32_t)at_col);
      seg.run_side = -1;
    }
  };
  auto flush_seg = [&](OutBuf& ob) {
    if (!seg.open) return;
    // trim trailing non-match columns: drop runs past col_of_last_match
    close_run(seg.cols);
    std::vector<int32_t> trimmed;
    for (size_t k = 0; k < seg.runs.size(); k += 3) {
      if (seg.runs[k + 1] > seg.col_of_last_match) continue;  // fully after last match
      int32_t e = std::min((int64_t)seg.runs[k + 2], seg.col_of_last_match);
      trimmed.push_back(seg.runs[k]);
      trimmed.push_back(seg.runs[k + 1]);
      trimmed.push_back(e);
    }
    int64_t q_a = reversed_mp ? rp_len - seg.meta_a + 1 : seg.meta_a;
    int64_t q_b = reversed_mp ? rp_len - seg.meta_b + 1 : seg.meta_b;
    ob.emit(lp_i, rp_i, seg.ref_a, seg.ref_b, q_a, q_b, trimmed);
    seg = Seg{};
  };

  for (int64_t c = w0; c <= w1; ++c) {
    bool r_gap = rgi < rgaps.n && rgaps.start[rgi] <= c && c <= rgaps.end[rgi];
    if (rgi < rgaps.n && c == rgaps.end[rgi]) ++rgi;
    bool q_gap = qgi < qgaps.n && qgaps.start[qgi] <= c && c <= qgaps.end[qgi];
    if (qgi < qgaps.n && c == qgaps.end[qgi]) ++qgi;

    bool split = false;
    if (!r_gap) {
      r_seq += r_dir;
      int64_t pi = 0;
      if (!lw_init) {
        pi = profile_idx_of_seq_idx(lp_range, lp_gaps, r_seq);
        lw.init(&lp_gaps, pi);
        lw_init = true;
      } else {
        lw.advance();
        if (lw.jump > 0) split = true;
      }
    }
    if (!q_gap) {
      q_seq += q_dir;
      if (!rw_init) {
        int64_t raw = profile_idx_of_seq_idx(rp_range, rp_gaps, q_seq);
        int64_t meta = reversed_mp ? rp_len - raw + 1 : raw;
        rw.init(&rp_walk_gaps, meta);
        rw_init = true;
      } else {
        rw.advance();
        if (rw.jump > 0) split = true;
      }
    }

    if (split) flush_seg(out);

    bool is_match = !r_gap && !q_gap;
    if (!seg.open) {
      if (!is_match) continue;  // leading non-match columns trimmed
      seg.open = true;
      seg.ref_a = lw.pi;
      seg.meta_a = rw.pi;
      seg.cols = 0;
    }
    seg.cols += 1;
    if (is_match) {
      seg.ref_b = lw.pi;
      seg.meta_b = rw.pi;
      seg.col_of_last_match = seg.cols;
      close_run(seg.cols - 1);
    } else {
      int64_t side = r_gap ? 0 : 1;
      if (seg.run_side != side) {
        close_run(seg.cols - 1);
        seg.run_side = side;
        seg.run_start = seg.cols;
      }
    }
  }
  flush_seg(out);
}

struct ProfileRef {
  int32_t index;  // original input index
  Rng range;
  GapList gaps;
  int64_t length;
};

}  // namespace

extern "C" {

// Translate a delta stream through two profile sets.
//
// Profile arrays (per side, count n): seq_id, start, end, length
// (int32[n]); gap_off (int32[n+1]); gap_start/gap_end flat.
// Delta arrays (count m): ref_seq_id, query_seq_id, rs, re, qs, qe
// (int32[m]); rgap_off/qgap_off (int32[m+1]) with flat gap arrays.
// Output: see OutBuf fields; o_delta[int32] records the source delta of
// each output entry.  Returns entry count, or -1 on overflow.
int32_t pm_translate(
    // left profiles
    int32_t ln, const int32_t* l_seq, const int32_t* l_start, const int32_t* l_end,
    const int32_t* l_len, const int32_t* l_goff, const int32_t* l_gs, const int32_t* l_ge,
    // right profiles
    int32_t rn, const int32_t* r_seq, const int32_t* r_start, const int32_t* r_end,
    const int32_t* r_len, const int32_t* r_goff, const int32_t* r_gs, const int32_t* r_ge,
    // deltas
    int32_t dn, const int32_t* d_rseq, const int32_t* d_qseq,
    const int32_t* d_rs, const int32_t* d_re, const int32_t* d_qs, const int32_t* d_qe,
    const int32_t* d_rgoff, const int32_t* d_rgs, const int32_t* d_rge,
    const int32_t* d_qgoff, const int32_t* d_qgs, const int32_t* d_qge,
    // outputs
    int32_t* o_delta, int32_t* o_lp, int32_t* o_rp,
    int32_t* o_ref_start, int32_t* o_ref_end,
    int32_t* o_query_start, int32_t* o_query_end,
    int32_t* o_gap_off, int32_t* o_gap_side, int32_t* o_gap_s, int32_t* o_gap_e,
    int32_t cap_entries, int32_t cap_gaps) {
  // Group profiles by seq id, sorted by abs start (stable on input order
  // like the Python _ProfileIndex).
  auto build = [](int32_t n, const int32_t* seq, const int32_t* start,
                  const int32_t* end, const int32_t* len, const int32_t* goff,
                  const int32_t* gs, const int32_t* ge) {
    std::vector<std::pair<int32_t, ProfileRef>> flat;
    flat.reserve(n);
    for (int32_t i = 0; i < n; ++i) {
      ProfileRef pr;
      pr.index = i;
      pr.range = {start[i], end[i]};
      pr.gaps = {gs + goff[i], ge + goff[i], goff[i + 1] - goff[i]};
      pr.length = len[i];
      flat.push_back({seq[i], pr});
    }
    std::stable_sort(flat.begin(), flat.end(),
                     [](const auto& a, const auto& b) {
                       if (a.first != b.first) return a.first < b.first;
                       return a.second.range.lo() < b.second.range.lo();
                     });
    return flat;
  };
  auto left = build(ln, l_seq, l_start, l_end, l_len, l_goff, l_gs, l_ge);
  auto right = build(rn, r_seq, r_start, r_end, r_len, r_goff, r_gs, r_ge);

  OutBuf out{o_lp, o_rp, o_ref_start, o_ref_end, o_query_start, o_query_end,
             o_gap_off, o_gap_side, o_gap_s, o_gap_e, cap_entries, cap_gaps};
  out.gap_off[0] = 0;

  auto lower = [](const std::vector<std::pair<int32_t, ProfileRef>>& v,
                  int32_t seq) {
    return std::lower_bound(
        v.begin(), v.end(), seq,
        [](const std::pair<int32_t, ProfileRef>& a, int32_t s) {
          return a.first < s;
        });
  };

  for (int32_t d = 0; d < dn; ++d) {
    Rng de_ref{d_rs[d], d_re[d]}, de_query{d_qs[d], d_qe[d]};
    GapList de_rg{d_rgs + d_rgoff[d], d_rge + d_rgoff[d], d_rgoff[d + 1] - d_rgoff[d]};
    GapList de_qg{d_qgs + d_qgoff[d], d_qge + d_qgoff[d], d_qgoff[d + 1] - d_qgoff[d]};
    for (auto li = lower(left, d_rseq[d]);
         li != left.end() && li->first == d_rseq[d]; ++li) {
      const ProfileRef& lp = li->second;
      if (lp.range.lo() > de_ref.hi() || lp.range.hi() < de_ref.lo()) continue;
      for (auto ri = lower(right, d_qseq[d]);
           ri != right.end() && ri->first == d_qseq[d]; ++ri) {
        const ProfileRef& rp = ri->second;
        if (rp.range.lo() > de_query.hi() || rp.range.hi() < de_query.lo()) continue;
        int32_t before = out.n_entries;
        translate_one(de_ref, de_query, de_rg, de_qg,
                      lp.index, lp.range, lp.gaps, lp.length,
                      rp.index, rp.range, rp.gaps, rp.length, out);
        for (int32_t k = before; k < out.n_entries; ++k) o_delta[k] = d;
        if (out.overflow) return -1;
      }
    }
  }
  return out.n_entries;
}

}  // extern "C"
