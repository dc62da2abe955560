// mem_align1_core in C++: chain -> filter -> extend -> dedup/patch.
//
// Native port of lariat_tpu/align/{chaining,extension}.py (which are the
// executable reference; the existing Python path is kept and the two are
// asserted bit-identical by tests/fuzz). Consumes the SMEM intervals +
// SA-dereferenced positions that fm_collect_seeds_batch / fm_sa_lookup_batch
// (seed.cpp) produce, and emits mem_alnreg_t-equivalent regions.
//
// Reference behavior consumed via gobwa/gobwa.go:181-187 (mem_align1_core).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {
void ksw_extend_one(const uint8_t* query, int qlen, const uint8_t* target,
                    int tlen, int o_del, int e_del, int o_ins, int e_ins,
                    int w, int end_bonus, int zdrop, int h0, int match_sc,
                    int mismatch_sc, int n_sc, int32_t* out);
int32_t ksw_global_one(const uint8_t* query, int qlen, const uint8_t* target,
                       int tlen, int o_del, int e_del, int o_ins, int e_ins,
                       int w, int match_sc, int mismatch_sc, int n_sc,
                       int32_t* score_out, int32_t* cigar_out,
                       int32_t cigar_cap);
}

namespace {

constexpr int MAX_BAND_TRY = 2;
constexpr double PATCH_MAX_R_BW = 0.15;
constexpr double PATCH_MIN_SC_RATIO = 0.90;

inline int score_sub_pub(uint8_t q, uint8_t t, int match_sc, int mismatch_sc,
                         int n_sc) {
  if (q >= 4 || t >= 4) return n_sc;
  return q == t ? match_sc : mismatch_sc;
}

struct Opt {
  int match, mismatch, n_sc;
  int o_del, e_del, o_ins, e_ins;
  int pen_clip5, pen_clip3, zdrop;
  int64_t band_width, max_chain_gap, max_occ;
  int64_t min_seed_len, min_chain_weight, max_chain_extend;
  double mask_level, mask_level_redun, drop_ratio;
};

struct Seed {
  int64_t rbeg, qbeg, len, score;
};

struct Chain {
  int64_t pos;
  int rid;
  std::vector<Seed> seeds;
  int64_t w = 0;
  int kept = 0;
  int first = -1;
};

struct Reg {
  int64_t rb = 0, re = 0, qb = 0, qe = 0;
  int rid = -1;
  int64_t score = -1, truesc = -1, sub = 0, csub = 0;
  int64_t seedcov = 0, w = 0, seedlen0 = 0, n_comp = 1;
};

struct Genome {
  const uint8_t* pac;
  int64_t l_pac;
  const int64_t* contig_offs;  // sorted start offsets
  int64_t n_contigs;

  inline uint8_t code(int64_t i) const {
    return (pac[i >> 2] >> ((3 - (i & 3)) * 2)) & 3;
  }
  // fetch_fmd: codes of the doubled text [start, end), no strand crossing
  void fetch(int64_t start, int64_t end, std::vector<uint8_t>& out) const {
    int64_t seq_len = 2 * l_pac;
    start = std::max<int64_t>(start, 0);
    end = std::min(end, seq_len);
    out.clear();
    if (end <= start) return;
    if (end <= l_pac) {
      out.resize(end - start);
      for (int64_t i = start; i < end; ++i) out[i - start] = code(i);
    } else if (start >= l_pac) {
      int64_t fb = seq_len - end, fe = seq_len - start;
      out.resize(fe - fb);
      for (int64_t i = fb; i < fe; ++i)
        out[fe - 1 - i] = 3 - code(i);
    }  // crossing: empty (unreachable from the engine flow)
  }
  int pos_to_contig(int64_t pos) const {
    if (n_contigs == 1) return 0;
    // last contig with offset <= pos
    const int64_t* it =
        std::upper_bound(contig_offs, contig_offs + n_contigs, pos);
    return (int)(it - contig_offs) - 1;
  }
  // bns_intv2rid
  int intv2rid(int64_t rb, int64_t re) const {
    int64_t seq_len = 2 * l_pac, b, e;
    if (re <= l_pac) {
      b = rb; e = re;
    } else if (rb >= l_pac) {
      b = seq_len - re; e = seq_len - rb;
    } else {
      return -1;
    }
    if (n_contigs == 1) return 0;
    int rid_b = pos_to_contig(b);
    int rid_e = e > b ? pos_to_contig(e - 1) : rid_b;
    return rid_b == rid_e ? rid_b : -1;
  }
};

inline int64_t cal_max_gap(const Opt& o, int64_t qlen) {
  int64_t l_del = (int64_t)((double)(qlen * o.match - o.o_del) / o.e_del + 1.0);
  int64_t l_ins = (int64_t)((double)(qlen * o.match - o.o_ins) / o.e_ins + 1.0);
  int64_t l = std::max(std::max(l_del, l_ins), (int64_t)1);
  return std::min(l, o.band_width * 2);
}

// mem_chain over precomputed mems (n,5)=[x0,x1,s,qb,qe] + rbegs in
// enumerate_occurrences order; also computes frac_rep.
void chain_seeds(const Genome& g, const Opt& o, int64_t l_query,
                 const int64_t* mems, int64_t n_mems, const int64_t* rbegs,
                 int64_t n_rbegs, std::vector<Chain>& chains,
                 double* frac_rep) {
  // frac_rep
  int64_t l_rep = 0, b = 0, e = 0;
  for (int64_t m = 0; m < n_mems; ++m) {
    int64_t s = mems[m * 5 + 2], qb = mems[m * 5 + 3], qe = mems[m * 5 + 4];
    if (s <= o.max_occ) continue;
    if (qb > e) {
      l_rep += e - b;
      b = qb; e = qe;
    } else {
      e = std::max(e, qe);
    }
  }
  l_rep += e - b;
  *frac_rep = l_query ? (double)l_rep / (double)l_query : 0.0;

  chains.clear();
  std::vector<int64_t> chain_pos;  // sorted, parallel to chains
  int64_t ri = 0;
  for (int64_t m = 0; m < n_mems && ri < n_rbegs; ++m) {
    int64_t s = mems[m * 5 + 2], qb = mems[m * 5 + 3], qe = mems[m * 5 + 4];
    int64_t step = s > o.max_occ ? s / o.max_occ : 1;
    int64_t count = 0;
    for (int64_t k = 0; k < s && count < o.max_occ && ri < n_rbegs;
         k += step, ++count) {
      int64_t rbeg = rbegs[ri++];
      int64_t slen = qe - qb;
      Seed seed{rbeg, qb, slen, slen};
      int rid = g.intv2rid(rbeg, rbeg + slen);
      if (rid < 0) continue;
      // chain with the largest pos <= rbeg
      int64_t idx = (int64_t)(std::upper_bound(chain_pos.begin(),
                                               chain_pos.end(), rbeg)
                              - chain_pos.begin()) - 1;
      bool merged = false;
      if (idx >= 0) {
        Chain& c = chains[idx];
        const Seed& last = c.seeds.back();
        const Seed& first = c.seeds.front();
        int64_t qend = last.qbeg + last.len, rend = last.rbeg + last.len;
        if (rid == c.rid) {
          if (seed.qbeg >= first.qbeg && seed.qbeg + seed.len <= qend
              && seed.rbeg >= first.rbeg && seed.rbeg + seed.len <= rend) {
            merged = true;  // contained
          } else if (!((last.rbeg < g.l_pac || first.rbeg < g.l_pac)
                       && seed.rbeg >= g.l_pac)) {
            int64_t x = seed.qbeg - last.qbeg;
            int64_t y = seed.rbeg - last.rbeg;
            if (y >= 0 && x - y <= o.band_width && y - x <= o.band_width
                && x - last.len < o.max_chain_gap
                && y - last.len < o.max_chain_gap) {
              c.seeds.push_back(seed);
              merged = true;
            }
          }
        }
      }
      if (!merged) {
        int64_t ins = (int64_t)(std::upper_bound(chain_pos.begin(),
                                                 chain_pos.end(), rbeg)
                                - chain_pos.begin());
        chain_pos.insert(chain_pos.begin() + ins, rbeg);
        Chain nc;
        nc.pos = rbeg;
        nc.rid = rid;
        nc.seeds.push_back(seed);
        chains.insert(chains.begin() + ins, std::move(nc));
      }
    }
  }
}

int64_t chain_weight(const Chain& c) {
  int64_t w = 0, end = 0;
  for (const Seed& s : c.seeds) {
    if (s.qbeg >= end) w += s.len;
    else if (s.qbeg + s.len > end) w += s.qbeg + s.len - end;
    end = std::max(end, s.qbeg + s.len);
  }
  int64_t tmp = w;
  w = 0; end = 0;
  for (const Seed& s : c.seeds) {
    if (s.rbeg >= end) w += s.len;
    else if (s.rbeg + s.len > end) w += s.rbeg + s.len - end;
    end = std::max(end, s.rbeg + s.len);
  }
  return std::min(std::min(w, tmp), (int64_t)((1 << 30) - 1));
}

inline int64_t chn_beg(const Chain& c) { return c.seeds.front().qbeg; }
inline int64_t chn_end(const Chain& c) {
  return c.seeds.back().qbeg + c.seeds.back().len;
}

// mem_chain_flt; keeps Python's stable-sort tie behavior
void filter_chains(const Opt& o, std::vector<Chain>& chains) {
  std::vector<Chain> pool;
  for (Chain& c : chains) {
    c.first = -1;
    c.kept = 0;
    c.w = chain_weight(c);
    if (c.w >= o.min_chain_weight) pool.push_back(std::move(c));
  }
  chains.clear();
  if (pool.empty()) return;
  std::stable_sort(pool.begin(), pool.end(),
                   [](const Chain& a, const Chain& b) { return a.w > b.w; });
  pool[0].kept = 3;
  std::vector<int64_t> kept_idx{0};
  for (int64_t i = 1; i < (int64_t)pool.size(); ++i) {
    bool large_ovlp = false, broke = false;
    for (int64_t j : kept_idx) {
      int64_t b_max = std::max(chn_beg(pool[j]), chn_beg(pool[i]));
      int64_t e_min = std::min(chn_end(pool[j]), chn_end(pool[i]));
      if (e_min > b_max) {
        int64_t li = chn_end(pool[i]) - chn_beg(pool[i]);
        int64_t lj = chn_end(pool[j]) - chn_beg(pool[j]);
        int64_t min_l = std::min(li, lj);
        if ((double)(e_min - b_max) >= (double)min_l * o.mask_level
            && min_l < o.max_chain_gap) {
          large_ovlp = true;
          if (pool[j].first < 0) pool[j].first = (int)i;
          if ((double)pool[i].w < (double)pool[j].w * o.drop_ratio
              && pool[j].w - pool[i].w >= o.min_seed_len * 2) {
            broke = true;
            break;
          }
        }
      }
    }
    if (!broke) {
      kept_idx.push_back(i);
      pool[i].kept = large_ovlp ? 2 : 3;
    }
  }
  for (int64_t j : kept_idx)
    if (pool[j].first >= 0) pool[pool[j].first].kept = 1;
  int64_t k = 0, cut = (int64_t)pool.size();
  for (int64_t i = 0; i < (int64_t)pool.size(); ++i) {
    if (pool[i].kept == 0 || pool[i].kept == 3) continue;
    ++k;
    if (k >= o.max_chain_extend) { cut = i; break; }
  }
  for (int64_t i = cut; i < (int64_t)pool.size(); ++i)
    if (pool[i].kept < 3) pool[i].kept = 0;
  for (Chain& c : pool)
    if (c.kept != 0) chains.push_back(std::move(c));
}

// mem_chain2aln
void chain2aln(const Genome& g, const Opt& o, const uint8_t* q,
               int64_t l_query, const Chain& c, double frac_rep_unused,
               std::vector<Reg>& regs, std::vector<uint8_t>& rseq,
               std::vector<uint8_t>& buf1, std::vector<uint8_t>& buf2) {
  (void)frac_rep_unused;
  if (c.seeds.empty()) return;
  int64_t l_pac = g.l_pac, seq_len = 2 * l_pac;
  int64_t rmax0 = seq_len, rmax1 = 0;
  for (const Seed& t : c.seeds) {
    int64_t b = t.rbeg - (t.qbeg + cal_max_gap(o, t.qbeg));
    int64_t e = t.rbeg + t.len + (l_query - t.qbeg - t.len)
                + cal_max_gap(o, l_query - t.qbeg - t.len);
    rmax0 = std::min(rmax0, b);
    rmax1 = std::max(rmax1, e);
  }
  rmax0 = std::max<int64_t>(rmax0, 0);
  rmax1 = std::min(rmax1, seq_len);
  if (rmax0 < l_pac && l_pac < rmax1) {
    if (c.seeds[0].rbeg < l_pac) rmax1 = l_pac;
    else rmax0 = l_pac;
  }
  g.fetch(rmax0, rmax1, rseq);

  int64_t n = (int64_t)c.seeds.size();
  std::vector<int64_t> srt(n);
  for (int64_t i = 0; i < n; ++i) srt[i] = i;
  std::sort(srt.begin(), srt.end(), [&](int64_t a, int64_t b) {
    if (c.seeds[a].score != c.seeds[b].score)
      return c.seeds[a].score > c.seeds[b].score;
    return a > b;
  });
  std::vector<char> skipped(n, 0);
  int32_t eo[6];
  for (int64_t si = 0; si < n; ++si) {
    const Seed& s = c.seeds[srt[si]];
    const Reg* hit = nullptr;
    for (const Reg& p : regs) {
      if (s.rbeg < p.rb || s.rbeg + s.len > p.re || s.qbeg < p.qb
          || s.qbeg + s.len > p.qe)
        continue;
      if ((double)(s.len - p.seedlen0) > 0.1 * (double)l_query) continue;
      int64_t qd = s.qbeg - p.qb, rd = s.rbeg - p.rb;
      int64_t w = std::min(cal_max_gap(o, std::min(qd, rd)), p.w);
      if (qd - rd < w && rd - qd < w) { hit = &p; break; }
      qd = p.qe - (s.qbeg + s.len);
      rd = p.re - (s.rbeg + s.len);
      w = std::min(cal_max_gap(o, std::min(qd, rd)), p.w);
      if (qd - rd < w && rd - qd < w) { hit = &p; break; }
    }
    if (hit) {
      bool conflict = false;
      for (int64_t sj = 0; sj < si; ++sj) {
        int64_t j_idx = srt[sj];
        if (skipped[j_idx]) continue;
        const Seed& t = c.seeds[j_idx];
        if ((double)t.len < (double)s.len * 0.95) continue;
        if (s.qbeg <= t.qbeg && s.qbeg + s.len - t.qbeg >= s.len / 4
            && t.qbeg - s.qbeg != t.rbeg - s.rbeg) { conflict = true; break; }
        if (t.qbeg <= s.qbeg && t.qbeg + t.len - s.qbeg >= s.len / 4
            && s.qbeg - t.qbeg != s.rbeg - t.rbeg) { conflict = true; break; }
      }
      if (!conflict) {
        skipped[srt[si]] = 1;
        continue;
      }
    }
    Reg a;
    a.w = o.band_width;
    a.rid = c.rid;
    int64_t aw0 = o.band_width, aw1 = o.band_width;
    if (s.qbeg) {
      buf1.assign(q, q + s.qbeg);
      std::reverse(buf1.begin(), buf1.end());
      int64_t tmp = s.rbeg - rmax0;
      buf2.assign(rseq.begin(), rseq.begin() + tmp);
      std::reverse(buf2.begin(), buf2.end());
      int64_t prev = -1;
      for (int i = 0; i < MAX_BAND_TRY; ++i) {
        aw0 = o.band_width << i;
        ksw_extend_one(buf1.data(), (int)buf1.size(), buf2.data(),
                       (int)buf2.size(), o.o_del, o.e_del, o.o_ins, o.e_ins,
                       (int)aw0, o.pen_clip5, o.zdrop,
                       (int)(s.len * o.match), o.match, o.mismatch, o.n_sc,
                       eo);
        if (eo[0] == prev || eo[5] < (aw0 >> 1) + (aw0 >> 2)) break;
        prev = eo[0];
      }
      a.score = eo[0];
      if (eo[4] <= 0 || eo[4] <= a.score - o.pen_clip5) {
        a.qb = s.qbeg - eo[1];
        a.rb = s.rbeg - eo[2];
        a.truesc = a.score;
      } else {
        a.qb = 0;
        a.rb = s.rbeg - eo[3];
        a.truesc = eo[4];
      }
    } else {
      a.score = a.truesc = s.len * o.match;
      a.qb = 0;
      a.rb = s.rbeg;
    }
    if (s.qbeg + s.len != l_query) {
      int64_t sc0 = a.score;
      int64_t qe = s.qbeg + s.len;
      int64_t re_off = s.rbeg + s.len - rmax0;
      int64_t prev = -1;
      for (int i = 0; i < MAX_BAND_TRY; ++i) {
        aw1 = o.band_width << i;
        ksw_extend_one(q + qe, (int)(l_query - qe), rseq.data() + re_off,
                       (int)((int64_t)rseq.size() - re_off), o.o_del,
                       o.e_del, o.o_ins, o.e_ins, (int)aw1, o.pen_clip3,
                       o.zdrop, (int)sc0, o.match, o.mismatch, o.n_sc, eo);
        if (eo[0] == prev || eo[5] < (aw1 >> 1) + (aw1 >> 2)) break;
        prev = eo[0];
      }
      a.score = eo[0];
      if (eo[4] <= 0 || eo[4] <= a.score - o.pen_clip3) {
        a.qe = qe + eo[1];
        a.re = rmax0 + re_off + eo[2];
        a.truesc += a.score - sc0;
      } else {
        a.qe = l_query;
        a.re = rmax0 + re_off + eo[3];
        a.truesc += eo[4] - sc0;
      }
    } else {
      a.qe = l_query;
      a.re = s.rbeg + s.len;
    }
    a.seedcov = 0;
    for (const Seed& t : c.seeds)
      if (t.qbeg >= a.qb && t.qbeg + t.len <= a.qe && t.rbeg >= a.rb
          && t.rbeg + t.len <= a.re)
        a.seedcov += t.len;
    a.w = std::max(aw0, aw1);
    a.seedlen0 = s.len;
    regs.push_back(a);
  }
}

// mem_patch_reg; returns true + (w, score) when mergeable
bool patch_reg(const Genome& g, const Opt& o, const uint8_t* q,
               const Reg& a, const Reg& b, int64_t* w_out, int64_t* sc_out,
               std::vector<uint8_t>& rseq) {
  if (a.rb < g.l_pac && g.l_pac <= b.rb) return false;
  if (a.qb >= b.qb || a.qe >= b.qe || a.re >= b.re) return false;
  int64_t w = std::llabs((a.re - b.rb) - (a.qe - b.qb));
  double r = std::fabs((double)(a.re - b.rb) / (double)(b.re - a.rb)
                       - (double)(a.qe - b.qb) / (double)(b.qe - a.qb));
  if (a.re < b.rb || a.qe < b.qb) {
    if (w > o.band_width * 2 || r >= PATCH_MAX_R_BW) return false;
  } else if (w > o.band_width * 4 || r >= PATCH_MAX_R_BW * 2) {
    return false;
  }
  w += std::max(a.w, b.w);
  w = std::min(w, o.band_width * 4);
  g.fetch(a.rb, b.re, rseq);
  int32_t score = 0;
  ksw_global_one(q + a.qb, (int)(b.qe - a.qb), rseq.data(),
                 (int)rseq.size(), o.o_del, o.e_del, o.o_ins, o.e_ins,
                 (int)w, o.match, o.mismatch, o.n_sc, &score, nullptr, 0);
  int64_t q_s = (int64_t)((double)(b.qe - a.qb)
                          / (double)((b.re - a.rb) + (b.qe - a.qb))
                          * (double)(a.score + b.score) + 0.499);
  int64_t r_s = (int64_t)((double)(b.re - a.rb)
                          / (double)((b.re - a.rb) + (b.qe - a.qb))
                          * (double)(a.score + b.score) + 0.499);
  if ((double)score / (double)std::max(q_s, r_s) < PATCH_MIN_SC_RATIO)
    return false;
  *w_out = w;
  *sc_out = score;
  return true;
}

// mem_sort_dedup_patch
void sort_dedup_patch(const Genome& g, const Opt& o, const uint8_t* q,
                      std::vector<Reg>& regs, std::vector<uint8_t>& rseq) {
  if (regs.size() <= 1) return;
  std::stable_sort(regs.begin(), regs.end(),
                   [](const Reg& x, const Reg& y) { return x.re < y.re; });
  for (Reg& p : regs) p.n_comp = 1;
  for (int64_t i = 1; i < (int64_t)regs.size(); ++i) {
    Reg& p = regs[i];
    if (p.rid != regs[i - 1].rid
        || p.rb >= regs[i - 1].re + o.max_chain_gap)
      continue;
    int64_t j = i - 1;
    while (j >= 0 && p.rid == regs[j].rid
           && p.rb < regs[j].re + o.max_chain_gap) {
      Reg& qreg = regs[j];
      if (qreg.qe == qreg.qb) { --j; continue; }
      int64_t or_ = qreg.re - p.rb;
      int64_t oq = qreg.qb < p.qb ? qreg.qe - p.qb : p.qe - qreg.qb;
      int64_t mr = std::min(qreg.re - qreg.rb, p.re - p.rb);
      int64_t mq = std::min(qreg.qe - qreg.qb, p.qe - p.qb);
      if ((double)or_ > o.mask_level_redun * (double)mr
          && (double)oq > o.mask_level_redun * (double)mq) {
        if (p.score < qreg.score) {
          p.qe = p.qb;
          break;
        } else {
          qreg.qe = qreg.qb;
        }
      } else if (qreg.rb < p.rb) {
        int64_t w, score;
        if (patch_reg(g, o, q, qreg, p, &w, &score, rseq)) {
          p.n_comp += qreg.n_comp + 1;
          p.seedcov = std::max(p.seedcov, qreg.seedcov);
          p.sub = std::max(p.sub, qreg.sub);
          p.csub = std::max(p.csub, qreg.csub);
          p.qb = qreg.qb;
          p.rb = qreg.rb;
          p.truesc = p.score = score;
          p.w = w;
          qreg.qb = qreg.qe;
        }
      }
      --j;
    }
  }
  regs.erase(std::remove_if(regs.begin(), regs.end(),
                            [](const Reg& p) { return p.qe <= p.qb; }),
             regs.end());
  std::stable_sort(regs.begin(), regs.end(), [](const Reg& x, const Reg& y) {
    if (x.score != y.score) return x.score > y.score;
    if (x.rb != y.rb) return x.rb < y.rb;
    return x.qb < y.qb;
  });
  for (int64_t i = 1; i < (int64_t)regs.size(); ++i)
    if (regs[i].score == regs[i - 1].score && regs[i].rb == regs[i - 1].rb
        && regs[i].qb == regs[i - 1].qb)
      regs[i].qe = regs[i].qb;
  regs.erase(std::remove_if(regs.begin(), regs.end(),
                            [](const Reg& p) { return p.qe <= p.qb; }),
             regs.end());
}

}  // namespace

extern "C" {

// Full per-read candidate generation for a batch of reads sharing one FM
// index. mems_flat rows are [x0, x1, s, qb, qe] (fm_collect_seeds_batch
// layout); rbegs in enumerate_occurrences order. Output rows are 14 doubles:
// [rb, re, qb, qe, rid, score, truesc, sub, csub, seedcov, w, seedlen0,
//  n_comp, frac_rep]. Returns total regions, or -1 if cap exceeded.
int64_t mem_align1_batch(
    const uint8_t* pac, int64_t l_pac, const int64_t* contig_offs,
    int64_t n_contigs, const uint8_t* reads_flat,
    const int64_t* read_offsets, int64_t n_reads, const int64_t* mems_flat,
    const int64_t* mem_offsets, const int64_t* rbegs_flat,
    const int64_t* rbeg_offsets, const int64_t* oi, const double* od,
    double* out, int64_t cap, int64_t* counts, int64_t* offs) {
  Genome g{pac, l_pac, contig_offs, n_contigs};
  Opt o;
  o.match = (int)oi[0];
  o.mismatch = (int)oi[1];   // already negative
  o.n_sc = (int)oi[2];
  o.o_del = (int)oi[3];
  o.e_del = (int)oi[4];
  o.o_ins = (int)oi[5];
  o.e_ins = (int)oi[6];
  o.pen_clip5 = (int)oi[7];
  o.pen_clip3 = (int)oi[8];
  o.zdrop = (int)oi[9];
  o.band_width = oi[10];
  o.max_chain_gap = oi[11];
  o.max_occ = oi[12];
  o.min_seed_len = oi[13];
  o.min_chain_weight = oi[14];
  o.max_chain_extend = oi[15];
  o.mask_level = od[0];
  o.mask_level_redun = od[1];
  o.drop_ratio = od[2];

  int64_t total = 0;
  std::vector<Chain> chains;
  std::vector<Reg> regs;
  std::vector<uint8_t> rseq, buf1, buf2;
  for (int64_t r = 0; r < n_reads; ++r) {
    const uint8_t* q = reads_flat + read_offsets[r];
    int64_t l_query = read_offsets[r + 1] - read_offsets[r];
    const int64_t* mems = mems_flat + mem_offsets[r] * 5;
    int64_t n_mems = mem_offsets[r + 1] - mem_offsets[r];
    const int64_t* rbegs = rbegs_flat + rbeg_offsets[r];
    int64_t n_rbegs = rbeg_offsets[r + 1] - rbeg_offsets[r];
    offs[r] = total;
    counts[r] = 0;
    if (l_query == 0) continue;
    double frac_rep = 0.0;
    chain_seeds(g, o, l_query, mems, n_mems, rbegs, n_rbegs, chains,
                &frac_rep);
    filter_chains(o, chains);
    regs.clear();
    for (const Chain& c : chains)
      chain2aln(g, o, q, l_query, c, frac_rep, regs, rseq, buf1, buf2);
    sort_dedup_patch(g, o, q, regs, rseq);
    if (total + (int64_t)regs.size() > cap) return -1;
    for (const Reg& p : regs) {
      double* row = out + total * 14;
      row[0] = (double)p.rb;
      row[1] = (double)p.re;
      row[2] = (double)p.qb;
      row[3] = (double)p.qe;
      row[4] = (double)p.rid;
      row[5] = (double)p.score;
      row[6] = (double)p.truesc;
      row[7] = (double)p.sub;
      row[8] = (double)p.csub;
      row[9] = (double)p.seedcov;
      row[10] = (double)p.w;
      row[11] = (double)p.seedlen0;
      row[12] = (double)p.n_comp;
      row[13] = frac_rep;
      ++total;
    }
    counts[r] = (int64_t)regs.size();
  }
  return total;
}

// mem_reg2aln (final banded global -> CIGAR/NM/position) for a batch of
// tasks. tasks rows are [read_idx, qb, qe, rb, re, truesc, w] int64; meta
// out rows are [pos_global, rid, is_rev, NM, n_cigar, cigar_off]; cigar
// (op, len) int32 pairs go to cigar_out. Returns total cigar pairs or -1
// if cigar_cap exceeded.
int64_t mem_reg2aln_batch(
    const uint8_t* pac, int64_t l_pac, const int64_t* contig_offs,
    int64_t n_contigs, const uint8_t* reads_flat,
    const int64_t* read_offsets, const int64_t* tasks, int64_t n_tasks,
    const int64_t* oi, const double* od, int64_t* meta_out,
    int32_t* cigar_out, int64_t cigar_cap) {
  (void)od;
  Genome g{pac, l_pac, contig_offs, n_contigs};
  int match = (int)oi[0], mismatch = (int)oi[1], n_sc = (int)oi[2];
  int o_del = (int)oi[3], e_del = (int)oi[4];
  int o_ins = (int)oi[5], e_ins = (int)oi[6];
  int64_t band_width = oi[10];
  int64_t seq_len = 2 * l_pac;

  auto infer_bw = [&](int64_t l1, int64_t l2, int64_t score, int q_pen,
                      int r_pen) -> int64_t {
    if (l1 == l2 && l1 * match - score < (int64_t)(q_pen + r_pen - match) << 1)
      return 0;
    int64_t w = (int64_t)((double)(std::min(l1, l2) * match - score - q_pen)
                          / r_pen + 2.0);
    return std::max(w, (int64_t)std::llabs(l1 - l2));
  };

  std::vector<uint8_t> rseq, qbuf;
  std::vector<int32_t> cig;
  int64_t cig_total = 0;
  for (int64_t t = 0; t < n_tasks; ++t) {
    const int64_t* tk = tasks + t * 7;
    int64_t ridx = tk[0], qb = tk[1], qe = tk[2], rb = tk[3], re = tk[4];
    int64_t truesc = tk[5], reg_w = tk[6];
    const uint8_t* read = reads_flat + read_offsets[ridx];
    int64_t l_full = read_offsets[ridx + 1] - read_offsets[ridx];
    int64_t l_query = qe - qb;
    int64_t* m = meta_out + t * 6;

    int64_t w2 = std::max(
        infer_bw(l_query, re - rb, truesc, o_del, e_del),
        infer_bw(l_query, re - rb, truesc, o_ins, e_ins));
    if (w2 > band_width) w2 = std::min(w2, reg_w);

    int64_t last_sc = -((int64_t)1 << 30);
    int i = 0;
    int64_t NM = -1;
    bool have_cigar = false;
    cig.clear();
    while (true) {
      w2 = std::min(w2, band_width << 2);
      // _gen_cigar
      int64_t score = 0;
      NM = -1;
      have_cigar = false;
      cig.clear();
      if (!(l_query <= 0 || rb >= re || (rb < l_pac && l_pac < re))) {
        g.fetch(rb, re, rseq);
        qbuf.assign(read + qb, read + qe);
        if (rb >= l_pac) {
          std::reverse(qbuf.begin(), qbuf.end());
          std::reverse(rseq.begin(), rseq.end());
        }
        if (l_query == re - rb && w2 == 0) {
          for (int64_t k = 0; k < l_query; ++k)
            score += score_sub_pub(qbuf[k], rseq[k], match, mismatch, n_sc);
          cig.push_back(0);
          cig.push_back((int32_t)l_query);
          have_cigar = true;
        } else {
          int32_t sc32 = 0;
          cig.resize(2 * (size_t)(l_query + (int64_t)rseq.size() + 2));
          int32_t n_ops = ksw_global_one(
              qbuf.data(), (int)l_query, rseq.data(), (int)rseq.size(),
              o_del, e_del, o_ins, e_ins, (int)w2, match, mismatch, n_sc,
              &sc32, cig.data(), (int32_t)(cig.size() / 2));
          score = sc32;
          if (n_ops >= 0 && n_ops > 0) {
            cig.resize(2 * (size_t)n_ops);
            have_cigar = true;
          } else {
            cig.clear();
          }
        }
        if (have_cigar) {
          int64_t n_mm = 0, n_gap = 0, x = 0, y = 0;
          int64_t n_ops = (int64_t)cig.size() / 2;
          for (int64_t k = 0; k < n_ops; ++k) {
            int op = cig[2 * k], ln = cig[2 * k + 1];
            if (op == 0) {
              for (int64_t u = 0; u < ln; ++u)
                if (qbuf[x + u] != rseq[y + u]) ++n_mm;
              x += ln;
              y += ln;
            } else if (op == 2) {
              if (k > 0 && k < n_ops - 1) n_gap += ln;
              y += ln;
            } else if (op == 1) {
              x += ln;
              n_gap += ln;
            }
          }
          NM = n_mm + n_gap;
        }
      }
      if (score == last_sc || w2 == band_width << 2) break;
      last_sc = score;
      w2 <<= 1;
      ++i;
      if (!(i < 3 && score < truesc - match)) break;
    }
    // position + D squeeze + clips
    int64_t dpos = rb < l_pac ? rb : re - 1;
    bool is_rev = dpos >= l_pac;
    int64_t pos = is_rev ? seq_len - 1 - dpos : dpos;
    if (!cig.empty()) {
      if (cig[0] == 2) {
        pos += cig[1];
        cig.erase(cig.begin(), cig.begin() + 2);
      } else if (cig[cig.size() - 2] == 2) {
        cig.resize(cig.size() - 2);
      }
    }
    if (qb != 0 || qe != l_full) {
      int64_t clip5 = is_rev ? l_full - qe : qb;
      int64_t clip3 = is_rev ? qb : l_full - qe;
      if (clip5 > 0) {
        cig.insert(cig.begin(), (int32_t)clip5);
        cig.insert(cig.begin(), 3);
      }
      if (clip3 > 0) {
        cig.push_back(3);
        cig.push_back((int32_t)clip3);
      }
    }
    int rid = g.pos_to_contig(pos);
    int64_t n_pairs = (int64_t)cig.size() / 2;
    if (cig_total + n_pairs > cigar_cap) return -1;
    for (size_t k = 0; k < cig.size(); ++k)
      cigar_out[cig_total * 2 + k] = cig[k];
    m[0] = pos;
    m[1] = rid;
    m[2] = is_rev ? 1 : 0;
    m[3] = NM;
    m[4] = n_pairs;
    m[5] = cig_total;
    cig_total += n_pairs;
  }
  return cig_total;
}

// GetAlignments' CIGAR walk (lariat.go:1552-1704 semantics, mirrored from
// rfa/candidates.py): count matches/indels/soft-clips and collect mismatch
// loci by comparing the contig-fetched ASCII reference slice against the
// raw read bytes. tasks rows (int64): [cigar_off, n_cigar_pairs, ref_off,
// ref_len, read_off, read_len, ref_start, ref_end, reversed]. stats out
// rows (int64 x6): [matches, indels, indel_length, soft_clipped,
// soft_clipped_length, n_mismatch]; mismatch (loc, read_loc) int64 pairs
// appended to mm_out (per-task offset in stats via running total order).
// Returns total mismatch pairs, -1 if mm_cap exceeded, -2 on the
// cigar-longer-than-read invariant breach (caller raises).
int64_t mismatch_walk_batch(const int32_t* cigars, const uint8_t* refs,
                            const uint8_t* reads, const int64_t* tasks,
                            int64_t n_tasks, int64_t* stats_out,
                            int64_t* mm_off_out, int64_t* mm_out,
                            int64_t mm_cap) {
  int64_t total = 0;
  for (int64_t t = 0; t < n_tasks; ++t) {
    const int64_t* tk = tasks + t * 9;
    const int32_t* cig = cigars + tk[0];
    int64_t n_pairs = tk[1];
    const uint8_t* ref = refs + tk[2];
    int64_t ref_len = tk[3];
    const uint8_t* read = reads + tk[4];
    int64_t read_len = tk[5];
    int64_t ref_start = tk[6], ref_end = tk[7];
    bool rev = tk[8] != 0;
    int64_t matches = 0, indels = 0, indel_len = 0, sc = 0, sc_len = 0;
    int64_t ref_off = 0, read_off = 0, n_mm = 0;
    mm_off_out[t] = total;
    for (int64_t kk = 0; kk < n_pairs; ++kk) {
      // ops walked in reverse order on the reverse strand
      int64_t k = rev ? n_pairs - 1 - kk : kk;
      int op = cig[2 * k], ln = cig[2 * k + 1];
      if (op == 0) {
        matches += ln;
        int64_t n_ref = std::min((int64_t)ln,
                                 std::max(ref_len - ref_off, (int64_t)0));
        if (read_off + n_ref > read_len) return -2;
        for (int64_t m = 0; m < n_ref; ++m) {
          if (ref[ref_off + m] != read[read_off + m]) {
            if (total + n_mm >= mm_cap) return -1;
            int64_t loc = rev ? ref_end - (ref_off + m)
                              : ref_off + ref_start + m;
            mm_out[2 * (total + n_mm)] = loc;
            mm_out[2 * (total + n_mm) + 1] = read_off + m;
            ++n_mm;
          }
        }
        ref_off += ln;
        read_off += ln;
      } else if (op == 1) {
        ++indels;
        indel_len += ln;
        read_off += ln;
      } else if (op == 2) {
        ++indels;
        indel_len += ln;
        ref_off += ln;
      } else if (op == 3) {
        ++sc;
        sc_len += ln;
        read_off += ln;
      }
    }
    int64_t* st = stats_out + t * 6;
    st[0] = matches;
    st[1] = indels;
    st[2] = indel_len;
    st[3] = sc;
    st[4] = sc_len;
    st[5] = n_mm;
    total += n_mm;
  }
  return total;
}

// Vectorized Go-style PRNG seeding chain for utils/gorand.py: out[i][k] =
// seeds[i] * powers[k] mod (2^31 - 1). The constant modulus lets the
// compiler strength-reduce the division (numpy's uint64 % cannot).
void gorand_chain_batch(const int64_t* seeds, int64_t n,
                        const uint64_t* powers, int64_t n_pow,
                        uint64_t* out) {
  constexpr uint64_t M = 0x7FFFFFFFULL;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t s = (uint64_t)seeds[i];
    uint64_t* row = out + i * n_pow;
    for (int64_t k = 0; k < n_pow; ++k)
      row[k] = (s * powers[k]) % M;
  }
}

}  // extern "C"
