// Native decode-order decision walk for the LD-P grid encoder.
//
// Host-side counterpart of tpuhevc/codec/inter_enc.assemble_frame_p +
// inter_enc._merge_static_cus + codec/mv.py (merge/AMVP derivation per
// H.265 §8.5.3.2.3/.2.6/.2.8, P slice / L0 multi-ref / no TMVP — the same
// semantics the Python decoder uses, so the two cannot diverge). The
// Python walk costs ~35 ms/frame (the whole-frame budget at 30 fps);
// this replacement runs in well under a millisecond.
//
// Inputs: per-16-block and per-32-block MVs + reference indices + cbf
// flags and the use32 selection grid from the device stage. References
// are the previous num_ref frames in display order (POC delta of ref r is
// r+1), which is what the AMVP scaling uses. Outputs: the per-8x8-cell
// FrameSyntax maps. Build: tools/build_native.sh (part of
// libtpuhevc_entropy.so).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

static void scale_mv(int mvx, int mvy, int tb, int td, int out[2]);

struct Walk {
  int W, H, w8, h8, log2_ctu, cps, wctu, max_merge, num_ref;
  std::vector<int64_t> order;
  std::vector<int32_t> fmvx, fmvy, fref;
  std::vector<uint8_t> fvalid;
  // TMVP collocated-picture motion (16x16 compressed): col_mv (w16*h16*2
  // quarter-pel), col_td (w16*h16; POC distance col->its ref, 0 = that
  // 16-block is intra/invalid). tmvp mirrors slice_temporal_mvp_enabled.
  const int32_t* col_mv = nullptr;
  const int32_t* col_td = nullptr;
  int w16 = 0, h16 = 0;
  bool tmvp = false;

  // §8.5.3.2.7/.2.8: temporal candidate for PU (px,py,pw,ph) scaled to
  // target POC distance tb (codec/mv.py temporal_candidate mirror:
  // bottom-right col 16-block when in the same CTU row and inside the
  // picture, else the center one).
  bool col_cand(int px, int py, int pw, int ph, int tb, int out2[2]) const {
    if (!tmvp) return false;
    int cx = -1, cy = -1;
    int xbr = px + pw, ybr = py + ph;
    if ((ybr >> log2_ctu) == (py >> log2_ctu) && ybr < H && xbr < W) {
      cx = xbr >> 4; cy = ybr >> 4;
      if (cx >= w16 || cy >= h16 || col_td[cy * w16 + cx] <= 0) cx = -1;
    }
    if (cx < 0) {
      int x = px + pw / 2, y = py + ph / 2;
      cx = x >> 4; cy = y >> 4;
      if (cx >= w16 || cy >= h16 || col_td[cy * w16 + cx] <= 0)
        return false;
    }
    int td = col_td[cy * w16 + cx];
    scale_mv(col_mv[(cy * w16 + cx) * 2], col_mv[(cy * w16 + cx) * 2 + 1],
             tb, td, out2);
    return true;
  }

  int64_t ord(int x8, int y8) const { return order[y8 * w8 + x8]; }

  bool precedes(int x8, int y8, int cx8, int cy8) const {
    if (x8 < 0 || y8 < 0 || x8 >= w8 || y8 >= h8) return false;
    return ord(x8, y8) < ord(cx8, cy8);
  }

  // (mv, ref) of the PU covering sample (px, py) if already decoded.
  bool neighbor(int cx8, int cy8, int px, int py, int mv[3]) const {
    if (px < 0 || py < 0) return false;
    int x8 = px >> 3, y8 = py >> 3;
    if (!precedes(x8, y8, cx8, cy8)) return false;
    if (x8 >= w8 || y8 >= h8 || !fvalid[y8 * w8 + x8]) return false;
    mv[0] = fmvx[y8 * w8 + x8];
    mv[1] = fmvy[y8 * w8 + x8];
    mv[2] = fref[y8 * w8 + x8];
    return true;
  }

  // progressive-valid-only availability (codec/mv.py _neighbor): the
  // z-order precedes test is wrong for intra-CU PU neighbors
  bool neighbor_v(int px, int py, int mv[3]) const {
    if (px < 0 || py < 0) return false;
    int x8 = px >> 3, y8 = py >> 3;
    if (x8 >= w8 || y8 >= h8 || !fvalid[y8 * w8 + x8]) return false;
    mv[0] = fmvx[y8 * w8 + x8];
    mv[1] = fmvy[y8 * w8 + x8];
    mv[2] = fref[y8 * w8 + x8];
    return true;
  }
};

static int64_t morton(int cx, int cy, int bits) {
  int64_t m = 0;
  for (int b = bits - 1; b >= 0; b--)
    m = (m << 2) | (((cy >> b) & 1) << 1) | ((cx >> b) & 1);
  return m;
}

static inline int clip3(int lo, int hi, int v) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// §8.5.3.2.8 temporal MV scaling (codec/mv.py scale_mv mirror)
static void scale_mv(int mvx, int mvy, int tb, int td, int out[2]) {
  if (tb == td) { out[0] = mvx; out[1] = mvy; return; }
  tb = clip3(-128, 127, tb);
  td = clip3(-128, 127, td);
  int tx = (16384 + (abs(td) >> 1)) / td;
  int dsf = clip3(-4096, 4095, (tb * tx + 32) >> 6);
  for (int k = 0; k < 2; k++) {
    int v = k ? mvy : mvx;
    long long p = (long long)dsf * v;
    int o = (int)((llabs(p) + 127) >> 8);
    o = p < 0 ? -o : o;
    out[k] = clip3(-32768, 32767, o);
  }
}

}  // namespace

namespace {

// shared decode-order walk over explicit CU origins: derives merge /
// AMVP syntax per §8.5.3.2.3/.2.6/.2.8 exactly as the decoder would.
// part: 0 = 2Nx2N, 1 = 2NxN, 2 = Nx2N (rectangular inter PUs, the
// TEncCu xCheckRDCostInter counterparts the device stage decides).
struct Cu { int x0, y0, size; int64_t ord; int part; };

// One PU's merge/AMVP derivation (mirror of codec/mv.py
// merge_candidates/amvp_candidates with the progressive-valid
// availability rule; excl: 1 = drop A1, 2 = drop B1 — §8.5.3.2.3
// availability step for second PUs).
struct PuSyn { int merge_i, mvp, mvdx, mvdy; };

static PuSyn derive_pu(Walk& wk, int px, int py, int pw, int ph,
                       int cmx, int cmy, int crf, int excl) {
  int cand[5][3];
  int ncand = 0;
  int a1[3], b1[3], b0[3], a0[3], b2[3];
  bool ha1 = wk.neighbor_v(px - 1, py + ph - 1, a1);
  bool hb1 = wk.neighbor_v(px + pw - 1, py - 1, b1);
  bool hb0 = wk.neighbor_v(px + pw, py - 1, b0);
  bool ha0 = wk.neighbor_v(px - 1, py + ph, a0);
  bool hb2 = wk.neighbor_v(px - 1, py - 1, b2);
  if (excl == 1) ha1 = false;
  if (excl == 2) hb1 = false;
  auto eq = [](const int* a, const int* b) {
    return a[0] == b[0] && a[1] == b[1] && a[2] == b[2];
  };
  auto push = [&](const int* c) {
    cand[ncand][0] = c[0]; cand[ncand][1] = c[1]; cand[ncand][2] = c[2];
    ncand++;
  };
  if (ha1) push(a1);
  if (hb1 && !(ha1 && eq(b1, a1))) push(b1);
  if (hb0 && !(hb1 && eq(b0, b1))) push(b0);
  if (ha0 && !(ha1 && eq(a0, a1))) push(a0);
  if (ncand < 4 && hb2 && !(ha1 && eq(b2, a1)) && !(hb1 && eq(b2, b1)))
    push(b2);
  if (ncand < wk.max_merge) {
    // TMVP merge candidate (ref fixed at 0, tb = 1 for contiguous
    // LD-P); NOT pruned against the spatials (§8.5.3.2.3)
    int t2[3];
    if (wk.col_cand(px, py, pw, ph, 1, t2)) {
      t2[2] = 0;
      push(t2);
    }
  }
  int zero_i = 0;
  for (; ncand < wk.max_merge; ncand++, zero_i++) {
    cand[ncand][0] = 0; cand[ncand][1] = 0;
    cand[ncand][2] = zero_i < wk.num_ref ? zero_i : 0;
  }
  PuSyn out;
  out.merge_i = -1;
  for (int k = 0; k < wk.max_merge; k++)
    if (cand[k][0] == cmx && cand[k][1] == cmy && cand[k][2] == crf) {
      out.merge_i = k;
      break;
    }
  if (out.merge_i >= 0) return out;
  // AMVP per TComDataCU::fillMvpCand (§8.5.3.2.6)
  int apos[2][2] = {{px - 1, py + ph}, {px - 1, py + ph - 1}};
  int bpos[3][2] = {{px + pw, py - 1}, {px + pw - 1, py - 1},
                    {px - 1, py - 1}};
  bool have_a[2], have_b[3];
  int mva[2][3], mvb[3][3];
  for (int i = 0; i < 2; i++)
    have_a[i] = wk.neighbor_v(apos[i][0], apos[i][1], mva[i]);
  for (int i = 0; i < 3; i++)
    have_b[i] = wk.neighbor_v(bpos[i][0], bpos[i][1], mvb[i]);
  bool is_scaled = have_a[0] || have_a[1];
  int ac[2][2] = {{0, 0}, {0, 0}};
  int na = 0;
  auto unscaled = [&](bool* have, int (*mvs)[3], int npos,
                      int out2[2]) -> bool {
    for (int i = 0; i < npos; i++)
      if (have[i] && mvs[i][2] == crf) {
        out2[0] = mvs[i][0]; out2[1] = mvs[i][1];
        return true;
      }
    return false;
  };
  auto scaled = [&](bool* have, int (*mvs)[3], int npos,
                    int out2[2]) -> bool {
    for (int i = 0; i < npos; i++)
      if (have[i]) {
        scale_mv(mvs[i][0], mvs[i][1], crf + 1, mvs[i][2] + 1, out2);
        return true;
      }
    return false;
  };
  int tmp[2];
  if (is_scaled &&
      (unscaled(have_a, mva, 2, tmp) || scaled(have_a, mva, 2, tmp))) {
    ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
  }
  if (unscaled(have_b, mvb, 3, tmp)) {
    ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
  }
  if (!is_scaled && na < 2 && scaled(have_b, mvb, 3, tmp)) {
    ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
  }
  if (na == 2 && ac[0][0] == ac[1][0] && ac[0][1] == ac[1][1]) {
    na = 1; ac[1][0] = 0; ac[1][1] = 0;
  }
  if (na < 2) {  // TMVP AMVP candidate at the PU's target ref (tb=crf+1)
    if (wk.col_cand(px, py, pw, ph, crf + 1, tmp)) {
      ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
    }
  }
  int d0 = abs(cmx - ac[0][0]) + abs(cmy - ac[0][1]);
  int d1 = abs(cmx - ac[1][0]) + abs(cmy - ac[1][1]);
  out.mvp = d1 < d0 ? 1 : 0;
  out.mvdx = cmx - ac[out.mvp][0];
  out.mvdy = cmy - ac[out.mvp][1];
  return out;
}

static void walk_cus(Walk& wk, std::vector<Cu>& cus,
                     const int32_t* cmv, const int32_t* cref,
                     const uint8_t* ccbf,
                     int32_t* cu_log2, int32_t* mv_out, int32_t* ref_out,
                     int32_t* skip, int32_t* merge_flag, int32_t* merge_idx,
                     int32_t* mvp_flag, int32_t* mvd) {
  std::sort(cus.begin(), cus.end(),
            [](const Cu& a, const Cu& b) { return a.ord < b.ord; });
  const int w8 = wk.w8;
  for (const Cu& cu : cus) {
    int cx8 = cu.x0 / 8, cy8 = cu.y0 / 8;
    int c0 = cy8 * w8 + cx8;
    int cmx = cmv[2 * c0], cmy = cmv[2 * c0 + 1], crf = cref[c0];
    int n = cu.size, s8 = n / 8;
    if (cu.part && crf != 255) {
      // rectangular inter CU: two PUs in decode order, each with its
      // own (mv, ref) from the per-8-cell maps; availability state
      // updates after EACH PU (mv.py _neighbor progressive rule)
      int lg = 0; while ((1 << lg) < n) lg++;
      for (int pi = 0; pi < 2; pi++) {
        int px = cu.x0, py = cu.y0, pw = n, ph = n;
        if (cu.part == 1) {  // 2NxN
          ph = n / 2; py += pi ? n / 2 : 0;
        } else {             // Nx2N
          pw = n / 2; px += pi ? n / 2 : 0;
        }
        int p0 = (py / 8) * w8 + (px / 8);
        int pmx = cmv[2 * p0], pmy = cmv[2 * p0 + 1], prf = cref[p0];
        int excl = pi == 0 ? 0 : (cu.part == 1 ? 2 : 1);
        PuSyn syn = derive_pu(wk, px, py, pw, ph, pmx, pmy, prf, excl);
        for (int yy = py / 8; yy < (py + ph) / 8; yy++)
          for (int xx = px / 8; xx < (px + pw) / 8; xx++) {
            int c = yy * w8 + xx;
            cu_log2[c] = lg;
            mv_out[2 * c] = pmx;
            mv_out[2 * c + 1] = pmy;
            ref_out[c] = prf;
            if (syn.merge_i >= 0) {
              merge_flag[c] = 1;
              merge_idx[c] = syn.merge_i;
            } else {
              mvp_flag[c] = syn.mvp;
              mvd[2 * c] = syn.mvdx;
              mvd[2 * c + 1] = syn.mvdy;
            }
            wk.fmvx[c] = pmx;
            wk.fmvy[c] = pmy;
            wk.fref[c] = prf;
            wk.fvalid[c] = 1;
          }
      }
      continue;
    }
    if (crf == 255) {
      // intra CU in a P slice (ref sentinel): no motion syntax, stays
      // unavailable (fvalid 0) as a merge/AMVP neighbor per the spec
      int lgi = 0; while ((1 << lgi) < n) lgi++;
      for (int dy = 0; dy < s8; dy++)
        for (int dx = 0; dx < s8; dx++) {
          int c = (cy8 + dy) * w8 + (cx8 + dx);
          cu_log2[c] = lgi;
          mv_out[2 * c] = 0;
          mv_out[2 * c + 1] = 0;
          ref_out[c] = 0;
        }
      continue;
    }
    bool has_cbf = false;
    for (int dy = 0; dy < s8; dy++)
      for (int dx = 0; dx < s8; dx++)
        has_cbf |= ccbf[(cy8 + dy) * w8 + (cx8 + dx)] != 0;

    // merge candidates (mvx, mvy, ref): A1, B1, B0, A0, B2 + zero fill
    int cand[5][3];
    int ncand = 0;
    int a1[3], b1[3], b0[3], a0[3], b2[3];
    bool ha1 = wk.neighbor(cx8, cy8, cu.x0 - 1, cu.y0 + n - 1, a1);
    bool hb1 = wk.neighbor(cx8, cy8, cu.x0 + n - 1, cu.y0 - 1, b1);
    bool hb0 = wk.neighbor(cx8, cy8, cu.x0 + n, cu.y0 - 1, b0);
    bool ha0 = wk.neighbor(cx8, cy8, cu.x0 - 1, cu.y0 + n, a0);
    bool hb2 = wk.neighbor(cx8, cy8, cu.x0 - 1, cu.y0 - 1, b2);
    auto eq = [](const int* a, const int* b) {
      return a[0] == b[0] && a[1] == b[1] && a[2] == b[2];
    };
    auto push = [&](const int* c) {
      cand[ncand][0] = c[0]; cand[ncand][1] = c[1]; cand[ncand][2] = c[2];
      ncand++;
    };
    if (ha1) push(a1);
    if (hb1 && !(ha1 && eq(b1, a1))) push(b1);
    if (hb0 && !(hb1 && eq(b0, b1))) push(b0);
    if (ha0 && !(ha1 && eq(a0, a1))) push(a0);
    if (ncand < 4 && hb2 && !(ha1 && eq(b2, a1)) && !(hb1 && eq(b2, b1)))
      push(b2);
    if (ncand < wk.max_merge) {  // TMVP merge candidate (ref 0, tb 1)
      int t2[3];
      if (wk.col_cand(cu.x0, cu.y0, n, n, 1, t2)) {
        t2[2] = 0;
        push(t2);
      }
    }
    int zero_i = 0;
    for (; ncand < wk.max_merge; ncand++, zero_i++) {
      cand[ncand][0] = 0; cand[ncand][1] = 0;
      cand[ncand][2] = zero_i < wk.num_ref ? zero_i : 0;
    }
    int merge_i = -1;
    for (int k = 0; k < wk.max_merge; k++)
      if (cand[k][0] == cmx && cand[k][1] == cmy && cand[k][2] == crf) {
        merge_i = k;
        break;
      }

    int lg = 0; while ((1 << lg) < n) lg++;
    for (int dy = 0; dy < s8; dy++)
      for (int dx = 0; dx < s8; dx++) {
        int c = (cy8 + dy) * w8 + (cx8 + dx);
        cu_log2[c] = lg;
        mv_out[2 * c] = cmx;
        mv_out[2 * c + 1] = cmy;
        ref_out[c] = crf;
      }
    if (merge_i >= 0) {
      for (int dy = 0; dy < s8; dy++)
        for (int dx = 0; dx < s8; dx++) {
          int c = (cy8 + dy) * w8 + (cx8 + dx);
          merge_flag[c] = 1;
          merge_idx[c] = merge_i;
          if (!has_cbf) skip[c] = 1;
        }
    } else {
      // AMVP per TComDataCU::fillMvpCand (§8.5.3.2.6)
      int apos[2][2] = {{cu.x0 - 1, cu.y0 + n}, {cu.x0 - 1, cu.y0 + n - 1}};
      int bpos[3][2] = {{cu.x0 + n, cu.y0 - 1}, {cu.x0 + n - 1, cu.y0 - 1},
                        {cu.x0 - 1, cu.y0 - 1}};
      bool have_a[2], have_b[3];
      int mva[2][3], mvb[3][3];
      for (int i = 0; i < 2; i++)
        have_a[i] = wk.neighbor(cx8, cy8, apos[i][0], apos[i][1], mva[i]);
      for (int i = 0; i < 3; i++)
        have_b[i] = wk.neighbor(cx8, cy8, bpos[i][0], bpos[i][1], mvb[i]);
      bool is_scaled = have_a[0] || have_a[1];
      int ac[2][2] = {{0, 0}, {0, 0}};
      int na = 0;
      auto unscaled = [&](bool* have, int (*mvs)[3], int npos,
                          int out[2]) -> bool {
        for (int i = 0; i < npos; i++)
          if (have[i] && mvs[i][2] == crf) {
            out[0] = mvs[i][0]; out[1] = mvs[i][1];
            return true;
          }
        return false;
      };
      auto scaled = [&](bool* have, int (*mvs)[3], int npos,
                        int out[2]) -> bool {
        for (int i = 0; i < npos; i++)
          if (have[i]) {
            scale_mv(mvs[i][0], mvs[i][1], crf + 1, mvs[i][2] + 1, out);
            return true;
          }
        return false;
      };
      int tmp[2];
      if (is_scaled &&
          (unscaled(have_a, mva, 2, tmp) || scaled(have_a, mva, 2, tmp))) {
        ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
      }
      if (unscaled(have_b, mvb, 3, tmp)) {
        ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
      }
      if (!is_scaled && na < 2 && scaled(have_b, mvb, 3, tmp)) {
        ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
      }
      if (na == 2 && ac[0][0] == ac[1][0] && ac[0][1] == ac[1][1]) {
        na = 1; ac[1][0] = 0; ac[1][1] = 0;
      }
      if (na < 2) {  // TMVP AMVP candidate at the target ref (tb=crf+1)
        if (wk.col_cand(cu.x0, cu.y0, n, n, crf + 1, tmp)) {
          ac[na][0] = tmp[0]; ac[na][1] = tmp[1]; na++;
        }
      }
      int d0 = abs(cmx - ac[0][0]) + abs(cmy - ac[0][1]);
      int d1 = abs(cmx - ac[1][0]) + abs(cmy - ac[1][1]);
      int mvp = d1 < d0 ? 1 : 0;
      for (int dy = 0; dy < s8; dy++)
        for (int dx = 0; dx < s8; dx++) {
          int c = (cy8 + dy) * w8 + (cx8 + dx);
          mvp_flag[c] = mvp;
          mvd[2 * c] = cmx - ac[mvp][0];
          mvd[2 * c + 1] = cmy - ac[mvp][1];
        }
    }
    for (int dy = 0; dy < s8; dy++)
      for (int dx = 0; dx < s8; dx++) {
        int c = (cy8 + dy) * w8 + (cx8 + dx);
        wk.fmvx[c] = cmx;
        wk.fmvy[c] = cmy;
        wk.fref[c] = crf;
        wk.fvalid[c] = 1;
      }
  }
}

static void init_walk(Walk& wk, int W, int H, int log2_ctu, int max_merge,
                      int num_ref) {
  wk.W = W; wk.H = H; wk.w8 = W / 8; wk.h8 = H / 8;
  wk.log2_ctu = log2_ctu; wk.max_merge = max_merge; wk.num_ref = num_ref;
  wk.cps = 1 << (log2_ctu - 3);
  wk.wctu = (W + (1 << log2_ctu) - 1) >> log2_ctu;
  wk.order.resize(wk.w8 * wk.h8);
  wk.fmvx.assign(wk.w8 * wk.h8, 0);
  wk.fmvy.assign(wk.w8 * wk.h8, 0);
  wk.fref.assign(wk.w8 * wk.h8, 0);
  wk.fvalid.assign(wk.w8 * wk.h8, 0);
  const int64_t per_ctu = (int64_t)wk.cps * wk.cps;
  for (int y8 = 0; y8 < wk.h8; y8++)
    for (int x8 = 0; x8 < wk.w8; x8++) {
      int64_t ctu = (int64_t)(y8 / wk.cps) * wk.wctu + (x8 / wk.cps);
      wk.order[y8 * wk.w8 + x8] =
          ctu * per_ctu + morton(x8 % wk.cps, y8 % wk.cps, log2_ctu - 3);
    }
}

}  // namespace

// v2 walk: the device stage hands over final per-8x8-cell maps
// (cu_log2, mv quarter-pel, ref idx, cbf); this derives the merge /
// skip / AMVP syntax in decode order. Size map must be quadtree-legal
// (every CU's cells uniform), which the device composition guarantees.
extern "C" int tpuhevc_decision_walk_map(
    const uint8_t* log2_map, const int32_t* mv8, const uint8_t* ref8,
    const uint8_t* cbf8,
    int W, int H, int log2_ctu, int max_merge, int num_ref,
    int32_t* cu_log2, int32_t* mv_out, int32_t* ref_out, int32_t* skip,
    int32_t* merge_flag, int32_t* merge_idx, int32_t* mvp_flag,
    int32_t* mvd) {
  if (W % 8 || H % 8) return -1;
  Walk wk;
  init_walk(wk, W, H, log2_ctu, max_merge, num_ref);
  const int w8 = wk.w8, h8 = wk.h8;
  std::vector<int32_t> cref(w8 * h8);
  for (int i = 0; i < w8 * h8; i++) cref[i] = ref8[i];
  std::vector<Cu> cus;
  cus.reserve(w8 * h8 / 4);
  std::vector<uint8_t> seen(w8 * h8, 0);
  for (int y8 = 0; y8 < h8; y8++)
    for (int x8 = 0; x8 < w8; x8++) {
      if (seen[y8 * w8 + x8]) continue;
      int lg = log2_map[y8 * w8 + x8];
      if (lg < 3 || lg > 6) return -2;
      int s8 = 1 << (lg - 3);
      for (int dy = 0; dy < s8; dy++)
        for (int dx = 0; dx < s8; dx++)
          seen[(y8 + dy) * w8 + (x8 + dx)] = 1;
      cus.push_back({x8 * 8, y8 * 8, 1 << lg, wk.ord(x8, y8), 0});
    }
  walk_cus(wk, cus, mv8, cref.data(), cbf8, cu_log2, mv_out, ref_out,
           skip, merge_flag, merge_idx, mvp_flag, mvd);
  return 0;
}

// v3 walk: v2 plus a per-8-cell partition map (0 = 2Nx2N, 1 = 2NxN,
// 2 = Nx2N at the CU origin cell) for rectangular inter PUs.
extern "C" int tpuhevc_decision_walk_map_part(
    const uint8_t* log2_map, const int32_t* mv8, const uint8_t* ref8,
    const uint8_t* cbf8, const uint8_t* part8,
    int W, int H, int log2_ctu, int max_merge, int num_ref,
    int32_t* cu_log2, int32_t* mv_out, int32_t* ref_out, int32_t* skip,
    int32_t* merge_flag, int32_t* merge_idx, int32_t* mvp_flag,
    int32_t* mvd) {
  if (W % 8 || H % 8) return -1;
  Walk wk;
  init_walk(wk, W, H, log2_ctu, max_merge, num_ref);
  const int w8 = wk.w8, h8 = wk.h8;
  std::vector<int32_t> cref(w8 * h8);
  for (int i = 0; i < w8 * h8; i++) cref[i] = ref8[i];
  std::vector<Cu> cus;
  cus.reserve(w8 * h8 / 4);
  std::vector<uint8_t> seen(w8 * h8, 0);
  for (int y8 = 0; y8 < h8; y8++)
    for (int x8 = 0; x8 < w8; x8++) {
      if (seen[y8 * w8 + x8]) continue;
      int lg = log2_map[y8 * w8 + x8];
      if (lg < 3 || lg > 6) return -2;
      int part = part8[y8 * w8 + x8];
      if (part && lg == 3) return -3;  // 8x8 PUs stay square (4-cell maps)
      int s8 = 1 << (lg - 3);
      for (int dy = 0; dy < s8; dy++)
        for (int dx = 0; dx < s8; dx++)
          seen[(y8 + dy) * w8 + (x8 + dx)] = 1;
      cus.push_back({x8 * 8, y8 * 8, 1 << lg, wk.ord(x8, y8), part});
    }
  walk_cus(wk, cus, mv8, cref.data(), cbf8, cu_log2, mv_out, ref_out,
           skip, merge_flag, merge_idx, mvp_flag, mvd);
  return 0;
}

// v4 walk: v3 plus TMVP — the collocated (previous coded) picture's
// 16x16-compressed motion (col_mv16: w16*h16*2 quarter-pel, col_td16:
// w16*h16 POC distance col->its ref, 0 = intra/invalid) enables the
// temporal merge + AMVP candidates exactly as the decoder derives them
// (codec/mv.py temporal_candidate; §8.5.3.2.7/.2.8).
extern "C" int tpuhevc_decision_walk_map_col(
    const uint8_t* log2_map, const int32_t* mv8, const uint8_t* ref8,
    const uint8_t* cbf8, const uint8_t* part8,
    const int32_t* col_mv16, const int32_t* col_td16,
    int W, int H, int log2_ctu, int max_merge, int num_ref,
    int32_t* cu_log2, int32_t* mv_out, int32_t* ref_out, int32_t* skip,
    int32_t* merge_flag, int32_t* merge_idx, int32_t* mvp_flag,
    int32_t* mvd) {
  if (W % 8 || H % 8) return -1;
  Walk wk;
  init_walk(wk, W, H, log2_ctu, max_merge, num_ref);
  if (col_mv16 && col_td16) {
    wk.col_mv = col_mv16;
    wk.col_td = col_td16;
    wk.w16 = (wk.w8 + 1) >> 1;
    wk.h16 = (wk.h8 + 1) >> 1;
    wk.tmvp = true;
  }
  const int w8 = wk.w8, h8 = wk.h8;
  std::vector<int32_t> cref(w8 * h8);
  for (int i = 0; i < w8 * h8; i++) cref[i] = ref8[i];
  std::vector<Cu> cus;
  cus.reserve(w8 * h8 / 4);
  std::vector<uint8_t> seen(w8 * h8, 0);
  for (int y8 = 0; y8 < h8; y8++)
    for (int x8 = 0; x8 < w8; x8++) {
      if (seen[y8 * w8 + x8]) continue;
      int lg = log2_map[y8 * w8 + x8];
      if (lg < 3 || lg > 6) return -2;
      int part = part8 ? part8[y8 * w8 + x8] : 0;
      if (part && lg == 3) return -3;
      int s8 = 1 << (lg - 3);
      for (int dy = 0; dy < s8; dy++)
        for (int dx = 0; dx < s8; dx++)
          seen[(y8 + dy) * w8 + (x8 + dx)] = 1;
      cus.push_back({x8 * 8, y8 * 8, 1 << lg, wk.ord(x8, y8), part});
    }
  walk_cus(wk, cus, mv8, cref.data(), cbf8, cu_log2, mv_out, ref_out,
           skip, merge_flag, merge_idx, mvp_flag, mvd);
  return 0;
}

extern "C" int tpuhevc_decision_walk(
    // per-16 grid (nh16 x nw16): quarter-pel MVs + ref + cbf
    const int32_t* mvq16, const uint8_t* ref16, const uint8_t* cbf16,
    // per-32 grid (nh32 x nw32)
    const int32_t* mvq32, const uint8_t* ref32, const uint8_t* cbf32,
    const uint8_t* use32,
    int W, int H, int log2_ctu, int max_merge, int num_ref,
    // outputs, all (h8*w8) int32 except mv/mvd (h8*w8*2)
    int32_t* cu_log2, int32_t* mv_out, int32_t* ref_out, int32_t* skip,
    int32_t* merge_flag, int32_t* merge_idx, int32_t* mvp_flag,
    int32_t* mvd) {
  if (W % 16 || H % 16) return -1;
  const int nw16 = W / 16, nh16 = H / 16;
  const int nw32 = W / 32, nh32 = H / 32;
  Walk wk;
  init_walk(wk, W, H, log2_ctu, max_merge, num_ref);

  // ---- CU size map from use32 + static agglomeration (32 then 64) ----
  std::vector<int> sz(nh16 * nw16, 16);
  std::vector<uint8_t> cbf(nh16 * nw16, 0);
  std::vector<int32_t> mvx(nh16 * nw16), mvy(nh16 * nw16), ref(nh16 * nw16);
  for (int b = 0; b < nh16 * nw16; b++) {
    mvx[b] = mvq16[2 * b];
    mvy[b] = mvq16[2 * b + 1];
    ref[b] = ref16[b];
    cbf[b] = cbf16[b];
  }
  for (int by = 0; by < nh32; by++)
    for (int bx = 0; bx < nw32; bx++) {
      if (!use32[by * nw32 + bx]) continue;
      int b32 = by * nw32 + bx;
      for (int dy = 0; dy < 2; dy++)
        for (int dx = 0; dx < 2; dx++) {
          int b = (2 * by + dy) * nw16 + (2 * bx + dx);
          sz[b] = 32;
          mvx[b] = mvq32[2 * b32];
          mvy[b] = mvq32[2 * b32 + 1];
          ref[b] = ref32[b32];
          cbf[b] = cbf32[b32];
        }
    }
  // agglomerate 4x16 -> 32 when same (MV, ref) and no residual
  for (int by = 0; by + 1 < nh16; by += 2)
    for (int bx = 0; bx + 1 < nw16; bx += 2) {
      int b0 = by * nw16 + bx;
      if (sz[b0] != 16) continue;
      bool ok = true;
      for (int dy = 0; dy < 2 && ok; dy++)
        for (int dx = 0; dx < 2 && ok; dx++) {
          int b = (by + dy) * nw16 + (bx + dx);
          ok = sz[b] == 16 && !cbf[b] && mvx[b] == mvx[b0] &&
               mvy[b] == mvy[b0] && ref[b] == ref[b0];
        }
      if (ok)
        for (int dy = 0; dy < 2; dy++)
          for (int dx = 0; dx < 2; dx++)
            sz[(by + dy) * nw16 + (bx + dx)] = 32;
    }
  // agglomerate 4x32 -> 64 when same (MV, ref) and no residual
  for (int by = 0; by + 3 < nh16; by += 4)
    for (int bx = 0; bx + 3 < nw16; bx += 4) {
      int b0 = by * nw16 + bx;
      bool ok = true;
      for (int dy = 0; dy < 4 && ok; dy++)
        for (int dx = 0; dx < 4 && ok; dx++) {
          int b = (by + dy) * nw16 + (bx + dx);
          ok = sz[b] == 32 && !cbf[b] && mvx[b] == mvx[b0] &&
               mvy[b] == mvy[b0] && ref[b] == ref[b0];
        }
      if (ok)
        for (int dy = 0; dy < 4; dy++)
          for (int dx = 0; dx < 4; dx++)
            sz[(by + dy) * nw16 + (bx + dx)] = 64;
    }

  // expand the per-16 grids to per-8-cell maps and run the shared walk
  const int w8 = wk.w8, h8 = wk.h8;
  std::vector<int32_t> cmv(2 * w8 * h8), cref(w8 * h8);
  std::vector<uint8_t> ccbf(w8 * h8);
  for (int y8 = 0; y8 < h8; y8++)
    for (int x8 = 0; x8 < w8; x8++) {
      int b = (y8 / 2) * nw16 + (x8 / 2);
      int c = y8 * w8 + x8;
      cmv[2 * c] = mvx[b];
      cmv[2 * c + 1] = mvy[b];
      cref[c] = ref[b];
      ccbf[c] = cbf[b];
    }
  std::vector<Cu> cus;
  cus.reserve(nh16 * nw16);
  for (int by = 0; by < nh16; by++)
    for (int bx = 0; bx < nw16; bx++) {
      int s = sz[by * nw16 + bx];
      int x0 = bx * 16, y0 = by * 16;
      if (x0 % s || y0 % s) continue;
      cus.push_back({x0, y0, s, wk.ord(x0 / 8, y0 / 8), 0});
    }
  walk_cus(wk, cus, cmv.data(), cref.data(), ccbf.data(), cu_log2,
           mv_out, ref_out, skip, merge_flag, merge_idx, mvp_flag, mvd);
  return 0;
}
