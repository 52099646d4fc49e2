// Native closed-loop intra coding walk for the quadtree I-frame encoder.
//
// Host-side counterpart of tpuhevc/codec/intra_qt._walk + _code_tb +
// codec/refsamples.gather_refs_qt + ops/intra predict_block_np +
// ops/transforms (forward/quant/rdoq/dequant/inverse) + the SBH
// quantizer post-pass (entropy/residual.apply_sign_bit_hiding).
// Semantics mirror the Python twin EXACTLY (same float64 RDOQ proxy,
// same integer transforms) so the two produce byte-identical streams —
// tested in tests/test_intra_qt.py. The Python walk costs ~0.7 s per
// 416x240 I-frame (per-TB numpy overheads); this runs in ~10 ms.
//
// Reference counterparts: TEncSearch::xIntraCodingLumaBlk /
// xIntraCodingChromaBlk (TEncSearch.cpp:980-1780), TComPrediction
// predIntraAngular/Planar/DC, TComTrQuant::xQuant + signBitHidingHDQ
// (TComTrQuant.cpp:991), TComPattern::initAdiPattern (§8.4.4.2
// substitution). Tables (transform matrices, scan orders) are passed in
// from the Python side; only normative arithmetic lives here.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// §8.4.4.2.6 intraPredAngle / invAngle tables (normative constants)
const int kAngle[33] = {32, 26, 21, 17, 13, 9,  5,  2,  0,  -2, -5,
                        -9, -13, -17, -21, -26, -32, -26, -21, -17, -13,
                        -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26, 32};
const int kInvAngle[15] = {-4096, -1638, -910, -630, -482, -390, -315,
                           -256,  -315,  -390, -482, -630, -910, -1638,
                           -4096};

inline int modeAngle(int mode) { return kAngle[mode - 2]; }
inline int modeInvAngle(int mode) { return kInvAngle[mode - 11]; }

inline bool filterFlag(int mode, int log2) {
  if (mode == 1 || log2 == 2) return false;
  int md = std::min(std::abs(mode - 10), std::abs(mode - 26));
  if (mode == 0) md = 10;
  int thr = log2 == 3 ? 7 : (log2 == 4 ? 1 : 0);
  return md > thr;
}

struct Ctx {
  int W, H, bd, qp, qpc, sdh, rdoq, strong;
  int64_t lam_fp;
  // estBitsSbac-style RDOQ tables (v2; null = Golomb-proxy fallback).
  // Entry (log2-2)*2 + isLuma at rdoq_off: [sig0 S*S][sig1 S*S]
  // [g1_0 g1_1 g10_0 g10_1 g2_0 g2_1 g20_0 g20_1 csbf0 csbf1].
  const double *rdoq_tb = nullptr;
  const int64_t *rdoq_off = nullptr;
  double lam_scale_c = 1.0;
  const int64_t *order8, *smin8;
  int w8, h8;
  int32_t *rec_y, *rec_u, *rec_v;
  const int32_t *org_y, *org_u, *org_v;
  int32_t *coef_y, *coef_cb, *coef_cr;
  const int32_t *scans, *scan_off;  // (log2-2)*3+scan_idx -> offset
  const int32_t *mats, *mat_off;    // per size 4,8,16,32 row-major
};

inline bool precedes(const Ctx &c, int nx, int ny, int cx, int cy) {
  if (nx < 0 || ny < 0 || nx >= c.w8 || ny >= c.h8) return false;
  int64_t no = c.order8[ny * c.w8 + nx], co = c.order8[cy * c.w8 + cx];
  if (no >= co) return false;
  if (c.smin8 && no < c.smin8[cy * c.w8 + cx]) return false;
  return true;
}

// §8.4.4.2.2 reference-sample gathering with substitution; mirror of
// refsamples.gather_refs_qt (availability per cell-sized sub-run).
void gatherRefs(const Ctx &c, const int32_t *plane, int pw, int ph, int x0,
                int y0, int s, int cell, int32_t *top, int32_t *left) {
  int cx8 = x0 / cell, cy8 = y0 / cell;
  int nrun = s / cell;
  int total = 4 * s + 1;
  std::vector<int32_t> arr(total);
  std::vector<uint8_t> av(total, 0);
  int pos = 0;
  auto colv = [&](int px, int py, int n, int32_t *out) {
    int py2 = std::min(py, ph - 1);
    int end = std::min(py2 + n, ph);
    int m = end - py2;
    for (int i = 0; i < m; i++) out[i] = plane[(py2 + i) * pw + px];
    for (int i = m; i < n; i++) out[i] = m > 0 ? out[m - 1] : 0;
  };
  auto rowv = [&](int px, int py, int n, int32_t *out) {
    int end = std::min(px + n, pw);
    int m = end - px;
    for (int i = 0; i < m; i++) out[i] = plane[py * pw + px + i];
    for (int i = m; i < n; i++) out[i] = m > 0 ? out[m - 1] : 0;
  };
  int32_t tmp[64];
  // left-below (bottom-most cell first), reversed inside
  for (int j = nrun - 1; j >= 0; j--) {
    bool a = precedes(c, cx8 - 1, cy8 + nrun + j, cx8, cy8) &&
             (y0 + s + j * cell) < ph;
    if (a) {
      colv(x0 - 1, y0 + s + j * cell, cell, tmp);
      for (int i = 0; i < cell; i++) {
        arr[pos + i] = tmp[cell - 1 - i];
        av[pos + i] = 1;
      }
    }
    pos += cell;
  }
  // left (bottom cell first), reversed inside
  for (int j = nrun - 1; j >= 0; j--) {
    bool a = precedes(c, cx8 - 1, cy8 + j, cx8, cy8);
    if (a) {
      colv(x0 - 1, y0 + j * cell, cell, tmp);
      for (int i = 0; i < cell; i++) {
        arr[pos + i] = tmp[cell - 1 - i];
        av[pos + i] = 1;
      }
    }
    pos += cell;
  }
  // corner
  {
    bool a = precedes(c, cx8 - 1, cy8 - 1, cx8, cy8);
    if (a) {
      arr[pos] = plane[(y0 - 1) * pw + (x0 - 1)];
      av[pos] = 1;
    }
    pos += 1;
  }
  // top
  for (int j = 0; j < nrun; j++) {
    bool a = precedes(c, cx8 + j, cy8 - 1, cx8, cy8);
    if (a) {
      rowv(x0 + j * cell, y0 - 1, cell, &arr[pos]);
      for (int i = 0; i < cell; i++) av[pos + i] = 1;
    }
    pos += cell;
  }
  // top-right
  for (int j = 0; j < nrun; j++) {
    bool a = precedes(c, cx8 + nrun + j, cy8 - 1, cx8, cy8) &&
             (x0 + s + j * cell) < pw;
    if (a) {
      rowv(x0 + s + j * cell, y0 - 1, cell, &arr[pos]);
      for (int i = 0; i < cell; i++) av[pos + i] = 1;
    }
    pos += cell;
  }
  bool any = false;
  for (int i = 0; i < total; i++) any |= (av[i] != 0);
  if (!any) {
    int32_t fill = 1 << (c.bd - 1);
    for (int i = 0; i <= 2 * s; i++) top[i] = left[i] = fill;
    return;
  }
  int first = 0;
  while (!av[first]) first++;
  for (int i = 0; i < first; i++) arr[i] = arr[first];
  for (int i = std::max(first, 1); i < total; i++)
    if (!av[i]) arr[i] = arr[i - 1];
  // arr = [left reversed (2s), corner, top row (2s)]
  top[0] = arr[2 * s];
  for (int i = 0; i < 2 * s; i++) top[1 + i] = arr[2 * s + 1 + i];
  left[0] = arr[2 * s];
  for (int i = 0; i < 2 * s; i++) left[1 + i] = arr[2 * s - 1 - i];
}

// §8.4.4.2.3 smoothing (incl. 32x32 strong bi-linear)
void smoothRefs(const int32_t *t, const int32_t *l, int s, bool strong,
                int32_t *ft, int32_t *fl) {
  int s2 = 2 * s;
  if (strong) {
    int tl = t[0], tr = t[s2], bl = l[s2];
    ft[0] = t[0];
    fl[0] = l[0];
    ft[s2] = t[s2];
    fl[s2] = l[s2];
    for (int i = 1; i < s2; i++) {
      ft[i] = ((s2 - i) * tl + i * tr + 32) >> 6;
      fl[i] = ((s2 - i) * tl + i * bl + 32) >> 6;
    }
    return;
  }
  ft[0] = fl[0] = (l[1] + 2 * t[0] + t[1] + 2) >> 2;
  for (int i = 1; i < s2; i++) {
    ft[i] = (t[i - 1] + 2 * t[i] + t[i + 1] + 2) >> 2;
    fl[i] = (l[i - 1] + 2 * l[i] + l[i + 1] + 2) >> 2;
  }
  ft[s2] = t[s2];
  fl[s2] = l[s2];
}

bool strongOk(const int32_t *t, const int32_t *l, int s, int bd) {
  int s2 = 2 * s;
  int thr = 1 << (bd - 5);
  return std::abs(t[0] + t[s2] - 2 * t[s]) < thr &&
         std::abs(l[0] + l[s2] - 2 * l[s]) < thr;
}

// §8.4.4.2.4-2.6 prediction (planar / DC / angular with extension)
void predict(const int32_t *t, const int32_t *l, int mode, int s, int bd,
             int32_t *pred /* s*s */) {
  if (mode == 0) {  // planar
    int lg = 0;
    while ((1 << lg) < s) lg++;
    int tr = t[s + 1], bl = l[s + 1];
    for (int y = 0; y < s; y++)
      for (int x = 0; x < s; x++)
        pred[y * s + x] = ((s - 1 - x) * l[1 + y] + (x + 1) * tr +
                           (s - 1 - y) * t[1 + x] + (y + 1) * bl + s) >>
                          (lg + 1);
    return;
  }
  if (mode == 1) {  // DC
    int lg = 0;
    while ((1 << lg) < s) lg++;
    int64_t sum = s;
    for (int i = 1; i <= s; i++) sum += t[i] + l[i];
    int dc = int(sum >> (lg + 1));
    for (int i = 0; i < s * s; i++) pred[i] = dc;
    return;
  }
  int angle = modeAngle(mode);
  bool ver = mode >= 18;
  const int32_t *main_ = ver ? t : l;
  const int32_t *side = ver ? l : t;
  std::vector<int32_t> ref(3 * s + 2, 0);
  for (int i = 0; i <= 2 * s; i++) ref[s + i] = main_[i];
  ref[3 * s + 1] = main_[2 * s];
  if (angle < 0) {
    int inv = modeInvAngle(mode);
    int need = (s * angle) >> 5;
    if (need < -1)
      for (int x = -1; x >= need; x--)
        ref[s + x] = side[((x * inv + 128) >> 8)];
  }
  for (int y = 1; y <= s; y++) {
    int pos = y * angle;
    int idx = pos >> 5, frac = pos & 31;
    for (int x = 0; x < s; x++) {
      int a = ref[s + idx + x + 1], b = ref[s + idx + x + 2];
      int v = ((32 - frac) * a + frac * b + 16) >> 5;
      if (ver)
        pred[(y - 1) * s + x] = v;
      else
        pred[x * s + (y - 1)] = v;  // transpose
    }
  }
}

void postFilter(int32_t *p, const int32_t *t, const int32_t *l, int mode,
                int s, int bd) {
  int maxv = (1 << bd) - 1;
  if (mode == 1) {
    int dc = p[0];
    for (int x = 1; x < s; x++) p[x] = (t[1 + x] + 3 * dc + 2) >> 2;
    for (int y = 1; y < s; y++) p[y * s] = (l[1 + y] + 3 * dc + 2) >> 2;
    p[0] = (l[1] + 2 * dc + t[1] + 2) >> 2;
  } else if (mode == 26) {
    for (int y = 0; y < s; y++)
      p[y * s] = std::clamp(t[1] + ((l[1 + y] - l[0]) >> 1), 0, maxv);
  } else if (mode == 10) {
    for (int x = 0; x < s; x++)
      p[x] = std::clamp(l[1] + ((t[1 + x] - t[0]) >> 1), 0, maxv);
  }
}

inline int32_t sshift(int64_t v, int sh) {  // floor shift (numpy >>)
  return int32_t(v >> sh);
}

// forward transform: two matrix stages (ops/transforms.py:32)
void fwdTransform(const Ctx &c, const int32_t *resi, int s, int32_t *out) {
  int log2 = 0;
  while ((1 << log2) < s) log2++;
  const int32_t *m = c.mats + c.mat_off[log2 - 2];
  int s1 = log2 + c.bd - 9, s2 = log2 + 6;
  std::vector<int64_t> h(s * s);
  // h = (r @ t.T + rnd) >> s1  -> h[i][j] = sum_k r[i][k]*m[j][k]
  int64_t r1 = int64_t(1) << (s1 - 1);
  for (int i = 0; i < s; i++)
    for (int j = 0; j < s; j++) {
      int64_t acc = r1;
      for (int k = 0; k < s; k++)
        acc += int64_t(resi[i * s + k]) * m[j * s + k];
      h[i * s + j] = acc >> s1;
    }
  // c = (t @ h + rnd) >> s2  -> out[i][j] = sum_k m[i][k]*h[k][j]
  int64_t r2 = int64_t(1) << (s2 - 1);
  for (int i = 0; i < s; i++)
    for (int j = 0; j < s; j++) {
      int64_t acc = r2;
      for (int k = 0; k < s; k++) acc += int64_t(m[i * s + k]) * h[k * s + j];
      out[i * s + j] = int32_t(acc >> s2);
    }
}

void invTransform(const Ctx &c, const int32_t *coef, int s, int32_t *out) {
  int log2 = 0;
  while ((1 << log2) < s) log2++;
  const int32_t *m = c.mats + c.mat_off[log2 - 2];
  std::vector<int32_t> g(s * s);
  // g = (t.T @ c + 64) >> 7, clip +-32767
  for (int i = 0; i < s; i++)
    for (int j = 0; j < s; j++) {
      int64_t acc = 64;
      for (int k = 0; k < s; k++)
        acc += int64_t(m[k * s + i]) * coef[k * s + j];
      g[i * s + j] = std::clamp(int32_t(acc >> 7), -32768, 32767);
    }
  int s2 = 20 - c.bd;
  int64_t r2 = int64_t(1) << (s2 - 1);
  for (int i = 0; i < s; i++)
    for (int j = 0; j < s; j++) {
      int64_t acc = r2;
      for (int k = 0; k < s; k++) acc += int64_t(g[i * s + k]) * m[k * s + j];
      out[i * s + j] =
          std::clamp(int32_t(acc >> s2), -32768, 32767);
    }
}

const int kQuantScales[6] = {26214, 23302, 20560, 18396, 16384, 14564};
const int kInvQuantScales[6] = {40, 45, 51, 57, 64, 72};
const int MAX_TR_DYNAMIC_RANGE = 15;

void quantTB(const Ctx &c, const int32_t *coef, int s, int qp, bool rdoq,
             int32_t *lvl, double *ideal, bool isLuma = true) {
  int log2 = 0;
  while ((1 << log2) < s) log2++;
  int qpe = qp + 6 * (c.bd - 8);
  int per = qpe / 6, rem = qpe % 6;
  int tshift = MAX_TR_DYNAMIC_RANGE - c.bd - log2;
  int qbits = 14 + per + tshift;
  int scale = kQuantScales[rem];
  for (int i = 0; i < s * s; i++)
    ideal[i] = double(coef[i]) * scale / double(int64_t(1) << qbits);
  if (!rdoq) {
    int64_t add = int64_t(171) << (qbits - 9);  // intra slice rounding
    for (int i = 0; i < s * s; i++) {
      int64_t l = (std::abs(int64_t(coef[i])) * scale + add) >> qbits;
      l = coef[i] < 0 ? -l : l;
      lvl[i] = int32_t(std::clamp<int64_t>(l, -32768, 32767));
    }
    return;
  }
  if (c.rdoq_tb) {
    // table-cost RDOQ — double twin of ops/transforms.rdoq_est_xp
    // (TComTrQuant::xGetCodedLevel semantics with frozen-context
    // fractional-bit tables; see the Python docstring for provenance)
    const double *tb = c.rdoq_tb + c.rdoq_off[(log2 - 2) * 2 + (isLuma ? 1 : 0)];
    const double *s0 = tb, *s1 = tb + s * s;
    const double *sc2 = tb + 2 * s * s;
    const double g1_0 = sc2[0], g1_1 = sc2[1], g10_0 = sc2[2], g10_1 = sc2[3];
    const double g2_0 = sc2[4], g2_1 = sc2[5], g20_0 = sc2[6], g20_1 = sc2[7];
    const double csbf0 = sc2[8], csbf1 = sc2[9];
    double lam = double(c.lam_fp) / 256.0 * (isLuma ? 1.0 : c.lam_scale_c);
    double q = double(int64_t(1) << qbits);
    double errDen = double(scale) * double(int64_t(1) << tshift);
    int cgw = s > 4 ? s / 4 : 1;
    std::vector<double> acv(s * s), lmaxv(s * s), best(s * s);
    for (int i = 0; i < s * s; i++) {
      acv[i] = std::abs(double(coef[i])) * scale;
      lmaxv[i] = std::ceil(acv[i] / q);
    }
    // per-CG Rice parameter from the ceiling levels
    std::vector<int> riceCG(cgw * cgw, 0);
    if (s > 4) {
      for (int cy = 0; cy < cgw; cy++)
        for (int cx = 0; cx < cgw; cx++) {
          double mx = 0;
          for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++)
              mx = std::max(mx, lmaxv[(cy * 4 + y) * s + cx * 4 + x]);
          double r = mx > 6.0 ? std::log2(std::max(mx, 1.0) / 3.0) : 0.0;
          riceCG[cy * cgw + cx] =
              int(std::clamp(r, 0.0, 4.0));
        }
    } else {
      double mx = 0;
      for (int i = 0; i < s * s; i++) mx = std::max(mx, lmaxv[i]);
      double r = mx > 6.0 ? std::log2(std::max(mx, 1.0) / 3.0) : 0.0;
      riceCG[0] = int(std::clamp(r, 0.0, 4.0));
    }
    auto lvlBits = [&](int i, int cg0, int rice, double level) {
      double ricef = double(1 << rice);
      double rem_ = std::max(level - 3.0, 0.0);
      double three = 3.0 * ricef;
      double rl = rem_ < three
                      ? std::floor(rem_ / ricef) + 1.0 + rice
                      : 4.0 + rice + 2.0 * std::floor(std::log2(
                            std::max(rem_ - three, 0.0) / ricef + 1.0));
      double gt1_0 = cg0 ? g10_0 : g1_0, gt1_1 = cg0 ? g10_1 : g1_1;
      double gt2_0 = cg0 ? g20_0 : g2_0, gt2_1 = cg0 ? g20_1 : g2_1;
      return s1[i] + 1.0 + gt1_0 +
             (level > 1.0
                  ? gt1_1 - gt1_0 + gt2_0 +
                        (level > 2.0 ? gt2_1 - gt2_0 + rl : 0.0)
                  : 0.0);
    };
    auto costOf = [&](int i, int cg0, int rice, double level) {
      double d = (acv[i] - level * q) / errDen;
      double bits = level > 0 ? lvlBits(i, cg0, rice, level) : s0[i];
      return d * d + lam * bits;
    };
    for (int i = 0; i < s * s; i++) {
      int y = i / s, x = i % s;
      int cg0 = (s <= 4) || (y < 4 && x < 4);
      int rice = riceCG[(y / 4) * cgw + (x / 4)];
      if (s <= 4) rice = riceCG[0];
      double l1 = std::max(lmaxv[i], 0.0), l2 = std::max(lmaxv[i] - 1.0, 0.0);
      double b = costOf(i, cg0, rice, l1) <= costOf(i, cg0, rice, l2) ? l1 : l2;
      if (!(costOf(i, cg0, rice, b) <= costOf(i, cg0, rice, 0.0))) b = 0.0;
      best[i] = b;
    }
    if (s > 4) {
      for (int cy = 0; cy < cgw; cy++)
        for (int cx = 0; cx < cgw; cx++) {
          int cg0 = (cy == 0 && cx == 0);
          int rice = riceCG[cy * cgw + cx];
          double ck = 0, cz = 0;
          for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
              int i = (cy * 4 + y) * s + cx * 4 + x;
              double dz = (acv[i] - best[i] * q) / errDen;
              double kb = best[i] > 0 ? lvlBits(i, cg0, rice, best[i]) : s0[i];
              ck += dz * dz + lam * kb;
              double acn = acv[i] / errDen;
              cz += acn * acn;
            }
          if (!(ck + lam * csbf1 <= cz + lam * csbf0))
            for (int y = 0; y < 4; y++)
              for (int x = 0; x < 4; x++)
                best[(cy * 4 + y) * s + cx * 4 + x] = 0.0;
        }
    }
    for (int i = 0; i < s * s; i++) {
      double l = coef[i] < 0 ? -best[i] : (coef[i] > 0 ? best[i] : 0.0);
      lvl[i] = int32_t(std::clamp(l, -32767.0, 32767.0));
    }
    return;
  }
  // RDOQ proxy — float64 twin of ops/transforms.rdoq_xp
  double lam = 1.5 * double(c.lam_fp) / 256.0;
  double errDen = double(scale) * double(int64_t(1) << tshift);
  double q = double(int64_t(1) << qbits);
  std::vector<int64_t> best(s * s);
  auto cost = [&](double ac, int64_t l) {
    double d = (ac - double(l) * q) / errDen;
    double bits =
        l > 0 ? 2.0 * std::floor(std::log2(double(std::max<int64_t>(l, 1)))) +
                    4.0
              : 0.0;
    return d * d + lam * bits;
  };
  for (int i = 0; i < s * s; i++) {
    double ac = std::abs(double(coef[i])) * scale;
    int64_t lmax = int64_t(std::ceil(ac / q));
    int64_t l1 = std::max<int64_t>(lmax, 0), l2 = std::max<int64_t>(lmax - 1, 0);
    int64_t b = cost(ac, l1) <= cost(ac, l2) ? l1 : l2;
    if (cost(ac, b) > cost(ac, 0)) b = 0;
    best[i] = b;
  }
  // per-4x4-CG zero trial
  for (int cy = 0; cy < s; cy += 4)
    for (int cx = 0; cx < s; cx += 4) {
      double dz2 = 0, z2 = 0, bits_cg = 4.0;
      for (int y = 0; y < 4; y++)
        for (int x = 0; x < 4; x++) {
          int i = (cy + y) * s + cx + x;
          double ac = std::abs(double(coef[i])) * scale;
          double dz = (ac - double(best[i]) * q) / errDen;
          dz2 += dz * dz;
          double cn = ac / errDen;
          z2 += cn * cn;
          if (best[i] > 0)
            bits_cg += 2.0 * std::floor(std::log2(
                                 double(std::max<int64_t>(best[i], 1)))) +
                       4.0;
        }
      if (!(dz2 + lam * bits_cg <= z2 + lam * 1.0))
        for (int y = 0; y < 4; y++)
          for (int x = 0; x < 4; x++) best[(cy + y) * s + cx + x] = 0;
    }
  for (int i = 0; i < s * s; i++) {
    int64_t l = coef[i] < 0 ? -best[i] : (coef[i] > 0 ? best[i] : 0);
    lvl[i] = int32_t(std::clamp<int64_t>(l, -32768, 32767));
  }
}

void dequantTB(const Ctx &c, const int32_t *lvl, int s, int qp,
               int32_t *out) {
  int log2 = 0;
  while ((1 << log2) < s) log2++;
  int qpe = qp + 6 * (c.bd - 8);
  int per = qpe / 6, rem = qpe % 6;
  int bdshift = c.bd + log2 - 5;
  int64_t scale = 16 * kInvQuantScales[rem];
  for (int i = 0; i < s * s; i++) {
    int64_t x = int64_t(lvl[i]) * scale;
    int64_t d;
    if (per < bdshift) {
      int sh = bdshift - per;
      d = (x + (int64_t(1) << (sh - 1))) >> sh;
    } else {
      d = x << (per - bdshift);
    }
    out[i] = int32_t(std::clamp<int64_t>(d, -32768, 32767));
  }
}

const int SBH_THRESHOLD = 4;

// signBitHidingHDQ with the deltaU (ideal-level) criterion; twin of
// entropy/residual.apply_sign_bit_hiding
void sbhTB(const Ctx &c, int32_t *lvl, const double *ideal, int s,
           const int32_t *scan) {
  int n = s * s, ncg = std::max(1, n >> 4);
  std::vector<int32_t> sv(n);
  std::vector<double> iv(n);
  for (int i = 0; i < n; i++) {
    sv[i] = lvl[scan[i]];
    iv[i] = ideal[scan[i]];
  }
  for (int cg = 0; cg < ncg; cg++) {
    int32_t *seg = &sv[cg * 16];
    const double *iseg = &iv[cg * 16];
    int first = -1, last = -1;
    for (int i = 0; i < 16; i++)
      if (seg[i]) {
        if (first < 0) first = i;
        last = i;
      }
    if (first < 0 || last - first < SBH_THRESHOLD) continue;
    int64_t absSum = 0;
    for (int i = 0; i < 16; i++) absSum += std::abs(seg[i]);
    int want = seg[first] < 0 ? 1 : 0;
    if ((absSum & 1) == want) continue;
    double bestErr = 0;
    int bp = -1;
    int64_t bna = 0;
    for (int p = first; p <= last; p++) {
      int64_t la = std::abs(int64_t(seg[p]));
      for (int dd = 0; dd < 2; dd++) {
        int64_t na = dd == 0 ? la + 1 : la - 1;
        if (na < 0 || (p == first && na == 0)) continue;
        double err = std::abs(double(na) - std::abs(iseg[p]));
        if (bp < 0 || err < bestErr) {
          bestErr = err;
          bp = p;
          bna = na;
        }
      }
    }
    int sgn = seg[bp] > 0 ? 1 : (seg[bp] < 0 ? -1 : (iseg[bp] >= 0 ? 1 : -1));
    seg[bp] = int32_t(sgn * bna);
  }
  for (int i = 0; i < n; i++) lvl[scan[i]] = sv[i];
}

inline int scanIdxOf(int mode, int log2, bool isLuma) {
  if (log2 == 2 || (log2 == 3 && isLuma)) {
    if (mode >= 6 && mode <= 14) return 2;   // SCAN_VER
    if (mode >= 22 && mode <= 30) return 1;  // SCAN_HOR
  }
  return 0;  // SCAN_DIAG
}

void codeTB(const Ctx &c, int32_t *plane, int32_t *coefPl,
            const int32_t *origPl, int pw, int ph, int x0, int y0, int s,
            int mode, int qp, bool isLuma, int cell) {
  bool enc = origPl != nullptr;  // decode mode: read coefPl instead
  int log2 = 0;
  while ((1 << log2) < s) log2++;
  std::vector<int32_t> top(2 * s + 1), left(2 * s + 1);
  gatherRefs(c, plane, pw, ph, x0, y0, s, cell, top.data(), left.data());
  std::vector<int32_t> ft(2 * s + 1), fl(2 * s + 1);
  const int32_t *ut = top.data(), *ul = left.data();
  if (isLuma && filterFlag(mode, log2)) {
    bool strong = log2 == 5 && c.strong &&
                  strongOk(top.data(), left.data(), s, c.bd);
    smoothRefs(top.data(), left.data(), s, strong, ft.data(), fl.data());
    ut = ft.data();
    ul = fl.data();
  }
  std::vector<int32_t> pred(s * s);
  predict(ut, ul, mode, s, c.bd, pred.data());
  if (isLuma && s < 32)
    postFilter(pred.data(), top.data(), left.data(), mode, s, c.bd);

  std::vector<int32_t> lvl(s * s);
  if (enc) {
    std::vector<int32_t> resi(s * s), coefb(s * s);
    std::vector<double> ideal(s * s);
    for (int y = 0; y < s; y++)
      for (int x = 0; x < s; x++)
        resi[y * s + x] = origPl[(y0 + y) * pw + x0 + x] - pred[y * s + x];
    fwdTransform(c, resi.data(), s, coefb.data());
    quantTB(c, coefb.data(), s, qp, c.rdoq != 0, lvl.data(), ideal.data(),
            isLuma);
    if (c.sdh) {
      int si = scanIdxOf(mode, log2, isLuma);
      const int32_t *scan = c.scans + c.scan_off[(log2 - 2) * 3 + si];
      sbhTB(c, lvl.data(), ideal.data(), s, scan);
    }
  } else {
    for (int y = 0; y < s; y++)
      for (int x = 0; x < s; x++)
        lvl[y * s + x] = coefPl[(y0 + y) * pw + x0 + x];
  }
  bool any = false;
  for (int i = 0; i < s * s; i++) any |= (lvl[i] != 0);
  if (enc)
    for (int y = 0; y < s; y++)
      for (int x = 0; x < s; x++)
        coefPl[(y0 + y) * pw + x0 + x] = lvl[y * s + x];
  int maxv = (1 << c.bd) - 1;
  if (any) {
    std::vector<int32_t> dq(s * s), r(s * s);
    dequantTB(c, lvl.data(), s, qp, dq.data());
    invTransform(c, dq.data(), s, r.data());
    for (int y = 0; y < s; y++)
      for (int x = 0; x < s; x++)
        plane[(y0 + y) * pw + x0 + x] =
            std::clamp(pred[y * s + x] + r[y * s + x], 0, maxv);
  } else {
    for (int y = 0; y < s; y++)
      for (int x = 0; x < s; x++)
        plane[(y0 + y) * pw + x0 + x] = pred[y * s + x];
  }
}

}  // namespace

extern "C" int tpuhevc_intra_walk_v2(
    int W, int H, int bd, int qp, int qpc, int sdh, int rdoq, int strong,
    int64_t lam_fp, const int32_t *cu, int n_cu, const int64_t *order8,
    const int64_t *smin8, int32_t *rec_y, int32_t *rec_u, int32_t *rec_v,
    const int32_t *org_y, const int32_t *org_u, const int32_t *org_v,
    int32_t *coef_y, int32_t *coef_cb, int32_t *coef_cr,
    const int32_t *scans, const int32_t *scan_off, const int32_t *mats,
    const int32_t *mat_off, const double *rdoq_tb, const int64_t *rdoq_off,
    double lam_scale_c) {
  Ctx c;
  c.W = W; c.H = H; c.bd = bd; c.qp = qp; c.qpc = qpc; c.sdh = sdh;
  c.rdoq = rdoq; c.strong = strong; c.lam_fp = lam_fp;
  c.order8 = order8; c.smin8 = smin8; c.w8 = W / 8; c.h8 = H / 8;
  c.rec_y = rec_y; c.rec_u = rec_u; c.rec_v = rec_v;
  c.org_y = org_y; c.org_u = org_u; c.org_v = org_v;
  c.coef_y = coef_y; c.coef_cb = coef_cb; c.coef_cr = coef_cr;
  c.scans = scans; c.scan_off = scan_off; c.mats = mats; c.mat_off = mat_off;
  c.rdoq_tb = rdoq_tb; c.rdoq_off = rdoq_off; c.lam_scale_c = lam_scale_c;
  int cw = W / 2, ch = H / 2;
  for (int i = 0; i < n_cu; i++) {
    int x8 = cu[i * 5], y8 = cu[i * 5 + 1], log2 = cu[i * 5 + 2];
    int mode = cu[i * 5 + 3], cmode = cu[i * 5 + 4];
    int s = 1 << log2;
    codeTB(c, rec_y, coef_y, org_y, W, H, x8 * 8, y8 * 8, s, mode, qp, true,
           8);
    int cs = std::max(4, s / 2);
    codeTB(c, rec_u, coef_cb, org_u, cw, ch, x8 * 4, y8 * 4, cs, cmode, qpc,
           false, 4);
    codeTB(c, rec_v, coef_cr, org_v, cw, ch, x8 * 4, y8 * 4, cs, cmode, qpc,
           false, 4);
  }
  return 0;
}

extern "C" int tpuhevc_intra_walk(
    int W, int H, int bd, int qp, int qpc, int sdh, int rdoq, int strong,
    int64_t lam_fp, const int32_t *cu, int n_cu, const int64_t *order8,
    const int64_t *smin8, int32_t *rec_y, int32_t *rec_u, int32_t *rec_v,
    const int32_t *org_y, const int32_t *org_u, const int32_t *org_v,
    int32_t *coef_y, int32_t *coef_cb, int32_t *coef_cr,
    const int32_t *scans, const int32_t *scan_off, const int32_t *mats,
    const int32_t *mat_off) {
  return tpuhevc_intra_walk_v2(W, H, bd, qp, qpc, sdh, rdoq, strong, lam_fp,
                               cu, n_cu, order8, smin8, rec_y, rec_u, rec_v,
                               org_y, org_u, org_v, coef_y, coef_cb, coef_cr,
                               scans, scan_off, mats, mat_off, nullptr,
                               nullptr, 1.0);
}
