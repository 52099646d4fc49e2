// Native slice-data entropy encoder (CABAC + HEVC intra syntax).
//
// Hot-path counterpart of tpuhevc/entropy/{cabac,residual,syntax}.py — the
// Python layer stays the readable reference; this C++ path must produce
// byte-identical output (tested in tests/test_native_entropy.py). Mirrors
// the role the reference keeps native in TLibEncoder (TEncBinCoderCABAC /
// TEncSbac / codeCoeffNxN). Normative tables are generated from the Python
// source of truth (tools/gen_ctx_header.py -> ctx_tables.inc).
//
// Build: tools/build_native.sh  ->  native/libtpuhevc_entropy.so (ctypes).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "ctx_tables.inc"

namespace {

// ---------------------------------------------------------------- tables
static const int kSigCtx4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                   6, 6, 8, 8, 7, 7, 8, 8};
static const int kGroupIdx[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6,
                                  6, 7, 7, 7, 7, 8, 8, 8, 8, 8, 8,
                                  8, 8, 9, 9, 9, 9, 9, 9, 9, 9};
static const int kMinInGroup[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};

// scan tables: [log2-2][scan_idx] -> raster positions in scan order
static std::vector<int> g_scan[4][3];

static void build_diag(int size, std::vector<std::pair<int, int>>& out) {
  for (int d = 0; d < 2 * size - 1; d++) {
    int y = d < size ? d : size - 1;
    while (y >= 0 && d - y < size) {
      out.push_back({d - y, y});
      y--;
    }
  }
}

static void init_scans() {
  if (!g_scan[0][0].empty()) return;
  for (int l = 2; l <= 5; l++) {
    int size = 1 << l;
    for (int s = 0; s < 3; s++) {
      std::vector<std::pair<int, int>> inner, groups;
      if (s == 0) build_diag(4, inner);
      if (s == 1)
        for (int y = 0; y < 4; y++)
          for (int x = 0; x < 4; x++) inner.push_back({x, y});
      if (s == 2)
        for (int x = 0; x < 4; x++)
          for (int y = 0; y < 4; y++) inner.push_back({x, y});
      std::vector<int>& sc = g_scan[l - 2][s];
      sc.clear();
      if (size == 4) {
        for (auto& p : inner) sc.push_back(p.second * 4 + p.first);
        continue;
      }
      int ng = size >> 2;
      if (s == 0) build_diag(ng, groups);
      if (s == 1)
        for (int y = 0; y < ng; y++)
          for (int x = 0; x < ng; x++) groups.push_back({x, y});
      if (s == 2)
        for (int x = 0; x < ng; x++)
          for (int y = 0; y < ng; y++) groups.push_back({x, y});
      for (auto& gxy : groups)
        for (auto& p : inner)
          sc.push_back((gxy.second * 4 + p.second) * size + gxy.first * 4 +
                       p.first);
    }
  }
}

// ---------------------------------------------------------------- engine
struct Cabac {
  uint32_t low = 0, range = 510;
  int bits_left = 23;
  int buffered = 0xFF, num_buffered = 0;
  std::vector<uint8_t> out;
  uint8_t ctx[512];
#ifdef TRACE_BINS
  FILE* tf = nullptr;
  void trace(const char* kind, int val, int idx) {
    if (!tf) tf = fopen("/tmp/native_bins.txt", "w");
    fprintf(tf, "%s %d %d\n", kind, val, idx);
  }
#endif

  void init_ctx(int slice_type_row, int qp) {
    const unsigned char* init =
        slice_type_row == 0 ? kInitB : (slice_type_row == 1 ? kInitP : kInitI);
    if (qp < 0) qp = 0;
    if (qp > 51) qp = 51;
    for (int i = 0; i < kNumCtx; i++) {
      int v = init[i];
      int slope = (v >> 4) * 5 - 45;
      int offset = ((v & 15) << 3) - 16;
      int st = ((slope * qp) >> 4) + offset;
      if (st < 1) st = 1;
      if (st > 126) st = 126;
      int mps = st >= 64;
      ctx[i] = (uint8_t)((((mps ? st - 64 : 63 - st)) << 1) + mps);
    }
  }

  void write_out() {
    uint32_t lead = low >> (24 - bits_left);
    bits_left += 8;
    low &= 0xFFFFFFFFu >> bits_left;
    if (lead == 0xFF) {
      num_buffered++;
    } else if (num_buffered > 0) {
      uint32_t carry = lead >> 8;
      out.push_back((uint8_t)(buffered + carry));
      buffered = lead & 0xFF;
      uint8_t fill = (uint8_t)(0xFF + carry);
      while (num_buffered > 1) {
        out.push_back(fill);
        num_buffered--;
      }
    } else {
      num_buffered = 1;
      buffered = lead & 0xFF;
    }
  }

  inline void bin(int val, int idx) {
#ifdef TRACE_BINS
    trace("B", val, idx);
#endif
    uint8_t s = ctx[idx];
    uint32_t lps = kLpsTable[(s >> 1) * 4 + ((range >> 6) & 3)];
    range -= lps;
    if (val != (s & 1)) {
      int n = kRenorm[lps >> 3];
      low = (low + range) << n;
      range = lps << n;
      ctx[idx] = kNextLps[s];
      bits_left -= n;
    } else {
      ctx[idx] = kNextMps[s];
      if (range >= 256) return;
      low <<= 1;
      range <<= 1;
      bits_left--;
    }
    if (bits_left < 12) write_out();
  }

  inline void ep(int val) {
#ifdef TRACE_BINS
    trace("E", val, -1);
#endif
    low <<= 1;
    if (val) low += range;
    bits_left--;
    if (bits_left < 12) write_out();
  }

  void eps(uint32_t value, int n) {
#ifdef TRACE_BINS
    trace("S", (int)value, n);
#endif
    while (n > 8) {
      n -= 8;
      uint32_t pattern = value >> n;
      low = (low << 8) + range * pattern;
      value -= pattern << n;
      bits_left -= 8;
      if (bits_left < 12) write_out();
    }
    low = (low << n) + range * value;
    bits_left -= n;
    if (bits_left < 12) write_out();
  }

  void trm(int val) {
#ifdef TRACE_BINS
    trace("T", val, -1);
#endif
    range -= 2;
    if (val) {
      low = (low + range) << 7;
      range = 2 << 7;
      bits_left -= 7;
    } else if (range >= 256) {
      return;
    } else {
      low <<= 1;
      range <<= 1;
      bits_left--;
    }
    if (bits_left < 12) write_out();
  }

  // flush + rbsp stop bit + byte align (slice data is byte-aligned after
  // the header, so the payload is a whole-byte string)
  void finish_rbsp() {
    if (low >> (32 - bits_left)) {
      out.push_back((uint8_t)(buffered + 1));
      while (num_buffered > 1) {
        out.push_back(0x00);
        num_buffered--;
      }
      low -= 1u << (32 - bits_left);
    } else {
      if (num_buffered > 0) out.push_back((uint8_t)buffered);
      while (num_buffered > 1) {
        out.push_back(0xFF);
        num_buffered--;
      }
    }
    int nbits = 24 - bits_left;
    uint32_t val = nbits ? ((low >> 8) & ((1u << nbits) - 1)) : 0;
    // append remaining bits + stop bit + zero padding
    uint64_t acc = ((uint64_t)val << 1) | 1;  // + rbsp_stop_one_bit
    int total = nbits + 1;
    int pad = (8 - (total & 7)) & 7;
    acc <<= pad;
    total += pad;
    for (int sh = total - 8; sh >= 0; sh -= 8)
      out.push_back((uint8_t)((acc >> sh) & 0xFF));
  }
};

// ---------------------------------------------------------------- params
struct Frame {
  const int32_t* cu_log2;
  const int32_t* luma_mode;
  const int32_t* chroma_mode;
  const int32_t* coeff_y;
  const int32_t* coeff_cb;
  const int32_t* coeff_cr;
  // inter arrays (P slices; null for I)
  const int32_t* skip;
  const int32_t* merge_flag;
  const int32_t* merge_idx;
  const int32_t* mvp_flag;
  const int32_t* mvd;  // (h8*w8*2)
  const int32_t* ref_idx;  // (h8*w8), may be null (all ref 0)
  int num_ref = 1;
  int w, h, w8, h8, cw;
  int log2_ctu, log2_min_cu, log2_min_tu, log2_max_tu, max_tu_depth_intra;
  int max_tu_depth_inter;
  int slice_type;  // 2 = I, 1 = P
  int max_merge;
  int sign_hiding;
  const int32_t* sao = nullptr;  // per-CTU packed params (18 each)
  int sao_luma = 0, sao_chroma = 0;
  // v3: rectangular inter PUs + intra-CU-in-P (both null for v1/v2)
  const int32_t* part = nullptr;       // per-8-cell: 0 2Nx2N, 1 2NxN, 2 Nx2N
  const int32_t* inter_dir = nullptr;  // per-8-cell: 0 = intra CU (P slice)
  int amp = 0;                         // sps.amp_enabled (AMP "not asym" bin)
  // v4: per-8-cell wanted leaf TU log2 (one-level inter RQT; null =
  // TU = CU everywhere). Twin of syntax._enc_transform_tree_p's
  // fs.tu_log2 consultation.
  const int32_t* tu_want8 = nullptr;
  std::vector<int8_t> depth8;  // decoded-CU depth map (-1 = none)
};

static inline int mode_at(const Frame& f, int x8, int y8) {
  return f.luma_mode[y8 * f.w8 + x8];
}

static int neighbor_mode(const Frame& f, int x0, int y0, bool left) {
  if (left) {
    if (x0 == 0) return 1;
    return mode_at(f, (x0 - 1) >> 3, y0 >> 3);
  }
  if (y0 == 0) return 1;
  if ((y0 - 1) < ((y0 >> f.log2_ctu) << f.log2_ctu)) return 1;
  return mode_at(f, x0 >> 3, (y0 - 1) >> 3);
}

static void mpm_list(int a, int b, int* cand) {
  if (a == b) {
    if (a < 2) {
      cand[0] = 0;
      cand[1] = 1;
      cand[2] = 26;
    } else {
      cand[0] = a;
      cand[1] = 2 + ((a + 29) % 32);
      cand[2] = 2 + ((a - 2 + 1) % 32);
    }
    return;
  }
  cand[0] = a;
  cand[1] = b;
  for (int c : {0, 1, 26}) {
    if (c != a && c != b) {
      cand[2] = c;
      break;
    }
  }
}

static int intra_scan_idx(int mode, int log2, bool luma) {
  if (log2 == 2 || (log2 == 3 && luma)) {
    if (mode >= 6 && mode <= 14) return 2;
    if (mode >= 22 && mode <= 30) return 1;
  }
  return 0;
}

// ------------------------------------------------------------- residual
struct ResidualCoder {
  Cabac& c;
  int c1 = 1;  // persistent only within one TB (reset per call)

  void last_pos(int lx, int ly, int log2, bool luma) {
    int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
    int off, shift;
    if (luma) {
      off = 3 * (log2 - 2) + ((log2 - 1) >> 2);
      shift = (log2 + 1) >> 2;
    } else {
      off = 15;
      shift = log2 - 2;
    }
    int cmax = (log2 << 1) - 1;
    for (int b = 0; b < gx; b++) c.bin(1, kOffLastSigXy + off + (b >> shift));
    if (gx < cmax) c.bin(0, kOffLastSigXy + off + (gx >> shift));
    for (int b = 0; b < gy; b++)
      c.bin(1, kOffLastSigXy + 30 + off + (b >> shift));
    if (gy < cmax) c.bin(0, kOffLastSigXy + 30 + off + (gy >> shift));
    if (gx > 3) c.eps(lx - kMinInGroup[gx], (gx - 2) >> 1);
    if (gy > 3) c.eps(ly - kMinInGroup[gy], (gy - 2) >> 1);
  }

  static int sig_ctx(int x, int y, int prev_csbf, int log2, bool luma,
                     int scan_idx) {
    if (log2 == 2) return kSigCtx4x4[(y << 2) + x];
    if (x == 0 && y == 0) return 0;
    int xp = x & 3, yp = y & 3, s;
    if (prev_csbf == 0)
      s = (xp + yp == 0) ? 2 : (xp + yp < 3 ? 1 : 0);
    else if (prev_csbf == 1)
      s = (yp == 0) ? 2 : (yp == 1 ? 1 : 0);
    else if (prev_csbf == 2)
      s = (xp == 0) ? 2 : (xp == 1 ? 1 : 0);
    else
      s = 2;
    if (luma) {
      if ((x >> 2) || (y >> 2)) s += 3;
      s += (log2 == 3) ? (scan_idx == 0 ? 9 : 15) : 21;
    } else {
      s += (log2 == 3) ? 9 : 12;
    }
    return s;
  }

  void remaining(uint32_t symbol, int rice) {
    if (symbol < (uint32_t)(3 << rice)) {
      int length = symbol >> rice;
      c.eps((1u << (length + 1)) - 2, length + 1);
      c.eps(symbol & ((1u << rice) - 1), rice);
    } else {
      int length = rice;
      symbol -= 3 << rice;
      while (symbol >= (1u << length)) symbol -= 1u << (length++);
      c.eps((1u << (3 + length + 1 - rice)) - 2, 3 + length + 1 - rice);
      c.eps(symbol, length);
    }
  }

  void code(const int32_t* plane, int stride, int x0, int y0, int log2,
            bool luma, int scan_idx, int sign_hiding) {
    init_scans();
    const std::vector<int>& scan = g_scan[log2 - 2][scan_idx];
    int size = 1 << log2;
    int n_coef = size * size;
    // scan-ordered values
    std::vector<int32_t> sv(n_coef);
    int last_scan = -1;
    for (int i = 0; i < n_coef; i++) {
      int r = scan[i];
      int32_t v = plane[(y0 + r / size) * stride + x0 + (r % size)];
      sv[i] = v;
      if (v) last_scan = i;
    }
    int num_cgs = n_coef > 16 ? n_coef >> 4 : 1;
    int cg_w = size >= 8 ? size >> 2 : 1;
    // csbf per CG + raster-CG -> scan-CG map
    std::vector<int> csbf(num_cgs, 0), cg_map(cg_w * cg_w, 0);
    for (int cg = 0; cg < num_cgs; cg++) {
      int r = scan[cg * 16];
      cg_map[((r / size) >> 2) * cg_w + ((r % size) >> 2)] = cg;
      for (int i = cg * 16; i < cg * 16 + 16 && i < n_coef; i++)
        if (sv[i]) {
          csbf[cg] = 1;
          break;
        }
    }
    csbf[0] = 1;
    int last_cg = last_scan >> 4;
    // last position
    int r = scan[last_scan];
    int lx = r % size, ly = r / size;
    if (scan_idx == 2) {
      int t = lx;
      lx = ly;
      ly = t;
    }
    last_pos(lx, ly, log2, luma);

    c1 = 1;
    for (int cg = last_cg; cg >= 0; cg--) {
      int rr = scan[cg * 16];
      int xs = (rr % size) >> 2, ys = (rr / size) >> 2;
      int cr = (xs + 1 < cg_w) ? csbf[cg_map[ys * cg_w + xs + 1]] : 0;
      int cb = (ys + 1 < cg_w) ? csbf[cg_map[(ys + 1) * cg_w + xs]] : 0;
      bool infer_dc = false;
      if (cg < last_cg && cg > 0) {
        c.bin(csbf[cg], kOffSigCgFlag + (luma ? 0 : 2) + ((cr | cb) ? 1 : 0));
        infer_dc = csbf[cg] != 0;
      }
      if (!csbf[cg]) continue;
      int prev_csbf = cr + 2 * cb;
      int first_pos = cg * 16;
      int start = (cg == last_cg) ? last_scan - first_pos : 15;
      int sig_base = kOffSigCoeffFlag + (luma ? 0 : 28);
      bool sig_found = false;
      int levels[16];
      int nlev = 0;
      if (cg == last_cg) {
        levels[nlev++] = last_scan;
        sig_found = true;
        start--;
      }
      for (int n = start; n >= 0; n--) {
        int pos = first_pos + n;
        int32_t v = sv[pos];
        if (n == 0 && infer_dc && !sig_found) {
          levels[nlev++] = pos;
          continue;
        }
        int rp = scan[pos];
        c.bin(v ? 1 : 0, sig_base + sig_ctx(rp % size, rp / size, prev_csbf,
                                            log2, luma, scan_idx));
        if (v) {
          levels[nlev++] = pos;
          sig_found = true;
        }
      }
      if (!nlev) continue;
      // levels
      int ctx_set = (cg > 0 && luma) ? 2 : 0;
      if (c1 == 0) ctx_set++;
      c1 = 1;
      int gt1_base = kOffCoeffGt1 + (luma ? 0 : 16) + 4 * ctx_set;
      int num_c1 = nlev < 8 ? nlev : 8;
      int first_c2 = -1;
      uint32_t absv[16];
      int signs[16];
      for (int i = 0; i < nlev; i++) {
        int32_t v = sv[levels[i]];
        absv[i] = v < 0 ? -v : v;
        signs[i] = v < 0;
      }
      for (int i = 0; i < num_c1; i++) {
        int sym = absv[i] > 1;
        c.bin(sym, gt1_base + c1);
        if (sym) {
          c1 = 0;
          if (first_c2 == -1) first_c2 = i;
        } else if (c1 > 0 && c1 < 3) {
          c1++;
        }
      }
      if (c1 == 0 && first_c2 != -1)
        c.bin(absv[first_c2] > 2, kOffCoeffGt2 + (luma ? 0 : 4) + ctx_set);
      bool hide = false;
      if (sign_hiding && nlev > 1)
        hide = ((levels[0] & 15) - (levels[nlev - 1] & 15)) >= 4;
      int nsigns = hide ? nlev - 1 : nlev;
      if (nsigns > 0) {
        uint32_t sval = 0;
        for (int i = 0; i < nsigns; i++) sval = (sval << 1) | signs[i];
        c.eps(sval, nsigns);
      }
      int rice = 0;
      for (int i = 0; i < nlev; i++) {
        uint32_t base = 1;
        if (i < 8) base = 2 + (i == first_c2 ? 1 : 0);
        if (absv[i] >= base) {
          remaining(absv[i] - base, rice);
          if (absv[i] > (uint32_t)(3 << rice)) rice = rice < 4 ? rice + 1 : 4;
        }
      }
    }
  }
};

// --------------------------------------------------------------- syntax
struct SliceEnc {
  Frame f;
  Cabac c;

  int split_ctx(int x0, int y0, int depth) {
    int ci = 0;
    if (x0 > 0 && f.depth8[(y0 >> 3) * f.w8 + ((x0 - 1) >> 3)] > depth) ci++;
    if (y0 > 0 && f.depth8[((y0 - 1) >> 3) * f.w8 + (x0 >> 3)] > depth) ci++;
    return kOffSplitCuFlag + ci;
  }

  bool any_y(int x0, int y0, int s) {
    for (int y = y0; y < y0 + s; y++)
      for (int x = x0; x < x0 + s; x++)
        if (f.coeff_y[y * f.w + x]) return true;
    return false;
  }
  bool any_c(const int32_t* pl, int cx, int cy, int cs) {
    for (int y = cy; y < cy + cs; y++)
      for (int x = cx; x < cx + cs; x++)
        if (pl[y * f.cw + x]) return true;
    return false;
  }

  void transform_unit(int x0, int y0, int log2, int depth, int mode,
                      int cmode, bool cbf_y, bool cbf_cb, bool cbf_cr) {
    int s = 1 << log2;
    if (!(cbf_y || cbf_cb || cbf_cr)) return;
    ResidualCoder rc{c};
    if (cbf_y)
      rc.code(f.coeff_y, f.w, x0, y0, log2, true,
              intra_scan_idx(mode, log2, true), f.sign_hiding);
    if (log2 > 2) {
      int clog2 = log2 - 1, cx = x0 >> 1, cy = y0 >> 1;
      static const int kCm[4] = {0, 26, 10, 1};
      int actual = cmode == 4 ? mode : (kCm[cmode] == mode ? 34 : kCm[cmode]);
      int cscan = intra_scan_idx(actual, clog2, false);
      if (cbf_cb) {
        ResidualCoder r2{c};
        r2.code(f.coeff_cb, f.cw, cx, cy, clog2, false, cscan, f.sign_hiding);
      }
      if (cbf_cr) {
        ResidualCoder r3{c};
        r3.code(f.coeff_cr, f.cw, cx, cy, clog2, false, cscan, f.sign_hiding);
      }
    }
  }

  void transform_tree(int x0, int y0, int log2, int depth, int mode,
                      int cmode, bool parent_cb, bool parent_cr) {
    bool split = log2 > f.log2_max_tu;
    bool explicit_f = log2 <= f.log2_max_tu && log2 > f.log2_min_tu &&
                      depth < f.max_tu_depth_intra;
    if (explicit_f)
      c.bin(split ? 1 : 0, kOffSplitTransformFlag + (5 - log2));
    int s = 1 << log2;
    bool cbf_y = any_y(x0, y0, s);
    int cs = s >> 1 >= 4 ? s >> 1 : 4;
    bool cbf_cb = any_c(f.coeff_cb, x0 >> 1, y0 >> 1, cs);
    bool cbf_cr = any_c(f.coeff_cr, x0 >> 1, y0 >> 1, cs);
    if (log2 > 2) {
      if (parent_cb) c.bin(cbf_cb, kOffQtCbf + 5 + depth);
      if (parent_cr) c.bin(cbf_cr, kOffQtCbf + 5 + depth);
    }
    if (split) {
      int half = 1 << (log2 - 1);
      for (int sy = 0; sy <= half; sy += half)
        for (int sx = 0; sx <= half; sx += half)
          transform_tree(x0 + sx, y0 + sy, log2 - 1, depth + 1, mode, cmode,
                         cbf_cb, cbf_cr);
      return;
    }
    c.bin(cbf_y, kOffQtCbf + (depth == 0 ? 1 : 0));
    transform_unit(x0, y0, log2, depth, mode, cmode, cbf_y, cbf_cb, cbf_cr);
  }

  void cu(int x0, int y0, int log2) {
    int x8 = x0 >> 3, y8 = y0 >> 3;
    int mode = f.luma_mode[y8 * f.w8 + x8];
    int cmode = f.chroma_mode[y8 * f.w8 + x8];
    if (log2 == f.log2_min_cu) c.bin(1, kOffPartMode);
    int cand[3];
    mpm_list(neighbor_mode(f, x0, y0, true), neighbor_mode(f, x0, y0, false),
             cand);
    int idx = -1;
    for (int i = 0; i < 3; i++)
      if (cand[i] == mode) idx = i;
    if (idx >= 0) {
      c.bin(1, kOffPrevIntraLumaPredFlag);
      c.ep(idx == 0 ? 0 : 1);
      if (idx) c.ep(idx - 1);
    } else {
      c.bin(0, kOffPrevIntraLumaPredFlag);
      int rem = mode;
      for (int i = 0; i < 3; i++)
        if (cand[i] < mode) rem--;
      c.eps(rem, 5);
    }
    if (cmode == 4) {
      c.bin(0, kOffIntraChromaPredMode);
    } else {
      c.bin(1, kOffIntraChromaPredMode);
      c.eps(cmode, 2);
    }
    int s8 = 1 << (log2 - 3);
    for (int yy = y8; yy < y8 + s8; yy++)
      for (int xx = x8; xx < x8 + s8; xx++)
        f.depth8[yy * f.w8 + xx] = (int8_t)(f.log2_ctu - log2);
    transform_tree(x0, y0, log2, 0, mode, cmode, true, true);
  }

  void quadtree(int x0, int y0, int log2, int depth) {
    if (x0 >= f.w || y0 >= f.h) return;
    int size = 1 << log2;
    bool inside = (x0 + size <= f.w) && (y0 + size <= f.h);
    int want = f.cu_log2[(y0 >> 3) * f.w8 + (x0 >> 3)];
    bool split = log2 > want;
    if (inside && log2 > f.log2_min_cu)
      c.bin(split ? 1 : 0, split_ctx(x0, y0, depth));
    else if (!inside)
      split = true;
    if (split) {
      int half = size >> 1;
      for (int sy = 0; sy <= half; sy += half)
        for (int sx = 0; sx <= half; sx += half)
          quadtree(x0 + sx, y0 + sy, log2 - 1, depth + 1);
      return;
    }
    if (f.slice_type == 2)
      cu(x0, y0, log2);
    else
      cu_p(x0, y0, log2);
  }

  // ----------------------------------------------------------- inter CU
  void mark_depth(int x0, int y0, int log2) {
    int s8 = 1 << (log2 - 3);
    for (int yy = y0 >> 3; yy < (y0 >> 3) + s8; yy++)
      for (int xx = x0 >> 3; xx < (x0 >> 3) + s8; xx++)
        f.depth8[yy * f.w8 + xx] = (int8_t)(f.log2_ctu - log2);
  }

  int skip_ctx(int x0, int y0) {
    int ci = 0;
    if (x0 > 0 && f.skip[(y0 >> 3) * f.w8 + ((x0 - 1) >> 3)] &&
        f.depth8[(y0 >> 3) * f.w8 + ((x0 - 1) >> 3)] >= 0)
      ci++;
    if (y0 > 0 && f.skip[((y0 - 1) >> 3) * f.w8 + (x0 >> 3)] &&
        f.depth8[((y0 - 1) >> 3) * f.w8 + (x0 >> 3)] >= 0)
      ci++;
    return kOffCuSkipFlag + ci;
  }

  void enc_merge_idx(int idx) {
    if (f.max_merge <= 1) return;
    c.bin(idx > 0 ? 1 : 0, kOffMergeIdx);
    for (int k = 1; k < idx; k++) c.ep(1);
    if (idx > 0 && idx < f.max_merge - 1) c.ep(0);
  }

  void enc_eg1(uint32_t v) {
    int k = 1;
    while (v >= (1u << k)) {
      c.ep(1);
      v -= 1u << k;
      k++;
    }
    c.ep(0);
    if (k) c.eps(v, k);
  }

  void enc_mvd(int dx, int dy) {
    c.bin(dx != 0 ? 1 : 0, kOffAbsMvdGreaterFlag);
    c.bin(dy != 0 ? 1 : 0, kOffAbsMvdGreaterFlag);
    int adx = dx < 0 ? -dx : dx, ady = dy < 0 ? -dy : dy;
    if (dx) c.bin(adx > 1 ? 1 : 0, kOffAbsMvdGreaterFlag + 1);
    if (dy) c.bin(ady > 1 ? 1 : 0, kOffAbsMvdGreaterFlag + 1);
    if (dx) {
      if (adx > 1) enc_eg1(adx - 2);
      c.ep(dx < 0 ? 1 : 0);
    }
    if (dy) {
      if (ady > 1) enc_eg1(ady - 2);
      c.ep(dy < 0 ? 1 : 0);
    }
  }

  // TEncSbac::codeRefFrmIdx:748 binarization
  void enc_ref_idx(int ref) {
    if (f.num_ref <= 1) return;
    c.bin(ref == 0 ? 0 : 1, kOffRefIdx);
    if (ref > 0) {
      int rem = f.num_ref - 2;
      int r = ref - 1;
      for (int ui = 0; ui < rem; ui++) {
        int sym = ui == r ? 0 : 1;
        if (ui == 0)
          c.bin(sym, kOffRefIdx + 1);
        else
          c.ep(sym);
        if (!sym) break;
      }
    }
  }

  // TEncSbac::codePartSize inter branch: part 1 = 2NxN, 2 = Nx2N (the
  // symmetric base forms; AMP variants are not emitted by the encoder)
  void part_mode_inter(int log2, int part) {
    bool at_min = log2 == f.log2_min_cu;
    int max_bits = 2 + ((at_min && log2 > 3) ? 1 : 0);
    for (int ui = 0; ui < part; ui++) c.bin(0, kOffPartMode + ui);
    if (part < max_bits) c.bin(1, kOffPartMode + part);
    if (f.amp && !at_min) c.bin(1, kOffPartMode + 3);  // not asymmetric
  }

  // one PU's motion syntax from the per-8-cell maps at its origin cell
  void pu_motion(int px, int py) {
    int ci = (py >> 3) * f.w8 + (px >> 3);
    int merge_f = f.merge_flag[ci];
    c.bin(merge_f ? 1 : 0, kOffMergeFlag);
    if (merge_f) {
      enc_merge_idx(f.merge_idx[ci]);
    } else {
      enc_ref_idx(f.ref_idx ? f.ref_idx[ci] : 0);
      enc_mvd(f.mvd[ci * 2], f.mvd[ci * 2 + 1]);
      c.bin(f.mvp_flag[ci] ? 1 : 0, kOffMvpFlag);
    }
  }

  // rectangular inter CU (counterpart of syntax._enc_cu_p_partitioned):
  // two PUs in decode order, TU tree with the §7.4.9.8 interSplitFlag
  void cu_p_part(int x0, int y0, int log2, int part) {
    c.bin(0, kOffPredModeFlag);  // inter
    part_mode_inter(log2, part);
    int n = 1 << log2;
    for (int pi = 0; pi < 2; pi++) {
      int px = x0, py = y0;
      if (part == 1)
        py += pi ? n / 2 : 0;  // 2NxN
      else
        px += pi ? n / 2 : 0;  // Nx2N
      pu_motion(px, py);
    }
    mark_depth(x0, y0, log2);
    int cs2 = n >> 1 >= 4 ? n >> 1 : 4;
    bool cbf_y = any_y(x0, y0, n);
    bool cbf_cb = any_c(f.coeff_cb, x0 >> 1, y0 >> 1, cs2);
    bool cbf_cr = any_c(f.coeff_cr, x0 >> 1, y0 >> 1, cs2);
    int root = (cbf_y || cbf_cb || cbf_cr) ? 1 : 0;
    c.bin(root, kOffRqtRootCbf);
    if (root)
      transform_tree_p(x0, y0, log2, 0, true, true,
                       f.max_tu_depth_inter == 0);
  }

  void cu_p(int x0, int y0, int log2) {
    int ci = (y0 >> 3) * f.w8 + (x0 >> 3);
    int skip = f.skip[ci];
    c.bin(skip ? 1 : 0, skip_ctx(x0, y0));
    if (skip) {
      enc_merge_idx(f.merge_idx[ci]);
      mark_depth(x0, y0, log2);
      return;
    }
    if (f.inter_dir && f.inter_dir[ci] == 0) {  // intra CU in a P slice
      c.bin(1, kOffPredModeFlag);
      cu(x0, y0, log2);
      return;
    }
    if (f.part && f.part[ci]) {
      cu_p_part(x0, y0, log2, f.part[ci]);
      return;
    }
    c.bin(0, kOffPredModeFlag);  // inter
    c.bin(1, kOffPartMode);      // 2Nx2N
    int merge_f = f.merge_flag[ci];
    c.bin(merge_f ? 1 : 0, kOffMergeFlag);
    if (merge_f) {
      enc_merge_idx(f.merge_idx[ci]);
    } else {
      enc_ref_idx(f.ref_idx ? f.ref_idx[ci] : 0);
      enc_mvd(f.mvd[ci * 2], f.mvd[ci * 2 + 1]);
      c.bin(f.mvp_flag[ci] ? 1 : 0, kOffMvpFlag);
    }
    mark_depth(x0, y0, log2);
    int s = 1 << log2;
    int cs2 = s >> 1 >= 4 ? s >> 1 : 4;
    bool cbf_y = any_y(x0, y0, s);
    bool cbf_cb = any_c(f.coeff_cb, x0 >> 1, y0 >> 1, cs2);
    bool cbf_cr = any_c(f.coeff_cr, x0 >> 1, y0 >> 1, cs2);
    int root = (cbf_y || cbf_cb || cbf_cr) ? 1 : 0;
    if (!merge_f) c.bin(root, kOffRqtRootCbf);
    if (root) transform_tree_p(x0, y0, log2, 0, true, true);
  }

  // inter_split: implicit depth-0 split for non-2Nx2N inter CUs when
  // max_tu_depth_inter == 0 (§7.4.9.8 interSplitFlag); twin of
  // syntax._enc_transform_tree_p
  void transform_tree_p(int x0, int y0, int log2, int depth, bool parent_cb,
                        bool parent_cr, bool inter_split = false) {
    bool split, explicit_f = false;
    if (inter_split && depth == 0)
      split = true;
    else if (log2 > f.log2_max_tu)
      split = true;
    else if (log2 <= f.log2_min_tu ||
             depth >= f.max_tu_depth_inter + (inter_split ? 1 : 0))
      split = false;
    else {
      split = false;  // default: encoder keeps TU = CU
      if (f.tu_want8) {
        int want = f.tu_want8[(y0 >> 3) * f.w8 + (x0 >> 3)];
        split = want >= 2 && want < log2;
      }
      explicit_f = true;
    }
    if (explicit_f)
      c.bin(split ? 1 : 0, kOffSplitTransformFlag + (5 - log2));
    int s = 1 << log2;
    bool cbf_y = any_y(x0, y0, s);
    int cs = s >> 1 >= 4 ? s >> 1 : 4;
    bool cbf_cb = any_c(f.coeff_cb, x0 >> 1, y0 >> 1, cs);
    bool cbf_cr = any_c(f.coeff_cr, x0 >> 1, y0 >> 1, cs);
    if (log2 > 2) {
      if (parent_cb) c.bin(cbf_cb, kOffQtCbf + 5 + depth);
      if (parent_cr) c.bin(cbf_cr, kOffQtCbf + 5 + depth);
    }
    if (split) {
      int half = 1 << (log2 - 1);
      for (int sy = 0; sy <= half; sy += half)
        for (int sx = 0; sx <= half; sx += half)
          transform_tree_p(x0 + sx, y0 + sy, log2 - 1, depth + 1, cbf_cb,
                           cbf_cr, inter_split);
      // (8x8 -> 4x4 luma splits would code chroma at this parent; the
      // encoder never splits below TU8, so that case is unreachable)
      return;
    }
    if (depth != 0 || cbf_cb || cbf_cr)
      c.bin(cbf_y, kOffQtCbf + (depth == 0 ? 1 : 0));
    // inter residual: always diagonal scan
    if (cbf_y || cbf_cb || cbf_cr) {
      ResidualCoder rc{c};
      if (cbf_y) rc.code(f.coeff_y, f.w, x0, y0, log2, true, 0, f.sign_hiding);
      if (log2 > 2) {
        int clog2 = log2 - 1, cx = x0 >> 1, cy = y0 >> 1;
        if (cbf_cb) {
          ResidualCoder r2{c};
          r2.code(f.coeff_cb, f.cw, cx, cy, clog2, false, 0, f.sign_hiding);
        }
        if (cbf_cr) {
          ResidualCoder r3{c};
          r3.code(f.coeff_cr, f.cw, cx, cy, clog2, false, 0, f.sign_hiding);
        }
      }
    }
  }

  // ------------------------------------------------------------- SAO
  // syntax twin of entropy/syntax._enc_sao_ctu (sao() §7.3.8.3); params
  // packed per CTU as 18 int32: ty, ay, oy[4], tc, acb, ocb[4], acr,
  // ocr[4], merge
  void sao_uvlc(int val) {
    c.ep(val ? 1 : 0);
    if (val) {
      for (int i = 1; i < val; i++) c.ep(1);
      if (val < 7) c.ep(0);
    }
  }
  void sao_type(int t) {
    if (t < 0) {
      c.bin(0, kOffSaoTypeIdx);
    } else {
      c.bin(1, kOffSaoTypeIdx);
      c.ep(t == 4 ? 0 : 1);
    }
  }
  void sao_comp(int t, int aux, const int32_t* off4, bool code_type) {
    if (code_type) sao_type(t);
    if (t < 0) return;
    for (int i = 0; i < 4; i++) sao_uvlc(off4[i] < 0 ? -off4[i] : off4[i]);
    if (t == 4) {
      for (int i = 0; i < 4; i++)
        if (off4[i]) c.ep(off4[i] < 0 ? 1 : 0);
      c.eps((uint32_t)aux, 5);
    } else if (code_type) {
      c.eps((uint32_t)t, 2);
    }
  }
  void sao_ctu(int cx, int cy, int wctu) {
    const int32_t* s = f.sao + (size_t)(cy * wctu + cx) * 18;
    int merge = s[17];
    if (cx > 0) c.bin(merge == 1 ? 1 : 0, kOffSaoMergeFlag);
    if (cy > 0 && merge != 1) c.bin(merge == 2 ? 1 : 0, kOffSaoMergeFlag);
    if (merge != 0) return;
    if (f.sao_luma) sao_comp(s[0], s[1], s + 2, true);
    if (f.sao_chroma) {
      sao_comp(s[6], s[7], s + 8, true);
      if (s[6] >= 0) sao_comp(s[6], s[12], s + 13, false);
    }
  }

  void run() {
    int ctu = 1 << f.log2_ctu;
    int wctu = (f.w + ctu - 1) >> f.log2_ctu;
    int hctu = (f.h + ctu - 1) >> f.log2_ctu;
    for (int cy = 0; cy < hctu; cy++)
      for (int cx = 0; cx < wctu; cx++) {
        if (f.sao && (f.sao_luma || f.sao_chroma)) sao_ctu(cx, cy, wctu);
        quadtree(cx << f.log2_ctu, cy << f.log2_ctu, f.log2_ctu, 0);
        c.trm((cy == hctu - 1 && cx == wctu - 1) ? 1 : 0);
      }
    c.finish_rbsp();
  }
};

}  // namespace

extern "C" {

// Returns payload byte count (or -1 if out_cap too small). The payload is
// the byte-aligned CABAC slice data incl. rbsp trailing bits.
int tpuhevc_encode_slice_data(
    const int32_t* cu_log2, const int32_t* luma_mode,
    const int32_t* chroma_mode, const int32_t* coeff_y,
    const int32_t* coeff_cb, const int32_t* coeff_cr,
    const int32_t* skip, const int32_t* merge_flag, const int32_t* merge_idx,
    const int32_t* mvp_flag, const int32_t* mvd, const int32_t* ref_idx,
    int width, int height,
    int log2_ctu, int log2_min_cu, int log2_min_tu, int log2_max_tu,
    int max_tu_depth_intra, int max_tu_depth_inter, int slice_type,
    int max_merge, int slice_type_row, int qp, int sign_hiding, int num_ref,
    uint8_t* out, int out_cap) {
  SliceEnc e;
  e.f.cu_log2 = cu_log2;
  e.f.luma_mode = luma_mode;
  e.f.chroma_mode = chroma_mode;
  e.f.coeff_y = coeff_y;
  e.f.coeff_cb = coeff_cb;
  e.f.coeff_cr = coeff_cr;
  e.f.skip = skip;
  e.f.merge_flag = merge_flag;
  e.f.merge_idx = merge_idx;
  e.f.mvp_flag = mvp_flag;
  e.f.mvd = mvd;
  e.f.ref_idx = ref_idx;
  e.f.num_ref = num_ref;
  e.f.max_tu_depth_inter = max_tu_depth_inter;
  e.f.slice_type = slice_type;
  e.f.max_merge = max_merge;
  e.f.w = width;
  e.f.h = height;
  e.f.w8 = width >> 3;
  e.f.h8 = height >> 3;
  e.f.cw = width >> 1;
  e.f.log2_ctu = log2_ctu;
  e.f.log2_min_cu = log2_min_cu;
  e.f.log2_min_tu = log2_min_tu;
  e.f.log2_max_tu = log2_max_tu;
  e.f.max_tu_depth_intra = max_tu_depth_intra;
  e.f.sign_hiding = sign_hiding;
  e.f.depth8.assign(e.f.w8 * e.f.h8, -1);
  e.c.init_ctx(slice_type_row, qp);
  e.run();
  if ((int)e.c.out.size() > out_cap) return -1;
  std::memcpy(out, e.c.out.data(), e.c.out.size());
  return (int)e.c.out.size();
}

// v2: adds SAO per-CTU parameters (18 int32 per CTU in raster order:
// type_y, aux_y, off_y[4], type_c, aux_cb, off_cb[4], aux_cr, off_cr[4],
// merge) coded before each CTU's quadtree when sao_luma/sao_chroma set.
int tpuhevc_encode_slice_data_sao(
    const int32_t* cu_log2, const int32_t* luma_mode,
    const int32_t* chroma_mode, const int32_t* coeff_y,
    const int32_t* coeff_cb, const int32_t* coeff_cr,
    const int32_t* skip, const int32_t* merge_flag, const int32_t* merge_idx,
    const int32_t* mvp_flag, const int32_t* mvd, const int32_t* ref_idx,
    const int32_t* sao, int sao_luma, int sao_chroma,
    int width, int height,
    int log2_ctu, int log2_min_cu, int log2_min_tu, int log2_max_tu,
    int max_tu_depth_intra, int max_tu_depth_inter, int slice_type,
    int max_merge, int slice_type_row, int qp, int sign_hiding, int num_ref,
    uint8_t* out, int out_cap) {
  SliceEnc e;
  e.f.cu_log2 = cu_log2;
  e.f.luma_mode = luma_mode;
  e.f.chroma_mode = chroma_mode;
  e.f.coeff_y = coeff_y;
  e.f.coeff_cb = coeff_cb;
  e.f.coeff_cr = coeff_cr;
  e.f.skip = skip;
  e.f.merge_flag = merge_flag;
  e.f.merge_idx = merge_idx;
  e.f.mvp_flag = mvp_flag;
  e.f.mvd = mvd;
  e.f.ref_idx = ref_idx;
  e.f.sao = sao;
  e.f.sao_luma = sao_luma;
  e.f.sao_chroma = sao_chroma;
  e.f.num_ref = num_ref;
  e.f.max_tu_depth_inter = max_tu_depth_inter;
  e.f.slice_type = slice_type;
  e.f.max_merge = max_merge;
  e.f.w = width;
  e.f.h = height;
  e.f.w8 = width >> 3;
  e.f.h8 = height >> 3;
  e.f.cw = width >> 1;
  e.f.log2_ctu = log2_ctu;
  e.f.log2_min_cu = log2_min_cu;
  e.f.log2_min_tu = log2_min_tu;
  e.f.log2_max_tu = log2_max_tu;
  e.f.max_tu_depth_intra = max_tu_depth_intra;
  e.f.sign_hiding = sign_hiding;
  e.f.depth8.assign(e.f.w8 * e.f.h8, -1);
  e.c.init_ctx(slice_type_row, qp);
  e.run();
  if ((int)e.c.out.size() > out_cap) return -1;
  std::memcpy(out, e.c.out.data(), e.c.out.size());
  return (int)e.c.out.size();
}

// v3: v2 plus rectangular inter PUs (part_mode per 8-cell at the CU
// origin: 0 2Nx2N, 1 2NxN, 2 Nx2N — PU motion read at each PU's origin
// cell) and intra CUs inside P slices (inter_dir == 0 cells use the
// intra CU syntax after pred_mode_flag). sao may be null.
int tpuhevc_encode_slice_data_v4(
    const int32_t* cu_log2, const int32_t* luma_mode,
    const int32_t* chroma_mode, const int32_t* coeff_y,
    const int32_t* coeff_cb, const int32_t* coeff_cr,
    const int32_t* skip, const int32_t* merge_flag, const int32_t* merge_idx,
    const int32_t* mvp_flag, const int32_t* mvd, const int32_t* ref_idx,
    const int32_t* sao, int sao_luma, int sao_chroma,
    const int32_t* part_mode, const int32_t* inter_dir, int amp_enabled,
    const int32_t* tu_want8,
    int width, int height,
    int log2_ctu, int log2_min_cu, int log2_min_tu, int log2_max_tu,
    int max_tu_depth_intra, int max_tu_depth_inter, int slice_type,
    int max_merge, int slice_type_row, int qp, int sign_hiding, int num_ref,
    uint8_t* out, int out_cap);

int tpuhevc_encode_slice_data_v3(
    const int32_t* cu_log2, const int32_t* luma_mode,
    const int32_t* chroma_mode, const int32_t* coeff_y,
    const int32_t* coeff_cb, const int32_t* coeff_cr,
    const int32_t* skip, const int32_t* merge_flag, const int32_t* merge_idx,
    const int32_t* mvp_flag, const int32_t* mvd, const int32_t* ref_idx,
    const int32_t* sao, int sao_luma, int sao_chroma,
    const int32_t* part_mode, const int32_t* inter_dir, int amp_enabled,
    int width, int height,
    int log2_ctu, int log2_min_cu, int log2_min_tu, int log2_max_tu,
    int max_tu_depth_intra, int max_tu_depth_inter, int slice_type,
    int max_merge, int slice_type_row, int qp, int sign_hiding, int num_ref,
    uint8_t* out, int out_cap) {
  return tpuhevc_encode_slice_data_v4(
      cu_log2, luma_mode, chroma_mode, coeff_y, coeff_cb, coeff_cr, skip,
      merge_flag, merge_idx, mvp_flag, mvd, ref_idx, sao, sao_luma,
      sao_chroma, part_mode, inter_dir, amp_enabled, nullptr, width, height,
      log2_ctu, log2_min_cu, log2_min_tu, log2_max_tu, max_tu_depth_intra,
      max_tu_depth_inter, slice_type, max_merge, slice_type_row, qp,
      sign_hiding, num_ref, out, out_cap);
}

// v5: v4 plus an optional end-of-slice context-state export (ctx_out,
// kNumCtx int32 slots, packed (state6<<1)|mps exactly like the Python
// ContextState) — the feedback source for the adaptive bit-estimator
// re-freeze (HM's estBitsSbac loads live contexts per CU,
// TEncSbac::load; the whole-frame batch design feeds states back per
// device chunk instead).
int tpuhevc_encode_slice_data_v5(
    const int32_t* cu_log2, const int32_t* luma_mode,
    const int32_t* chroma_mode, const int32_t* coeff_y,
    const int32_t* coeff_cb, const int32_t* coeff_cr,
    const int32_t* skip, const int32_t* merge_flag, const int32_t* merge_idx,
    const int32_t* mvp_flag, const int32_t* mvd, const int32_t* ref_idx,
    const int32_t* sao, int sao_luma, int sao_chroma,
    const int32_t* part_mode, const int32_t* inter_dir, int amp_enabled,
    const int32_t* tu_want8,
    int width, int height,
    int log2_ctu, int log2_min_cu, int log2_min_tu, int log2_max_tu,
    int max_tu_depth_intra, int max_tu_depth_inter, int slice_type,
    int max_merge, int slice_type_row, int qp, int sign_hiding, int num_ref,
    uint8_t* out, int out_cap, int32_t* ctx_out) {
  SliceEnc e;
  e.f.tu_want8 = tu_want8;
  e.f.cu_log2 = cu_log2;
  e.f.luma_mode = luma_mode;
  e.f.chroma_mode = chroma_mode;
  e.f.coeff_y = coeff_y;
  e.f.coeff_cb = coeff_cb;
  e.f.coeff_cr = coeff_cr;
  e.f.skip = skip;
  e.f.merge_flag = merge_flag;
  e.f.merge_idx = merge_idx;
  e.f.mvp_flag = mvp_flag;
  e.f.mvd = mvd;
  e.f.ref_idx = ref_idx;
  e.f.sao = sao;
  e.f.sao_luma = sao_luma;
  e.f.sao_chroma = sao_chroma;
  e.f.part = part_mode;
  e.f.inter_dir = inter_dir;
  e.f.amp = amp_enabled;
  e.f.num_ref = num_ref;
  e.f.max_tu_depth_inter = max_tu_depth_inter;
  e.f.slice_type = slice_type;
  e.f.max_merge = max_merge;
  e.f.w = width;
  e.f.h = height;
  e.f.w8 = width >> 3;
  e.f.h8 = height >> 3;
  e.f.cw = width >> 1;
  e.f.log2_ctu = log2_ctu;
  e.f.log2_min_cu = log2_min_cu;
  e.f.log2_min_tu = log2_min_tu;
  e.f.log2_max_tu = log2_max_tu;
  e.f.max_tu_depth_intra = max_tu_depth_intra;
  e.f.sign_hiding = sign_hiding;
  e.f.depth8.assign(e.f.w8 * e.f.h8, -1);
  e.c.init_ctx(slice_type_row, qp);
  e.run();
  if (ctx_out)
    for (int i = 0; i < kNumCtx; i++) ctx_out[i] = e.c.ctx[i];
  if ((int)e.c.out.size() > out_cap) return -1;
  std::memcpy(out, e.c.out.data(), e.c.out.size());
  return (int)e.c.out.size();
}

int tpuhevc_encode_slice_data_v4(
    const int32_t* cu_log2, const int32_t* luma_mode,
    const int32_t* chroma_mode, const int32_t* coeff_y,
    const int32_t* coeff_cb, const int32_t* coeff_cr,
    const int32_t* skip, const int32_t* merge_flag, const int32_t* merge_idx,
    const int32_t* mvp_flag, const int32_t* mvd, const int32_t* ref_idx,
    const int32_t* sao, int sao_luma, int sao_chroma,
    const int32_t* part_mode, const int32_t* inter_dir, int amp_enabled,
    const int32_t* tu_want8,
    int width, int height,
    int log2_ctu, int log2_min_cu, int log2_min_tu, int log2_max_tu,
    int max_tu_depth_intra, int max_tu_depth_inter, int slice_type,
    int max_merge, int slice_type_row, int qp, int sign_hiding, int num_ref,
    uint8_t* out, int out_cap) {
  return tpuhevc_encode_slice_data_v5(
      cu_log2, luma_mode, chroma_mode, coeff_y, coeff_cb, coeff_cr, skip,
      merge_flag, merge_idx, mvp_flag, mvd, ref_idx, sao, sao_luma,
      sao_chroma, part_mode, inter_dir, amp_enabled, tu_want8, width, height,
      log2_ctu, log2_min_cu, log2_min_tu, log2_max_tu, max_tu_depth_intra,
      max_tu_depth_inter, slice_type, max_merge, slice_type_row, qp,
      sign_hiding, num_ref, out, out_cap, nullptr);
}
}
