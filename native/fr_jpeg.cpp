// fr_jpeg: native JPEG decoder for funky_tpu's asset pipeline.
//
// The reference loads whatever image format a glTF references through the
// Rust `image` crate (gltf_loader.rs:100 `image::open`, :116
// `load_from_memory`), whose JPEG backend decodes baseline AND progressive
// JFIF streams. This is the native equivalent: baseline (SOF0), extended
// sequential (SOF1) and progressive (SOF2) huffman JPEG, grayscale or
// YCbCr with any h/v sampling factors 1..4 (4:4:4, 4:2:2, 4:2:0, ...),
// restart markers, and the Adobe APP14 color-transform tag. Chroma planes
// are upsampled by sample replication (box), matching the spec's minimal
// decoder; models/jpeg_io.py implements the identical algorithm in numpy
// as the portable fallback, so the two paths agree to IDCT rounding.
//
// Exposed C ABI (see funky_tpu/utils/native.py): fr_jpeg_info,
// fr_jpeg_decode_rgba.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct Huff {
  // Canonical huffman decode tables (ITU T.81 F.2.2.3).
  int32_t mincode[17];
  int32_t maxcode[18];
  int32_t valptr[17];
  uint8_t vals[256];
  bool present = false;
};

struct Component {
  int id = 0, h = 1, v = 1, tq = 0;
  int td = 0, ta = 0;       // huffman table ids for the current scan
  int pred = 0;             // DC predictor
  int bw = 0, bh = 0;       // coefficient blocks (MCU-padded)
  int bw_used = 0, bh_used = 0;  // blocks covering the actual image
  std::vector<int16_t> coef;     // bw*bh blocks of 64, natural order
};

struct Decoder {
  const uint8_t* data;
  size_t len, pos = 0;

  int width = 0, height = 0;
  bool progressive = false;
  int ncomp = 0;
  Component comp[4];
  int hmax = 1, vmax = 1;
  int mcux = 0, mcuy = 0;
  uint16_t qt[4][64] = {};
  Huff hdc[4], hac[4];
  int restart_interval = 0;
  int adobe_transform = -1;  // APP14: 0 none, 1 YCbCr, 2 YCCK
  int eobrun = 0;

  // entropy-coded bit reader (handles 0xFF00 stuffing; stops at markers)
  uint32_t bitbuf = 0;
  int bitcnt = 0;

  bool fail = false;

  int byte() { return pos < len ? data[pos++] : (fail = true, 0); }
  int be16() { int a = byte(); return (a << 8) | byte(); }

  void reset_bits() { bitbuf = 0; bitcnt = 0; }

  int bit() {
    if (bitcnt == 0) {
      if (pos >= len) { fail = true; return 0; }
      int b = data[pos++];
      if (b == 0xFF) {
        int b2 = pos < len ? data[pos] : 0xD9;
        if (b2 == 0x00) {
          pos++;
        } else {
          // Marker inside entropy data: per T.81 the decoder pads with
          // zero bits (handles truncated scans / DNL); rewind the 0xFF.
          pos--;
          bitbuf = 0;
          bitcnt = 1;
          return 0;
        }
      }
      bitbuf = uint32_t(b);
      bitcnt = 8;
    }
    bitcnt--;
    return int((bitbuf >> bitcnt) & 1u);
  }

  int bits(int n) {
    int v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | bit();
    return v;
  }

  int decode_huff(const Huff& h) {
    int code = 0;
    for (int l = 1; l <= 16; ++l) {
      code = (code << 1) | bit();
      if (code <= h.maxcode[l])
        return h.vals[h.valptr[l] + code - h.mincode[l]];
    }
    fail = true;
    return 0;
  }

  static int extend(int v, int t) {
    // ITU T.81 F.2.2.1 EXTEND
    return (t && v < (1 << (t - 1))) ? v - (1 << t) + 1 : v;
  }

  bool parse_dqt(int seg_end) {
    while (pos < size_t(seg_end)) {
      int pq_tq = byte();
      int pq = pq_tq >> 4, tq = pq_tq & 15;
      if (tq > 3) return false;
      for (int i = 0; i < 64; ++i)
        qt[tq][kZigzag[i]] = uint16_t(pq ? be16() : byte());
    }
    return !fail;
  }

  bool parse_dht(int seg_end) {
    while (pos < size_t(seg_end)) {
      int tc_th = byte();
      int tc = tc_th >> 4, th = tc_th & 15;
      if (th > 3 || tc > 1) return false;
      Huff& h = tc ? hac[th] : hdc[th];
      int counts[17];
      int total = 0;
      for (int l = 1; l <= 16; ++l) { counts[l] = byte(); total += counts[l]; }
      if (total > 256) return false;
      for (int i = 0; i < total; ++i) h.vals[i] = uint8_t(byte());
      int code = 0, k = 0;
      for (int l = 1; l <= 16; ++l) {
        h.valptr[l] = k;
        h.mincode[l] = code;
        code += counts[l];
        k += counts[l];
        h.maxcode[l] = counts[l] ? code - 1 : -1;
        code <<= 1;
      }
      h.maxcode[17] = 0x7FFFFFFF;
      h.present = true;
    }
    return !fail;
  }

  bool parse_sof(int marker) {
    progressive = marker == 0xC2;
    byte();  // precision (8 assumed; 12-bit unsupported)
    height = be16();
    width = be16();
    ncomp = byte();
    if (width <= 0 || height <= 0 || (ncomp != 1 && ncomp != 3)) return false;
    for (int i = 0; i < ncomp; ++i) {
      comp[i].id = byte();
      int hv = byte();
      comp[i].h = hv >> 4;
      comp[i].v = hv & 15;
      comp[i].tq = byte();
      if (comp[i].h < 1 || comp[i].h > 4 || comp[i].v < 1 || comp[i].v > 4 ||
          comp[i].tq > 3)
        return false;
      hmax = comp[i].h > hmax ? comp[i].h : hmax;
      vmax = comp[i].v > vmax ? comp[i].v : vmax;
    }
    mcux = (width + 8 * hmax - 1) / (8 * hmax);
    mcuy = (height + 8 * vmax - 1) / (8 * vmax);
    for (int i = 0; i < ncomp; ++i) {
      Component& c = comp[i];
      c.bw = mcux * c.h;
      c.bh = mcuy * c.v;
      c.bw_used = (width * c.h + 8 * hmax - 1) / (8 * hmax);
      c.bh_used = (height * c.v + 8 * vmax - 1) / (8 * vmax);
      c.coef.assign(size_t(c.bw) * c.bh * 64, 0);
    }
    return !fail;
  }

  int16_t* block(Component& c, int by, int bx) {
    return c.coef.data() + (size_t(by) * c.bw + bx) * 64;
  }

  // -- scan decoding -------------------------------------------------------

  void decode_block_baseline(Component& c, int16_t* out) {
    int t = decode_huff(hdc[c.td]);
    int diff = t ? extend(bits(t), t) : 0;
    c.pred += diff;
    out[0] = int16_t(c.pred);
    int k = 1;
    while (k < 64 && !fail) {
      int rs = decode_huff(hac[c.ta]);
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r != 15) break;  // EOB
        k += 16;             // ZRL
        continue;
      }
      k += r;
      if (k > 63) { fail = true; break; }
      out[kZigzag[k]] = int16_t(extend(bits(s), s));
      k++;
    }
  }

  void decode_block_dc(Component& c, int16_t* out, int ah, int al) {
    if (ah == 0) {
      int t = decode_huff(hdc[c.td]);
      int diff = t ? extend(bits(t), t) : 0;
      c.pred += diff;
      out[0] = int16_t(c.pred << al);
    } else if (bit()) {
      out[0] = int16_t(out[0] | (1 << al));
    }
  }

  void decode_block_ac_first(Component& c, int16_t* out, int ss, int se,
                             int al) {
    if (eobrun > 0) { eobrun--; return; }
    int k = ss;
    while (k <= se && !fail) {
      int rs = decode_huff(hac[c.ta]);
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r != 15) {
          eobrun = (1 << r) - 1;
          if (r) eobrun += bits(r);
          break;
        }
        k += 16;
        continue;
      }
      k += r;
      if (k > 63) { fail = true; break; }
      out[kZigzag[k]] = int16_t(extend(bits(s), s) << al);
      k++;
    }
  }

  void refine_nonzero(int16_t& coef, int p1, int m1) {
    // ITU T.81 G.1.2.3: correction bit for an already-nonzero coefficient.
    if (bit()) {
      if ((coef & p1) == 0) coef = int16_t(coef + (coef >= 0 ? p1 : m1));
    }
  }

  void decode_block_ac_refine(Component& c, int16_t* out, int ss, int se,
                              int al) {
    int p1 = 1 << al, m1 = -(1 << al);
    int k = ss;
    if (eobrun == 0) {
      while (k <= se && !fail) {
        int rs = decode_huff(hac[c.ta]);
        int r = rs >> 4, s = rs & 15;
        int newval = 0;
        if (s == 0) {
          if (r != 15) {
            eobrun = (1 << r);
            if (r) eobrun += bits(r);
            break;
          }
          // ZRL: skip over 16 zero-history coefficients
        } else {
          // s must be 1 in a refinement scan
          newval = bit() ? p1 : m1;
        }
        while (k <= se && !fail) {
          int16_t& coef = out[kZigzag[k]];
          if (coef != 0) {
            refine_nonzero(coef, p1, m1);
          } else {
            if (r == 0) break;
            r--;
          }
          k++;
        }
        if (s != 0 && k <= se) out[kZigzag[k]] = int16_t(newval);
        k++;
      }
    }
    if (eobrun > 0) {
      while (k <= se && !fail) {
        int16_t& coef = out[kZigzag[k]];
        if (coef != 0) refine_nonzero(coef, p1, m1);
        k++;
      }
      eobrun--;
    }
  }

  bool restart() {
    // Byte-align, consume RSTn, reset predictors + EOB run.
    reset_bits();
    if (pos + 2 > len) return false;
    if (data[pos] != 0xFF || data[pos + 1] < 0xD0 || data[pos + 1] > 0xD7)
      return false;
    pos += 2;
    for (int i = 0; i < ncomp; ++i) comp[i].pred = 0;
    eobrun = 0;
    return true;
  }

  bool parse_sos() {
    int ns = byte();
    int sc[4];
    if (ns < 1 || ns > 4) return false;
    for (int j = 0; j < ns; ++j) {
      int cs = byte();
      int tdta = byte();
      int found = -1;
      for (int i = 0; i < ncomp; ++i)
        if (comp[i].id == cs) found = i;
      if (found < 0) return false;
      sc[j] = found;
      comp[found].td = tdta >> 4;
      comp[found].ta = tdta & 15;
    }
    int ss = byte(), se = byte();
    int ahal = byte();
    int ah = ahal >> 4, al = ahal & 15;
    if (!progressive) { ss = 0; se = 63; ah = 0; al = 0; }
    if (ss > 63 || se > 63 || se < ss) return false;

    for (int j = 0; j < ns; ++j) comp[sc[j]].pred = 0;
    eobrun = 0;
    reset_bits();

    bool dc_scan = ss == 0;
    auto decode_one = [&](Component& c, int16_t* out) {
      if (!progressive) {
        decode_block_baseline(c, out);
      } else if (dc_scan) {
        decode_block_dc(c, out, ah, al);
      } else if (ah == 0) {
        decode_block_ac_first(c, out, ss, se, al);
      } else {
        decode_block_ac_refine(c, out, ss, se, al);
      }
    };

    int todo = restart_interval;
    if (ns == 1) {
      // Non-interleaved: one block per "MCU", over the USED block grid.
      Component& c = comp[sc[0]];
      for (int by = 0; by < c.bh_used && !fail; ++by) {
        for (int bx = 0; bx < c.bw_used && !fail; ++bx) {
          decode_one(c, block(c, by, bx));
          if (restart_interval && --todo == 0 &&
              !(by == c.bh_used - 1 && bx == c.bw_used - 1)) {
            if (!restart()) return false;
            todo = restart_interval;
          }
        }
      }
    } else {
      for (int my = 0; my < mcuy && !fail; ++my) {
        for (int mx = 0; mx < mcux && !fail; ++mx) {
          for (int j = 0; j < ns && !fail; ++j) {
            Component& c = comp[sc[j]];
            for (int v = 0; v < c.v; ++v)
              for (int hh = 0; hh < c.h; ++hh)
                decode_one(c, block(c, my * c.v + v, mx * c.h + hh));
          }
          if (restart_interval && --todo == 0 &&
              !(my == mcuy - 1 && mx == mcux - 1)) {
            if (!restart()) return false;
            todo = restart_interval;
          }
        }
      }
    }
    return !fail;
  }

  bool parse(bool header_only) {
    if (len < 2 || data[0] != 0xFF || data[1] != 0xD8) return false;
    pos = 2;
    while (pos + 4 <= len) {
      if (data[pos] != 0xFF) { pos++; continue; }  // skip fill/garbage
      if (data[pos + 1] == 0xFF) { pos++; continue; }  // fill byte
      int marker = data[pos + 1];
      pos += 2;
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7))
        continue;  // TEM / stray RST: no segment body
      if (marker == 0xD9) break;  // EOI
      int seg_len = be16();
      int seg_end = int(pos) + seg_len - 2;
      if (seg_len < 2 || size_t(seg_end) > len) return false;
      switch (marker) {
        case 0xC0: case 0xC1: case 0xC2:  // SOF0/1/2
          if (!parse_sof(marker)) return false;
          if (header_only) return true;
          break;
        case 0xC3: case 0xC5: case 0xC6: case 0xC7: case 0xC9:
        case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
          return false;  // lossless/arithmetic/hierarchical: unsupported
        case 0xC4:  // DHT
          if (!parse_dht(seg_end)) return false;
          break;
        case 0xDB:  // DQT
          if (!parse_dqt(seg_end)) return false;
          break;
        case 0xDD:  // DRI
          restart_interval = be16();
          break;
        case 0xEE:  // APP14 (Adobe)
          if (seg_len >= 14 && !std::memcmp(data + pos, "Adobe", 5))
            adobe_transform = data[pos + 11];
          break;
        case 0xDA:  // SOS: scan header at pos, then entropy data
          if (ncomp == 0) return false;
          if (!parse_sos()) return false;
          continue;  // entropy data consumed; loop resumes at next marker
        default:
          break;  // APPn/COM/etc: skip
      }
      pos = size_t(seg_end);
    }
    return ncomp > 0;
  }

  // -- reconstruction ------------------------------------------------------

  void idct_block(const int16_t* coef, const uint16_t* q, uint8_t* out,
                  int out_stride) {
    // Separable double-precision IDCT (DCT-III), then level shift + clamp.
    // models/jpeg_io.py implements the same math in float64 numpy so the
    // native and fallback decoders agree to rounding.
    static double ctab[8][8];
    static bool init = false;
    if (!init) {
      for (int u = 0; u < 8; ++u)
        for (int x = 0; x < 8; ++x)
          ctab[u][x] = (u == 0 ? std::sqrt(0.125) : 0.5) *
                       std::cos((2 * x + 1) * u * M_PI / 16.0);
      init = true;
    }
    double tmp[64];
    for (int u = 0; u < 8; ++u) {  // rows of coef -> tmp over x
      for (int x = 0; x < 8; ++x) {
        double s = 0;
        for (int v = 0; v < 8; ++v)
          s += double(coef[u * 8 + v]) * double(q[u * 8 + v]) * ctab[v][x];
        tmp[u * 8 + x] = s;
      }
    }
    for (int y = 0; y < 8; ++y) {
      for (int x = 0; x < 8; ++x) {
        double s = 0;
        for (int u = 0; u < 8; ++u) s += ctab[u][y] * tmp[u * 8 + x];
        int val = int(std::nearbyint(s)) + 128;  // round-half-even = np.rint
        out[y * out_stride + x] =
            uint8_t(val < 0 ? 0 : (val > 255 ? 255 : val));
      }
    }
  }

  bool reconstruct(uint8_t* rgba) {
    std::vector<std::vector<uint8_t>> planes(ncomp);
    for (int i = 0; i < ncomp; ++i) {
      Component& c = comp[i];
      int pw = c.bw * 8, ph = c.bh * 8;
      planes[i].resize(size_t(pw) * ph);
      for (int by = 0; by < c.bh; ++by)
        for (int bx = 0; bx < c.bw; ++bx)
          idct_block(block(c, by, bx), qt[c.tq],
                     planes[i].data() + size_t(by) * 8 * pw + bx * 8, pw);
    }
    bool rgb_ids = ncomp == 3 && comp[0].id == 'R' && comp[1].id == 'G' &&
                   comp[2].id == 'B';
    bool ycc = ncomp == 3 && !rgb_ids && adobe_transform != 0;
    for (int y = 0; y < height; ++y) {
      uint8_t* dst = rgba + size_t(y) * width * 4;
      for (int x = 0; x < width; ++x) {
        int s[3] = {0, 0, 0};
        for (int i = 0; i < ncomp; ++i) {
          Component& c = comp[i];
          int sx = x * c.h / hmax, sy = y * c.v / vmax;
          s[i] = planes[i][size_t(sy) * (c.bw * 8) + sx];
        }
        int r, g, b;
        if (ncomp == 1) {
          r = g = b = s[0];
        } else if (ycc) {
          double yv = s[0], cb = s[1] - 128.0, cr = s[2] - 128.0;
          r = int(std::nearbyint(yv + 1.402 * cr));
          g = int(std::nearbyint(yv - 0.344136 * cb - 0.714136 * cr));
          b = int(std::nearbyint(yv + 1.772 * cb));
        } else {
          r = s[0]; g = s[1]; b = s[2];
        }
        dst[4 * x + 0] = uint8_t(r < 0 ? 0 : (r > 255 ? 255 : r));
        dst[4 * x + 1] = uint8_t(g < 0 ? 0 : (g > 255 ? 255 : g));
        dst[4 * x + 2] = uint8_t(b < 0 ? 0 : (b > 255 ? 255 : b));
        dst[4 * x + 3] = 255;
      }
    }
    return true;
  }
};

}  // namespace

extern "C" {

// Returns 0 and fills w/h if `data` is a decodable JPEG header.
int fr_jpeg_info(const uint8_t* data, size_t len, int* w, int* h) {
  Decoder d{data, len};
  if (!d.parse(/*header_only=*/true) || d.width <= 0) return -1;
  *w = d.width;
  *h = d.height;
  return 0;
}

// Decodes into caller-allocated (h, w, 4) RGBA8. Returns 0 on success.
int fr_jpeg_decode_rgba(const uint8_t* data, size_t len, uint8_t* out) {
  Decoder d{data, len};
  if (!d.parse(/*header_only=*/false)) return -1;
  if (!d.reconstruct(out)) return -2;
  return 0;
}

}  // extern "C"
