// fr_native: native asset-pipeline kernels for funky_tpu.
//
// The reference renderer's only CPU-side hot loops are asset decoding
// (Rust `image` crate decoding DuckCM.png and glTF buffers,
// gltf_loader.rs:89-127). This library provides the same role natively:
// a complete 8-bit PNG decoder (zlib inflate + scanline unfilter + RGBA8
// expansion) exposed through a C ABI for ctypes. The pure-Python decoder
// in models/png_io.py remains as the portable fallback.
//
// Build: make -C native   (g++ -O3 -shared, links system zlib)

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

constexpr uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngMeta {
  uint32_t width = 0, height = 0;
  uint8_t bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples
  std::vector<uint8_t> trns;     // palette alpha
  bool ok = false;
};

PngMeta parse(const uint8_t* data, size_t len) {
  PngMeta m;
  if (len < 8 || std::memcmp(data, kSig, 8) != 0) return m;
  size_t pos = 8;
  while (pos + 12 <= len) {
    uint32_t clen = be32(data + pos);
    const uint8_t* tag = data + pos + 4;
    const uint8_t* payload = data + pos + 8;
    if (pos + 12 + clen > len) return m;
    if (!std::memcmp(tag, "IHDR", 4) && clen >= 13) {
      m.width = be32(payload);
      m.height = be32(payload + 4);
      m.bit_depth = payload[8];
      m.color_type = payload[9];
      m.interlace = payload[12];
    } else if (!std::memcmp(tag, "PLTE", 4)) {
      m.palette.assign(payload, payload + clen);
    } else if (!std::memcmp(tag, "tRNS", 4)) {
      m.trns.assign(payload, payload + clen);
    } else if (!std::memcmp(tag, "IDAT", 4)) {
      m.idat.insert(m.idat.end(), payload, payload + clen);
    } else if (!std::memcmp(tag, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  m.ok = (m.width && m.height && m.bit_depth == 8 && m.interlace == 0);
  return m;
}

int channels_for(uint8_t color_type) {
  switch (color_type) {
    case 0: return 1;  // gray
    case 2: return 3;  // rgb
    case 3: return 1;  // palette index
    case 4: return 2;  // gray+alpha
    case 6: return 4;  // rgba
    default: return 0;
  }
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// Reverse PNG scanline filters in place. rows points at h*(1+stride).
bool unfilter(uint8_t* rows, uint32_t h, size_t stride, int bpp) {
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t f = rows[y * (stride + 1)];
    uint8_t* row = rows + y * (stride + 1) + 1;
    switch (f) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t x = bpp; x < stride; ++x) row[x] += row[x - bpp];
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x) row[x] += prev[x];
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int left = x >= size_t(bpp) ? row[x - bpp] : 0;
          row[x] += uint8_t((left + prev[x]) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? row[x - bpp] : 0;
          int c = x >= size_t(bpp) ? prev[x - bpp] : 0;
          row[x] += paeth(a, prev[x], c);
        }
        break;
      default:
        return false;
    }
    std::memcpy(prev.data(), row, stride);
  }
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success and fills w/h. Supports 8-bit non-interlaced PNGs.
int fr_png_info(const uint8_t* data, size_t len, int* w, int* h) {
  PngMeta m = parse(data, len);
  if (!m.ok || channels_for(m.color_type) == 0) return -1;
  *w = int(m.width);
  *h = int(m.height);
  return 0;
}

// Decode into caller-allocated RGBA8 buffer of w*h*4 bytes. Returns 0 ok.
int fr_png_decode_rgba(const uint8_t* data, size_t len, uint8_t* out) {
  PngMeta m = parse(data, len);
  int ch = channels_for(m.color_type);
  if (!m.ok || ch == 0) return -1;

  const size_t stride = size_t(m.width) * ch;
  std::vector<uint8_t> raw(m.height * (stride + 1));
  uLongf raw_len = uLongf(raw.size());
  if (uncompress(raw.data(), &raw_len, m.idat.data(),
                 uLong(m.idat.size())) != Z_OK ||
      raw_len != raw.size()) {
    return -2;
  }
  if (!unfilter(raw.data(), m.height, stride, ch)) return -3;

  for (uint32_t y = 0; y < m.height; ++y) {
    const uint8_t* row = raw.data() + y * (stride + 1) + 1;
    uint8_t* dst = out + size_t(y) * m.width * 4;
    switch (m.color_type) {
      case 0:  // gray
        for (uint32_t x = 0; x < m.width; ++x) {
          uint8_t g = row[x];
          dst[4 * x] = g; dst[4 * x + 1] = g; dst[4 * x + 2] = g;
          dst[4 * x + 3] = 255;
        }
        break;
      case 2:  // rgb
        for (uint32_t x = 0; x < m.width; ++x) {
          dst[4 * x] = row[3 * x];
          dst[4 * x + 1] = row[3 * x + 1];
          dst[4 * x + 2] = row[3 * x + 2];
          dst[4 * x + 3] = 255;
        }
        break;
      case 3: {  // palette
        for (uint32_t x = 0; x < m.width; ++x) {
          uint8_t idx = row[x];
          if (size_t(idx) * 3 + 2 < m.palette.size()) {
            dst[4 * x] = m.palette[3 * idx];
            dst[4 * x + 1] = m.palette[3 * idx + 1];
            dst[4 * x + 2] = m.palette[3 * idx + 2];
          } else {
            dst[4 * x] = dst[4 * x + 1] = dst[4 * x + 2] = 0;
          }
          dst[4 * x + 3] = idx < m.trns.size() ? m.trns[idx] : 255;
        }
        break;
      }
      case 4:  // gray + alpha
        for (uint32_t x = 0; x < m.width; ++x) {
          uint8_t g = row[2 * x];
          dst[4 * x] = g; dst[4 * x + 1] = g; dst[4 * x + 2] = g;
          dst[4 * x + 3] = row[2 * x + 1];
        }
        break;
      case 6:  // rgba
        std::memcpy(dst, row, size_t(m.width) * 4);
        break;
    }
  }
  return 0;
}

// sRGB EOTF lookup-table fill (256 entries) — lets Python build the
// linearization LUT natively once.
void fr_srgb_lut(float* out256) {
  for (int i = 0; i < 256; ++i) {
    float s = float(i) / 255.0f;
    out256[i] = s <= 0.04045f ? s / 12.92f
                              : __builtin_powf((s + 0.055f) / 1.055f, 2.4f);
  }
}

}  // extern "C"
