// fr_native: native asset-pipeline kernels for funky_tpu.
//
// The reference renderer's only CPU-side hot loops are asset decoding
// (Rust `image` crate decoding DuckCM.png and glTF buffers,
// gltf_loader.rs:89-127). This library provides the same role natively:
// a complete PNG decoder (zlib inflate + scanline unfilter + RGBA8
// expansion; bit depths 1/2/4/8/16, Adam7 interlacing — the `image`
// crate's coverage; 16-bit folds to the high byte like
// DynamicImage::to_rgba8) exposed through a C ABI for ctypes. The
// pure-Python decoder in models/png_io.py remains as the portable
// fallback.
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
  const bool depth_ok = m.bit_depth == 1 || m.bit_depth == 2 ||
                        m.bit_depth == 4 || m.bit_depth == 8 ||
                        m.bit_depth == 16;
  m.ok = (m.width && m.height && depth_ok && m.interlace <= 1);
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

// Expand one unfiltered scanline into w*ch bytes (one byte per channel
// sample): 16-bit takes the high byte; 1/2/4-bit unpack MSB-first and
// rescale to 0..255 for gray (palette indices stay raw).
void expand_row(const uint8_t* row, uint32_t w, int ch, int depth,
                bool rescale_gray, uint8_t* px) {
  if (depth == 8) {
    std::memcpy(px, row, size_t(w) * ch);
    return;
  }
  if (depth == 16) {
    for (size_t i = 0; i < size_t(w) * ch; ++i) px[i] = row[2 * i];
    return;
  }
  const int per = 8 / depth;
  const uint8_t max_v = uint8_t((1 << depth) - 1);
  const uint8_t scale = rescale_gray ? uint8_t(255 / max_v) : 1;
  for (uint32_t x = 0; x < w; ++x) {
    const uint8_t byte = row[x / per];
    const int shift = 8 - depth * (x % per + 1);
    px[x] = uint8_t(((byte >> shift) & max_v) * scale);
  }
}

// Adam7 pass grid (PNG spec 8.2): x0, y0, dx, dy per pass.
constexpr int kAdam7[7][4] = {{0, 0, 8, 8}, {4, 0, 8, 8}, {0, 4, 4, 8},
                              {2, 0, 4, 4}, {0, 2, 2, 4}, {1, 0, 2, 2},
                              {0, 1, 1, 2}};

}  // namespace

extern "C" {

// Returns 0 on success and fills w/h.
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
  const int depth = m.bit_depth;
  const bool rescale_gray = depth < 8 && m.color_type == 0;

  // Pass layout: one full-frame pass, or the 7 Adam7 sub-images.
  struct Pass { uint32_t x0, y0, dx, dy, w, h; size_t stride; };
  std::vector<Pass> passes;
  if (m.interlace == 0) {
    passes.push_back({0, 0, 1, 1, m.width, m.height,
                      (size_t(m.width) * ch * depth + 7) / 8});
  } else {
    for (auto& p : kAdam7) {
      const uint32_t x0 = p[0], y0 = p[1], dx = p[2], dy = p[3];
      if (m.width <= x0 || m.height <= y0) continue;
      const uint32_t wp = (m.width - x0 + dx - 1) / dx;
      const uint32_t hp = (m.height - y0 + dy - 1) / dy;
      passes.push_back({x0, y0, dx, dy, wp, hp,
                        (size_t(wp) * ch * depth + 7) / 8});
    }
  }
  size_t raw_size = 0;
  for (auto& p : passes) raw_size += size_t(p.h) * (p.stride + 1);

  std::vector<uint8_t> raw(raw_size);
  uLongf raw_len = uLongf(raw.size());
  if (uncompress(raw.data(), &raw_len, m.idat.data(),
                 uLong(m.idat.size())) != Z_OK ||
      raw_len != raw.size()) {
    return -2;
  }

  // Unfilter every pass, expand samples to one byte each, and place them
  // into the assembled (h, w*ch) image.
  const int bpp = depth < 8 ? 1 : ch * depth / 8;
  std::vector<uint8_t> img(size_t(m.height) * m.width * ch);
  std::vector<uint8_t> px;
  size_t off = 0;
  for (auto& p : passes) {
    if (!unfilter(raw.data() + off, p.h, p.stride, bpp)) return -3;
    px.resize(size_t(p.w) * ch);
    for (uint32_t y = 0; y < p.h; ++y) {
      const uint8_t* row = raw.data() + off + y * (p.stride + 1) + 1;
      expand_row(row, p.w, ch, depth, rescale_gray, px.data());
      uint8_t* dst_row = img.data() +
          (size_t(p.y0) + size_t(y) * p.dy) * m.width * ch;
      for (uint32_t x = 0; x < p.w; ++x) {
        std::memcpy(dst_row + (size_t(p.x0) + size_t(x) * p.dx) * ch,
                    px.data() + size_t(x) * ch, ch);
      }
    }
    off += size_t(p.h) * (p.stride + 1);
  }

  for (uint32_t y = 0; y < m.height; ++y) {
    const uint8_t* row = img.data() + size_t(y) * m.width * ch;
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
