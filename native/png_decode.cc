// Minimal PNG decoder for dataset images: 8/16-bit grayscale + 8-bit
// RGB(A), non-interlaced, all five scanline filters; inflate via zlib.
//
// Native counterpart of the reference's OpenCV imread path inside its
// dataset loaders (reference: examples/dataset/euroc.hpp:20-130 uses
// cv::imread per frame on the feed thread). Kept dependency-free except
// zlib so the loader builds anywhere with `g++ -lz`.

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

}  // namespace

extern "C" {

// Decode a PNG byte buffer into an 8-bit grayscale image.
// Returns 0 on success; fills *out_w/*out_h. `out` must hold max_out bytes.
int svo_png_decode_gray8(const uint8_t* data, size_t size, uint8_t* out,
                         size_t max_out, int* out_w, int* out_h) {
  static const uint8_t kMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A,
                                    '\n'};
  if (size < 8 || std::memcmp(data, kMagic, 8) != 0) return -1;

  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 8 <= size) {
    uint32_t len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + len > size) return -2;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return -3;
      w = be32(body);
      h = be32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0 || interlace != 0) return -4;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;   // gray
    case 2: channels = 3; break;   // rgb
    case 4: channels = 2; break;   // gray+alpha
    case 6: channels = 4; break;   // rgba
    default: return -5;            // palette unsupported
  }
  if (bit_depth != 8 && !(bit_depth == 16 && color_type == 0)) return -6;
  const int bpp = channels * (bit_depth / 8);
  const size_t stride = size_t(w) * bpp;
  if (size_t(w) * h > max_out) return -7;

  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return -8;
  if (raw_len != raw.size()) return -9;

  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    int filter = src[0];
    const uint8_t* s = src + 1;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
      int b = prev[x];
      int c = x >= size_t(bpp) ? prev[x - bpp] : 0;
      int v = s[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -10;
      }
      cur[x] = uint8_t(v);
    }
    // convert row to gray8
    uint8_t* dst = out + size_t(y) * w;
    if (color_type == 0 && bit_depth == 8) {
      std::memcpy(dst, cur.data(), w);
    } else if (color_type == 0 && bit_depth == 16) {
      for (uint32_t x = 0; x < w; ++x) dst[x] = cur[2 * x];  // high byte
    } else if (color_type == 4) {
      for (uint32_t x = 0; x < w; ++x) dst[x] = cur[2 * x];
    } else {  // rgb / rgba → luma
      for (uint32_t x = 0; x < w; ++x) {
        const uint8_t* px = cur.data() + size_t(x) * channels;
        dst[x] = uint8_t((299 * px[0] + 587 * px[1] + 114 * px[2]) / 1000);
      }
    }
    std::swap(prev, cur);
  }
  *out_w = int(w);
  *out_h = int(h);
  return 0;
}

}  // extern "C"
