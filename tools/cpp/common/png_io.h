// Minimal PNG encode/decode on top of zlib — just the subset the tools
// need: encode 8-bit RGB and 16-bit grayscale; decode 8-bit RGB/RGBA/gray
// and 16-bit grayscale, non-interlaced.
#pragma once

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace pngio {

inline void put_u32(std::vector<uint8_t> &out, uint32_t v) {
  out.push_back(v >> 24);
  out.push_back(v >> 16);
  out.push_back(v >> 8);
  out.push_back(v);
}

inline void write_chunk(std::vector<uint8_t> &out, const char type[4],
                        const uint8_t *data, size_t len) {
  put_u32(out, (uint32_t)len);
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0, out.data() + start, (uInt)(len + 4));
  put_u32(out, crc);
}

inline std::vector<uint8_t> zlib_compress(const std::vector<uint8_t> &raw) {
  uLongf bound = compressBound((uLong)raw.size());
  std::vector<uint8_t> buf(bound);
  if (compress2(buf.data(), &bound, raw.data(), (uLong)raw.size(), 6) != Z_OK)
    throw std::runtime_error("zlib compress failed");
  buf.resize(bound);
  return buf;
}

inline std::vector<uint8_t> zlib_decompress(const uint8_t *data, size_t len,
                                            size_t expected) {
  std::vector<uint8_t> out(expected);
  uLongf out_len = (uLongf)expected;
  int rc = uncompress(out.data(), &out_len, data, (uLong)len);
  if (rc != Z_OK) throw std::runtime_error("zlib uncompress failed");
  out.resize(out_len);
  return out;
}

// color_type 0 = gray, 2 = rgb; bit_depth 8 or 16.
inline void write_png(const std::string &path, const uint8_t *pixels, int width,
                      int height, int channels, int bit_depth) {
  int color_type = channels == 1 ? 0 : 2;
  size_t bpp = (size_t)channels * (bit_depth / 8);
  size_t stride = (size_t)width * bpp;

  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * height);
  for (int y = 0; y < height; y++) {
    raw.push_back(0);  // filter: none
    raw.insert(raw.end(), pixels + y * stride, pixels + (y + 1) * stride);
  }
  std::vector<uint8_t> idat = zlib_compress(raw);

  std::vector<uint8_t> out;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = width >> 24; ihdr[1] = width >> 16; ihdr[2] = width >> 8; ihdr[3] = width;
  ihdr[4] = height >> 24; ihdr[5] = height >> 16; ihdr[6] = height >> 8; ihdr[7] = height;
  ihdr[8] = (uint8_t)bit_depth;
  ihdr[9] = (uint8_t)color_type;
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  write_chunk(out, "IHDR", ihdr, 13);
  write_chunk(out, "IDAT", idat.data(), idat.size());
  write_chunk(out, "IEND", nullptr, 0);

  FILE *f = fopen(path.c_str(), "wb");
  if (!f) throw std::runtime_error("cannot open " + path);
  fwrite(out.data(), 1, out.size(), f);
  fclose(f);
}

struct Image {
  int width = 0, height = 0, channels = 0, bit_depth = 8;
  std::vector<uint8_t> data;  // row-major, big-endian 16-bit when depth 16

  // Sample as 16-bit grayscale (matches Go's color.Gray16Model conversion
  // for gray inputs; for RGB uses the standard luma weights Go applies).
  // Channel layouts: 1 = gray, 2 = gray+alpha, 3 = RGB, 4 = RGBA —
  // treating gray+alpha as RGB read the alpha as green and the NEXT
  // pixel (out of bounds on the last one) as blue.
  uint16_t gray16(int x, int y) const {
    size_t bpp = (size_t)channels * (bit_depth / 8);
    const uint8_t *p = &data[((size_t)y * width + x) * bpp];
    auto chan16 = [&](int c) -> uint32_t {
      if (bit_depth == 16) return (p[2 * c] << 8) | p[2 * c + 1];
      return p[c] * 0x101;
    };
    if (channels <= 2) return (uint16_t)chan16(0);
    uint32_t r = chan16(0), g = chan16(1), b = chan16(2);
    uint32_t gray = (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16;
    if (channels == 4) {
      // Alpha-premultiply like Go's color model conversions: a
      // transparent background must not contribute its stored RGB.
      uint32_t a = chan16(3);
      gray = gray * a / 0xffff;
    }
    return (uint16_t)gray;
  }

  void rgb8(int x, int y, uint8_t out[3]) const {
    size_t bpp = (size_t)channels * (bit_depth / 8);
    const uint8_t *p = &data[((size_t)y * width + x) * bpp];
    auto chan8 = [&](int c) -> uint8_t {
      return bit_depth == 16 ? p[2 * c] : p[c];
    };
    if (channels <= 2) {
      uint8_t g = chan8(0);
      if (channels == 2) g = (uint8_t)((uint32_t)g * chan8(1) / 255);
      out[0] = out[1] = out[2] = g;
    } else {
      out[0] = chan8(0); out[1] = chan8(1); out[2] = chan8(2);
      if (channels == 4) {
        // Alpha-premultiply (Go color.RGBAModel semantics).
        uint32_t a = chan8(3);
        for (int i = 0; i < 3; i++)
          out[i] = (uint8_t)((uint32_t)out[i] * a / 255);
      }
    }
  }
};

inline uint32_t read_u32(const uint8_t *p) {
  return ((uint32_t)p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

inline Image read_png(const std::string &path) {
  FILE *f = fopen(path.c_str(), "rb");
  if (!f) throw std::runtime_error("cannot open " + path);
  std::vector<uint8_t> file;
  uint8_t buf[65536];
  size_t n;
  while ((n = fread(buf, 1, sizeof(buf), f)) > 0) file.insert(file.end(), buf, buf + n);
  fclose(f);

  if (file.size() < 8 || file[0] != 137 || file[1] != 'P')
    throw std::runtime_error("not a PNG: " + path);

  Image img;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  int color_type = 0;
  while (pos + 8 <= file.size()) {
    uint32_t len = read_u32(&file[pos]);
    // Validate the declared chunk fits the file BEFORE touching its
    // data: a truncated/corrupt PNG must error, not read out of bounds.
    if (pos + 8 + (size_t)len + 4 > file.size())
      throw std::runtime_error("truncated PNG chunk in " + path);
    std::string type((char *)&file[pos + 4], 4);
    const uint8_t *data = &file[pos + 8];
    if (type == "IHDR") {
      if (len < 13) throw std::runtime_error("short IHDR in " + path);
      img.width = read_u32(data);
      img.height = read_u32(data + 4);
      img.bit_depth = data[8];
      color_type = data[9];
      if (data[12] != 0) throw std::runtime_error("interlaced PNG unsupported");
      switch (color_type) {
        case 0: img.channels = 1; break;
        case 2: img.channels = 3; break;
        case 4: img.channels = 2; break;
        case 6: img.channels = 4; break;
        default: throw std::runtime_error("palette PNG unsupported");
      }
    } else if (type == "IDAT") {
      idat.insert(idat.end(), data, data + len);
    } else if (type == "IEND") {
      break;
    }
    pos += 12 + len;
  }

  size_t bpp = (size_t)img.channels * (img.bit_depth / 8);
  size_t stride = (size_t)img.width * bpp;
  std::vector<uint8_t> raw =
      zlib_decompress(idat.data(), idat.size(), (stride + 1) * img.height);

  img.data.assign(stride * img.height, 0);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < img.height; y++) {
    uint8_t filter = raw[(stride + 1) * y];
    const uint8_t *src = &raw[(stride + 1) * y + 1];
    uint8_t *dst = &img.data[stride * y];
    for (size_t i = 0; i < stride; i++) {
      int a = i >= bpp ? dst[i - bpp] : 0;
      int b = prev[i];
      int c = i >= bpp ? prev[i - bpp] : 0;
      int v = src[i];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: throw std::runtime_error("bad PNG filter");
      }
      dst[i] = (uint8_t)v;
    }
    std::memcpy(prev.data(), dst, stride);
  }
  return img;
}

}  // namespace pngio
