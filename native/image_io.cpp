// image_io.cpp — native image pipeline for torch_nerf_tpu.
//
// First-party replacement for the reference's external image tooling
// (ImageMagick `mogrify` shell-outs in load_llff.py:17-85 and
// imageio/cv2 decoding): a minimal, dependency-light PNG codec (zlib only)
// plus multithreaded batch decode + area downsampling, exposed with a C ABI
// for ctypes.
//
// Supported PNG subset: 8-bit, non-interlaced, color types 0 (gray),
// 2 (RGB), 4 (gray+alpha), 6 (RGBA) — everything the NeRF datasets use.
// Unsupported files return an error so Python can fall back to PIL.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC ... -lz -lpthread).

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ByteReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;

  bool read(void* out, size_t n) {
    if (pos + n > size) return false;
    std::memcpy(out, data + pos, n);
    pos += n;
    return true;
  }
  uint32_t read_u32be() {
    uint8_t b[4];
    if (!read(b, 4)) return 0;
    return (uint32_t(b[0]) << 24) | (uint32_t(b[1]) << 16) |
           (uint32_t(b[2]) << 8) | uint32_t(b[3]);
  }
};

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a PNG byte buffer. On success fills width/height/channels and
// returns 0; output buffer is resized to h*w*channels bytes.
int decode_png(const uint8_t* bytes, size_t size, std::vector<uint8_t>* out,
               uint32_t* width, uint32_t* height, uint32_t* channels) {
  static const uint8_t kMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  if (size < 8 || std::memcmp(bytes, kMagic, 8) != 0) return -1;

  ByteReader r{bytes, size, 8};
  uint32_t w = 0, h = 0;
  uint8_t bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;

  while (r.pos + 8 <= r.size) {
    uint32_t chunk_len = r.read_u32be();
    char type[5] = {0};
    if (!r.read(type, 4)) return -2;
    if (r.pos + chunk_len + 4 > r.size) return -2;

    if (std::strcmp(type, "IHDR") == 0) {
      w = r.read_u32be();
      h = r.read_u32be();
      uint8_t hdr[5];
      if (!r.read(hdr, 5)) return -2;
      bit_depth = hdr[0];
      color_type = hdr[1];
      interlace = hdr[4];
      if (bit_depth != 8 || interlace != 0) return -3;  // unsupported
      if (color_type != 0 && color_type != 2 && color_type != 4 &&
          color_type != 6)
        return -3;
    } else if (std::strcmp(type, "IDAT") == 0) {
      size_t old = idat.size();
      idat.resize(old + chunk_len);
      if (!r.read(idat.data() + old, chunk_len)) return -2;
    } else if (std::strcmp(type, "IEND") == 0) {
      break;
    } else {
      r.pos += chunk_len;  // skip ancillary chunk
    }
    r.pos += 4;  // CRC
  }
  if (w == 0 || h == 0 || idat.empty()) return -2;

  uint32_t ch = (color_type == 0) ? 1 : (color_type == 2) ? 3
                : (color_type == 4) ? 2 : 4;
  const size_t stride = size_t(w) * ch;
  std::vector<uint8_t> raw((stride + 1) * h);

  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -4;
  zs.next_in = idat.data();
  zs.avail_in = static_cast<uInt>(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = static_cast<uInt>(raw.size());
  int zret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zret != Z_STREAM_END) return -4;

  // de-filter scanlines
  out->resize(stride * h);
  const uint32_t bpp = ch;
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = out->data() + stride * y;
    const uint8_t* prev = (y > 0) ? out->data() + stride * (y - 1) : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (x >= bpp ? dst[x - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (prev ? prev[x] : 0);
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          dst[x] = src[x] + uint8_t((a + b) / 2);
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
          dst[x] = src[x] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return -5;
    }
  }
  *width = w;
  *height = h;
  *channels = ch;
  return 0;
}

}  // namespace

extern "C" {

// Decode one PNG file into caller-allocated buffer.
// Returns 0 on success. Call tn_png_info first to size the buffer.
int tn_png_info(const char* path, uint32_t* width, uint32_t* height,
                uint32_t* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> bytes(fsize);
  size_t got = std::fread(bytes.data(), 1, fsize, f);
  std::fclose(f);
  if (got != size_t(fsize)) return -10;
  std::vector<uint8_t> out;
  return decode_png(bytes.data(), bytes.size(), &out, width, height, channels);
}

int tn_png_decode(const char* path, uint8_t* out_buf, uint32_t out_size,
                  uint32_t* width, uint32_t* height, uint32_t* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> bytes(fsize);
  size_t got = std::fread(bytes.data(), 1, fsize, f);
  std::fclose(f);
  if (got != size_t(fsize)) return -10;

  std::vector<uint8_t> out;
  int ret = decode_png(bytes.data(), bytes.size(), &out, width, height, channels);
  if (ret != 0) return ret;
  if (out.size() > out_size) return -11;
  std::memcpy(out_buf, out.data(), out.size());
  return 0;
}

// Batch decode `count` PNGs of identical dimensions into a contiguous
// float32 [count, h, w, c] buffer scaled to [0, 1], using worker threads.
// `paths` is a NUL-separated, double-NUL-terminated string list.
int tn_png_decode_batch_f32(const char* paths, int count, float* out,
                            uint32_t expect_w, uint32_t expect_h,
                            uint32_t expect_c, int num_threads) {
  std::vector<const char*> files;
  const char* p = paths;
  for (int i = 0; i < count; ++i) {
    files.push_back(p);
    p += std::strlen(p) + 1;
  }
  const size_t pixels = size_t(expect_w) * expect_h * expect_c;

  std::vector<int> status(count, 0);
  auto worker = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      uint32_t w, h, c;
      std::vector<uint8_t> tmp(pixels);
      int ret = tn_png_decode(files[i], tmp.data(),
                              static_cast<uint32_t>(tmp.size()), &w, &h, &c);
      if (ret != 0 || w != expect_w || h != expect_h || c != expect_c) {
        status[i] = ret != 0 ? ret : -12;
        continue;
      }
      float* dst = out + pixels * i;
      for (size_t j = 0; j < pixels; ++j) dst[j] = tmp[j] * (1.0f / 255.0f);
    }
  };

  if (num_threads <= 1 || count <= 1) {
    worker(0, count);
  } else {
    int nt = std::min(num_threads, count);
    std::vector<std::thread> threads;
    int per = (count + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int begin = t * per;
      int end = std::min(count, begin + per);
      if (begin < end) threads.emplace_back(worker, begin, end);
    }
    for (auto& th : threads) th.join();
  }
  for (int s : status)
    if (s != 0) return s;
  return 0;
}

// Area-downsample a float32 HWC image by an integer factor (box filter),
// the native replacement for the reference's ImageMagick minification.
void tn_area_downsample_f32(const float* src, uint32_t h, uint32_t w,
                            uint32_t c, uint32_t factor, float* dst) {
  const uint32_t oh = h / factor, ow = w / factor;
  const float inv = 1.0f / float(factor * factor);
  for (uint32_t y = 0; y < oh; ++y) {
    for (uint32_t x = 0; x < ow; ++x) {
      for (uint32_t k = 0; k < c; ++k) {
        float acc = 0.0f;
        for (uint32_t dy = 0; dy < factor; ++dy) {
          const float* row = src + (size_t(y * factor + dy) * w) * c;
          for (uint32_t dx = 0; dx < factor; ++dx)
            acc += row[(x * factor + dx) * c + k];
        }
        dst[(size_t(y) * ow + x) * c + k] = acc * inv;
      }
    }
  }
}

}  // extern "C"
