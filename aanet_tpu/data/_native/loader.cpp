// Native data-layer: threaded PNG / PFM decoding for the input pipeline.
//
// TPU-native counterpart of the reference's native layer. The reference
// ships CUDA/C++ for its hot device op (nets/deform_conv/src/) and leans
// on torch's C++ DataLoader workers for input; here the device ops are
// XLA/Pallas, and the host-side decode path — the part that actually
// bottlenecks TPU feeding at batch 64 — is implemented natively:
//
//   * PFM decode (SceneFlow disparities, utils/file_io.py:34-70 semantics:
//     bottom-up scanlines, endian sign in the scale line)
//   * PNG decode via zlib inflate + unfiltering (8-bit RGB/RGBA/gray for
//     images; 16-bit grayscale for KITTI uint16 disparity maps)
//   * a std::thread pool fan-out decoding a whole batch per call
//
// Exposed as a C ABI consumed through ctypes (aanet_tpu/data/native_io.py).
// Build: make -C aanet_tpu/data/_native   (g++ -O3 -shared -fPIC, links -lz)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Buffer {
  std::vector<uint8_t> data;
};

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) { std::fclose(f); return false; }
  out->resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out->data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decodes non-interlaced 8/16-bit gray / 8/16-bit RGB(A) / gray+alpha PNGs.
// Returns float32 pixels as [h, w, channels_out]: color in 0..255 (16-bit
// color truncated to the high byte, matching PIL), grayscale raw
// (0..255 / 0..65535 for KITTI uint16 disparities), nullptr on failure.
// channels_out: 3 for color types 2/6 (alpha dropped), 1 for types 0/4.
float* decode_png(const uint8_t* bytes, size_t n, int64_t* h_out,
                  int64_t* w_out, int64_t* c_out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 8 || std::memcmp(bytes, kSig, 8) != 0) return nullptr;

  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;

  size_t pos = 8;
  while (pos + 8 <= n) {
    uint32_t len = be32(bytes + pos);
    const uint8_t* type = bytes + pos + 4;
    const uint8_t* payload = bytes + pos + 8;
    if (pos + 12 + len > n) return nullptr;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return nullptr;
      width = be32(payload);
      height = be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (!width || !height || interlace != 0) return nullptr;
  if (bit_depth != 8 && bit_depth != 16) return nullptr;

  int samples;  // samples per pixel in the file
  switch (color_type) {
    case 0: samples = 1; break;  // gray
    case 2: samples = 3; break;  // rgb
    case 4: samples = 2; break;  // gray + alpha
    case 6: samples = 4; break;  // rgba
    default: return nullptr;     // palette unsupported -> python fallback
  }
  const int bpp = samples * (bit_depth / 8);             // bytes per pixel
  const size_t stride = size_t(width) * bpp;             // bytes per row
  const size_t raw_size = (stride + 1) * height;

  std::vector<uint8_t> raw(raw_size);
  {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return nullptr;
    zs.next_in = const_cast<uint8_t*>(idat.data());
    zs.avail_in = static_cast<uInt>(idat.size());
    zs.next_out = raw.data();
    zs.avail_out = static_cast<uInt>(raw.size());
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END && rc != Z_OK) return nullptr;
    if (zs.total_out != raw_size) return nullptr;
  }

  // Unfilter in place (scanline layout: filter byte + row bytes).
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < height; ++y) {
    uint8_t* row = raw.data() + size_t(y) * (stride + 1);
    int filter = row[0];
    uint8_t* cur = row + 1;
    switch (filter) {
      case 0: break;
      case 1:
        for (size_t i = bpp; i < stride; ++i) cur[i] += cur[i - bpp];
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i) cur[i] += prev[i];
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(bpp) ? cur[i - bpp] : 0;
          cur[i] += uint8_t((left + prev[i]) / 2);
        }
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(bpp) ? cur[i - bpp] : 0;
          int ul = i >= size_t(bpp) ? prev[i - bpp] : 0;
          cur[i] += uint8_t(paeth(left, prev[i], ul));
        }
        break;
      default:
        return nullptr;
    }
    std::memcpy(prev.data(), cur, stride);
  }

  const int c_out_n = (color_type == 2 || color_type == 6) ? 3 : 1;
  float* out = static_cast<float*>(
      std::malloc(sizeof(float) * height * width * c_out_n));
  if (!out) return nullptr;

  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* cur = raw.data() + size_t(y) * (stride + 1) + 1;
    float* dst = out + size_t(y) * width * c_out_n;
    if (bit_depth == 8) {
      for (uint32_t x = 0; x < width; ++x)
        for (int c = 0; c < c_out_n; ++c)
          dst[x * c_out_n + c] = float(cur[x * samples + c]);
    } else if (c_out_n == 3) {
      // 16-bit color: reduce to 8-bit range by taking the high byte, the
      // same truncation PIL applies when opening 16-bit RGB PNGs — keeps
      // the native and fallback paths consistent for downstream /255
      // normalization (images are 8-bit in practice; this is a safety net).
      for (uint32_t x = 0; x < width; ++x)
        for (int c = 0; c < c_out_n; ++c)
          dst[x * c_out_n + c] = float(cur[(x * samples + c) * 2]);
    } else {  // 16-bit big-endian grayscale (KITTI disparity): raw values
      for (uint32_t x = 0; x < width; ++x)
        for (int c = 0; c < c_out_n; ++c) {
          const uint8_t* s = cur + (x * samples + c) * 2;
          dst[x * c_out_n + c] = float((uint32_t(s[0]) << 8) | s[1]);
        }
    }
  }
  *h_out = height;
  *w_out = width;
  *c_out = c_out_n;
  return out;
}

// ---------------------------------------------------------------------------
// PFM (reference utils/file_io.py:34-70 semantics)
// ---------------------------------------------------------------------------

bool host_is_little_endian() {
  const uint16_t x = 1;
  return *reinterpret_cast<const uint8_t*>(&x) == 1;
}

// Returns float32 [h, w, c] flipped to top-down row order.
float* decode_pfm(const uint8_t* bytes, size_t n, int64_t* h_out,
                  int64_t* w_out, int64_t* c_out) {
  // header: "PF\n" | "Pf\n", "<w> <h>\n", "<scale>\n" (sign = endianness)
  size_t pos = 0;
  auto read_token = [&](std::string* tok) {
    while (pos < n && std::isspace(bytes[pos])) ++pos;
    tok->clear();
    while (pos < n && !std::isspace(bytes[pos])) tok->push_back(char(bytes[pos++]));
    return !tok->empty();
  };
  std::string magic, ws, hs, ss;
  if (!read_token(&magic) || (magic != "PF" && magic != "Pf")) return nullptr;
  if (!read_token(&ws) || !read_token(&hs) || !read_token(&ss)) return nullptr;
  if (pos >= n || !std::isspace(bytes[pos])) return nullptr;
  ++pos;  // single whitespace after the scale line
  const int channels = magic == "PF" ? 3 : 1;
  long w = std::strtol(ws.c_str(), nullptr, 10);
  long h = std::strtol(hs.c_str(), nullptr, 10);
  double scale = std::strtod(ss.c_str(), nullptr);
  if (w <= 0 || h <= 0) return nullptr;
  const bool file_little = scale < 0;
  const size_t count = size_t(w) * h * channels;
  if (pos + count * 4 > n) return nullptr;

  float* out = static_cast<float*>(std::malloc(sizeof(float) * count));
  if (!out) return nullptr;
  const uint8_t* src = bytes + pos;
  const bool swap = file_little != host_is_little_endian();
  // PFM scanlines are bottom-up; flip while copying.
  for (long y = 0; y < h; ++y) {
    const uint8_t* srow = src + size_t(h - 1 - y) * w * channels * 4;
    float* drow = out + size_t(y) * w * channels;
    if (!swap) {
      std::memcpy(drow, srow, size_t(w) * channels * 4);
    } else {
      for (long i = 0; i < w * channels; ++i) {
        const uint8_t* p = srow + i * 4;
        uint8_t b[4] = {p[3], p[2], p[1], p[0]};
        std::memcpy(&drow[i], b, 4);
      }
    }
  }
  *h_out = h;
  *w_out = w;
  *c_out = channels;
  return out;
}

float* decode_any(const char* path, int64_t* h, int64_t* w, int64_t* c) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes)) return nullptr;
  if (bytes.size() >= 8 && bytes[0] == 137 && bytes[1] == 'P')
    return decode_png(bytes.data(), bytes.size(), h, w, c);
  if (bytes.size() >= 2 && bytes[0] == 'P' && (bytes[1] == 'F' || bytes[1] == 'f'))
    return decode_pfm(bytes.data(), bytes.size(), h, w, c);
  return nullptr;
}

}  // namespace

extern "C" {

// Decode one file (PNG or PFM by magic). Returns a malloc'd float32
// [h, w, c] buffer (caller frees via aanet_free) or nullptr.
float* aanet_decode(const char* path, int64_t* h, int64_t* w, int64_t* c) {
  return decode_any(path, h, w, c);
}

void aanet_free(float* ptr) { std::free(ptr); }

// Threaded batch decode: n files -> outs[i] (nullptr on per-file failure),
// dims[3*i..3*i+2] = (h, w, c). Returns the number of successful decodes.
int64_t aanet_decode_batch(const char** paths, int64_t n, float** outs,
                           int64_t* dims, int64_t num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  if (num_threads > n) num_threads = n;
  std::atomic<int64_t> next(0), ok(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      int64_t h = 0, w = 0, c = 0;
      outs[i] = decode_any(paths[i], &h, &w, &c);
      dims[3 * i] = h;
      dims[3 * i + 1] = w;
      dims[3 * i + 2] = c;
      if (outs[i]) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int64_t t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return ok.load();
}

}  // extern "C"
