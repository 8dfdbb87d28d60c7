// Native data-loading runtime: PNG decode + thread-pool prefetcher.
//
// TPU-native framework's answer to the reference's C++ dataset machinery
// (dynosam dataprovider/*, which decodes PNG/flow images on the host):
// a minimal, dependency-light (zlib only) PNG decoder supporting the
// formats the datasets use (8/16-bit gray, RGB, RGBA, non-interlaced)
// plus a worker pool so image decode overlaps TPU compute.  Exposed as a
// C ABI consumed from Python via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libdynoloader.so)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct PngImage {
  uint32_t width = 0;
  uint32_t height = 0;
  int channels = 0;
  int bit_depth = 0;           // 8 or 16
  std::vector<uint8_t> data;   // row-major, native-endian for 16-bit
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  std::vector<uint8_t> buf(1 << 20);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a PNG file. Supports color types 0 (gray), 2 (RGB), 4 (gray+A),
// 6 (RGBA); bit depths 8/16; no interlacing, no palette.
bool decode_png(const char* path, PngImage& img) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> file(n);
  if (std::fread(file.data(), 1, n, f) != size_t(n)) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 8 || std::memcmp(file.data(), sig, 8) != 0) return false;

  size_t off = 8;
  std::vector<uint8_t> idat;
  int color_type = -1, interlace = 0;
  while (off + 8 <= size_t(n)) {
    uint32_t len = be32(&file[off]);
    const char* type = reinterpret_cast<const char*>(&file[off + 4]);
    const uint8_t* payload = &file[off + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      img.width = be32(payload);
      img.height = be32(payload + 4);
      img.bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    off += 12 + len;
  }
  if (interlace != 0) return false;
  switch (color_type) {
    case 0: img.channels = 1; break;
    case 2: img.channels = 3; break;
    case 4: img.channels = 2; break;
    case 6: img.channels = 4; break;
    default: return false;  // palette unsupported
  }
  if (img.bit_depth != 8 && img.bit_depth != 16) return false;

  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw)) return false;

  const size_t bypp = size_t(img.channels) * (img.bit_depth / 8);
  const size_t stride = bypp * img.width;
  if (raw.size() < (stride + 1) * img.height) return false;

  img.data.resize(stride * img.height);
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < img.height; ++y) {
    const uint8_t* src = &raw[y * (stride + 1)];
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = &img.data[y * stride];
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bypp ? dst[x - bypp] : 0;
      int b = prev[x];
      int c = x >= bypp ? prev[x - bypp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
    std::memcpy(prev.data(), dst, stride);
  }

  // big-endian -> native for 16-bit
  if (img.bit_depth == 16) {
    for (size_t i = 0; i + 1 < img.data.size(); i += 2) {
      std::swap(img.data[i], img.data[i + 1]);
    }
  }
  return true;
}

// ------------------------------------------------------------------
// Thread pool
// ------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { run(); });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push_back(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop_front();
      }
      job();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<std::function<void()>> jobs_;
  std::vector<std::thread> workers_;
  bool stop_;
};

}  // namespace

extern "C" {

// Synchronous decode into caller-provided buffer.  Returns 0 on success.
// out must hold width*height*channels elements of (bit_depth/8) bytes
// (use dyno_png_info first).
int dyno_png_info(const char* path, int* width, int* height, int* channels,
                  int* bit_depth) {
  PngImage img;
  if (!decode_png(path, img)) return -1;  // full decode; cached? keep simple
  *width = int(img.width);
  *height = int(img.height);
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  return 0;
}

int dyno_png_decode(const char* path, uint8_t* out, long out_size) {
  PngImage img;
  if (!decode_png(path, img)) return -1;
  if (long(img.data.size()) > out_size) return -2;
  std::memcpy(out, img.data.data(), img.data.size());
  return int(img.data.size());
}

void* dyno_pool_create(int n_threads) { return new Pool(n_threads); }

void dyno_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Async decode: sets *status to the decode result (bytes or <0) and
// *done to 1 when finished.
void dyno_pool_decode(void* pool, const char* path, uint8_t* out,
                      long out_size, std::atomic<int>* done,
                      std::atomic<int>* status) {
  std::string p(path);
  static_cast<Pool*>(pool)->submit([p, out, out_size, done, status] {
    int r = dyno_png_decode(p.c_str(), out, out_size);
    status->store(r);
    done->store(1);
  });
}

}  // extern "C"
