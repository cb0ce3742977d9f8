// ViewFusion-TPU native data loader.
//
// Multi-threaded webdataset-format tar shard reader + PNG decoder with a
// bounded ring buffer, exposed through a C ABI consumed via ctypes
// (viewfusion_tpu/data/native_loader.py).
//
// This supplies the native data path the reference gets from its
// dependencies (webdataset's tar streaming + PIL's C PNG decode inside
// torch dataloader worker processes, reference experiment.py:180-187);
// here the whole decode path is in-process C++ worker threads feeding the
// host input pipeline, so TPU feeding never blocks on Python.
//
// Capabilities:
//   * streaming ustar/pax tar parsing, samples grouped by basename prefix
//     (webdataset grouping, reference data/nmr_dataset.py:96-98)
//   * minimal PNG decoder (8-bit gray/RGB/palette/gray-alpha/RGBA,
//     non-interlaced; alpha dropped, matching PIL convert("RGB"))
//   * per-epoch shard shuffling (xorshift PRNG, seeded), optional
//     infinite resampling (reference resampled=True semantics)
//   * bounded producer/consumer ring buffer, N decode threads
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC vfloader.cpp -lz)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <set>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// PNG decoding
// ---------------------------------------------------------------------

struct PNGImage {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

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

bool zlib_inflate(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  zs.next_out = out.data();
  zs.avail_out = static_cast<uInt>(out.size());
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END && zs.avail_out == 0;
}

bool decode_png(const uint8_t* buf, size_t len, PNGImage& out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, kSig, 8) != 0) return false;

  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // rgb triples

  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + clen > len) return false;
    if (!memcmp(type, "IHDR", 4)) {
      if (clen < 13) return false;
      w = be32(data);
      h = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
      if (bit_depth != 8 || interlace != 0) return false;
    } else if (!memcmp(type, "PLTE", 4)) {
      palette.assign(data, data + clen);
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;  // len + type + data + crc
  }
  if (w == 0 || h == 0 || idat.empty()) return false;

  int ch;
  switch (color_type) {
    case 0: ch = 1; break;  // gray
    case 2: ch = 3; break;  // rgb
    case 3: ch = 1; break;  // palette index
    case 4: ch = 2; break;  // gray + alpha
    case 6: ch = 4; break;  // rgba
    default: return false;
  }

  const size_t stride = size_t(w) * ch;
  std::vector<uint8_t> raw(h * (stride + 1));
  if (!zlib_inflate(idat, raw)) return false;

  // unfilter in place into `img`
  std::vector<uint8_t> img(h * stride);
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = img.data() + y * stride;
    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (x >= size_t(ch) ? dst[x - ch] : 0);
        break;
      case 2:
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (prev ? prev[x] : 0);
        break;
      case 3:
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(ch) ? dst[x - ch] : 0;
          int b = prev ? prev[x] : 0;
          dst[x] = src[x] + uint8_t((a + b) / 2);
        }
        break;
      case 4:
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(ch) ? dst[x - ch] : 0;
          int b = prev ? prev[x] : 0;
          int c = (prev && x >= size_t(ch)) ? prev[x - ch] : 0;
          dst[x] = src[x] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return false;
    }
    prev = img.data() + y * stride;
  }

  // convert to RGB (alpha dropped == PIL convert("RGB") on RGBA)
  out.w = int(w);
  out.h = int(h);
  out.rgb.resize(size_t(w) * h * 3);
  for (size_t i = 0; i < size_t(w) * h; ++i) {
    const uint8_t* px = img.data() + i * ch;
    uint8_t r, g, b;
    switch (color_type) {
      case 0: case 4: r = g = b = px[0]; break;
      case 2: case 6: r = px[0]; g = px[1]; b = px[2]; break;
      case 3: {
        size_t idx = size_t(px[0]) * 3;
        if (idx + 2 >= palette.size()) return false;
        r = palette[idx]; g = palette[idx + 1]; b = palette[idx + 2];
        break;
      }
      default: return false;
    }
    out.rgb[i * 3] = r;
    out.rgb[i * 3 + 1] = g;
    out.rgb[i * 3 + 2] = b;
  }
  return true;
}

// ---------------------------------------------------------------------
// Tar streaming
// ---------------------------------------------------------------------

struct TarEntry {
  std::string name;
  std::vector<uint8_t> data;
};

// Reads next regular-file entry; returns false at end of archive.
bool tar_next(FILE* f, TarEntry& e) {
  uint8_t hdr[512];
  for (;;) {
    if (fread(hdr, 1, 512, f) != 512) return false;
    bool all_zero = true;
    for (int i = 0; i < 512; ++i)
      if (hdr[i]) { all_zero = false; break; }
    if (all_zero) return false;

    char size_oct[13];
    memcpy(size_oct, hdr + 124, 12);
    size_oct[12] = 0;
    size_t size = strtoull(size_oct, nullptr, 8);
    char typeflag = hdr[156];
    size_t padded = (size + 511) & ~size_t(511);

    if (typeflag == '0' || typeflag == 0) {
      char name[101];
      memcpy(name, hdr, 100);
      name[100] = 0;
      e.name = name;
      e.data.resize(size);
      if (size && fread(e.data.data(), 1, size, f) != size) return false;
      if (padded > size) fseek(f, long(padded - size), SEEK_CUR);
      return true;
    }
    // skip non-regular entries (pax headers, dirs, ...)
    fseek(f, long(padded), SEEK_CUR);
  }
}

// ---------------------------------------------------------------------
// Loader
// ---------------------------------------------------------------------

struct Sample {
  std::string key;
  int views = 0, h = 0, w = 0;
  std::vector<uint8_t> data;  // views*h*w*3
};

struct Loader {
  std::vector<std::string> paths;
  int total_views;
  bool resample;
  uint64_t rng_state;
  size_t capacity;

  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<std::unique_ptr<Sample>> queue;
  std::deque<std::string> shard_queue;
  int active_producers = 0;
  std::set<std::string> done_shards;  // distinct shards fully processed (mu)
  size_t unique_paths = 0;            // distinct entries in `paths`
  bool epoch_done = false;   // all shards consumed and not resampling
  bool failed = false;       // no readable data: stop instead of spinning
  std::atomic<bool> stop{false};
  std::atomic<long> decode_errors{0};
  std::atomic<long> pushed{0};
  std::vector<std::thread> threads;

  uint64_t next_rand() {  // xorshift64*
    uint64_t x = rng_state;
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    rng_state = x;
    return x * 0x2545F4914F6CDD1DULL;
  }

  void refill_shards_locked() {
    shard_queue.assign(paths.begin(), paths.end());
    for (size_t i = shard_queue.size(); i > 1; --i)
      std::swap(shard_queue[i - 1], shard_queue[next_rand() % i]);
  }

  bool pop_shard(std::string& out) {
    std::unique_lock<std::mutex> lk(mu);
    if (shard_queue.empty()) {
      if (!resample) return false;
      // guard: declare "no readable data" (instead of resampling
      // forever) only once EVERY distinct shard has FINISHED processing
      // at least once with zero samples produced overall — decode is
      // deterministic, so re-reading those shards cannot help.  The old
      // guard counted queue refills, which is racy: on a loaded host
      // the other producers can empty/refill the queue twice while the
      // first shard is still mid-decode, failing a healthy stream.
      if (done_shards.size() >= unique_paths && pushed.load() == 0) {
        failed = true;
        epoch_done = true;
        cv_pop.notify_all();
        return false;
      }
      refill_shards_locked();
      if (shard_queue.empty()) {
        failed = true;
        epoch_done = true;
        cv_pop.notify_all();
        return false;
      }
    }
    out = shard_queue.front();
    shard_queue.pop_front();
    return true;
  }

  void push_sample(std::unique_ptr<Sample> s) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] { return queue.size() < capacity || stop; });
    if (stop) return;
    queue.push_back(std::move(s));
    cv_pop.notify_one();
  }

  static std::pair<std::string, std::string> split_name(
      const std::string& name) {
    // key = dir + basename-before-first-dot; suffix = rest
    size_t slash = name.find_last_of('/');
    size_t base_start = slash == std::string::npos ? 0 : slash + 1;
    size_t dot = name.find('.', base_start);
    if (dot == std::string::npos) return {name, ""};
    return {name.substr(0, dot), name.substr(dot + 1)};
  }

  void process_shard(const std::string& path) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) {
      // unreadable shard counts as an error (silent loss otherwise)
      decode_errors.fetch_add(1);
      return;
    }
    TarEntry e;
    std::string cur_key;
    std::vector<std::pair<std::string, std::vector<uint8_t>>> files;

    auto flush = [&]() {
      if (cur_key.empty() || files.empty()) return;
      auto s = std::make_unique<Sample>();
      s->key = cur_key;
      PNGImage img;
      bool ok = true;
      int count = 0;
      for (int v = 0; v < total_views && ok; ++v) {
        char want[16];
        snprintf(want, sizeof(want), "%04d.png", v);
        const std::vector<uint8_t>* payload = nullptr;
        for (auto& kv : files)
          if (kv.first == want) { payload = &kv.second; break; }
        if (!payload) { ok = false; break; }
        if (!decode_png(payload->data(), payload->size(), img)) {
          ok = false;
          break;
        }
        if (v == 0) {
          s->views = total_views;
          s->h = img.h;
          s->w = img.w;
          s->data.resize(size_t(total_views) * img.h * img.w * 3);
        } else if (img.h != s->h || img.w != s->w) {
          ok = false;
          break;
        }
        memcpy(s->data.data() + size_t(v) * img.h * img.w * 3,
               img.rgb.data(), img.rgb.size());
        ++count;
      }
      if (ok && count == total_views) {
        pushed.fetch_add(1);
        push_sample(std::move(s));
      } else {
        decode_errors.fetch_add(1);
      }
      files.clear();
    };

    while (!stop && tar_next(f, e)) {
      auto [key, suffix] = split_name(e.name);
      if (key != cur_key) {
        flush();
        cur_key = key;
      }
      files.emplace_back(suffix, std::move(e.data));
    }
    if (!stop) flush();
    fclose(f);
  }

  void producer() {
    std::string shard;
    while (!stop && pop_shard(shard)) {
      process_shard(shard);
      std::unique_lock<std::mutex> lk(mu);
      done_shards.insert(shard);
    }
    std::unique_lock<std::mutex> lk(mu);
    if (--active_producers == 0 && !resample) {
      epoch_done = true;
      cv_pop.notify_all();
    }
  }

  std::unique_ptr<Sample> next() {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [&] { return !queue.empty() || epoch_done || stop; });
    if (queue.empty()) return nullptr;
    auto s = std::move(queue.front());
    queue.pop_front();
    cv_push.notify_one();
    return s;
  }
};

}  // namespace

extern "C" {

void* vf_loader_open(const char** paths, int n_paths, int n_threads,
                     int total_views, int resample, uint64_t seed,
                     int capacity) {
  if (n_paths <= 0) return nullptr;  // empty shard list is caller error
  auto* L = new Loader();
  for (int i = 0; i < n_paths; ++i) L->paths.emplace_back(paths[i]);
  L->unique_paths =
      std::set<std::string>(L->paths.begin(), L->paths.end()).size();
  L->total_views = total_views;
  L->resample = resample != 0;
  L->rng_state = seed * 0x9E3779B97F4A7C15ULL + 1;
  L->capacity = capacity > 0 ? size_t(capacity) : 64;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->refill_shards_locked();
    L->active_producers = n_threads > 0 ? n_threads : 1;
  }
  for (int t = 0; t < (n_threads > 0 ? n_threads : 1); ++t)
    L->threads.emplace_back([L] { L->producer(); });
  return L;
}

// Returns 1 and fills outputs on success; 0 at end of (non-resampled)
// stream; -1 when the loader failed (no readable samples).  The data
// pointer stays valid until vf_loader_release.
int vf_loader_next(void* handle, uint8_t** data, int* views, int* height,
                   int* width, char* key, int key_capacity,
                   void** sample_token) {
  auto* L = static_cast<Loader*>(handle);
  auto s = L->next();
  if (!s) {
    std::unique_lock<std::mutex> lk(L->mu);
    return L->failed ? -1 : 0;
  }
  *data = s->data.data();
  *views = s->views;
  *height = s->h;
  *width = s->w;
  snprintf(key, key_capacity, "%s", s->key.c_str());
  *sample_token = s.release();
  return 1;
}

void vf_loader_release(void* sample_token) {
  delete static_cast<Sample*>(sample_token);
}

long vf_loader_decode_errors(void* handle) {
  return static_cast<Loader*>(handle)->decode_errors.load();
}

void vf_loader_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    // hold mu so no waiter can check the predicate and park between the
    // stop store and the notify (lost-wakeup -> join() deadlock)
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop = true;
    L->cv_push.notify_all();
    L->cv_pop.notify_all();
  }
  for (auto& t : L->threads) t.join();
  delete L;
}

}  // extern "C"
