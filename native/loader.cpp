// Native data loader for opticalflow_tpu.
//
// A minimal, dependency-free, multithreaded movie loader for the formats
// microscopy stacks actually ship in: uncompressed grayscale TIFF
// (single- and multi-page, 8/16/32-bit, II/MM byte order, strip-based)
// and PGM (P5).  The reference pipeline loads frames serially through
// cv2/tifffile/skimage (C++ behind Python glue, one frame at a time);
// here decoding of a whole stack fans out over a thread pool and lands
// directly in one caller-provided contiguous buffer, ready for a single
// host->device transfer.
//
// C API (ctypes-friendly), all functions return 0 on success:
//   ofl_tiff_query(path, &frames, &height, &width, &bits)
//   ofl_tiff_read(path, out_f32, frames, height, width)   [multithreaded]
//   ofl_sequence_read(paths, n_paths, out_f32, height, width)
//   ofl_version()

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <atomic>
#include <memory>

namespace {

struct Buffer {
  std::vector<uint8_t> data;
  bool ok = false;
};

Buffer read_file(const char* path) {
  Buffer buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return buf;
  }
  buf.data.resize(static_cast<size_t>(size));
  buf.ok = std::fread(buf.data.data(), 1, buf.data.size(), f) == buf.data.size();
  std::fclose(f);
  return buf;
}

class TiffParser {
 public:
  explicit TiffParser(const uint8_t* p, size_t n) : p_(p), n_(n) {}

  bool init() {
    if (n_ < 8) return false;
    if (p_[0] == 'I' && p_[1] == 'I') {
      big_endian_ = false;
    } else if (p_[0] == 'M' && p_[1] == 'M') {
      big_endian_ = true;
    } else {
      return false;
    }
    if (u16(2) != 42) return false;
    first_ifd_ = u32(4);
    return first_ifd_ != 0 && first_ifd_ < n_;
  }

  uint16_t u16(size_t off) const {
    if (off + 2 > n_) return 0;
    return big_endian_ ? (p_[off] << 8) | p_[off + 1]
                       : (p_[off + 1] << 8) | p_[off];
  }

  uint32_t u32(size_t off) const {
    if (off + 4 > n_) return 0;
    if (big_endian_)
      return (uint32_t(p_[off]) << 24) | (uint32_t(p_[off + 1]) << 16) |
             (uint32_t(p_[off + 2]) << 8) | uint32_t(p_[off + 3]);
    return (uint32_t(p_[off + 3]) << 24) | (uint32_t(p_[off + 2]) << 16) |
           (uint32_t(p_[off + 1]) << 8) | uint32_t(p_[off]);
  }

  struct Page {
    uint32_t width = 0, height = 0;
    uint16_t bits = 8, compression = 1, sample_format = 1, samples = 1;
    std::vector<uint32_t> strip_offsets;
    std::vector<uint32_t> strip_counts;
    uint32_t rows_per_strip = 0xFFFFFFFF;
  };

  // Walk the IFD chain, collecting page descriptors.
  bool parse_pages(std::vector<Page>* pages) {
    size_t ifd = first_ifd_;
    int guard = 0;
    while (ifd != 0 && ifd + 2 <= n_ && guard++ < 100000) {
      uint16_t n_entries = u16(ifd);
      Page page;
      for (uint16_t e = 0; e < n_entries; ++e) {
        size_t entry = ifd + 2 + size_t(e) * 12;
        if (entry + 12 > n_) return false;
        uint16_t tag = u16(entry);
        uint16_t type = u16(entry + 2);
        uint32_t count = u32(entry + 4);
        switch (tag) {
          case 256: page.width = read_scalar(entry, type); break;
          case 257: page.height = read_scalar(entry, type); break;
          case 258: page.bits = static_cast<uint16_t>(read_scalar(entry, type)); break;
          case 259: page.compression = static_cast<uint16_t>(read_scalar(entry, type)); break;
          case 277: page.samples = static_cast<uint16_t>(read_scalar(entry, type)); break;
          case 273: read_array(entry, type, count, &page.strip_offsets); break;
          case 278: page.rows_per_strip = read_scalar(entry, type); break;
          case 279: read_array(entry, type, count, &page.strip_counts); break;
          case 339: page.sample_format = static_cast<uint16_t>(read_scalar(entry, type)); break;
          default: break;
        }
      }
      pages->push_back(std::move(page));
      ifd = u32(ifd + 2 + size_t(n_entries) * 12);
    }
    return !pages->empty();
  }

  // Decode one page into a float32 row-major (height, width) plane.
  bool decode(const Page& page, float* out) const {
    if (page.compression != 1 || page.samples != 1) return false;
    if (page.bits != 8 && page.bits != 16 && page.bits != 32) return false;
    const size_t bytes_per_px = page.bits / 8;
    const size_t row_bytes = size_t(page.width) * bytes_per_px;
    uint32_t rows_left = page.height;
    size_t out_idx = 0;
    for (size_t s = 0; s < page.strip_offsets.size(); ++s) {
      uint32_t rows =
          std::min(rows_left, page.rows_per_strip == 0 ? page.height
                                                       : page.rows_per_strip);
      size_t off = page.strip_offsets[s];
      size_t need = size_t(rows) * row_bytes;
      if (s < page.strip_counts.size() && page.strip_counts[s] < need) {
        need = page.strip_counts[s];
        rows = static_cast<uint32_t>(need / row_bytes);
      }
      if (off + need > n_) return false;
      const uint8_t* src = p_ + off;
      size_t count = size_t(rows) * page.width;
      const bool be = big_endian_;
      if (page.bits == 8) {
        for (size_t i = 0; i < count; ++i) out[out_idx + i] = float(src[i]);
      } else if (page.bits == 16) {
        if (!be) {
          // little-endian fast path: unaligned u16 loads vectorize
          for (size_t i = 0; i < count; ++i) {
            uint16_t v;
            std::memcpy(&v, src + 2 * i, 2);
            out[out_idx + i] = float(v);
          }
        } else {
          for (size_t i = 0; i < count; ++i) {
            uint16_t v = uint16_t((src[2 * i] << 8) | src[2 * i + 1]);
            out[out_idx + i] = float(v);
          }
        }
      } else {
        for (size_t i = 0; i < count; ++i) {
          uint32_t v;
          if (big_endian_) {
            v = (uint32_t(src[4 * i]) << 24) | (uint32_t(src[4 * i + 1]) << 16) |
                (uint32_t(src[4 * i + 2]) << 8) | uint32_t(src[4 * i + 3]);
          } else {
            v = (uint32_t(src[4 * i + 3]) << 24) | (uint32_t(src[4 * i + 2]) << 16) |
                (uint32_t(src[4 * i + 1]) << 8) | uint32_t(src[4 * i]);
          }
          if (page.sample_format == 3) {  // IEEE float samples
            float fv;
            std::memcpy(&fv, &v, 4);
            out[out_idx + i] = fv;
          } else {
            out[out_idx + i] = float(v);
          }
        }
      }
      out_idx += count;
      rows_left -= rows;
    }
    return rows_left == 0;
  }

 private:
  uint32_t read_scalar(size_t entry, uint16_t type) const {
    // value fits inline for SHORT/LONG with count 1
    if (type == 3) return u16(entry + 8);
    return u32(entry + 8);
  }

  void read_array(size_t entry, uint16_t type, uint32_t count,
                  std::vector<uint32_t>* out) const {
    out->clear();
    size_t elem = (type == 3) ? 2 : 4;
    size_t total = elem * size_t(count);
    size_t base = (total <= 4) ? entry + 8 : u32(entry + 8);
    for (uint32_t i = 0; i < count; ++i) {
      out->push_back(type == 3 ? u16(base + i * 2) : u32(base + i * 4));
    }
  }

  const uint8_t* p_;
  size_t n_;
  bool big_endian_ = false;
  size_t first_ifd_ = 0;
};

bool decode_pgm(const uint8_t* p, size_t n, uint32_t* height, uint32_t* width,
                uint16_t* bits, float* out) {
  // P5 binary grayscale
  if (n < 2 || p[0] != 'P' || p[1] != '5') return false;
  size_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < n) {
      if (p[pos] == '#') {
        while (pos < n && p[pos] != '\n') ++pos;
      } else if (p[pos] == ' ' || p[pos] == '\t' || p[pos] == '\n' || p[pos] == '\r') {
        ++pos;
      } else {
        break;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    bool any = false;
    while (pos < n && p[pos] >= '0' && p[pos] <= '9') {
      v = v * 10 + (p[pos] - '0');
      ++pos;
      any = true;
    }
    return any ? v : -1;
  };
  long w = read_int(), h = read_int(), maxval = read_int();
  if (w <= 0 || h <= 0 || maxval <= 0) return false;
  ++pos;  // single whitespace after maxval
  *width = static_cast<uint32_t>(w);
  *height = static_cast<uint32_t>(h);
  *bits = maxval > 255 ? 16 : 8;
  if (!out) return true;
  size_t count = size_t(w) * size_t(h);
  if (maxval > 255) {
    if (pos + count * 2 > n) return false;
    for (size_t i = 0; i < count; ++i)
      out[i] = float((p[pos + 2 * i] << 8) | p[pos + 2 * i + 1]);  // PGM is big-endian
  } else {
    if (pos + count > n) return false;
    for (size_t i = 0; i < count; ++i) out[i] = float(p[pos + i]);
  }
  return true;
}

int thread_count(size_t jobs) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  return static_cast<int>(std::min<size_t>(hw, jobs));
}

}  // namespace

extern "C" {

int ofl_version() { return 1; }

// Query a TIFF stack: number of pages and the first page's geometry.
int ofl_tiff_query(const char* path, int64_t* frames, int64_t* height,
                   int64_t* width, int64_t* bits) {
  Buffer buf = read_file(path);
  if (!buf.ok) return 1;
  TiffParser parser(buf.data.data(), buf.data.size());
  if (!parser.init()) return 2;
  std::vector<TiffParser::Page> pages;
  if (!parser.parse_pages(&pages)) return 3;
  *frames = static_cast<int64_t>(pages.size());
  *height = pages[0].height;
  *width = pages[0].width;
  *bits = pages[0].bits;
  return 0;
}

// Read a TIFF stack into out (frames, height, width) float32, pages
// decoded in parallel.
int ofl_tiff_read(const char* path, float* out, int64_t frames, int64_t height,
                  int64_t width) {
  Buffer buf = read_file(path);
  if (!buf.ok) return 1;
  auto parser = std::make_shared<TiffParser>(buf.data.data(), buf.data.size());
  if (!parser->init()) return 2;
  std::vector<TiffParser::Page> pages;
  if (!parser->parse_pages(&pages)) return 3;
  if (static_cast<int64_t>(pages.size()) < frames) return 4;
  for (int64_t k = 0; k < frames; ++k) {
    if (pages[k].height != height || pages[k].width != width) return 5;
  }

  std::atomic<int64_t> next(0);
  std::atomic<int> failed(0);
  size_t plane = size_t(height) * size_t(width);
  auto worker = [&]() {
    while (true) {
      int64_t k = next.fetch_add(1);
      if (k >= frames || failed.load()) break;
      if (!parser->decode(pages[k], out + size_t(k) * plane)) failed.store(1);
    }
  };
  int n_threads = thread_count(static_cast<size_t>(frames));
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load() ? 6 : 0;
}

// Query a single image file (TIFF first page or PGM).
int ofl_image_query(const char* path, int64_t* height, int64_t* width,
                    int64_t* bits) {
  Buffer buf = read_file(path);
  if (!buf.ok) return 1;
  TiffParser parser(buf.data.data(), buf.data.size());
  if (parser.init()) {
    std::vector<TiffParser::Page> pages;
    if (!parser.parse_pages(&pages)) return 3;
    *height = pages[0].height;
    *width = pages[0].width;
    *bits = pages[0].bits;
    return 0;
  }
  uint32_t h, w;
  uint16_t b;
  if (decode_pgm(buf.data.data(), buf.data.size(), &h, &w, &b, nullptr)) {
    *height = h;
    *width = w;
    *bits = b;
    return 0;
  }
  return 2;
}

// Read a sequence of same-shaped single-frame files (TIFF page 0 or PGM)
// into out (n_paths, height, width) float32; files decoded in parallel.
int ofl_sequence_read(const char** paths, int64_t n_paths, float* out,
                      int64_t height, int64_t width) {
  std::atomic<int64_t> next(0);
  std::atomic<int> failed(0);
  size_t plane = size_t(height) * size_t(width);
  auto worker = [&]() {
    while (true) {
      int64_t k = next.fetch_add(1);
      if (k >= n_paths || failed.load()) break;
      Buffer buf = read_file(paths[k]);
      if (!buf.ok) {
        failed.store(1);
        break;
      }
      float* dst = out + size_t(k) * plane;
      TiffParser parser(buf.data.data(), buf.data.size());
      if (parser.init()) {
        std::vector<TiffParser::Page> pages;
        if (!parser.parse_pages(&pages) || pages[0].height != height ||
            pages[0].width != width || !parser.decode(pages[0], dst)) {
          failed.store(1);
        }
        continue;
      }
      uint32_t h, w;
      uint16_t b;
      if (!decode_pgm(buf.data.data(), buf.data.size(), &h, &w, &b, dst) ||
          h != height || w != width) {
        failed.store(1);
      }
    }
  };
  int n_threads = thread_count(static_cast<size_t>(n_paths));
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load() ? 1 : 0;
}

}  // extern "C"
