// Native frame IO for tpuao: PFM depth-map codec + multithreaded batch
// loader (the framework's data-loader component, SURVEY.md SS6 analog of a
// production renderer feeding the AO pass).
//
// The reference consumes the camera's live depth buffer; a standalone
// framework ingests frames from disk, and decode must keep up with a
// multi-frame device pipeline, hence native + threaded.  Plain C ABI for
// ctypes (no pybind11 in this environment).
//
// PFM ("portable float map"): header "Pf\n<w> <h>\n<scale>\n" (grayscale)
// or "PF\n..." (3-channel), then w*h*c little-endian (scale < 0) or
// big-endian (scale > 0) f32 samples, rows stored BOTTOM-UP per the
// Netpbm convention.  Grayscale 'Pf' carries depth; 3-channel 'PF'
// carries normals or color for the streaming normals/composite pipeline
// (VERDICT r2 item 6).

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <atomic>
#include <thread>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrHeader = -2;
constexpr int kErrDims = -3;
constexpr int kErrData = -4;
constexpr int kErrWrite = -5;

void byteswap4(float* p, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    uint32_t v;
    std::memcpy(&v, p + i, 4);
    v = __builtin_bswap32(v);
    std::memcpy(p + i, &v, 4);
  }
}

bool host_is_little_endian() {
  const uint16_t one = 1;
  return *reinterpret_cast<const uint8_t*>(&one) == 1;
}

// Reads one whitespace-delimited token, skipping PFM '#' comments.
bool read_token(FILE* f, char* buf, size_t cap) {
  int c;
  do {
    c = std::fgetc(f);
    if (c == '#') {
      while (c != '\n' && c != EOF) c = std::fgetc(f);
    }
  } while (c == ' ' || c == '\t' || c == '\n' || c == '\r');
  if (c == EOF) return false;
  size_t i = 0;
  while (c != EOF && c != ' ' && c != '\t' && c != '\n' && c != '\r') {
    if (i + 1 >= cap) return false;
    buf[i++] = static_cast<char>(c);
    c = std::fgetc(f);
  }
  buf[i] = '\0';
  return true;
}

struct PfmHeader {
  int w = 0, h = 0, c = 0;  // c: 1 ('Pf') or 3 ('PF')
  bool little = false;
};

int parse_header(FILE* f, PfmHeader* out) {
  char tok[64];
  if (!read_token(f, tok, sizeof tok)) return kErrHeader;
  if (std::strcmp(tok, "Pf") == 0) out->c = 1;
  else if (std::strcmp(tok, "PF") == 0) out->c = 3;
  else return kErrHeader;
  if (!read_token(f, tok, sizeof tok)) return kErrHeader;
  out->w = std::atoi(tok);
  if (!read_token(f, tok, sizeof tok)) return kErrHeader;
  out->h = std::atoi(tok);
  if (!read_token(f, tok, sizeof tok)) return kErrHeader;
  const double scale = std::atof(tok);
  if (out->w <= 0 || out->h <= 0 || scale == 0.0) return kErrHeader;
  out->little = scale < 0.0;
  return kOk;
}

// Loads one PFM into row-major top-down `out` (size h*w*c).  If `out` is
// null, only writes dims.  If expect_h/expect_w/expect_c > 0, mismatching
// files fail with kErrDims.
int load_pfm_impl(const char* path, float* out, int expect_h, int expect_w,
                  int expect_c, int* h, int* w, int* c) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  PfmHeader hd;
  int rc = parse_header(f, &hd);
  if (rc != kOk) { std::fclose(f); return rc; }
  if (h) *h = hd.h;
  if (w) *w = hd.w;
  if (c) *c = hd.c;
  if (!out) { std::fclose(f); return kOk; }
  if ((expect_h > 0 && hd.h != expect_h) ||
      (expect_w > 0 && hd.w != expect_w) ||
      (expect_c > 0 && hd.c != expect_c)) {
    std::fclose(f);
    return kErrDims;
  }
  // PFM rows are bottom-up: read row r of the file into output row h-1-r.
  const size_t row = static_cast<size_t>(hd.w) * hd.c;
  for (int r = 0; r < hd.h; ++r) {
    float* dst = out + static_cast<size_t>(hd.h - 1 - r) * row;
    if (std::fread(dst, 4, row, f) != row) {
      std::fclose(f);
      return kErrData;
    }
  }
  std::fclose(f);
  if (hd.little != host_is_little_endian())
    byteswap4(out, static_cast<size_t>(hd.h) * row);
  return kOk;
}

}  // namespace

extern "C" {

// Probe (out == nullptr) or load one PFM of either format ('Pf' c=1,
// 'PF' c=3).  Returns 0 or a negative kErr* code.
int fio_load_pfm2(const char* path, float* out, int expect_h, int expect_w,
                  int expect_c, int* h, int* w, int* c) {
  return load_pfm_impl(path, out, expect_h, expect_w, expect_c, h, w, c);
}

// Grayscale-only compatibility entry point ('PF' fails with kErrDims).
int fio_load_pfm(const char* path, float* out, int expect_h, int expect_w,
                 int* h, int* w) {
  return load_pfm_impl(path, out, expect_h, expect_w, out ? 1 : 0, h, w,
                       nullptr);
}

// Write a row-major top-down (h, w, c) f32 buffer as little-endian PFM
// ('Pf' for c=1, 'PF' for c=3).
int fio_save_pfm2(const char* path, const float* data, int h, int w,
                  int c) {
  if (c != 1 && c != 3) return kErrDims;
  FILE* f = std::fopen(path, "wb");
  if (!f) return kErrOpen;
  std::fprintf(f, "%s\n%d %d\n-1.0\n", c == 1 ? "Pf" : "PF", w, h);
  const size_t rowlen = static_cast<size_t>(w) * c;
  std::vector<float> row(rowlen);
  const bool little = host_is_little_endian();
  for (int r = h - 1; r >= 0; --r) {  // file rows are bottom-up
    std::memcpy(row.data(), data + static_cast<size_t>(r) * rowlen,
                rowlen * 4);
    if (!little) byteswap4(row.data(), rowlen);
    if (std::fwrite(row.data(), 4, rowlen, f) != rowlen) {
      std::fclose(f);
      return kErrWrite;
    }
  }
  return std::fclose(f) == 0 ? kOk : kErrWrite;
}

int fio_save_pfm(const char* path, const float* data, int h, int w) {
  return fio_save_pfm2(path, data, h, w, 1);
}

// Parallel batch load of n same-size PFMs into contiguous (n, h, w, c).
// Work-stealing over an atomic index with `threads` std::threads (the
// ctypes call releases the GIL, so decode overlaps Python/device work).
// Returns 0, or 1 + index of the first failing file (error code is the
// per-file kErr*, reported via err_out if non-null).
int fio_load_pfm_batch2(const char** paths, int n, float* out, int h,
                        int w, int c, int threads, int* err_out) {
  if (n <= 0) return kOk;
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::atomic<int> next(0);
  std::atomic<int> failed(-1);
  std::atomic<int> fail_code(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() >= 0) return;
      const int rc = load_pfm_impl(
          paths[i], out + static_cast<size_t>(i) * h * w * c, h, w, c,
          nullptr, nullptr, nullptr);
      if (rc != kOk) {
        int expect = -1;
        if (failed.compare_exchange_strong(expect, i))
          fail_code.store(rc);
        return;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  const int bad = failed.load();
  if (bad >= 0) {
    if (err_out) *err_out = fail_code.load();
    return 1 + bad;
  }
  if (err_out) *err_out = kOk;
  return kOk;
}

int fio_load_pfm_batch(const char** paths, int n, float* out, int h, int w,
                       int threads, int* err_out) {
  return fio_load_pfm_batch2(paths, n, out, h, w, 1, threads, err_out);
}

}  // extern "C"
