// kdpc_io: native data-loading core.
//
// TPU-native counterpart of the runtime the reference gets from torch's C++
// DataLoader internals: .npy parsing and multi-threaded batch reads that
// release the Python GIL (ctypes releases it around foreign calls), so host
// IO overlaps both the Python augmentation workers and the device step.
//
// Exposed C ABI (see kd_pointcloud_tpu/data/native_io.py):
//   kdpc_npy_info(path, shape_out[8], &ndim)          -> 0 ok / <0 error
//   kdpc_npy_read_f32(path, out, capacity)            -> elements read / <0
//   kdpc_read_batch_f32(paths, n, outs, caps, counts, n_threads) -> 0 / <0
//
// Only little-endian float32/float64 C-order arrays are supported — that is
// what the preprocessed FT3D/KITTI pc{1,2}.npy files contain.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyHeader {
  int ndim = 0;
  long shape[8] = {0};
  int word_size = 0;      // 4 or 8
  bool fortran = false;
  long data_offset = 0;
};

// Parse the .npy v1/v2 header. Returns 0 on success.
int parse_header(FILE* f, NpyHeader* h) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return -1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return -2;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return -1;
    header_len = b[0] | (b[1] << 8);
    h->data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return -1;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24);
    h->data_offset = 12 + header_len;
  }
  std::string hdr(header_len, '\0');
  if (fread(&hdr[0], 1, header_len, f) != header_len) return -1;

  // dtype
  size_t dt = hdr.find("'descr'");
  if (dt == std::string::npos) return -3;
  size_t q1 = hdr.find('\'', dt + 7);
  size_t q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4" || descr == "|f4") h->word_size = 4;
  else if (descr == "<f8") h->word_size = 8;
  else return -4;  // unsupported dtype

  h->fortran = hdr.find("'fortran_order': True") != std::string::npos;
  if (h->fortran) return -5;

  size_t sp = hdr.find("'shape'");
  if (sp == std::string::npos) return -3;
  size_t p1 = hdr.find('(', sp);
  size_t p2 = hdr.find(')', p1);
  std::string dims = hdr.substr(p1 + 1, p2 - p1 - 1);
  h->ndim = 0;
  const char* s = dims.c_str();
  while (*s && h->ndim < 8) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    h->shape[h->ndim++] = strtol(s, const_cast<char**>(&s), 10);
  }
  return 0;
}

long read_f32(const char* path, float* out, long capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyHeader h;
  int rc = parse_header(f, &h);
  if (rc != 0) { fclose(f); return rc - 10; }
  long total = 1;
  for (int i = 0; i < h.ndim; ++i) total *= h.shape[i];
  if (total > capacity) { fclose(f); return -20; }
  fseek(f, h.data_offset, SEEK_SET);
  if (h.word_size == 4) {
    if ((long)fread(out, 4, total, f) != total) { fclose(f); return -21; }
  } else {
    std::vector<double> tmp(total);
    if ((long)fread(tmp.data(), 8, total, f) != total) {
      fclose(f); return -21;
    }
    for (long i = 0; i < total; ++i) out[i] = (float)tmp[i];
  }
  fclose(f);
  return total;
}

}  // namespace

extern "C" {

int kdpc_npy_info(const char* path, long* shape_out, int* ndim_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyHeader h;
  int rc = parse_header(f, &h);
  fclose(f);
  if (rc != 0) return rc;
  *ndim_out = h.ndim;
  for (int i = 0; i < h.ndim; ++i) shape_out[i] = h.shape[i];
  return 0;
}

long kdpc_npy_read_f32(const char* path, float* out, long capacity) {
  return read_f32(path, out, capacity);
}

// Read n files concurrently. outs[i] must have capacity caps[i] floats;
// counts[i] receives elements read (or <0 error code per file).
int kdpc_read_batch_f32(const char** paths, int n, float** outs,
                        const long* caps, long* counts, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> errors(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      counts[i] = read_f32(paths[i], outs[i], caps[i]);
      if (counts[i] < 0) errors.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return errors.load() ? -1 : 0;
}

}  // extern "C"
