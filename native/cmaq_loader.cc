// Native CMAQ data-plane: threaded .npy block loader + sample assembler.
//
// The reference's input pipeline issues ~100 small .npy reads per sample from
// Python worker processes (dataset.py:1138-1409, evaluation_vit.py:138).
// This C++ core does the same work GIL-free on a thread pool, with the
// per-species standardization and the channel stacking fused into the read
// pass, exposing a plain C ABI consumed via ctypes
// (vit_grid_model_tpu/data/native.py).
//
// Fault semantics preserved exactly: missing/unreadable/malformed files
// produce zero grids (dataset.py:784-789).
//
// Build: ./native/build.sh  (g++ -O3 -shared -fPIC -pthread)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// minimal .npy reader (v1.0/v2.0, little-endian f4/f8, C order)
// ---------------------------------------------------------------------------

bool parse_shape(const std::string& header, std::vector<int64_t>* shape) {
  auto pos = header.find("'shape':");
  if (pos == std::string::npos) return false;
  pos = header.find('(', pos);
  auto end = header.find(')', pos);
  if (pos == std::string::npos || end == std::string::npos) return false;
  std::string body = header.substr(pos + 1, end - pos - 1);
  shape->clear();
  char* p = const_cast<char*>(body.c_str());
  while (*p) {
    while (*p && (*p == ' ' || *p == ',')) ++p;
    if (!*p) break;
    shape->push_back(strtoll(p, &p, 10));
  }
  return true;
}

// Reads an .npy file of float32/float64 into `out` (n_expected floats).
// Returns true on success; on any failure the caller zero-fills.
bool load_npy_f32(const char* path, float* out, int64_t n_expected,
                  const std::vector<int64_t>& expected_shape) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  bool ok = false;
  std::vector<char> hdr_buf;
  do {
    unsigned char magic[8];
    if (fread(magic, 1, 8, f) != 8) break;
    if (memcmp(magic, "\x93NUMPY", 6) != 0) break;
    int major = magic[6];
    uint32_t hlen = 0;
    if (major == 1) {
      unsigned char b[2];
      if (fread(b, 1, 2, f) != 2) break;
      hlen = b[0] | (b[1] << 8);
    } else {
      unsigned char b[4];
      if (fread(b, 1, 4, f) != 4) break;
      hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    }
    hdr_buf.resize(hlen + 1, 0);
    if (fread(hdr_buf.data(), 1, hlen, f) != hlen) break;
    std::string header(hdr_buf.data(), hlen);
    if (header.find("'fortran_order': True") != std::string::npos) break;
    bool f4 = header.find("'<f4'") != std::string::npos;
    bool f8 = header.find("'<f8'") != std::string::npos;
    if (!f4 && !f8) break;
    std::vector<int64_t> shape;
    if (!parse_shape(header, &shape)) break;
    // the reference treats wrong-rank files as malformed -> zeros
    if (shape.size() != expected_shape.size()) break;
    int64_t n = 1;
    for (auto s : shape) n *= s;
    if (n != n_expected) break;
    if (f4) {
      if ((int64_t)fread(out, 4, n, f) != n) break;
    } else {
      std::vector<double> tmp(n);
      if ((int64_t)fread(tmp.data(), 8, n, f) != n) break;
      for (int64_t i = 0; i < n; ++i) out[i] = (float)tmp[i];
    }
    ok = true;
  } while (false);
  fclose(f);
  return ok;
}

void run_parallel(int64_t n_tasks, int n_threads,
                  const std::function<void(int64_t)>& fn) {
  if (n_threads <= 1 || n_tasks <= 1) {
    for (int64_t i = 0; i < n_tasks; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  int n = std::min<int64_t>(n_threads, n_tasks);
  for (int t = 0; t < n; ++t) {
    pool.emplace_back([&]() {
      while (true) {
        int64_t i = next.fetch_add(1);
        if (i >= n_tasks) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Load `n_files` .npy cycle files of (n_species, H, W) each into
// out[(n_species)*H*W * i]; zero-fill failures.  Returns count loaded OK.
int64_t vg_load_cycle_files(const char** paths, int64_t n_files,
                            int64_t n_species, int64_t h, int64_t w,
                            float* out, int n_threads) {
  const int64_t per = n_species * h * w;
  std::vector<int64_t> shape = {n_species, h, w};
  std::atomic<int64_t> ok_count(0);
  run_parallel(n_files, n_threads, [&](int64_t i) {
    float* dst = out + i * per;
    if (load_npy_f32(paths[i], dst, per, shape)) {
      ok_count.fetch_add(1);
    } else {
      memset(dst, 0, per * sizeof(float));
    }
  });
  return ok_count.load();
}

// Assemble one sample's stacked simulation tensor, fusing the read,
// per-species standardization and channel interleave:
//   out (H, W, n_steps * (4*S + 4)); paths laid out [step][cycle];
//   leads (n_steps, 4); species `pm_index` left raw; others standardized
//   with (means[s], stds[s]).  pm25_out, when non-null, receives the
//   4-cycle PM2.5 planes (n_steps, 4, H, W) for history means.
int64_t vg_assemble_sample(const char** paths, int64_t n_steps,
                           int64_t n_species, int64_t h, int64_t w,
                           const float* means, const float* stds,
                           int64_t pm_index, const float* leads,
                           float* out, float* pm25_out, int n_threads) {
  const int64_t hw = h * w;
  const int64_t bc = 4 * n_species + 4;           // channels per step
  std::vector<int64_t> shape = {n_species, h, w};
  std::atomic<int64_t> ok_count(0);

  run_parallel(n_steps * 4, n_threads, [&](int64_t task) {
    const int64_t step = task / 4;
    const int64_t cyc = task % 4;
    std::vector<float> buf(n_species * hw);
    bool ok = load_npy_f32(paths[task], buf.data(), n_species * hw, shape);
    if (!ok) memset(buf.data(), 0, buf.size() * sizeof(float));
    else ok_count.fetch_add(1);
    // standardize all but the PM2.5 plane (dataset.py:861-866)
    for (int64_t s = 0; s < n_species; ++s) {
      if (s == pm_index) continue;
      const float mu = means[s], sd = stds[s];
      float* p = buf.data() + s * hw;
      for (int64_t i = 0; i < hw; ++i) p[i] = (p[i] - mu) / sd;
    }
    if (pm25_out) {
      memcpy(pm25_out + (step * 4 + cyc) * hw,
             buf.data() + pm_index * hw, hw * sizeof(float));
    }
    // interleave into channels-last (H, W, C) layout
    const int64_t c0 = step * bc + cyc * n_species;
    for (int64_t i = 0; i < hw; ++i) {
      float* dst = out + i * (n_steps * bc) + c0;
      for (int64_t s = 0; s < n_species; ++s) dst[s] = buf[s * hw + i];
    }
    // lead channels: 4 constant planes per step (dataset.py:848-851)
    if (cyc == 0) {
      const int64_t l0 = step * bc + 4 * n_species;
      for (int64_t i = 0; i < hw; ++i) {
        float* dst = out + i * (n_steps * bc) + l0;
        for (int64_t c = 0; c < 4; ++c) dst[c] = leads[step * 4 + c];
      }
    }
  });
  return ok_count.load();
}

int vg_abi_version() { return 1; }

}  // extern "C"
