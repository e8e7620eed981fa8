// Native runtime support library for anyfeature_vslam_tpu.
//
// The reference is a C++ system end to end; in the TPU build the compute
// path is JAX/XLA, and this library provides the native RUNTIME pieces
// around it (the reference counterparts are noted per function):
//   - PNG/PGM grayscale decoding  (reference src/Image.cpp / cv::imread)
//   - a prefetching frame loader   (reference main loop pacing,
//     src/vslamlab_anyfeature_mono.cpp:144-170, made asynchronous)
//   - map-graph host kernels: covisibility weights and per-point
//     observation counts over the SoA match arrays (reference
//     KeyFrame::UpdateConnections, src/KeyFrame.cc:369; these are the
//     hot host-side bookkeeping loops of the Python orchestrator)
//
// C ABI only; loaded from Python via ctypes (no pybind11 in the image).
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC, libpng+z)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------- imaging

// Decode an 8/16-bit PNG to float32 grayscale in [0, 255].
// Returns 0 on success; fills h/w. `out` must hold max_h*max_w floats.
int decode_png_gray(const char* path, float* out, int max_h, int max_w,
                    int* out_h, int* out_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  unsigned char header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return -2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if ((int)h > max_h || (int)w > max_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  std::vector<unsigned char> row(png_get_rowbytes(png, info));
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * w;
    if (channels == 1) {
      for (png_uint_32 x = 0; x < w; ++x) dst[x] = (float)row[x];
    } else {
      // RGB -> gray with the cv::cvtColor weights (0.299, 0.587, 0.114)
      for (png_uint_32 x = 0; x < w; ++x) {
        const unsigned char* p = &row[(size_t)x * channels];
        dst[x] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      }
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  *out_h = (int)h;
  *out_w = (int)w;
  return 0;
}

// ---------------------------------------------------------- map kernels

// weights[k] = |points(target) ∩ points(k)| for every valid keyframe k.
// kf_matches: (K, N) int32 point ids (-1 = none). scratch: max_pt bytes.
void covisibility_weights(const int32_t* kf_matches, const uint8_t* kf_valid,
                          int64_t K, int64_t N, int64_t target, int64_t max_pt,
                          uint8_t* scratch, int64_t* out_w) {
  memset(scratch, 0, (size_t)max_pt);
  const int32_t* mine = kf_matches + target * N;
  for (int64_t i = 0; i < N; ++i) {
    int32_t p = mine[i];
    if (p >= 0 && p < max_pt) scratch[p] = 1;
  }
  for (int64_t k = 0; k < K; ++k) {
    out_w[k] = 0;
    if (!kf_valid[k] || k == target) continue;
    const int32_t* row = kf_matches + k * N;
    int64_t c = 0;
    for (int64_t i = 0; i < N; ++i) {
      int32_t p = row[i];
      if (p >= 0 && p < max_pt && scratch[p]) ++c;
    }
    out_w[k] = c;
  }
}

// counts[p] = number of valid keyframes observing point p.
void point_obs_counts(const int32_t* kf_matches, const uint8_t* kf_valid,
                      int64_t K, int64_t N, int64_t max_pt, int64_t* out_counts) {
  memset(out_counts, 0, (size_t)max_pt * sizeof(int64_t));
  for (int64_t k = 0; k < K; ++k) {
    if (!kf_valid[k]) continue;
    const int32_t* row = kf_matches + k * N;
    for (int64_t i = 0; i < N; ++i) {
      int32_t p = row[i];
      if (p >= 0 && p < max_pt) ++out_counts[p];
    }
  }
}

// Full covisibility matrix: out_w[(a, b)] = shared points, for all valid
// pairs. out_w is (K, K) int32, zeroed here. One pass over observations
// via per-point keyframe lists (avoids the K^2 * N scan).
void covisibility_matrix(const int32_t* kf_matches, const uint8_t* kf_valid,
                         int64_t K, int64_t N, int64_t max_pt, int32_t* out_w) {
  memset(out_w, 0, (size_t)K * K * sizeof(int32_t));
  // per-point observer lists (compact: first build counts, then fill)
  std::vector<int32_t> head(max_pt, -1);
  std::vector<int32_t> next;
  std::vector<int32_t> owner;
  next.reserve((size_t)K * 16);
  owner.reserve((size_t)K * 16);
  for (int64_t k = 0; k < K; ++k) {
    if (!kf_valid[k]) continue;
    const int32_t* row = kf_matches + k * N;
    for (int64_t i = 0; i < N; ++i) {
      int32_t p = row[i];
      if (p < 0 || p >= max_pt) continue;
      owner.push_back((int32_t)k);
      next.push_back(head[p]);
      head[p] = (int32_t)owner.size() - 1;
    }
  }
  for (int64_t p = 0; p < max_pt; ++p) {
    for (int32_t a = head[p]; a >= 0; a = next[a]) {
      for (int32_t b = next[a]; b >= 0; b = next[b]) {
        int32_t ka = owner[a], kb = owner[b];
        out_w[(int64_t)ka * K + kb] += 1;
        out_w[(int64_t)kb * K + ka] += 1;
      }
    }
  }
}

// ------------------------------------------------------ prefetching loader

struct Loader {
  std::vector<std::string> paths;
  int h = 0, w = 0, ahead = 4;
  std::map<int, std::vector<float>> ready;
  std::mutex mu;
  std::condition_variable cv;
  std::thread worker;
  int want = 0;  // lowest index still needed
  bool stop = false;

  void run() {
    int idx = 0;
    while (true) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] {
          return stop || (idx < (int)paths.size() &&
                          (int)ready.size() < ahead + 1);
        });
        if (stop) return;
        if (idx < want) idx = want;  // skip frames the consumer passed
        if (idx >= (int)paths.size()) return;
      }
      std::vector<float> buf((size_t)h * w, 0.0f);
      int oh = 0, ow = 0;
      decode_png_gray(paths[idx].c_str(), buf.data(), h, w, &oh, &ow);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready.emplace(idx, std::move(buf));
      }
      cv.notify_all();
      ++idx;
    }
  }
};

void* loader_create(const char** paths, int64_t n, int h, int w, int ahead) {
  Loader* l = new Loader();
  for (int64_t i = 0; i < n; ++i) l->paths.emplace_back(paths[i]);
  l->h = h;
  l->w = w;
  l->ahead = ahead;
  l->worker = std::thread([l] { l->run(); });
  return l;
}

// Blocking fetch of frame idx into out (h*w floats). Returns 0 on success.
int loader_get(void* handle, int idx, float* out) {
  Loader* l = (Loader*)handle;
  std::unique_lock<std::mutex> lk(l->mu);
  l->want = idx;
  // drop stale frames below idx now so a full buffer can't deadlock the
  // worker when the consumer skips ahead
  l->ready.erase(l->ready.begin(), l->ready.lower_bound(idx));
  l->cv.notify_all();
  l->cv.wait(lk, [&] { return l->stop || l->ready.count(idx) > 0; });
  if (l->stop) return -1;
  auto it = l->ready.find(idx);
  memcpy(out, it->second.data(), it->second.size() * sizeof(float));
  // drop frames at or below idx (consumed in order)
  l->ready.erase(l->ready.begin(), l->ready.upper_bound(idx));
  l->cv.notify_all();
  return 0;
}

void loader_destroy(void* handle) {
  Loader* l = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->stop = true;
  }
  l->cv.notify_all();
  if (l->worker.joinable()) l->worker.join();
  delete l;
}

}  // extern "C"
