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

#include <algorithm>
#include <cmath>
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

// Recompute per-point statistics for P selected points in one pass:
// distinctive descriptor (min median distance among observers, reference
// MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:279-349), mean
// viewing normal and reference scale band (UpdateNormalAndDepth,
// src/MapPoint.cc:372-430). Replaces the per-point Python loop that was
// the orchestrator's hottest host code at map scale.
//
// kf_desc: (K, N, D) uint8 bit-bytes when is_binary, else float32.
// Outputs are written into the full-size pt_* arrays at the pt_ids rows.
void update_point_stats(
    const int32_t* kf_matches, const uint8_t* kf_valid, const void* kf_desc,
    int is_binary, const float* kf_size, const float* kf_centers,
    int64_t K, int64_t N, int64_t D, int64_t max_pt,
    const int64_t* pt_ids, int64_t P, const float* pt_pos,
    const int32_t* pt_ref_kf, void* pt_desc, float* pt_normal,
    float* pt_ref_size, float* pt_ref_dist, float* pt_min_dist,
    float* pt_max_dist) {
  std::vector<int32_t> mark(max_pt, -1);
  for (int64_t i = 0; i < P; ++i) {
    int64_t p = pt_ids[i];
    if (p >= 0 && p < max_pt) mark[p] = (int32_t)i;
  }
  // per selected point: list of (kf, slot)
  std::vector<std::vector<std::pair<int32_t, int32_t>>> obs(P);
  for (int64_t k = 0; k < K; ++k) {
    if (!kf_valid[k]) continue;
    const int32_t* row = kf_matches + k * N;
    for (int64_t i = 0; i < N; ++i) {
      int32_t p = row[i];
      if (p >= 0 && p < max_pt && mark[p] >= 0)
        obs[mark[p]].emplace_back((int32_t)k, (int32_t)i);
    }
  }
  const uint8_t* descb = (const uint8_t*)kf_desc;
  const float* descf = (const float*)kf_desc;
  std::vector<float> dist_row;
  std::vector<float> med;
  for (int64_t i = 0; i < P; ++i) {
    const auto& o = obs[i];
    int64_t O = (int64_t)o.size();
    if (O == 0) continue;
    int64_t p = pt_ids[i];
    int best = 0;
    if (O > 1) {
      // pairwise distances; pick observation with minimal median row
      med.assign(O, 0.f);
      std::vector<float> dmat((size_t)O * O, 0.f);
      for (int64_t a = 0; a < O; ++a) {
        for (int64_t b = a + 1; b < O; ++b) {
          float d = 0.f;
          if (is_binary) {
            const uint8_t* da =
                descb + ((size_t)o[a].first * N + o[a].second) * D;
            const uint8_t* db =
                descb + ((size_t)o[b].first * N + o[b].second) * D;
            int64_t c = 0;
            for (int64_t j = 0; j < D; ++j) c += (da[j] != db[j]);
            d = (float)c;
          } else {
            const float* da =
                descf + ((size_t)o[a].first * N + o[a].second) * D;
            const float* db =
                descf + ((size_t)o[b].first * N + o[b].second) * D;
            for (int64_t j = 0; j < D; ++j) {
              float t = da[j] - db[j];
              d += t * t;
            }
          }
          dmat[a * O + b] = d;
          dmat[b * O + a] = d;
        }
      }
      float best_med = 1e30f;
      for (int64_t a = 0; a < O; ++a) {
        dist_row.assign(dmat.begin() + a * O, dmat.begin() + (a + 1) * O);
        // reference takes vDists[0.5*(N-1)] of the sorted row
        int64_t mid = (O - 1) / 2;
        std::nth_element(dist_row.begin(), dist_row.begin() + mid,
                         dist_row.end());
        float m = dist_row[mid];
        if (m < best_med) {
          best_med = m;
          best = (int)a;
        }
      }
    }
    size_t src = ((size_t)o[best].first * N + o[best].second) * D;
    if (is_binary)
      memcpy((uint8_t*)pt_desc + (size_t)p * D, descb + src, (size_t)D);
    else
      memcpy((float*)pt_desc + (size_t)p * D, descf + src,
             (size_t)D * sizeof(float));
    // mean viewing normal
    const float* pos = pt_pos + (size_t)p * 3;
    float nx = 0.f, ny = 0.f, nz = 0.f;
    for (int64_t a = 0; a < O; ++a) {
      const float* c = kf_centers + (size_t)o[a].first * 3;
      float vx = pos[0] - c[0], vy = pos[1] - c[1], vz = pos[2] - c[2];
      float nrm = std::sqrt(vx * vx + vy * vy + vz * vz);
      if (nrm < 1e-9f) nrm = 1e-9f;
      nx += vx / nrm;
      ny += vy / nrm;
      nz += vz / nrm;
    }
    float inv = 1.0f / (float)O;
    pt_normal[(size_t)p * 3 + 0] = nx * inv;
    pt_normal[(size_t)p * 3 + 1] = ny * inv;
    pt_normal[(size_t)p * 3 + 2] = nz * inv;
    // reference observation: the ref_kf's if it still observes, else first
    int32_t rk = o[0].first, rs = o[0].second;
    int32_t want = pt_ref_kf[p];
    for (int64_t a = 0; a < O; ++a)
      if (o[a].first == want) {
        rk = o[a].first;
        rs = o[a].second;
        break;
      }
    const float* c = kf_centers + (size_t)rk * 3;
    float dx = pos[0] - c[0], dy = pos[1] - c[1], dz = pos[2] - c[2];
    float dist = std::sqrt(dx * dx + dy * dy + dz * dz);
    float size = kf_size[(size_t)rk * N + rs];
    pt_ref_size[p] = size;
    pt_ref_dist[p] = dist;
    // scale-invariance band (MapPoint.cc:402-431), maxKeyPtSize = 1.2^7
    const float max_size = 3.58318f;
    pt_max_dist[p] = 1.2f * dist * size;
    pt_min_dist[p] = 0.8f * dist * size / max_size;
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
