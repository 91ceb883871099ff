// tpuir native host pipeline: patch extraction, Gaussian-window blend-stitch,
// and dtype restore for the tiled inference engine.
//
// The TPU compute path is JAX/XLA/Pallas; this is the native runtime piece
// for the host side of the engine (the role CUDA/cuDNN host glue played in
// the reference): zero-copy C loops instead of NumPy temporaries for the
// per-image tile scatter/gather. Built as a plain shared library and loaded
// via ctypes (tpuir/native/__init__.py).
//
// All images are float32 HWC row-major; coordinates are (row, col) pairs.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Gather N patches of (ph, pw, c) from img (h, w, c) at coords[2*i..].
void extract_patches(const float* img, int64_t h, int64_t w, int64_t c,
                     const int64_t* coords, int64_t n, int64_t ph, int64_t pw,
                     float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t hi = coords[2 * i], wi = coords[2 * i + 1];
    for (int64_t r = 0; r < ph; ++r) {
      const float* src = img + ((hi + r) * w + wi) * c;
      float* dst = out + ((i * ph + r) * pw) * c;
      std::memcpy(dst, src, sizeof(float) * pw * c);
    }
  }
}

// Accumulate preds (n, ph, pw, c) * window into out/wmap (h, w, c),
// in patch order (matches the reference loop's accumulation order).
void blend_accumulate(float* out, float* wmap, int64_t h, int64_t w, int64_t c,
                      const float* preds, const int64_t* coords, int64_t n,
                      int64_t ph, int64_t pw, const float* window) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t hi = coords[2 * i], wi = coords[2 * i + 1];
    for (int64_t r = 0; r < ph; ++r) {
      float* orow = out + ((hi + r) * w + wi) * c;
      float* wrow = wmap + ((hi + r) * w + wi) * c;
      const float* prow = preds + ((i * ph + r) * pw) * c;
      const float* wnrow = window + (r * pw) * c;
      for (int64_t k = 0; k < pw * c; ++k) {
        orow[k] += prow[k] * wnrow[k];
        wrow[k] += wnrow[k];
      }
    }
  }
}

// Gather N patches in space_to_depth(f) phase layout: out
// (n, ph_pad/f, pw_pad/f, f*f*c) with channel order (di, dj, c).
// The valid source region is (ph, pw) at coords[i]; rows/cols in
// [ph, ph_pad) / [pw, pw_pad) are zero — this fuses the DeblurGANv2
// always-pad-to-block AND the phase relayout into the patch gather the
// engine already performs, so phase-IO costs the host nothing extra.
void extract_patches_phase(const float* img, int64_t h, int64_t w, int64_t c,
                           const int64_t* coords, int64_t n,
                           int64_t ph, int64_t pw,
                           int64_t ph_pad, int64_t pw_pad, int64_t f,
                           float* out) {
  const int64_t hpf = ph_pad / f, wpf = pw_pad / f;
  std::memset(out, 0, sizeof(float) * n * hpf * wpf * f * f * c);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t hi = coords[2 * i], wi = coords[2 * i + 1];
    for (int64_t rb = 0; rb < hpf; ++rb) {
      for (int64_t di = 0; di < f; ++di) {
        const int64_t r = f * rb + di;
        if (r >= ph) continue;
        const float* src = img + ((hi + r) * w + wi) * c;
        float* dst = out + (((i * hpf + rb) * wpf) * f * f + di * f) * c;
        for (int64_t wb = 0; wb < wpf; ++wb) {
          for (int64_t dj = 0; dj < f; ++dj) {
            const int64_t col = f * wb + dj;
            if (col < pw)
              std::memcpy(dst + dj * c, src + col * c, sizeof(float) * c);
          }
          dst += f * f * c;
        }
      }
    }
  }
}

// Accumulate phase-layout preds (n, ph_pad/f, pw_pad/f, f*f*c) * window
// into out/wmap (h, w, c) — the phase-IO counterpart of blend_accumulate;
// the crop to the (ph, pw) valid region happens here.
void blend_accumulate_phase(float* out, float* wmap, int64_t h, int64_t w,
                            int64_t c, const float* preds,
                            const int64_t* coords, int64_t n,
                            int64_t ph, int64_t pw,
                            int64_t ph_pad, int64_t pw_pad, int64_t f,
                            const float* window) {
  const int64_t hpf = ph_pad / f, wpf = pw_pad / f;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t hi = coords[2 * i], wi = coords[2 * i + 1];
    for (int64_t rb = 0; rb < hpf; ++rb) {
      for (int64_t di = 0; di < f; ++di) {
        const int64_t r = f * rb + di;
        if (r >= ph) continue;
        float* orow = out + ((hi + r) * w + wi) * c;
        float* wrow = wmap + ((hi + r) * w + wi) * c;
        const float* prow =
            preds + (((i * hpf + rb) * wpf) * f * f + di * f) * c;
        const float* wnrow = window + (r * pw) * c;
        for (int64_t wb = 0; wb < wpf; ++wb) {
          for (int64_t dj = 0; dj < f; ++dj) {
            const int64_t col = f * wb + dj;
            if (col >= pw) continue;
            const float* p = prow + (f * f * wb + dj) * c;
            for (int64_t k = 0; k < c; ++k) {
              orow[col * c + k] += p[k] * wnrow[col * c + k];
              wrow[col * c + k] += wnrow[col * c + k];
            }
          }
        }
      }
    }
  }
}

// out /= max(wmap, eps)
void blend_normalize(float* out, const float* wmap, int64_t numel, float eps) {
  for (int64_t i = 0; i < numel; ++i) {
    out[i] /= std::max(wmap[i], eps);
  }
}

// float [0,1] -> uint8 with round-half-away (NumPy .round() is
// half-to-even; the engine keeps NumPy for the final cast by default, this
// native variant uses rint which matches half-to-even).
void to_uint8(const float* in, int64_t numel, uint8_t* out) {
  for (int64_t i = 0; i < numel; ++i) {
    float v = in[i] * 255.0f;
    v = std::min(std::max(v, 0.0f), 255.0f);
    out[i] = static_cast<uint8_t>(std::nearbyint(v));
  }
}

void to_uint16(const float* in, int64_t numel, uint16_t* out) {
  for (int64_t i = 0; i < numel; ++i) {
    float v = in[i] * 65535.0f;
    v = std::min(std::max(v, 0.0f), 65535.0f);
    out[i] = static_cast<uint16_t>(std::nearbyint(v));
  }
}

// uint8 HWC -> float32 [0,1]
void from_uint8(const uint8_t* in, int64_t numel, float* out) {
  constexpr float kScale = 1.0f / 255.0f;
  for (int64_t i = 0; i < numel; ++i) out[i] = in[i] * kScale;
}

}  // extern "C"
