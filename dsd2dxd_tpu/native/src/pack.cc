// pack.cc — wire-format interleaving of the fused kernel's blocked
// byte-plane output (ops/fused.py emit="planes"; PlaneLayout docstring
// defines the addressing). This is the host half of the in-kernel PCM
// packing: the device emits s24/s16 planes in its natural blocked
// layout, and this single sequential pass produces the frame-interleaved
// wire stream — replacing the XLA de-block permute + pack pass
// (reference-side equivalent: the Rust engine's CPU packing of s24le,
// reference build_test_stereo.sh:10).

#include <cstddef>
#include <cstdint>

#define DSDKIT_API extern "C" __attribute__((visibility("default")))

namespace {

// Source index of the first sample of the run containing wire frame f
// for channel cc; within a run (one sub-block's sub_cols samples) the
// index advances by 1 per frame (PlaneLayout contract).
inline size_t run_base(size_t f, uint32_t cc, uint32_t channels,
                       uint32_t batch, uint32_t sub, size_t cols) {
  if (batch > 1) {
    size_t i = f / ((size_t)batch * sub);
    uint32_t b = (uint32_t)((f / sub) % batch);
    size_t row = (size_t)b * channels + cc;
    return row * cols + i * sub + (f % sub);
  }
  return (size_t)cc * cols + f;
}

}  // namespace

DSDKIT_API void dsdkit_interleave24(const uint8_t* planes, size_t rows,
                                    size_t cols, uint32_t channels,
                                    uint32_t batch, uint32_t sub,
                                    size_t n_frames, int big_endian,
                                    uint8_t* out) {
  const size_t plane = rows * cols;
  const uint8_t* lo = planes;
  const uint8_t* mid = planes + plane;
  const uint8_t* hi = planes + 2 * plane;
  if (batch <= 1) sub = (uint32_t)cols;  // one contiguous run per row
  size_t f = 0;
  uint8_t* o = out;
  const size_t stride = (size_t)channels * 3;
  while (f < n_frames) {
    size_t run = sub - (f % sub);
    if (run > n_frames - f) run = n_frames - f;
    for (uint32_t cc = 0; cc < channels; ++cc) {
      size_t idx = run_base(f, cc, channels, batch, sub, cols);
      const uint8_t* l = lo + idx;
      const uint8_t* m = mid + idx;
      const uint8_t* h = hi + idx;
      uint8_t* oc = o + (size_t)cc * 3;
      if (big_endian) {
        for (size_t k = 0; k < run; ++k, oc += stride) {
          oc[0] = h[k];
          oc[1] = m[k];
          oc[2] = l[k];
        }
      } else {
        for (size_t k = 0; k < run; ++k, oc += stride) {
          oc[0] = l[k];
          oc[1] = m[k];
          oc[2] = h[k];
        }
      }
    }
    f += run;
    o += run * stride;
  }
}

// Blocked byte planes -> (frames, channels) int32 samples (sign-
// extended 24-bit). Feeds consumers that want frame-major ints — the
// FLAC encoder — straight from the kernel's plane output, skipping the
// device-side de-block/interleave entirely.
DSDKIT_API void dsdkit_deplane24(const uint8_t* planes, size_t rows,
                                 size_t cols, uint32_t channels,
                                 uint32_t batch, uint32_t sub,
                                 size_t n_frames, int32_t* out) {
  const size_t plane = rows * cols;
  const uint8_t* lo = planes;
  const uint8_t* mid = planes + plane;
  const uint8_t* hi = planes + 2 * plane;
  if (batch <= 1) sub = (uint32_t)cols;
  size_t f = 0;
  int32_t* o = out;
  while (f < n_frames) {
    size_t run = sub - (f % sub);
    if (run > n_frames - f) run = n_frames - f;
    for (uint32_t cc = 0; cc < channels; ++cc) {
      size_t idx = run_base(f, cc, channels, batch, sub, cols);
      const uint8_t* l = lo + idx;
      const uint8_t* m = mid + idx;
      const uint8_t* h = hi + idx;
      int32_t* oc = o + cc;
      for (size_t k = 0; k < run; ++k, oc += channels) {
        uint32_t v = (uint32_t)l[k] | ((uint32_t)m[k] << 8)
                     | ((uint32_t)h[k] << 16);
        *oc = (int32_t)(v << 8) >> 8;  // sign-extend 24 -> 32
      }
    }
    f += run;
    o += (size_t)run * channels;
  }
}

DSDKIT_API void dsdkit_deplane16(const int16_t* data, size_t rows,
                                 size_t cols, uint32_t channels,
                                 uint32_t batch, uint32_t sub,
                                 size_t n_frames, int32_t* out) {
  (void)rows;
  if (batch <= 1) sub = (uint32_t)cols;
  size_t f = 0;
  int32_t* o = out;
  while (f < n_frames) {
    size_t run = sub - (f % sub);
    if (run > n_frames - f) run = n_frames - f;
    for (uint32_t cc = 0; cc < channels; ++cc) {
      size_t idx = run_base(f, cc, channels, batch, sub, cols);
      const int16_t* s = data + idx;
      int32_t* oc = o + cc;
      for (size_t k = 0; k < run; ++k, oc += channels) *oc = s[k];
    }
    f += run;
    o += (size_t)run * channels;
  }
}

DSDKIT_API void dsdkit_interleave16(const int16_t* data, size_t rows,
                                    size_t cols, uint32_t channels,
                                    uint32_t batch, uint32_t sub,
                                    size_t n_frames, int big_endian,
                                    uint8_t* out) {
  (void)rows;
  if (batch <= 1) sub = (uint32_t)cols;
  size_t f = 0;
  uint8_t* o = out;
  const size_t stride = (size_t)channels * 2;
  while (f < n_frames) {
    size_t run = sub - (f % sub);
    if (run > n_frames - f) run = n_frames - f;
    for (uint32_t cc = 0; cc < channels; ++cc) {
      size_t idx = run_base(f, cc, channels, batch, sub, cols);
      const int16_t* s = data + idx;
      uint8_t* oc = o + (size_t)cc * 2;
      if (big_endian) {
        for (size_t k = 0; k < run; ++k, oc += stride) {
          uint16_t v = (uint16_t)s[k];
          oc[0] = (uint8_t)(v >> 8);
          oc[1] = (uint8_t)(v & 0xFF);
        }
      } else {
        for (size_t k = 0; k < run; ++k, oc += stride) {
          uint16_t v = (uint16_t)s[k];
          oc[0] = (uint8_t)(v & 0xFF);
          oc[1] = (uint8_t)(v >> 8);
        }
      }
    }
    f += run;
    o += run * stride;
  }
}
