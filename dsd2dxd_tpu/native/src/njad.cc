// njad.cc — "Not Just Another Dither" requantizer.
//
// The reference README documents `-d N` (reference README.md:74) from the
// pre-Rust C++ dsd2dxd, crediting Airwindows (README.md:236-244); v2.7.0
// dropped it but the driver's BASELINE configs require it (SURVEY.md §2.4
// fine print). This is OUR INTERPRETATION of the publicly described
// Airwindows "Not Just Another Dither" idea — built from its published
// description only (no network in this environment, so the actual
// Airwindows source could not be consulted; fidelity to its exact
// algorithm is unverified): instead of adding noise, choose between
// floor and ceil per sample so the running distribution of leading
// digits of the quantized values tracks Benford's law — a
// deterministic, content-adaptive dither. Sequential feedback per
// channel, hence host-side native code (SURVEY.md §2.3). Tests pin the
// statistical behavior (bounded error, determinism, Benford tracking),
// not lineage.

#include <cmath>
#include <cstdint>
#include <cstring>

#define DSDKIT_API extern "C" __attribute__((visibility("default")))

namespace {

// Benford ideal proportions log10(1 + 1/d), d = 1..9.
const double kBenford[10] = {0.0,
                             0.301029995663981, 0.176091259055681,
                             0.124938736608300, 0.096910013008056,
                             0.079181246047625, 0.066946789630613,
                             0.057991946977687, 0.051152522447381,
                             0.045757490560675};

struct ChannelState {
  double counts[10];
  double total;
};

struct NjadState {
  uint32_t channels;
  ChannelState ch[16];
};

// Integer fast path for the quantize loop (candidates are whole
// numbers): one table-guided divide instead of a divide-per-decade loop.
int leading_digit_ll(long long v) {
  unsigned long long a = v < 0 ? 0ull - (unsigned long long)(v) : (unsigned long long)(v);
  if (a == 0) return 0;
  static const unsigned long long p10[20] = {
      1ull, 10ull, 100ull, 1000ull, 10000ull, 100000ull, 1000000ull,
      10000000ull, 100000000ull, 1000000000ull, 10000000000ull,
      100000000000ull, 1000000000000ull, 10000000000000ull,
      100000000000000ull, 1000000000000000ull, 10000000000000000ull,
      100000000000000000ull, 1000000000000000000ull,
      10000000000000000000ull};
  int bl = 63 - __builtin_clzll(a);
  // Hacker's Delight digit-count estimate: (bl+1)*log10(2) rounded UP
  // by construction, so the correction below only ever decrements once.
  // (The old bl*1233>>12 form underestimated: leading_digit_ll(10) was
  // 10, indexing counts[10..19] out of bounds.)
  int g = ((bl + 1) * 1233) >> 12;
  if (a < p10[g]) --g;
  return int(a / p10[g]);  // 1..9 by construction
}

// Distance of the histogram (with candidate digit d added) from Benford.
double score(const ChannelState& st, int d) {
  double total = st.total + (d > 0 ? 1.0 : 0.0);
  if (total <= 0.0) return 0.0;
  double s = 0.0;
  for (int i = 1; i <= 9; ++i) {
    double c = st.counts[i] + (i == d ? 1.0 : 0.0);
    s += std::fabs(c / total - kBenford[i]);
  }
  return s;
}

int32_t clip(long long v, int bits) {
  long long lim = 1ll << (bits - 1);
  if (v >= lim) return int32_t(lim - 1);
  if (v < -lim) return int32_t(-lim);
  return int32_t(v);
}

}  // namespace

DSDKIT_API void* dsdkit_njad_new(uint32_t channels) {
  // Reject rather than clamp: a clamp would silently alias channels >= 16
  // onto ch[0]'s Benford histogram (cross-channel dither-feedback
  // coupling). The loader maps nullptr to a ConfigError.
  if (channels == 0 || channels > 16) return nullptr;
  auto* st = new NjadState();
  st->channels = channels;
  for (uint32_t c = 0; c < channels; ++c) {
    for (int i = 0; i < 10; ++i) st->ch[c].counts[i] = 0.0;
    st->ch[c].total = 0.0;
  }
  return st;
}

// in: (frames x channels) float32 full-scale ±1; out: int32 at `bits`.
// Returns 0, or -1 when `channels` does not match the handle (aliasing
// extra channels onto ch[0] would couple their dither feedback — the
// exact failure njad_new's reject-don't-clamp contract exists to stop).
DSDKIT_API int dsdkit_njad_quantize(void* handle, const float* in,
                                    int32_t* out, size_t frames,
                                    uint32_t channels, int bits) {
  auto* st = static_cast<NjadState*>(handle);
  if (channels != st->channels || bits < 2 || bits > 32) return -1;
  double scale = double(1ll << (bits - 1));
  for (size_t i = 0; i < frames; ++i) {
    for (uint32_t c = 0; c < channels; ++c) {
      ChannelState& cs = st->ch[c];
      double x = double(in[i * channels + c]) * scale;
      double lo = std::floor(x), hi = lo + 1.0;
      int dlo = leading_digit_ll((long long)lo);
      int dhi = leading_digit_ll((long long)hi);
      double pick;
      int dpick;
      if (dlo > 0 && dhi > 0) {
        // both candidates add one count, so the normalizing total is the
        // same and the argmin survives scaling by it: compare
        // S(d) = sum_i |c_i - b_i*(T+1) + [i==d]| — no per-digit division
        double tp = cs.total + 1.0;
        double e[10], s0 = 0.0;
        for (int k = 1; k <= 9; ++k) {
          e[k] = cs.counts[k] - kBenford[k] * tp;
          s0 += std::fabs(e[k]);
        }
        double slo = s0 - std::fabs(e[dlo]) + std::fabs(e[dlo] + 1.0);
        double shi = s0 - std::fabs(e[dhi]) + std::fabs(e[dhi] + 1.0);
        if (slo <= shi) { pick = lo; dpick = dlo; }
        else { pick = hi; dpick = dhi; }
      } else if (score(cs, dlo) <= score(cs, dhi)) {
        pick = lo; dpick = dlo;
      } else {
        pick = hi; dpick = dhi;
      }
      if (dpick > 0) {
        cs.counts[dpick] += 1.0;
        cs.total += 1.0;
        if (cs.total > 1024.0) {  // decay so the histogram stays adaptive
          for (int k = 1; k <= 9; ++k) cs.counts[k] *= 0.5;
          cs.total *= 0.5;
        }
      }
      out[i * channels + c] = clip((long long)std::llround(pick), bits);
    }
  }
  return 0;
}

DSDKIT_API void dsdkit_njad_free(void* handle) {
  delete static_cast<NjadState*>(handle);
}
