// Native audio IO implementation. See audio_io.h for the contract.
//
// Semantics mirror whisper_tpu/ops/audio.py exactly (shared golden tests via
// ctypes in tests/test_native.py): PCM 8/16/24/32 + IEEE float WAVs, mean
// stereo downmix, windowed-sinc resampling with blackman taper.

#include "audio_io.h"

#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_error;

void set_error(const std::string& e) { g_error = e; }

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}

uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

struct WavFmt {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
};

int decode_samples(const WavFmt& fmt, const uint8_t* raw, size_t len,
                   std::vector<float>* mono) {
  const int ch = fmt.channels;
  if (ch <= 0) {
    set_error("zero channels");
    return -1;
  }
  size_t bytes_per = fmt.bits / 8;
  if (bytes_per == 0) {
    set_error("zero bit depth");
    return -1;
  }
  size_t n_total = len / (bytes_per * ch);
  mono->resize(n_total);
  const double inv_ch = 1.0 / ch;

  auto fail = [&](const char* m) {
    set_error(m);
    return -1;
  };

  if (fmt.format == 1) {  // PCM
    switch (fmt.bits) {
      case 16:
        for (size_t i = 0; i < n_total; ++i) {
          double acc = 0;
          for (int c = 0; c < ch; ++c) {
            int16_t v;
            std::memcpy(&v, raw + (i * ch + c) * 2, 2);
            acc += v / 32768.0;
          }
          (*mono)[i] = static_cast<float>(acc * inv_ch);
        }
        return 0;
      case 32:
        for (size_t i = 0; i < n_total; ++i) {
          double acc = 0;
          for (int c = 0; c < ch; ++c) {
            int32_t v;
            std::memcpy(&v, raw + (i * ch + c) * 4, 4);
            acc += v / 2147483648.0;
          }
          (*mono)[i] = static_cast<float>(acc * inv_ch);
        }
        return 0;
      case 8:
        for (size_t i = 0; i < n_total; ++i) {
          double acc = 0;
          for (int c = 0; c < ch; ++c) {
            acc += (raw[i * ch + c] - 128.0) / 128.0;
          }
          (*mono)[i] = static_cast<float>(acc * inv_ch);
        }
        return 0;
      case 24:
        for (size_t i = 0; i < n_total; ++i) {
          double acc = 0;
          for (int c = 0; c < ch; ++c) {
            const uint8_t* b = raw + (i * ch + c) * 3;
            int32_t v = b[0] | (b[1] << 8) | (b[2] << 16);
            if (v >= (1 << 23)) v -= (1 << 24);
            acc += v / 8388608.0;
          }
          (*mono)[i] = static_cast<float>(acc * inv_ch);
        }
        return 0;
      default:
        return fail("unsupported PCM bit depth");
    }
  } else if (fmt.format == 3) {  // IEEE float
    if (fmt.bits == 32) {
      for (size_t i = 0; i < n_total; ++i) {
        double acc = 0;
        for (int c = 0; c < ch; ++c) {
          float v;
          std::memcpy(&v, raw + (i * ch + c) * 4, 4);
          acc += v;
        }
        (*mono)[i] = static_cast<float>(acc * inv_ch);
      }
      return 0;
    } else if (fmt.bits == 64) {
      for (size_t i = 0; i < n_total; ++i) {
        double acc = 0;
        for (int c = 0; c < ch; ++c) {
          double v;
          std::memcpy(&v, raw + (i * ch + c) * 8, 8);
          acc += v;
        }
        (*mono)[i] = static_cast<float>(acc * inv_ch);
      }
      return 0;
    }
    return fail("unsupported float bit depth");
  }
  return fail("unsupported WAV format tag");
}

}  // namespace

extern "C" {

const char* wt_last_error(void) { return g_error.c_str(); }

void wt_free(void* p) { std::free(p); }

int wt_resample(const float* in, int64_t n, int in_rate, int out_rate,
                float** out, int64_t* out_n) {
  if (in_rate <= 0 || out_rate <= 0 || n < 0) {
    set_error("bad resample args");
    return -1;
  }
  if (in_rate == out_rate) {
    *out = static_cast<float*>(std::malloc(sizeof(float) * std::max<int64_t>(n, 1)));
    std::memcpy(*out, in, sizeof(float) * n);
    *out_n = n;
    return 0;
  }
  int64_t g = std::__gcd<int64_t>(in_rate, out_rate);
  int64_t up = out_rate / g, down = in_rate / g;
  // windowed-sinc lowpass at min Nyquist (matches ops/audio.py::resample)
  const int64_t half_zeros = 24;
  const int64_t m = std::max(up, down);
  const double cutoff = 1.0 / static_cast<double>(m);
  const int64_t half = half_zeros * m;
  const int64_t ntaps = 2 * half + 1;
  std::vector<double> taps(ntaps);
  for (int64_t i = 0; i < ntaps; ++i) {
    const double x = static_cast<double>(i - half);
    const double sinc =
        x == 0.0 ? 1.0 : std::sin(M_PI * cutoff * x) / (M_PI * cutoff * x);
    const double w =
        0.42 - 0.5 * std::cos(2.0 * M_PI * i / (ntaps - 1)) +
        0.08 * std::cos(4.0 * M_PI * i / (ntaps - 1));  // blackman
    taps[i] = up * cutoff * sinc * w;
  }

  const int64_t up_len = n * up;
  const int64_t expect = static_cast<int64_t>(
      std::llround(static_cast<double>(n) * out_rate / in_rate));
  float* res = static_cast<float*>(std::malloc(sizeof(float) * std::max<int64_t>(expect, 1)));
  // polyphase: output sample j reads upsampled index j*down; only every
  // `up`-th upsampled position holds a real input sample
  for (int64_t j = 0; j < expect; ++j) {
    const int64_t center = j * down;  // position in upsampled stream
    double acc = 0.0;
    // upsampled index i contributes in [center-half, center+half]
    int64_t lo = center - half;
    int64_t rem = ((lo % up) + up) % up;
    int64_t first = rem == 0 ? lo : lo + (up - rem);  // first multiple of up
    for (int64_t i = first; i <= center + half; i += up) {
      const int64_t src = i / up;
      if (src < 0 || src >= n) continue;
      acc += in[src] * taps[i - lo];
    }
    res[j] = static_cast<float>(acc);
  }
  *out = res;
  *out_n = expect;
  return 0;
}

int wt_load_wav(const uint8_t* data, size_t len, int target_rate,
                float** out_samples, int64_t* out_n, int* out_rate) {
  if (len < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    set_error("not a RIFF/WAVE file");
    return -1;
  }
  WavFmt fmt;
  const uint8_t* raw = nullptr;
  size_t raw_len = 0;
  size_t pos = 12;
  while (pos + 8 <= len) {
    const uint8_t* cid = data + pos;
    const uint32_t csize = rd_u32(data + pos + 4);
    if (pos + 8 + csize > len) break;
    const uint8_t* body = data + pos + 8;
    if (std::memcmp(cid, "fmt ", 4) == 0 && csize >= 16) {
      fmt.format = rd_u16(body);
      fmt.channels = rd_u16(body + 2);
      fmt.rate = rd_u32(body + 4);
      fmt.bits = rd_u16(body + 14);
      if (fmt.format == 0xFFFE && csize >= 26) {
        fmt.format = rd_u16(body + 24);  // extensible sub-format
      }
    } else if (std::memcmp(cid, "data", 4) == 0) {
      raw = body;
      raw_len = csize;
    }
    pos += 8 + csize + (csize & 1);
  }
  if (fmt.format == 0 || raw == nullptr) {
    set_error("missing fmt/data chunk");
    return -1;
  }
  std::vector<float> mono;
  if (decode_samples(fmt, raw, raw_len, &mono) != 0) return -1;

  if (target_rate > 0 && static_cast<int>(fmt.rate) != target_rate) {
    float* res = nullptr;
    int64_t res_n = 0;
    if (wt_resample(mono.data(), static_cast<int64_t>(mono.size()),
                    static_cast<int>(fmt.rate), target_rate, &res, &res_n) != 0) {
      return -1;
    }
    *out_samples = res;
    *out_n = res_n;
    *out_rate = target_rate;
    return 0;
  }
  *out_samples =
      static_cast<float*>(std::malloc(sizeof(float) * std::max<size_t>(mono.size(), 1)));
  std::memcpy(*out_samples, mono.data(), sizeof(float) * mono.size());
  *out_n = static_cast<int64_t>(mono.size());
  *out_rate = static_cast<int>(fmt.rate);
  return 0;
}

int64_t wt_edit_distance(const uint32_t* a, int64_t na,
                         const uint32_t* b, int64_t nb) {
  if (na < nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= nb; ++j) {
      const int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

}  // extern "C"
