// In-place iterative radix-2 real FFT helpers.
// Role parity: runtime/core/frontend/fft.{h,cc} in the reference.
#ifndef WESPEAKER_TPU_FRONTEND_FFT_H_
#define WESPEAKER_TPU_FRONTEND_FFT_H_

#include <cmath>
#include <complex>
#include <cstddef>
#include <vector>

namespace wespeaker_tpu {

// Iterative Cooley-Tukey radix-2 FFT over a complex buffer whose size must
// be a power of two. Twiddles are computed per call group; for the fbank
// use-case the plan is cached by the Fbank object.
class FFT {
 public:
  explicit FFT(size_t n) : n_(n) {
    // bit-reversal permutation
    rev_.resize(n);
    size_t log2n = 0;
    while ((1u << log2n) < n) ++log2n;
    for (size_t i = 0; i < n; ++i) {
      size_t r = 0;
      for (size_t b = 0; b < log2n; ++b) {
        if (i & (1u << b)) r |= 1u << (log2n - 1 - b);
      }
      rev_[i] = r;
    }
    // per-stage twiddle tables
    for (size_t len = 2; len <= n; len <<= 1) {
      std::vector<std::complex<double>> tw(len / 2);
      for (size_t k = 0; k < len / 2; ++k) {
        double ang = -2.0 * M_PI * static_cast<double>(k) /
                     static_cast<double>(len);
        tw[k] = {std::cos(ang), std::sin(ang)};
      }
      twiddles_.push_back(std::move(tw));
    }
  }

  void Transform(std::complex<double>* data) const {
    for (size_t i = 0; i < n_; ++i) {
      if (i < rev_[i]) std::swap(data[i], data[rev_[i]]);
    }
    size_t stage = 0;
    for (size_t len = 2; len <= n_; len <<= 1, ++stage) {
      const auto& tw = twiddles_[stage];
      for (size_t i = 0; i < n_; i += len) {
        for (size_t k = 0; k < len / 2; ++k) {
          auto u = data[i + k];
          auto v = data[i + k + len / 2] * tw[k];
          data[i + k] = u + v;
          data[i + k + len / 2] = u - v;
        }
      }
    }
  }

  size_t size() const { return n_; }

 private:
  size_t n_;
  std::vector<size_t> rev_;
  std::vector<std::vector<std::complex<double>>> twiddles_;
};

}  // namespace wespeaker_tpu

#endif  // WESPEAKER_TPU_FRONTEND_FFT_H_
