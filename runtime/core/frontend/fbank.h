// Kaldi-style log-mel filterbank, C++ implementation.
// Spec parity: wespeaker_tpu/frontend/fbank.py (the jnp implementation) and
// the kaldi semantics the reference C++ implements
// (runtime/core/frontend/fbank.h:57-198): snip-edges framing, DC removal,
// pre-emphasis 0.97, hamming/povey window, power-of-two zero-padded FFT,
// triangular mel bins, natural-log floor at float32 epsilon.
#ifndef WESPEAKER_TPU_FRONTEND_FBANK_H_
#define WESPEAKER_TPU_FRONTEND_FBANK_H_

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include "frontend/fft.h"

namespace wespeaker_tpu {

class Fbank {
 public:
  Fbank(int num_bins, int sample_rate, int frame_length, int frame_shift,
        std::string window_type = "hamming", float dither = 0.0f,
        float low_freq = 20.0f, float high_freq = 0.0f,
        float preemphasis = 0.97f, bool remove_dc = true)
      : num_bins_(num_bins),
        sample_rate_(sample_rate),
        frame_length_(frame_length),
        frame_shift_(frame_shift),
        dither_(dither),
        preemphasis_(preemphasis),
        remove_dc_(remove_dc),
        generator_(0),
        distribution_(0.0f, 1.0f) {
    padded_size_ = 1;
    while (padded_size_ < frame_length_) padded_size_ <<= 1;
    fft_.reset(new FFT(static_cast<size_t>(padded_size_)));

    // window function
    window_.resize(frame_length_);
    double a = 2.0 * M_PI / (frame_length_ - 1);
    for (int i = 0; i < frame_length_; ++i) {
      if (window_type == "povey") {
        window_[i] = std::pow(0.5 - 0.5 * std::cos(a * i), 0.85);
      } else if (window_type == "hanning") {
        window_[i] = 0.5 - 0.5 * std::cos(a * i);
      } else {  // hamming
        window_[i] = 0.54 - 0.46 * std::cos(a * i);
      }
    }

    // triangular mel filters over fft bins [0, padded/2)
    double nyquist = 0.5 * sample_rate_;
    double hi = high_freq > 0 ? high_freq : nyquist + high_freq;
    double mel_low = MelScale(low_freq);
    double mel_high = MelScale(hi);
    double delta = (mel_high - mel_low) / (num_bins_ + 1);
    int num_fft_bins = padded_size_ / 2;
    double bin_width = static_cast<double>(sample_rate_) / padded_size_;
    bins_.resize(num_bins_);
    for (int j = 0; j < num_bins_; ++j) {
      double left = mel_low + j * delta;
      double center = left + delta;
      double right = center + delta;
      int first = -1;
      std::vector<double> weights;
      for (int i = 0; i < num_fft_bins; ++i) {
        double mel = MelScale(bin_width * i);
        if (mel > left && mel < right) {
          double w = mel <= center ? (mel - left) / (center - left)
                                   : (right - mel) / (right - center);
          if (first < 0) first = i;
          weights.push_back(w);
        } else if (first >= 0) {
          break;
        }
      }
      bins_[j] = {first < 0 ? 0 : first, std::move(weights)};
    }
  }

  static double MelScale(double freq) {
    return 1127.0 * std::log1p(freq / 700.0);
  }

  int NumFrames(int num_samples) const {
    if (num_samples < frame_length_) return 0;
    return 1 + (num_samples - frame_length_) / frame_shift_;
  }

  // wave: raw samples (int16-range floats, i.e. already x 1<<15).
  // out: NumFrames x num_bins, row-major.
  int Compute(const float* wave, int num_samples, float* out) {
    int num_frames = NumFrames(num_samples);
    std::vector<double> frame(frame_length_);
    std::vector<std::complex<double>> spec(padded_size_);
    const double kEps = 1.1920928955078125e-07;
    for (int t = 0; t < num_frames; ++t) {
      const float* start = wave + t * frame_shift_;
      for (int i = 0; i < frame_length_; ++i) frame[i] = start[i];
      if (dither_ != 0.0f) {
        for (int i = 0; i < frame_length_; ++i)
          frame[i] += dither_ * distribution_(generator_);
      }
      if (remove_dc_) {
        double mean = 0.0;
        for (double v : frame) mean += v;
        mean /= frame_length_;
        for (double& v : frame) v -= mean;
      }
      if (preemphasis_ != 0.0f) {
        for (int i = frame_length_ - 1; i > 0; --i)
          frame[i] -= preemphasis_ * frame[i - 1];
        frame[0] -= preemphasis_ * frame[0];
      }
      for (int i = 0; i < frame_length_; ++i) frame[i] *= window_[i];

      for (int i = 0; i < padded_size_; ++i)
        spec[i] = i < frame_length_ ? std::complex<double>(frame[i], 0.0)
                                    : std::complex<double>(0.0, 0.0);
      fft_->Transform(spec.data());

      float* row = out + t * num_bins_;
      for (int j = 0; j < num_bins_; ++j) {
        double acc = 0.0;
        const auto& bin = bins_[j];
        for (size_t k = 0; k < bin.second.size(); ++k) {
          const auto& c = spec[bin.first + k];
          acc += bin.second[k] *
                 (c.real() * c.real() + c.imag() * c.imag());
        }
        row[j] = static_cast<float>(std::log(std::max(acc, kEps)));
      }
    }
    return num_frames;
  }

  int num_bins() const { return num_bins_; }
  int frame_shift() const { return frame_shift_; }
  int frame_length() const { return frame_length_; }

 private:
  int num_bins_, sample_rate_, frame_length_, frame_shift_;
  float dither_, preemphasis_;
  bool remove_dc_;
  int padded_size_;
  std::unique_ptr<FFT> fft_;
  std::vector<double> window_;
  std::vector<std::pair<int, std::vector<double>>> bins_;
  std::mt19937 generator_;
  std::normal_distribution<float> distribution_;
};

}  // namespace wespeaker_tpu

#endif  // WESPEAKER_TPU_FRONTEND_FBANK_H_
