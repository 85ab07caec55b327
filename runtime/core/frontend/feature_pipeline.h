// Streaming feature pipeline: producer thread feeds waveform chunks,
// consumer thread reads fixed counts of fbank frames.
// Behavioral spec: runtime/core/frontend/feature_pipeline.{h,cc} in the
// reference — AcceptWaveform extracts whole frames into a blocking queue,
// carries the residual samples, Read(n) blocks until n frames (or input
// finished), set_input_finished flushes.
#ifndef WESPEAKER_TPU_FRONTEND_FEATURE_PIPELINE_H_
#define WESPEAKER_TPU_FRONTEND_FEATURE_PIPELINE_H_

#include <atomic>
#include <condition_variable>
#include <mutex>
#include <string>
#include <vector>

#include "frontend/fbank.h"
#include "utils/blocking_queue.h"

namespace wespeaker_tpu {

struct FeaturePipelineConfig {
  int num_bins = 80;
  int sample_rate = 16000;
  int frame_length_ms = 25;
  int frame_shift_ms = 10;
  std::string window_type = "hamming";
};

class FeaturePipeline {
 public:
  explicit FeaturePipeline(const FeaturePipelineConfig& config)
      : config_(config),
        fbank_(config.num_bins, config.sample_rate,
               config.sample_rate / 1000 * config.frame_length_ms,
               config.sample_rate / 1000 * config.frame_shift_ms,
               config.window_type),
        input_finished_(false) {}

  int feature_dim() const { return config_.num_bins; }

  // Producer side: int16-range float samples.
  void AcceptWaveform(const std::vector<float>& wav) {
    std::vector<float> joined;
    joined.reserve(remained_wav_.size() + wav.size());
    joined.insert(joined.end(), remained_wav_.begin(), remained_wav_.end());
    joined.insert(joined.end(), wav.begin(), wav.end());
    int num_frames = fbank_.NumFrames(static_cast<int>(joined.size()));
    if (num_frames > 0) {
      std::vector<float> feats(
          static_cast<size_t>(num_frames) * config_.num_bins);
      fbank_.Compute(joined.data(), static_cast<int>(joined.size()),
                     feats.data());
      for (int t = 0; t < num_frames; ++t) {
        queue_.Push(std::vector<float>(
            feats.begin() + static_cast<size_t>(t) * config_.num_bins,
            feats.begin() + static_cast<size_t>(t + 1) * config_.num_bins));
      }
      int shift = config_.sample_rate / 1000 * config_.frame_shift_ms;
      size_t consumed = static_cast<size_t>(num_frames) * shift;
      remained_wav_.assign(joined.begin() + consumed, joined.end());
    } else {
      remained_wav_ = std::move(joined);
    }
    finish_cv_.notify_all();
  }

  void set_input_finished() {
    input_finished_.store(true);
    finish_cv_.notify_all();
  }

  // Consumer side: blocks until `n` frames are available or input finished;
  // returns false when fewer than n frames remain at end of stream.
  bool Read(int n, std::vector<std::vector<float>>* out) {
    out->clear();
    for (int i = 0; i < n; ++i) {
      // wait until a frame exists or the stream is finished & drained
      {
        std::unique_lock<std::mutex> lock(finish_mutex_);
        finish_cv_.wait(lock, [this] {
          return !queue_.Empty() || input_finished_.load();
        });
      }
      if (queue_.Empty() && input_finished_.load()) return false;
      out->push_back(queue_.Pop());
    }
    return true;
  }

  size_t NumQueuedFrames() const { return queue_.Size(); }

 private:
  FeaturePipelineConfig config_;
  Fbank fbank_;
  std::vector<float> remained_wav_;
  BlockingQueue<std::vector<float>> queue_;
  std::atomic<bool> input_finished_;
  std::mutex finish_mutex_;
  std::condition_variable finish_cv_;
};

}  // namespace wespeaker_tpu

#endif  // WESPEAKER_TPU_FRONTEND_FEATURE_PIPELINE_H_
