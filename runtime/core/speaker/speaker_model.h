// Abstract embedding backend + C-callback backend.
// Role parity: runtime/core/speaker/speaker_model.h (the reference plugs in
// ONNX Runtime / MNN here). The TPU deployment path plugs the jitted JAX
// model in through a C function pointer (ctypes/cffi host bridge), so the
// C++ engine owns feature extraction, chunking, CMN and pooling while the
// accelerator owns the network forward.
#ifndef WESPEAKER_TPU_SPEAKER_SPEAKER_MODEL_H_
#define WESPEAKER_TPU_SPEAKER_SPEAKER_MODEL_H_

#include <cmath>
#include <functional>
#include <vector>

namespace wespeaker_tpu {

class SpeakerModel {
 public:
  virtual ~SpeakerModel() = default;
  // feats: frames x feat_dim row-major -> embedding (resized by callee)
  virtual void ExtractEmbedding(const float* feats, int num_frames,
                                int feat_dim,
                                std::vector<float>* embedding) = 0;
  virtual int embedding_dim() const = 0;
};

// embed_fn(feats, num_frames, feat_dim, out_embedding) with out buffer of
// size embedding_dim; used to bridge to a jitted JAX model via ctypes.
using EmbedCallback = void (*)(const float*, int, int, float*, void*);

class CallbackSpeakerModel : public SpeakerModel {
 public:
  CallbackSpeakerModel(EmbedCallback fn, void* user_data, int embed_dim)
      : fn_(fn), user_data_(user_data), embed_dim_(embed_dim) {}

  void ExtractEmbedding(const float* feats, int num_frames, int feat_dim,
                        std::vector<float>* embedding) override {
    embedding->resize(embed_dim_);
    fn_(feats, num_frames, feat_dim, embedding->data(), user_data_);
  }

  int embedding_dim() const override { return embed_dim_; }

 private:
  EmbedCallback fn_;
  void* user_data_;
  int embed_dim_;
};

// Trivial built-in backend for smoke tests / RTF accounting of the DSP path
// without an accelerator attached: per-bin temporal std (non-degenerate
// after the engine's per-chunk CMN, unlike a plain mean).
class MeanMelSpeakerModel : public SpeakerModel {
 public:
  explicit MeanMelSpeakerModel(int feat_dim) : feat_dim_(feat_dim) {}
  void ExtractEmbedding(const float* feats, int num_frames, int feat_dim,
                        std::vector<float>* embedding) override {
    std::vector<double> mean(feat_dim, 0.0), sq(feat_dim, 0.0);
    for (int t = 0; t < num_frames; ++t)
      for (int f = 0; f < feat_dim; ++f) {
        double v = feats[t * feat_dim + f];
        mean[f] += v;
        sq[f] += v * v;
      }
    embedding->resize(feat_dim);
    int n = num_frames > 0 ? num_frames : 1;
    for (int f = 0; f < feat_dim; ++f) {
      double m = mean[f] / n;
      (*embedding)[f] =
          static_cast<float>(std::sqrt(std::max(sq[f] / n - m * m, 0.0)));
    }
  }
  int embedding_dim() const override { return feat_dim_; }

 private:
  int feat_dim_;
};

}  // namespace wespeaker_tpu

#endif  // WESPEAKER_TPU_SPEAKER_SPEAKER_MODEL_H_
