// Deployment engine: wav -> fbank -> chunking -> CMN -> model -> averaged
// embedding; cosine similarity normalized to [0, 1].
// Behavioral spec: runtime/core/speaker/speaker_engine.{h,cc} in the
// reference — 198-frame chunks with head-wrap padding of the last chunk
// (:96-134), per-chunk mean subtraction (:63), chunk-averaged embedding
// (:140-158), cosine in [0,1] (:161-173).
#ifndef WESPEAKER_TPU_SPEAKER_SPEAKER_ENGINE_H_
#define WESPEAKER_TPU_SPEAKER_SPEAKER_ENGINE_H_

#include <cmath>
#include <memory>
#include <vector>

#include "frontend/fbank.h"
#include "speaker/speaker_model.h"

namespace wespeaker_tpu {

class SpeakerEngine {
 public:
  SpeakerEngine(std::shared_ptr<SpeakerModel> model, int feat_dim,
                int sample_rate, int embedding_size, int chunk_frames = 198)
      : model_(std::move(model)),
        feat_dim_(feat_dim),
        embedding_size_(embedding_size),
        chunk_frames_(chunk_frames),
        fbank_(feat_dim, sample_rate, sample_rate / 1000 * 25,
               sample_rate / 1000 * 10) {}

  int EmbeddingSize() const { return embedding_size_; }

  // per-chunk cepstral mean normalization
  static void ApplyMean(std::vector<float>* feat, int feat_dim) {
    int frames = static_cast<int>(feat->size()) / feat_dim;
    std::vector<float> mean(feat_dim, 0.0f);
    for (int t = 0; t < frames; ++t)
      for (int f = 0; f < feat_dim; ++f)
        mean[f] += (*feat)[t * feat_dim + f];
    for (auto& m : mean) m /= frames > 0 ? frames : 1;
    for (int t = 0; t < frames; ++t)
      for (int f = 0; f < feat_dim; ++f)
        (*feat)[t * feat_dim + f] -= mean[f];
  }

  // wave in int16 range; returns averaged embedding over chunks.
  void ExtractEmbedding(const float* wave, int num_samples,
                        std::vector<float>* avg_emb) {
    int num_frames = fbank_.NumFrames(num_samples);
    if (num_frames <= 0) {
      avg_emb->assign(embedding_size_, 0.0f);
      return;
    }
    std::vector<float> feats(static_cast<size_t>(num_frames) * feat_dim_);
    fbank_.Compute(wave, num_samples, feats.data());

    // chunk; head-wrap-pad the final partial chunk with the utterance start
    std::vector<std::vector<float>> chunks;
    int full = num_frames / chunk_frames_;
    for (int c = 0; c < full; ++c) {
      chunks.emplace_back(
          feats.begin() + static_cast<size_t>(c) * chunk_frames_ * feat_dim_,
          feats.begin() +
              static_cast<size_t>(c + 1) * chunk_frames_ * feat_dim_);
    }
    int rest = num_frames % chunk_frames_;
    if (rest > 0) {
      std::vector<float> last;
      last.reserve(static_cast<size_t>(chunk_frames_) * feat_dim_);
      int pad = chunk_frames_ - rest;
      // pad with the head of the utterance, then the tail frames
      for (int t = 0; t < pad; ++t)
        last.insert(last.end(), feats.begin() + (t % num_frames) * feat_dim_,
                    feats.begin() + ((t % num_frames) + 1) * feat_dim_);
      last.insert(last.end(),
                  feats.begin() + static_cast<size_t>(full) * chunk_frames_ *
                                      feat_dim_,
                  feats.end());
      chunks.push_back(std::move(last));
    }

    avg_emb->assign(embedding_size_, 0.0f);
    std::vector<float> emb;
    for (auto& chunk : chunks) {
      ApplyMean(&chunk, feat_dim_);
      model_->ExtractEmbedding(chunk.data(),
                               static_cast<int>(chunk.size()) / feat_dim_,
                               feat_dim_, &emb);
      for (int i = 0; i < embedding_size_; ++i) (*avg_emb)[i] += emb[i];
    }
    for (auto& v : *avg_emb) v /= static_cast<float>(chunks.size());
  }

  // cosine similarity mapped to [0, 1]
  float CosineSimilarity(const std::vector<float>& a,
                         const std::vector<float>& b) const {
    double dot = 0, na = 0, nb = 0;
    for (size_t i = 0; i < a.size(); ++i) {
      dot += a[i] * b[i];
      na += a[i] * a[i];
      nb += b[i] * b[i];
    }
    double cos = dot / (std::sqrt(na) * std::sqrt(nb) + 1e-12);
    return static_cast<float>((cos + 1.0) / 2.0);
  }

 private:
  std::shared_ptr<SpeakerModel> model_;
  int feat_dim_;
  int embedding_size_;
  int chunk_frames_;
  Fbank fbank_;
};

}  // namespace wespeaker_tpu

#endif  // WESPEAKER_TPU_SPEAKER_SPEAKER_ENGINE_H_
