// C ABI surface for ctypes bindings (and for embedding the engine in other
// runtimes). Exposes fbank computation and the speaker engine with a
// pluggable embedding callback (the bridge to the jitted TPU model).
#include <cstring>
#include <memory>
#include <vector>

#include "frontend/fbank.h"
#include "frontend/feature_pipeline.h"
#include "frontend/wav.h"
#include "speaker/speaker_engine.h"
#include "speaker/speaker_model.h"

using wespeaker_tpu::CallbackSpeakerModel;
using wespeaker_tpu::EmbedCallback;
using wespeaker_tpu::Fbank;
using wespeaker_tpu::FeaturePipeline;
using wespeaker_tpu::FeaturePipelineConfig;
using wespeaker_tpu::MeanMelSpeakerModel;
using wespeaker_tpu::SpeakerEngine;
using wespeaker_tpu::SpeakerModel;
using wespeaker_tpu::WavReader;

extern "C" {

void* wtpu_fbank_new(int num_bins, int sample_rate, int frame_length_ms,
                     int frame_shift_ms, const char* window_type,
                     float dither) {
  return new Fbank(num_bins, sample_rate,
                   sample_rate / 1000 * frame_length_ms,
                   sample_rate / 1000 * frame_shift_ms,
                   window_type ? window_type : "hamming", dither);
}

void wtpu_fbank_free(void* fbank) { delete static_cast<Fbank*>(fbank); }

int wtpu_fbank_num_frames(void* fbank, int num_samples) {
  return static_cast<Fbank*>(fbank)->NumFrames(num_samples);
}

// wave: int16-range floats; out must hold num_frames * num_bins floats
int wtpu_fbank_compute(void* fbank, const float* wave, int num_samples,
                       float* out) {
  return static_cast<Fbank*>(fbank)->Compute(wave, num_samples, out);
}

void* wtpu_engine_new_with_callback(EmbedCallback fn, void* user_data,
                                    int embed_dim, int feat_dim,
                                    int sample_rate, int chunk_frames) {
  auto model = std::make_shared<CallbackSpeakerModel>(fn, user_data,
                                                      embed_dim);
  return new SpeakerEngine(model, feat_dim, sample_rate, embed_dim,
                           chunk_frames);
}

void* wtpu_engine_new_meanmel(int feat_dim, int sample_rate,
                              int chunk_frames) {
  auto model = std::make_shared<MeanMelSpeakerModel>(feat_dim);
  return new SpeakerEngine(model, feat_dim, sample_rate, feat_dim,
                           chunk_frames);
}

void wtpu_engine_free(void* engine) {
  delete static_cast<SpeakerEngine*>(engine);
}

void wtpu_engine_extract(void* engine, const float* wave, int num_samples,
                         float* out_embedding) {
  std::vector<float> emb;
  auto* e = static_cast<SpeakerEngine*>(engine);
  e->ExtractEmbedding(wave, num_samples, &emb);
  std::memcpy(out_embedding, emb.data(), emb.size() * sizeof(float));
}

float wtpu_engine_cosine(void* engine, const float* a, const float* b,
                         int dim) {
  auto* e = static_cast<SpeakerEngine*>(engine);
  std::vector<float> va(a, a + dim), vb(b, b + dim);
  return e->CosineSimilarity(va, vb);
}

void* wtpu_pipeline_new(int num_bins, int sample_rate) {
  FeaturePipelineConfig cfg;
  cfg.num_bins = num_bins;
  cfg.sample_rate = sample_rate;
  return new FeaturePipeline(cfg);
}

void wtpu_pipeline_free(void* p) { delete static_cast<FeaturePipeline*>(p); }

void wtpu_pipeline_accept(void* p, const float* wav, int n) {
  static_cast<FeaturePipeline*>(p)->AcceptWaveform(
      std::vector<float>(wav, wav + n));
}

void wtpu_pipeline_finish(void* p) {
  static_cast<FeaturePipeline*>(p)->set_input_finished();
}

// Returns number of frames written (<= n); out must hold n*num_bins floats.
int wtpu_pipeline_read(void* p, int n, float* out, int num_bins) {
  std::vector<std::vector<float>> frames;
  auto* fp = static_cast<FeaturePipeline*>(p);
  bool full = fp->Read(n, &frames);
  (void)full;
  for (size_t t = 0; t < frames.size(); ++t)
    std::memcpy(out + t * num_bins, frames[t].data(),
                num_bins * sizeof(float));
  return static_cast<int>(frames.size());
}

int wtpu_read_wav(const char* path, float* out, int max_samples,
                  int* sample_rate) {
  try {
    WavReader reader(path);
    *sample_rate = reader.sample_rate();
    int n = static_cast<int>(reader.data().size());
    if (n > max_samples) n = max_samples;
    std::memcpy(out, reader.data().data(), n * sizeof(float));
    return n;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
