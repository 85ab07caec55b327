// Automatic speaker verification binary: enroll wav + test wav ->
// similarity + accept/reject at a threshold.
// Role parity: runtime/core/bin/asv_main.cc in the reference (enroll/test
// pair scored with the engine's [0,1]-normalized cosine).
// Usage: asv_main <enroll.wav> <test.wav> [threshold] [feat_dim]
//        [sample_rate] [chunk_frames]
#include <cstdlib>
#include <iostream>
#include <memory>
#include <string>
#include <vector>

#include "frontend/wav.h"
#include "speaker/speaker_engine.h"
#include "speaker/speaker_model.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: " << argv[0]
              << " <enroll.wav> <test.wav> [threshold] [feat_dim]"
              << " [sample_rate] [chunk_frames]\n";
    return 1;
  }
  std::string enroll_path = argv[1], test_path = argv[2];
  float threshold = argc > 3 ? std::atof(argv[3]) : 0.5f;
  int feat_dim = argc > 4 ? std::atoi(argv[4]) : 80;
  int sample_rate = argc > 5 ? std::atoi(argv[5]) : 16000;
  int chunk_frames = argc > 6 ? std::atoi(argv[6]) : 198;

  auto model =
      std::make_shared<wespeaker_tpu::MeanMelSpeakerModel>(feat_dim);
  wespeaker_tpu::SpeakerEngine engine(model, feat_dim, sample_rate, feat_dim,
                                      chunk_frames);

  std::vector<float> enroll_emb, test_emb;
  {
    wespeaker_tpu::WavReader reader(enroll_path);
    engine.ExtractEmbedding(reader.data().data(),
                            static_cast<int>(reader.data().size()),
                            &enroll_emb);
  }
  {
    wespeaker_tpu::WavReader reader(test_path);
    engine.ExtractEmbedding(reader.data().data(),
                            static_cast<int>(reader.data().size()),
                            &test_emb);
  }
  float score = engine.CosineSimilarity(enroll_emb, test_emb);
  bool accept = score >= threshold;
  std::cout << "score " << score << " threshold " << threshold << " "
            << (accept ? "ACCEPT" : "REJECT") << "\n";
  return accept ? 0 : 2;
}
