// Batch embedding extraction binary: wav.scp -> embeddings file, with a
// thread pool and RTF accounting.
// Role parity: runtime/core/bin/extract_emb_main.cc in the reference.
// Usage: extract_emb_main <wav.scp> <out.txt> [feat_dim] [sample_rate]
//        [chunk_frames] [num_threads]
#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <vector>

#include "frontend/wav.h"
#include "speaker/speaker_engine.h"
#include "speaker/speaker_model.h"
#include "utils/thread_pool.h"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: " << argv[0]
              << " <wav.scp> <out.txt> [feat_dim] [sample_rate]"
              << " [chunk_frames] [threads]\n";
    return 1;
  }
  std::string scp = argv[1], out_path = argv[2];
  int feat_dim = argc > 3 ? std::atoi(argv[3]) : 80;
  int sample_rate = argc > 4 ? std::atoi(argv[4]) : 16000;
  int chunk_frames = argc > 5 ? std::atoi(argv[5]) : 198;
  int threads = argc > 6 ? std::atoi(argv[6]) : 1;

  std::vector<std::pair<std::string, std::string>> items;
  std::ifstream fin(scp);
  std::string line;
  while (std::getline(fin, line)) {
    std::istringstream iss(line);
    std::string key, path;
    if (iss >> key >> path) items.emplace_back(key, path);
  }

  std::ofstream fout(out_path);
  std::mutex out_mutex;
  double total_wave_s = 0.0;
  auto t0 = std::chrono::steady_clock::now();
  {
    wespeaker_tpu::ThreadPool pool(threads);
    std::vector<std::future<void>> futs;
    for (auto& item : items) {
      futs.push_back(pool.Enqueue([&, item] {
        // MeanMel backend: DSP-path RTF without an accelerator attached;
        // production uses the callback backend through the C API.
        auto model = std::make_shared<wespeaker_tpu::MeanMelSpeakerModel>(
            feat_dim);
        wespeaker_tpu::SpeakerEngine engine(model, feat_dim, sample_rate,
                                            feat_dim, chunk_frames);
        wespeaker_tpu::WavReader reader(item.second);
        std::vector<float> emb;
        engine.ExtractEmbedding(reader.data().data(),
                                static_cast<int>(reader.data().size()), &emb);
        std::lock_guard<std::mutex> lock(out_mutex);
        total_wave_s +=
            reader.data().size() / static_cast<double>(sample_rate);
        fout << item.first;
        for (float v : emb) fout << " " << v;
        fout << "\n";
      }));
    }
    for (auto& f : futs) f.get();
  }
  auto dt = std::chrono::duration<double>(
                std::chrono::steady_clock::now() - t0)
                .count();
  std::cerr << "processed " << items.size() << " utts, audio " << total_wave_s
            << "s in " << dt << "s, RTF " << dt / total_wave_s << "\n";
  return 0;
}
