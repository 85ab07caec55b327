// RIFF WAV reader (PCM16), role parity: runtime/core/frontend/wav.h.
#ifndef WESPEAKER_TPU_FRONTEND_WAV_H_
#define WESPEAKER_TPU_FRONTEND_WAV_H_

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace wespeaker_tpu {

class WavReader {
 public:
  explicit WavReader(const std::string& filename) { Open(filename); }

  void Open(const std::string& filename) {
    FILE* fp = std::fopen(filename.c_str(), "rb");
    if (!fp) throw std::runtime_error("cannot open " + filename);
    char riff[4], wave[4];
    uint32_t riff_size = 0;
    if (std::fread(riff, 1, 4, fp) != 4 ||
        std::fread(&riff_size, 4, 1, fp) != 1 ||
        std::fread(wave, 1, 4, fp) != 4 ||
        std::memcmp(riff, "RIFF", 4) != 0 ||
        std::memcmp(wave, "WAVE", 4) != 0) {
      std::fclose(fp);
      throw std::runtime_error("not a RIFF/WAVE file: " + filename);
    }
    uint16_t channels = 0, bits = 0, format = 0;
    uint32_t rate = 0;
    // chunk walk
    for (;;) {
      char id[4];
      uint32_t size = 0;
      if (std::fread(id, 1, 4, fp) != 4 || std::fread(&size, 4, 1, fp) != 1)
        break;
      if (std::memcmp(id, "fmt ", 4) == 0) {
        std::vector<char> buf(size);
        if (std::fread(buf.data(), 1, size, fp) != size) break;
        std::memcpy(&format, buf.data(), 2);
        std::memcpy(&channels, buf.data() + 2, 2);
        std::memcpy(&rate, buf.data() + 4, 4);
        std::memcpy(&bits, buf.data() + 14, 2);
      } else if (std::memcmp(id, "data", 4) == 0) {
        if (bits != 16)
          throw std::runtime_error("only PCM16 supported");
        size_t n = size / 2;
        std::vector<int16_t> pcm(n);
        size_t got = std::fread(pcm.data(), 2, n, fp);
        num_channels_ = channels;
        sample_rate_ = static_cast<int>(rate);
        size_t frames = got / channels;
        data_.resize(frames);
        for (size_t i = 0; i < frames; ++i)
          data_[i] = static_cast<float>(pcm[i * channels]);  // first channel
        break;
      } else {
        std::fseek(fp, size, SEEK_CUR);
      }
    }
    std::fclose(fp);
  }

  int sample_rate() const { return sample_rate_; }
  int num_channels() const { return num_channels_; }
  const std::vector<float>& data() const { return data_; }  // int16 range

 private:
  int sample_rate_ = 0;
  int num_channels_ = 0;
  std::vector<float> data_;
};

}  // namespace wespeaker_tpu

#endif  // WESPEAKER_TPU_FRONTEND_WAV_H_
