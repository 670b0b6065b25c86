// Fast WAV (RIFF PCM) reader — native data-loader hot path.
//
// The reference's fastest audio backend was scipy's wav reader
// (README.md:220-233: ~300 us per 5-s file); this is the C++ equivalent for
// the dataloader: one open+read, chunked RIFF parse, direct int16->float32
// conversion and optional downmix, no Python object churn. Exposed via
// ctypes (convasr_tpu/audio/io.py backend='native').
//
// Supports: PCM 16-bit and IEEE float32, arbitrary channel count,
// RIFF chunks in any order. Build: g++ -O3 -shared -fPIC.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct WavInfo {
  int32_t sample_rate = 0;
  int16_t num_channels = 0;
  int16_t format = 0;        // 1 = PCM, 3 = IEEE float
  int16_t bits = 0;
  int64_t num_frames = 0;
  int64_t data_offset = 0;
  int64_t data_bytes = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  char tag[4];
  uint32_t size;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) != 0) return false;
  if (std::fread(&size, 4, 1, f) != 1) return false;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (std::fread(tag, 1, 4, f) == 4 && std::fread(&size, 4, 1, f) == 1) {
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      struct { uint16_t format, channels; uint32_t rate, byte_rate;
               uint16_t block_align, bits; } fmt;
      if (size < sizeof(fmt) || std::fread(&fmt, sizeof(fmt), 1, f) != 1) return false;
      if (size > sizeof(fmt)) std::fseek(f, size - sizeof(fmt), SEEK_CUR);
      info->format = fmt.format;
      info->num_channels = fmt.channels;
      info->sample_rate = fmt.rate;
      info->bits = fmt.bits;
      have_fmt = true;
    } else if (std::memcmp(tag, "data", 4) == 0) {
      info->data_offset = std::ftell(f);
      info->data_bytes = size;
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);  // chunks are 2-byte aligned
    } else {
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);
    }
  }
  if (!have_fmt || info->data_offset == 0 || info->num_channels == 0) return false;
  int bytes_per_sample = info->bits / 8;
  if (bytes_per_sample == 0) return false;
  info->num_frames = info->data_bytes / (bytes_per_sample * info->num_channels);
  return (info->format == 1 && info->bits == 16) ||
         (info->format == 3 && info->bits == 32);
}

}  // namespace

extern "C" {

// Probe: returns 0 on success; fills sample_rate/num_channels/num_frames.
int wav_probe(const char* path, int32_t* sample_rate, int32_t* num_channels,
              int64_t* num_frames) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = parse_header(f, &info);
  std::fclose(f);
  if (!ok) return -2;
  *sample_rate = info.sample_rate;
  *num_channels = info.num_channels;
  *num_frames = info.num_frames;
  return 0;
}

// Read into caller-allocated float32 buffer shaped (num_channels, num_frames)
// channel-major (or (1, num_frames) when mono != 0: downmix by mean).
// begin/count select a frame range (count < 0 = to end). Returns frames read.
int64_t wav_read(const char* path, float* out, int mono, int64_t begin,
                 int64_t count) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) { std::fclose(f); return -2; }
  if (begin < 0) begin = 0;
  if (begin > info.num_frames) begin = info.num_frames;
  int64_t frames = (count < 0) ? info.num_frames - begin
                               : std::min<int64_t>(count, info.num_frames - begin);
  const int C = info.num_channels;
  const int bps = info.bits / 8;
  std::fseek(f, info.data_offset + begin * bps * C, SEEK_SET);

  const int64_t CHUNK = 1 << 16;
  std::vector<char> buf(CHUNK * bps * C);
  const float inv = 1.0f / 32767.0f;
  int64_t done = 0;
  while (done < frames) {
    int64_t want = std::min(CHUNK, frames - done);
    int64_t got = std::fread(buf.data(), bps * C, want, f);
    if (got <= 0) break;
    if (info.format == 1) {  // int16
      const int16_t* s = reinterpret_cast<const int16_t*>(buf.data());
      if (mono && C > 1) {
        for (int64_t i = 0; i < got; ++i) {
          float acc = 0.0f;
          for (int c = 0; c < C; ++c) acc += s[i * C + c] * inv;
          out[done + i] = acc / C;
        }
      } else {
        for (int c = 0; c < C; ++c)
          for (int64_t i = 0; i < got; ++i)
            out[c * frames + done + i] = s[i * C + c] * inv;
      }
    } else {  // float32
      const float* s = reinterpret_cast<const float*>(buf.data());
      if (mono && C > 1) {
        for (int64_t i = 0; i < got; ++i) {
          float acc = 0.0f;
          for (int c = 0; c < C; ++c) acc += s[i * C + c];
          out[done + i] = acc / C;
        }
      } else {
        for (int c = 0; c < C; ++c)
          for (int64_t i = 0; i < got; ++i)
            out[c * frames + done + i] = s[i * C + c];
      }
    }
    done += got;
  }
  std::fclose(f);
  return done;
}

}  // extern "C"
