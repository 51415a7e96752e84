// mrgen_io: native audio IO for the TPU framework's host data pipeline.
//
// The reference delegates audio decode to libsndfile via torchaudio
// (audio.py:26) and pays Python-loop costs per segment; this library
// performs the dataloader's hot path natively: batched PCM16 WAV slice
// reads decoded straight into a caller-provided float32 buffer
// (one call per batch instead of per segment), plus framed energy for
// host-side VAD prefiltering.
//
// Build: make -C native        (produces libmrgen_io.so)
// Python binding: multimodalreactiongeneration_tpu/utils/native_io.py (ctypes)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  long data_offset = 0;   // byte offset of sample payload
  uint64_t data_frames = 0;
};

// Minimal RIFF walker (PCM16 only). Returns 0 on success.
int parse_header(FILE* f, WavInfo* info) {
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return -1;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) return -2;
  unsigned char chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      unsigned char fmt[16];
      if (size < 16 || fread(fmt, 1, 16, f) != 16) return -3;
      uint16_t audio_format;
      memcpy(&audio_format, fmt, 2);
      memcpy(&info->channels, fmt + 2, 2);
      memcpy(&info->sample_rate, fmt + 4, 4);
      memcpy(&info->bits, fmt + 14, 2);
      if (audio_format != 1 || info->bits != 16) return -4;
      if (size > 16) fseek(f, (long)(size - 16 + (size & 1)), SEEK_CUR);
    } else if (memcmp(chunk, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_frames = size / (2ULL * (info->channels ? info->channels : 1));
      return 0;
    } else {
      fseek(f, (long)(size + (size & 1)), SEEK_CUR);
    }
  }
  return -5;
}

constexpr float kScale = 1.0f / 32768.0f;

}  // namespace

extern "C" {

// Returns sample_rate (>0) or a negative error; fills frames/channels.
int mrgen_wav_info(const char* path, long* frames, int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  WavInfo info;
  int rc = parse_header(f, &info);
  fclose(f);
  if (rc != 0) return rc;
  *frames = (long)info.data_frames;
  *channels = (int)info.channels;
  return (int)info.sample_rate;
}

// Read `frames` mono-ized float32 samples starting at `start` (channel 0
// when multichannel). Zero-pads past EOF. Returns frames actually read
// from the file (>=0) or a negative error.
long mrgen_read_f32(const char* path, long start, long frames, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  WavInfo info;
  int rc = parse_header(f, &info);
  if (rc != 0) { fclose(f); return rc; }
  const int ch = info.channels ? info.channels : 1;
  long avail = 0;
  if (start < (long)info.data_frames) {
    avail = (long)info.data_frames - start;
    if (avail > frames) avail = frames;
  }
  if (avail > 0) {
    fseek(f, info.data_offset + start * 2L * ch, SEEK_SET);
    std::vector<int16_t> buf((size_t)avail * ch);
    size_t got = fread(buf.data(), 2, (size_t)avail * ch, f);
    long got_frames = (long)(got / ch);
    for (long i = 0; i < got_frames; ++i) out[i] = buf[(size_t)i * ch] * kScale;
    avail = got_frames;
  }
  fclose(f);
  for (long i = avail < 0 ? 0 : avail; i < frames; ++i) out[i] = 0.0f;
  return avail;
}

// Batched slice read: n segments, possibly from different files, decoded
// into one contiguous (n, frames) float32 buffer. paths is a flat array of
// NUL-terminated strings back to back; offsets[i] indexes each string.
// Returns 0 on success, or -(i+1) for the first failing segment.
long mrgen_read_batch_f32(const char* paths, const long* path_offsets,
                          const long* starts, long frames, long n,
                          float* out) {
  for (long i = 0; i < n; ++i) {
    long rc = mrgen_read_f32(paths + path_offsets[i], starts[i], frames,
                             out + i * frames);
    if (rc < 0) return -(i + 1);
  }
  return 0;
}

// Raw-PCM16 variant of mrgen_read_f32: channel 0, no float conversion.
// The train collate uploads these straight to the accelerator and scales
// by 1/2^15 in-graph (exact in float32), halving host-link bytes.
long mrgen_read_i16(const char* path, long start, long frames,
                    int16_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  WavInfo info;
  int rc = parse_header(f, &info);
  if (rc != 0) { fclose(f); return rc; }
  const int ch = info.channels ? info.channels : 1;
  long avail = 0;
  if (start < (long)info.data_frames) {
    avail = (long)info.data_frames - start;
    if (avail > frames) avail = frames;
  }
  if (avail > 0) {
    fseek(f, info.data_offset + start * 2L * ch, SEEK_SET);
    if (ch == 1) {
      size_t got = fread(out, 2, (size_t)avail, f);
      avail = (long)got;
    } else {
      std::vector<int16_t> buf((size_t)avail * ch);
      size_t got = fread(buf.data(), 2, (size_t)avail * ch, f);
      long got_frames = (long)(got / ch);
      for (long i = 0; i < got_frames; ++i) out[i] = buf[(size_t)i * ch];
      avail = got_frames;
    }
  }
  fclose(f);
  for (long i = avail < 0 ? 0 : avail; i < frames; ++i) out[i] = 0;
  return avail;
}

long mrgen_read_batch_i16(const char* paths, const long* path_offsets,
                          const long* starts, long frames, long n,
                          int16_t* out) {
  for (long i = 0; i < n; ++i) {
    long rc = mrgen_read_i16(paths + path_offsets[i], starts[i], frames,
                             out + i * frames);
    if (rc < 0) return -(i + 1);
  }
  return 0;
}

// Framed energy (un-windowed): writes (len-n_fft)/hop + 1 values and
// returns the frame count. Production caller: the databuild VAD
// (data/segmentation.py compute_log_power) when this library is built.
// Each window is summed independently in the same left-to-right float32
// order as the numpy fallback (tests/test_native_io.py pins equality) —
// the accumulation order matters because VAD thresholds define dataset
// turn boundaries.
long mrgen_frame_energy(const float* wave, long len, long n_fft, long hop,
                        float* out) {
  if (len < n_fft) return 0;
  long num = (len - n_fft) / hop + 1;
  // each window summed independently (windows overlap n_fft-hop
  // samples; a true rolling sum would drift in float32)
  for (long t = 0; t < num; ++t) {
    const float* w = wave + t * hop;
    float acc = 0.0f;
    for (long k = 0; k < n_fft; ++k) acc += w[k] * w[k];
    out[t] = acc;
  }
  return num;
}

}  // extern "C"
