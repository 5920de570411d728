// Native WAV decode + batch assembly.
//
// TPU-native replacement for the reference's libsndfile/sox decode path
// (reference data.py:273-292,478). Exposed to Python via ctypes (see
// tpu_slu/native/__init__.py). Two entry points:
//
//   wav_decode:       one file -> float32 [-1,1) first channel
//   wav_decode_batch: N files decoded on a thread pool straight into a
//                     caller-provided zero-padded (batch, T) buffer — the
//                     collate step becomes a single native call with no GIL
//                     contention and no intermediate copies.
//
// Build: g++ -O3 -shared -fPIC -o _libwavload.so wavload.cc -lpthread

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM, 3 = IEEE float
  const uint8_t* data = nullptr;
  size_t data_len = 0;           // clipped to the parsed buffer
  size_t declared_data_len = 0;  // the chunk header's size field
  size_t data_offset = 0;        // byte offset of the data payload in the file
};

bool parse_riff(const uint8_t* buf, size_t n, WavInfo* info) {
  if (n < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= n) {
    uint32_t size;
    memcpy(&size, buf + pos + 4, 4);
    const uint8_t* body = buf + pos + 8;
    size_t body_len = size;
    if (pos + 8 + body_len > n) body_len = n - pos - 8;
    if (memcmp(buf + pos, "fmt ", 4) == 0 && body_len >= 16) {
      uint16_t fmt, ch, bits;
      uint32_t rate;
      memcpy(&fmt, body, 2);
      memcpy(&ch, body + 2, 2);
      memcpy(&rate, body + 4, 4);
      memcpy(&bits, body + 14, 2);
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = (int)rate;
      info->bits = bits;
      if (fmt == 0xFFFE) info->format = (bits == 32 || bits == 64) ? 3 : 1;
      have_fmt = true;
    } else if (memcmp(buf + pos, "data", 4) == 0) {
      info->data = body;
      info->data_len = body_len;
      info->declared_data_len = size;
      info->data_offset = pos + 8;
      have_data = true;
    }
    pos += 8 + size + (size & 1);  // word-aligned chunks
  }
  return have_fmt && have_data && info->channels > 0;
}

// Decode first channel into out[0..max_out). Returns frames written, -1 on error.
int64_t decode_buffer(const uint8_t* buf, size_t n, float* out, int64_t max_out,
                      int* sample_rate) {
  WavInfo info;
  if (!parse_riff(buf, n, &info)) return -1;
  *sample_rate = info.sample_rate;
  const int ch = info.channels;
  int64_t frames = 0;
  if (info.format == 1 && info.bits == 16) {
    frames = (int64_t)(info.data_len / 2 / ch);
    if (frames > max_out) frames = max_out;
    const int16_t* s = (const int16_t*)info.data;
    for (int64_t i = 0; i < frames; ++i) out[i] = s[i * ch] * (1.0f / 32768.0f);
  } else if (info.format == 1 && info.bits == 32) {
    frames = (int64_t)(info.data_len / 4 / ch);
    if (frames > max_out) frames = max_out;
    const int32_t* s = (const int32_t*)info.data;
    for (int64_t i = 0; i < frames; ++i)
      out[i] = (float)(s[i * ch] * (1.0 / 2147483648.0));
  } else if (info.format == 1 && info.bits == 24) {
    frames = (int64_t)(info.data_len / 3 / ch);
    if (frames > max_out) frames = max_out;
    const uint8_t* s = info.data;
    for (int64_t i = 0; i < frames; ++i) {
      const uint8_t* p = s + (size_t)(i * ch) * 3;
      int32_t v = (int32_t)(p[0] | (p[1] << 8) | (p[2] << 16));
      v = (v ^ 0x800000) - 0x800000;
      out[i] = (float)(v * (1.0 / 8388608.0));
    }
  } else if (info.format == 1 && info.bits == 8) {
    frames = (int64_t)(info.data_len / ch);
    if (frames > max_out) frames = max_out;
    for (int64_t i = 0; i < frames; ++i)
      out[i] = ((int)info.data[i * ch] - 128) * (1.0f / 128.0f);
  } else if (info.format == 3 && info.bits == 32) {
    frames = (int64_t)(info.data_len / 4 / ch);
    if (frames > max_out) frames = max_out;
    const float* s = (const float*)info.data;
    for (int64_t i = 0; i < frames; ++i) out[i] = s[i * ch];
  } else if (info.format == 3 && info.bits == 64) {
    frames = (int64_t)(info.data_len / 8 / ch);
    if (frames > max_out) frames = max_out;
    const double* s = (const double*)info.data;
    for (int64_t i = 0; i < frames; ++i) out[i] = (float)s[i * ch];
  } else {
    return -1;
  }
  return frames;
}

int64_t decode_file(const char* path, float* out, int64_t max_out, int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return -1;
  }
  std::vector<uint8_t> buf((size_t)n);
  size_t got = fread(buf.data(), 1, (size_t)n, f);
  fclose(f);
  if (got != (size_t)n) return -1;
  return decode_buffer(buf.data(), buf.size(), out, max_out, sample_rate);
}

}  // namespace

extern "C" {

// Single-file decode. Returns frames written (clipped to max_out) or -1.
int64_t wav_decode(const char* path, float* out, int64_t max_out, int* sample_rate) {
  return decode_file(path, out, max_out, sample_rate);
}

// Frame count + sample rate without decoding (header only).
int64_t wav_info(const char* path, int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t head[65536];
  size_t n = fread(head, 1, sizeof(head), f);
  long total;
  fseek(f, 0, SEEK_END);
  total = ftell(f);
  fclose(f);
  WavInfo info;
  if (!parse_riff(head, n, &info)) {
    // chunks past the 64 KB header read: fall back to a full read
    f = fopen(path, "rb");
    if (!f) return -1;
    std::vector<uint8_t> buf((size_t)total);
    size_t got = fread(buf.data(), 1, (size_t)total, f);
    fclose(f);
    if (got != (size_t)total || !parse_riff(buf.data(), got, &info)) return -1;
  }
  *sample_rate = info.sample_rate;
  // The data payload may extend past whatever buffer we parsed: size it from
  // the chunk header, clipped to the file.
  size_t avail = (size_t)total > info.data_offset ? (size_t)total - info.data_offset : 0;
  size_t len = info.declared_data_len < avail ? info.declared_data_len : avail;
  int bytes = (info.bits / 8) * info.channels;
  return bytes > 0 ? (int64_t)(len / bytes) : -1;
}

// Batch decode: n files onto a thread pool, each zero-padded row of `out`
// (row stride `stride` floats). lengths[i] receives the true frame count,
// rates[i] the sample rate. Returns 0 on success, else a bitmask-free count
// of failed files (their rows are zeroed, lengths[i] = -1).
int wav_decode_batch(const char** paths, int n, float* out, int64_t stride,
                     int64_t* lengths, int* rates, int num_threads) {
  if (num_threads <= 0) num_threads = (int)std::thread::hardware_concurrency();
  if (num_threads > n) num_threads = n > 0 ? n : 1;
  std::vector<std::thread> workers;
  std::vector<int> failures(num_threads, 0);
  for (int w = 0; w < num_threads; ++w) {
    workers.emplace_back([&, w]() {
      for (int i = w; i < n; i += num_threads) {
        float* row = out + (size_t)i * (size_t)stride;
        memset(row, 0, (size_t)stride * sizeof(float));
        int64_t frames = decode_file(paths[i], row, stride, &rates[i]);
        lengths[i] = frames;
        if (frames < 0) failures[w]++;
      }
    });
  }
  for (auto& t : workers) t.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}
}
