// From-scratch FLAC decoder (the free lossless audio codec format spec).
//
// Role: same as native/mp3dec.cpp — the reference ingests flac through
// torchaudio/ffmpeg (its bundled voice prompts are .flac:
// reference src/f5_tts/infer/examples/multi/*.flac); this repo's native
// input pipeline decodes it directly.
//
// Supports: all block sizes, sample rates, 8/12/16/20/24-bit, 1-8 channels,
// all stereo decorrelation modes (L/S, R/S, M/S), constant / verbatim /
// fixed(0-4) / LPC(1-32) subframes, both Rice residual methods including
// escape partitions, wasted bits, and UTF-8 frame numbering.
//
// Validation (tests/test_native_audio.py): exact round-trip against a
// freshly written Python FLAC encoder (tests/oracles/flac_encoder.py), and
// sample-exact comparison with SDL_mixer's decoder on the reference repo's
// real .flac assets.

#include <cstdint>
#include <cstring>
#include <vector>

#include "decoders.h"

namespace {

struct Bits {
  const uint8_t* p;
  size_t nbits;
  size_t pos = 0;
  bool overrun = false;

  Bits(const uint8_t* data, size_t nbytes) : p(data), nbits(nbytes * 8) {}

  uint32_t get(int n) {  // n <= 32
    uint64_t v = 0;
    int need = n;
    while (need > 0) {
      if (pos >= nbits) {
        overrun = true;
        return static_cast<uint32_t>(v << need);
      }
      int avail = 8 - static_cast<int>(pos & 7);
      int take = need < avail ? need : avail;
      int shift = avail - take;
      v = (v << take) | ((p[pos >> 3] >> shift) & ((1u << take) - 1));
      pos += take;
      need -= take;
    }
    return static_cast<uint32_t>(v);
  }
  uint64_t get64(int n) {
    uint64_t v = 0;
    if (n > 32) {
      v = get(n - 32);
      v = (v << 32) | get(32);
    } else {
      v = get(n);
    }
    return v;
  }
  int32_t get_signed(int n) {
    uint32_t v = get(n);
    if (n == 0) return 0;
    if (v & (1u << (n - 1))) return static_cast<int32_t>(v | (~0u << n));
    return static_cast<int32_t>(v);
  }
  uint32_t unary() {
    uint32_t q = 0;
    while (!overrun && get(1) == 0) ++q;
    return q;
  }
  void align() { pos = (pos + 7) & ~size_t(7); }
};

int32_t zigzag(uint32_t v) {
  return static_cast<int32_t>(v >> 1) ^ -static_cast<int32_t>(v & 1);
}

bool read_residual(Bits& b, int block_size, int pred_order, int32_t* res) {
  int method = b.get(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  int escape = method == 0 ? 15 : 31;
  int po = b.get(4);
  int nparts = 1 << po;
  if (block_size % nparts) return false;
  int psize = block_size >> po;
  int idx = pred_order;
  for (int part = 0; part < nparts; ++part) {
    int count = psize - (part == 0 ? pred_order : 0);
    if (count < 0) return false;
    int param = b.get(plen);
    if (param == escape) {
      int bits = b.get(5);
      for (int i = 0; i < count; ++i) res[idx++] = bits ? b.get_signed(bits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = b.unary();
        uint32_t r = param ? b.get(param) : 0;
        res[idx++] = zigzag((q << param) | r);
      }
    }
    if (b.overrun) return false;
  }
  return true;
}

bool read_subframe(Bits& b, int block_size, int bps, std::vector<int64_t>& out) {
  if (b.get(1) != 0) return false;  // padding bit
  int type = b.get(6);
  int wasted = 0;
  if (b.get(1)) wasted = 1 + b.unary();
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;
  out.assign(block_size, 0);
  std::vector<int32_t> res(block_size);
  if (type == 0) {  // constant
    int32_t v = b.get_signed(bps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < block_size; ++i) out[i] = b.get_signed(bps);
  } else if (type >= 8 && type <= 12) {  // fixed, order = type - 8
    int order = type - 8;
    if (order > block_size) return false;
    for (int i = 0; i < order; ++i) out[i] = b.get_signed(bps);
    if (!read_residual(b, block_size, order, res.data())) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4]; break;
      }
      out[i] = p + res[i];
    }
  } else if (type >= 32) {  // LPC, order = (type & 31) + 1
    int order = (type & 31) + 1;
    if (order > block_size) return false;
    for (int i = 0; i < order; ++i) out[i] = b.get_signed(bps);
    int precision = b.get(4) + 1;
    if (precision > 16) return false;
    int shift = b.get_signed(5);
    if (shift < 0) return false;
    int32_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = b.get_signed(precision);
    if (!read_residual(b, block_size, order, res.data())) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += static_cast<int64_t>(coef[j]) * out[i - 1 - j];
      out[i] = (acc >> shift) + res[i];
    }
  } else {
    return false;  // reserved
  }
  if (wasted)
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  return !b.overrun;
}

uint64_t read_utf8(Bits& b) {
  uint32_t c = b.get(8);
  if (c < 0x80) return c;
  int n = 0;
  while (c & 0x40) {
    ++n;
    c <<= 1;
  }
  uint64_t v = (c & 0x7F) >> n;
  for (int i = 0; i < n; ++i) v = (v << 6) | (b.get(8) & 0x3F);
  return v;
}

}  // namespace

bool flac_decode_stream(const uint8_t* data, size_t size, std::vector<float>& mono,
                        int* sample_rate) {
  size_t pos = 0;
  if (size >= 10 && !memcmp(data, "ID3", 3)) {  // some taggers prepend ID3
    size_t sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) |
                ((data[8] & 0x7F) << 7) | (data[9] & 0x7F);
    pos = 10 + sz + ((data[5] & 0x10) ? 10 : 0);
  }
  if (pos + 4 > size || memcmp(data + pos, "fLaC", 4)) return false;
  pos += 4;
  int si_rate = 0, si_channels = 0, si_bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  while (!last && pos + 4 <= size) {
    last = data[pos] & 0x80;
    int type = data[pos] & 0x7F;
    size_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > size) return false;
    if (type == 0 && len >= 34) {  // STREAMINFO
      Bits b(data + pos, len);
      b.get(16);  // min block
      b.get(16);  // max block
      b.get(24);  // min frame
      b.get(24);  // max frame
      si_rate = b.get(20);
      si_channels = b.get(3) + 1;
      si_bps = b.get(5) + 1;
      total_samples = b.get64(36);
    }
    pos += len;
  }
  if (!si_rate || !si_channels) return false;
  *sample_rate = si_rate;
  mono.clear();
  if (total_samples) mono.reserve(static_cast<size_t>(total_samples));

  std::vector<int64_t> ch[8];
  static const int kBlock[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                 256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
  while (pos + 2 <= size) {
    // frame sync: 11111111 111110xx
    if (data[pos] != 0xFF || (data[pos + 1] & 0xFC) != 0xF8) {
      ++pos;  // resync
      continue;
    }
    Bits b(data + pos, size - pos);
    b.get(14);             // sync
    b.get(1);              // reserved
    b.get(1);              // blocking strategy
    int bs_code = b.get(4);
    int sr_code = b.get(4);
    int ch_code = b.get(4);
    int ss_code = b.get(3);
    b.get(1);  // reserved
    read_utf8(b);
    int block_size = kBlock[bs_code];
    if (block_size == 0) {
      ++pos;
      continue;
    }
    if (block_size == -1) block_size = b.get(8) + 1;
    if (block_size == -2) block_size = b.get(16) + 1;
    if (sr_code == 12) b.get(8);
    if (sr_code == 13 || sr_code == 14) b.get(16);
    static const int kBps[8] = {0, 8, 12, 0, 16, 20, 24, 32};
    int bps = ss_code == 0 ? si_bps : kBps[ss_code];
    if (!bps) {
      ++pos;
      continue;
    }
    b.get(8);  // CRC-8 (not verified; next-frame sync scan recovers)
    int nch = ch_code < 8 ? ch_code + 1 : 2;
    if (ch_code > 10) {
      ++pos;
      continue;
    }
    bool ok = true;
    for (int c = 0; c < nch && ok; ++c) {
      int cbps = bps;
      if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) || (ch_code == 10 && c == 1))
        ++cbps;  // side channel carries one extra bit
      ok = read_subframe(b, block_size, cbps, ch[c]);
    }
    if (!ok || b.overrun) {
      ++pos;
      continue;
    }
    b.align();
    b.get(16);  // CRC-16
    if (b.overrun) break;
    // stereo decorrelation
    if (ch_code == 8) {  // left/side
      for (int i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_code == 9) {  // side/right
      for (int i = 0; i < block_size; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t s = ch[1][i];
        int64_t m = (ch[0][i] << 1) | (s & 1);
        ch[0][i] = (m + s) >> 1;
        ch[1][i] = (m - s) >> 1;
      }
    }
    float scale = 1.0f / static_cast<float>(1u << (bps - 1));
    size_t base = mono.size();
    mono.resize(base + block_size);
    for (int i = 0; i < block_size; ++i) {
      double acc = 0.0;
      for (int c = 0; c < nch; ++c) acc += static_cast<double>(ch[c][i]);
      mono[base + i] = static_cast<float>(acc / nch * scale);
    }
    pos += (b.pos + 7) / 8;
  }
  if (total_samples && mono.size() > total_samples)
    mono.resize(static_cast<size_t>(total_samples));
  return !mono.empty();
}

extern "C" {

long flac_decode_mono_buf(const unsigned char* data, long size, float* out, long max_len,
                          int* sr) {
  std::vector<float> mono;
  int rate = 0;
  if (!flac_decode_stream(data, static_cast<size_t>(size), mono, &rate)) return -1;
  if (sr) *sr = rate;
  long n = static_cast<long>(mono.size());
  if (out) {
    long m = n < max_len ? n : max_len;
    memcpy(out, mono.data(), m * sizeof(float));
    return m;
  }
  return n;
}

}  // extern "C"
