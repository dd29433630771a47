// From-scratch MPEG-1/2/2.5 Layer III decoder (ISO/IEC 11172-3 + 13818-3 LSF).
//
// Role: the reference framework decodes its pretraining corpus (Emilia is
// mp3 — reference src/f5_tts/train/datasets/prepare_emilia_v2.py:35) through
// torchaudio/ffmpeg inside DataLoader workers.  This repo's input pipeline is
// native C++ off the GIL (native/audioio.cpp), so mp3 decode is implemented
// here directly — no ffmpeg/torchaudio dependency.
//
// Constant tables (Huffman codes, scalefactor bands, synthesis window) are
// pure ISO spec data in native/mp3_tables.inc, extracted from the system
// codec binaries by scripts/extract_mp3_tables.py and verified as complete
// prefix codes.  The decode math below (side info, bit reservoir, requant,
// MS/intensity stereo, alias reduction, IMDCT, polyphase synthesis) is
// written from the spec's algorithm descriptions.
//
// Validation: tests/test_native_audio.py compares against libmpg123 (ctypes
// oracle) on LAME-encoded fixtures over all 9 sample rates, mono/stereo,
// CBR/VBR — plus the in-image real-world mp3 assets.

#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <vector>

#include "decoders.h"
#include "mp3_tables.inc"

namespace {

// ---------------------------------------------------------------- bitstream

struct Bits {
  const uint8_t* p = nullptr;
  size_t nbits = 0;
  size_t pos = 0;  // in bits
  bool overrun = false;

  Bits() = default;
  Bits(const uint8_t* data, size_t nbytes) : p(data), nbits(nbytes * 8) {}

  uint32_t get(int n) {
    uint32_t v = 0;
    while (n > 0) {
      if (pos >= nbits) {
        overrun = true;
        return v << n;  // zero-pad past the end
      }
      int avail = 8 - (pos & 7);
      int take = n < avail ? n : avail;
      int shift = avail - take;
      v = (v << take) | ((p[pos >> 3] >> shift) & ((1u << take) - 1));
      pos += take;
      n -= take;
    }
    return v;
  }
  uint32_t get1() { return get(1); }
};

// ---------------------------------------------------------------- header

struct FrameInfo {
  int version;   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
  int sr;
  int sr_idx;    // row in kSfbRates
  int bitrate;   // bits/s
  int channels, mode, mode_ext;
  int crc;
  int frame_bytes, side_bytes, granules;
};

bool parse_header(const uint8_t* p, size_t avail, FrameInfo& f) {
  if (avail < 4) return false;
  if (p[0] != 0xFF || (p[1] & 0xE0) != 0xE0) return false;
  int ver = (p[1] >> 3) & 3;          // 0=2.5, 1=reserved, 2=2, 3=1
  int layer = (p[1] >> 1) & 3;        // 1 = Layer III
  if (ver == 1 || layer != 1) return false;
  int bidx = p[2] >> 4;
  int sidx = (p[2] >> 2) & 3;
  if (bidx == 0 || bidx == 15 || sidx == 3) return false;  // free-format unsupported
  static const int kSr1[3] = {44100, 48000, 32000};
  f.version = ver;
  f.sr = kSr1[sidx] >> (ver == 3 ? 0 : ver == 2 ? 1 : 2);
  static const int kBr1[15] = {0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320};
  static const int kBr2[15] = {0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160};
  f.bitrate = (ver == 3 ? kBr1 : kBr2)[bidx] * 1000;
  int padding = (p[2] >> 1) & 1;
  f.crc = !(p[1] & 1);
  f.mode = (p[3] >> 6) & 3;
  f.mode_ext = (p[3] >> 4) & 3;
  f.channels = f.mode == 3 ? 1 : 2;
  f.granules = ver == 3 ? 2 : 1;
  f.frame_bytes = (ver == 3 ? 144 : 72) * f.bitrate / f.sr + padding;
  f.side_bytes = ver == 3 ? (f.channels == 1 ? 17 : 32) : (f.channels == 1 ? 9 : 17);
  f.sr_idx = -1;
  for (int i = 0; i < 9; ++i)
    if (kSfbRates[i] == f.sr) f.sr_idx = i;
  return f.sr_idx >= 0 && f.frame_bytes > 4 + f.side_bytes + 2 * f.crc;
}

// ---------------------------------------------------------------- side info

struct Granule {
  int part2_3_length, big_values, global_gain, scalefac_compress;
  int window_switching, block_type, mixed_block_flag;
  int table_select[3], subblock_gain[3];
  int region0_count, region1_count;
  int preflag, scalefac_scale, count1table_select;
};

struct SideInfo {
  int main_data_begin;
  int scfsi[2][4];
  Granule gr[2][2];  // [granule][channel]
};

bool read_side_info(Bits& b, const FrameInfo& f, SideInfo& si) {
  si.main_data_begin = b.get(f.version == 3 ? 9 : 8);
  b.get(f.version == 3 ? (f.channels == 1 ? 5 : 3) : (f.channels == 1 ? 1 : 2));
  if (f.version == 3)
    for (int ch = 0; ch < f.channels; ++ch)
      for (int i = 0; i < 4; ++i) si.scfsi[ch][i] = b.get1();
  else
    memset(si.scfsi, 0, sizeof(si.scfsi));
  for (int g = 0; g < f.granules; ++g) {
    for (int ch = 0; ch < f.channels; ++ch) {
      Granule& gi = si.gr[g][ch];
      gi.part2_3_length = b.get(12);
      gi.big_values = b.get(9);
      if (gi.big_values > 288) return false;
      gi.global_gain = b.get(8);
      gi.scalefac_compress = b.get(f.version == 3 ? 4 : 9);
      gi.window_switching = b.get1();
      if (gi.window_switching) {
        gi.block_type = b.get(2);
        gi.mixed_block_flag = b.get1();
        gi.table_select[0] = b.get(5);
        gi.table_select[1] = b.get(5);
        gi.table_select[2] = 0;
        for (int w = 0; w < 3; ++w) gi.subblock_gain[w] = b.get(3);
        if (gi.block_type == 0) return false;  // forbidden
        gi.region0_count = (gi.block_type == 2 && !gi.mixed_block_flag) ? 8 : 7;
        gi.region1_count = 36;  // "rest"
      } else {
        gi.block_type = 0;
        gi.mixed_block_flag = 0;
        for (int r = 0; r < 3; ++r) gi.table_select[r] = b.get(5);
        for (int w = 0; w < 3; ++w) gi.subblock_gain[w] = 0;
        gi.region0_count = b.get(4);
        gi.region1_count = b.get(3);
      }
      gi.preflag = f.version == 3 ? b.get1() : 0;  // LSF: derived from scalefac_compress
      gi.scalefac_scale = b.get1();
      gi.count1table_select = b.get1();
    }
  }
  return !b.overrun;
}

// ---------------------------------------------------------------- huffman

// Flat binary tree per distinct code table, built once at startup from the
// (code, length) pairs.  node >= 0: internal, value = index of left child
// (right child at +1); node < 0: leaf, entry index = -(node + 1).
struct HuffTree {
  std::vector<int32_t> nodes;

  void build(const unsigned short* codes, const unsigned char* lens, int n) {
    nodes.assign(2, 0x7FFFFFFF);
    for (int e = 0; e < n; ++e) {
      uint32_t code = codes[e];
      int len = lens[e];
      int node = 0;
      for (int d = len - 1; d >= 0; --d) {
        int bit = (code >> d) & 1;
        int slot = node + bit;
        if (d == 0) {
          nodes[slot] = -(e + 1);
        } else {
          if (nodes[slot] == 0x7FFFFFFF) {
            nodes[slot] = static_cast<int32_t>(nodes.size());
            nodes.push_back(0x7FFFFFFF);
            nodes.push_back(0x7FFFFFFF);
          }
          node = nodes[slot];
        }
      }
    }
  }

  int decode(Bits& b) const {
    int node = 0;
    for (int guard = 0; guard < 20; ++guard) {
      int32_t v = nodes[node + b.get1()];
      if (v < 0) return -(v + 1);
      if (v == 0x7FFFFFFF) return -1;
      node = v;
    }
    return -1;
  }
};

struct HuffSet {
  HuffTree trees[34];
  HuffSet() {
    for (int t = 0; t < 34; ++t)
      if (kHuffTabs[t].codes) {
        int n = t < 32 ? kHuffXlen[t] * kHuffXlen[t] : 16;
        trees[t].build(kHuffTabs[t].codes, kHuffTabs[t].lens, n);
      }
  }
};
const HuffSet& huffset() {
  static const HuffSet hs;
  return hs;
}

// ---------------------------------------------------------------- tables

struct Tables {
  float pow43[8208];      // i^(4/3)
  float imdct36[36][18];  // cos(pi/72 (2i+19)(2k+1))
  float imdct12[12][6];
  float win[4][36];       // block type 0,1,2(short unit),3 windows
  float synth_n[64][32];  // cos((16+i)(2k+1) pi/64)
  float dwin[512];        // ISO B.3 synthesis window
  float cs[8], ca[8];     // alias butterflies

  Tables() {
    for (int i = 0; i < 8208; ++i) pow43[i] = powf(static_cast<float>(i), 4.0f / 3.0f);
    for (int i = 0; i < 36; ++i)
      for (int k = 0; k < 18; ++k)
        imdct36[i][k] = cosf(static_cast<float>(M_PI) / 72.0f * (2 * i + 19) * (2 * k + 1));
    for (int i = 0; i < 12; ++i)
      for (int k = 0; k < 6; ++k)
        imdct12[i][k] = cosf(static_cast<float>(M_PI) / 24.0f * (2 * i + 7) * (2 * k + 1));
    for (int i = 0; i < 36; ++i) win[0][i] = sinf(static_cast<float>(M_PI) / 36.0f * (i + 0.5f));
    for (int i = 0; i < 36; ++i) {  // start
      win[1][i] = i < 18 ? sinf(static_cast<float>(M_PI) / 36.0f * (i + 0.5f))
                : i < 24 ? 1.0f
                : i < 30 ? sinf(static_cast<float>(M_PI) / 12.0f * (i - 18 + 0.5f))
                         : 0.0f;
    }
    for (int i = 0; i < 36; ++i) win[3][i] = win[1][35 - i];  // stop = mirrored start
    for (int i = 0; i < 36; ++i)
      win[2][i] = i < 12 ? sinf(static_cast<float>(M_PI) / 12.0f * (i + 0.5f)) : 0.0f;
    for (int i = 0; i < 64; ++i)
      for (int k = 0; k < 32; ++k)
        synth_n[i][k] = cosf(static_cast<float>(M_PI) / 64.0f * (16 + i) * (2 * k + 1));
    // ISO B.3 synthesis window: symmetric prototype (extracted half-table)
    // with the sign flipped every 64 taps.  The flip pattern falls out of the
    // V/U/W algorithm's slot layout: older V blocks carry cos terms whose
    // phase advances by (2k+1)*pi per two slots, so D must supply
    // (-1)^floor(i/64) for the filter taps to line up with
    // g_k[n] = 32*h[n]*cos((2k+1)(n+16)pi/64).
    for (int i = 0; i < 512; ++i) {
      float proto = kSynthWinHalf[i <= 256 ? i : 512 - i] / 65536.0f;
      dwin[i] = ((i >> 6) & 1) ? -proto : proto;
    }
    static const double ci[8] = {-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037};
    for (int i = 0; i < 8; ++i) {
      double c = 1.0 / std::sqrt(1.0 + ci[i] * ci[i]);
      cs[i] = static_cast<float>(c);
      ca[i] = static_cast<float>(ci[i] * c);
    }
  }
};
const Tables& tables() {
  static const Tables t;
  return t;
}

const int kPretab[22] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0};

// ---------------------------------------------------------------- scalefactors

struct ScaleFactors {
  int l[23];      // long bands (index 21, 22 always 0)
  int s[3][13];   // short bands per window (index 12 always 0)
};

const int kSlen1[16] = {0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4};
const int kSlen2[16] = {0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3};

// MPEG-1 scalefactor read; returns part2 bits consumed.
void read_scalefactors_v1(Bits& b, const Granule& gi, const int scfsi[4],
                          const ScaleFactors* prev, ScaleFactors& sf, bool granule1) {
  memset(&sf, 0, sizeof(sf));
  int s1 = kSlen1[gi.scalefac_compress], s2 = kSlen2[gi.scalefac_compress];
  if (gi.block_type == 2) {
    if (gi.mixed_block_flag) {
      for (int band = 0; band < 8; ++band) sf.l[band] = b.get(s1);
      for (int band = 3; band < 6; ++band)
        for (int w = 0; w < 3; ++w) sf.s[w][band] = b.get(s1);
    } else {
      for (int band = 0; band < 6; ++band)
        for (int w = 0; w < 3; ++w) sf.s[w][band] = b.get(s1);
    }
    for (int band = 6; band < 12; ++band)
      for (int w = 0; w < 3; ++w) sf.s[w][band] = b.get(s2);
  } else {
    static const int kGroups[4][2] = {{0, 6}, {6, 11}, {11, 16}, {16, 21}};
    for (int gidx = 0; gidx < 4; ++gidx) {
      int lo = kGroups[gidx][0], hi = kGroups[gidx][1];
      int slen = gidx < 2 ? s1 : s2;
      if (granule1 && scfsi[gidx] && prev) {
        for (int band = lo; band < hi; ++band) sf.l[band] = prev->l[band];
      } else {
        for (int band = lo; band < hi; ++band) sf.l[band] = b.get(slen);
      }
    }
  }
}

// ISO 13818-3 LSF nr_of_sfb partition table [blocknumber][blocktypenumber][4].
const int kLsfNr[6][3][4] = {
    {{6, 5, 5, 5}, {9, 9, 9, 9}, {6, 9, 9, 9}},
    {{6, 5, 7, 3}, {9, 9, 12, 6}, {6, 9, 12, 6}},
    {{11, 10, 0, 0}, {18, 18, 0, 0}, {15, 18, 0, 0}},
    {{7, 7, 7, 0}, {12, 12, 12, 0}, {6, 15, 12, 0}},
    {{6, 6, 6, 3}, {12, 9, 9, 6}, {6, 12, 9, 6}},
    {{8, 8, 5, 0}, {15, 12, 9, 0}, {6, 18, 9, 0}},
};

// MPEG-2/2.5 scalefactor read (also produces intensity-position illegality
// markers in `illegal`, parallel layout to sf).
void read_scalefactors_lsf(Bits& b, Granule& gi, bool intensity_right,
                           ScaleFactors& sf, ScaleFactors& illegal) {
  memset(&sf, 0, sizeof(sf));
  memset(&illegal, 0, sizeof(illegal));
  int slen[4], blocknumber;
  int sc = gi.scalefac_compress;
  gi.preflag = 0;
  if (!intensity_right) {
    if (sc < 400) {
      slen[0] = (sc >> 4) / 5;
      slen[1] = (sc >> 4) % 5;
      slen[2] = (sc & 15) >> 2;
      slen[3] = sc & 3;
      blocknumber = 0;
    } else if (sc < 500) {
      int t = sc - 400;
      slen[0] = (t >> 2) / 5;
      slen[1] = (t >> 2) % 5;
      slen[2] = t & 3;
      slen[3] = 0;
      blocknumber = 1;
    } else {
      int t = sc - 500;
      slen[0] = t / 3;
      slen[1] = t % 3;
      slen[2] = 0;
      slen[3] = 0;
      gi.preflag = 1;
      blocknumber = 2;
    }
  } else {
    int isc = sc >> 1;
    if (isc < 180) {
      slen[0] = isc / 36;
      slen[1] = (isc % 36) / 6;
      slen[2] = isc % 6;
      slen[3] = 0;
      blocknumber = 3;
    } else if (isc < 244) {
      int t = isc - 180;
      slen[0] = (t & 63) >> 4;
      slen[1] = (t & 15) >> 2;
      slen[2] = t & 3;
      slen[3] = 0;
      blocknumber = 4;
    } else {
      int t = isc - 244;
      slen[0] = t / 3;
      slen[1] = t % 3;
      slen[2] = 0;
      slen[3] = 0;
      blocknumber = 5;
    }
  }
  int btn = gi.block_type == 2 ? (gi.mixed_block_flag ? 2 : 1) : 0;
  const int* nr = kLsfNr[blocknumber][btn];
  // flat read order: mixed = long bands first then short; short = per-sfb
  // 3 window values in sequence
  int part = 0, taken = 0;
  auto fill = [&](int* dst, int* ill_dst, int count) {
    for (int i = 0; i < count; ++i) {
      while (taken >= nr[part] && part < 3) {
        taken = 0;
        ++part;
      }
      int bits = slen[part];
      ++taken;
      int v = bits ? static_cast<int>(b.get(bits)) : 0;
      dst[i] = v;
      ill_dst[i] = bits && v == (1 << bits) - 1;
    }
  };
  if (gi.block_type == 2 && !gi.mixed_block_flag) {
    int tmp[36], ill[36];
    fill(tmp, ill, 36);
    for (int band = 0; band < 12; ++band)
      for (int w = 0; w < 3; ++w) {
        sf.s[w][band] = tmp[band * 3 + w];
        illegal.s[w][band] = ill[band * 3 + w];
      }
  } else if (gi.block_type == 2) {  // mixed: 6 long + sfb 3..11 short
    int tmp[33], ill[33];
    fill(tmp, ill, 33);
    for (int band = 0; band < 6; ++band) {
      sf.l[band] = tmp[band];
      illegal.l[band] = ill[band];
    }
    for (int band = 3; band < 12; ++band)
      for (int w = 0; w < 3; ++w) {
        sf.s[w][band] = tmp[6 + (band - 3) * 3 + w];
        illegal.s[w][band] = ill[6 + (band - 3) * 3 + w];
      }
  } else {
    int tmp[21], ill[21];
    fill(tmp, ill, 21);
    for (int band = 0; band < 21; ++band) {
      sf.l[band] = tmp[band];
      illegal.l[band] = ill[band];
    }
  }
}

// ---------------------------------------------------------------- spectrum

// Decode big_values + count1 into integer spectrum `is` with signs applied as
// float magnitudes later; here we keep signed ints (linbits-extended).
int read_spectrum(Bits& b, const FrameInfo& f, const Granule& gi, size_t part23_end,
                  int is[576]) {
  memset(is, 0, 576 * sizeof(int));
  const HuffSet& hs = huffset();
  int region1, region2;
  if (gi.window_switching && gi.block_type == 2 && !gi.mixed_block_flag) {
    // pure short: implied region0_count = 8 -> first 3 short bands x 3 windows
    // (36 samples at every rate except 8 kHz, whose short bands are wider)
    region1 = 3 * kSfbShort[f.sr_idx][3];
    region2 = 576;
  } else if (gi.window_switching) {
    // start/stop/mixed: implied region0_count = 7 on the long band table
    region1 = kSfbLong[f.sr_idx][8];
    region2 = 576;
  } else {
    int r0 = gi.region0_count + 1;
    int r1 = r0 + gi.region1_count + 1;
    if (r0 > 22) r0 = 22;
    if (r1 > 22) r1 = 22;
    region1 = kSfbLong[f.sr_idx][r0];
    region2 = kSfbLong[f.sr_idx][r1];
  }
  int big = gi.big_values * 2;
  if (big > 576) big = 576;
  for (int pos = 0; pos < big; pos += 2) {
    int region = pos < region1 ? 0 : pos < region2 ? 1 : 2;
    int tsel = gi.table_select[region];
    if (tsel == 0 || tsel == 4 || tsel == 14) continue;  // all-zero / invalid
    int entry = hs.trees[tsel].decode(b);
    if (entry < 0) return -1;
    int xlen = kHuffXlen[tsel];
    int x = entry / xlen, y = entry % xlen;
    int linbits = kHuffLinbits[tsel];
    if (x == 15 && linbits) x += b.get(linbits);
    if (x) x = b.get1() ? -x : x;
    if (y == 15 && linbits) y += b.get(linbits);
    if (y) y = b.get1() ? -y : y;
    is[pos] = x;
    is[pos + 1] = y;
  }
  int pos = big;
  const HuffTree& c1 = hs.trees[32 + gi.count1table_select];
  while (b.pos < part23_end && pos <= 572) {
    size_t save = b.pos;
    int entry = c1.decode(b);
    if (entry < 0) return -1;
    int q[4];
    q[0] = (entry >> 3) & 1;
    q[1] = (entry >> 2) & 1;
    q[2] = (entry >> 1) & 1;
    q[3] = entry & 1;
    for (int i = 0; i < 4; ++i)
      if (q[i]) q[i] = b.get1() ? -1 : 1;
    if (b.pos > part23_end) {  // quadruple straddled the boundary: discard
      b.pos = save;
      break;
    }
    for (int i = 0; i < 4; ++i) is[pos + i] = q[i];
    pos += 4;
  }
  return pos;  // zero-part start
}

// ---------------------------------------------------------------- requantize

void requantize(const FrameInfo& f, const Granule& gi, const ScaleFactors& sf,
                const int is[576], float xr[576]) {
  const Tables& T = tables();
  const short* sfl = kSfbLong[f.sr_idx];
  const short* sfs = kSfbShort[f.sr_idx];
  float step = gi.scalefac_scale ? 1.0f : 0.5f;
  float gain = exp2f(0.25f * (gi.global_gain - 210));
  auto mag = [&](int v) {
    int a = v < 0 ? -v : v;
    float m = a < 8208 ? T.pow43[a] : powf(static_cast<float>(a), 4.0f / 3.0f);
    return v < 0 ? -m : m;
  };
  if (gi.block_type == 2) {
    int long_end = gi.mixed_block_flag ? 36 : 0;
    if (long_end) {
      int band = 0;
      for (int i = 0; i < long_end; ++i) {
        while (sfl[band + 1] <= i) ++band;
        float e = gain * exp2f(-step * (sf.l[band] + (gi.preflag ? kPretab[band] : 0)));
        xr[i] = mag(is[i]) * e;
      }
    }
    int band = 0;
    while (3 * sfs[band + 1] <= long_end) ++band;
    for (int i = long_end; i < 576;) {
      int bw = sfs[band + 1] - sfs[band];
      for (int w = 0; w < 3; ++w) {
        float e = gain * exp2f(-2.0f * gi.subblock_gain[w] - step * sf.s[w][band < 13 ? band : 12]);
        for (int k = 0; k < bw && i < 576; ++k, ++i) xr[i] = mag(is[i]) * e;
      }
      if (band < 12) ++band;
    }
  } else {
    int band = 0;
    for (int i = 0; i < 576; ++i) {
      while (band < 21 && sfl[band + 1] <= i) ++band;
      int b_idx = sfl[band + 1] <= i ? 21 : band;
      float e = gain * exp2f(-step * (sf.l[b_idx] + (gi.preflag ? kPretab[b_idx] : 0)));
      xr[i] = mag(is[i]) * e;
    }
  }
}

// ---------------------------------------------------------------- stereo

// In-place joint stereo on requantized spectra.  xr[0]=left/mid, xr[1]=right/side.
void process_stereo(const FrameInfo& f, const Granule& gi_r, const ScaleFactors& sf_r,
                    const ScaleFactors& ill_r, int zero_bound_r, float xr[2][576]) {
  const bool ms = f.mode == 1 && (f.mode_ext & 2);
  const bool intensity = f.mode == 1 && (f.mode_ext & 1);
  const float sq2i = static_cast<float>(M_SQRT1_2);
  const short* sfl = kSfbLong[f.sr_idx];
  const short* sfs = kSfbShort[f.sr_idx];
  const bool lsf = f.version != 3;
  const float io = (gi_r.scalefac_compress & 1) ? 0.707106781f : 0.840896415f;  // 2^-1/2, 2^-1/4

  auto apply_ms = [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      float m = xr[0][i], s = xr[1][i];
      xr[0][i] = (m + s) * sq2i;
      xr[1][i] = (m - s) * sq2i;
    }
  };
  auto apply_is = [&](int lo, int hi, int is_pos, int ill) {
    if (ill) {  // illegal intensity position: fall back to MS / copy
      if (ms) apply_ms(lo, hi);
      return;
    }
    float k0, k1;
    if (!lsf) {
      if (is_pos == 7) {
        if (ms) apply_ms(lo, hi);
        return;
      }
      float t = tanf(is_pos * static_cast<float>(M_PI) / 12.0f);
      k0 = t / (1.0f + t);
      k1 = 1.0f / (1.0f + t);
    } else {
      if (is_pos == 0) {
        k0 = 1.0f;
        k1 = 1.0f;
      } else if (is_pos & 1) {
        k0 = powf(io, (is_pos + 1) / 2.0f);
        k1 = 1.0f;
      } else {
        k0 = 1.0f;
        k1 = powf(io, is_pos / 2.0f);
      }
    }
    for (int i = lo; i < hi; ++i) {
      float m = xr[0][i];
      xr[0][i] = m * k0;
      xr[1][i] = m * k1;
    }
  };

  if (!intensity) {
    if (ms) apply_ms(0, 576);
    return;
  }
  // Intensity applies to scalefactor bands lying entirely above the right
  // channel's last nonzero sample; everything below (including the partial
  // band containing the bound) stays MS/LR.  Short-block zero bounds are
  // per-window in the spec; the shared bound here is a documented
  // approximation (modern encoders do not emit intensity stereo — see
  // module doc; the path is validated structurally, not against fixtures).
  if (gi_r.block_type == 2) {
    int long_end = gi_r.mixed_block_flag ? 36 : 0;
    if (long_end && zero_bound_r < long_end) {
      int band = 0;
      while (band < 21 && sfl[band] < zero_bound_r) ++band;  // first whole band
      if (ms) apply_ms(0, sfl[band] < long_end ? sfl[band] : long_end);
      for (; band < 22 && sfl[band] < long_end; ++band)
        apply_is(sfl[band], sfl[band + 1] < long_end ? sfl[band + 1] : long_end,
                 sf_r.l[band < 21 ? band : 21], ill_r.l[band < 21 ? band : 21]);
    } else if (long_end && ms) {
      apply_ms(0, long_end);
    }
    int band0 = 0;
    while (3 * sfs[band0 + 1] <= long_end) ++band0;
    for (int band = band0; band < 13; ++band) {
      int bw = sfs[band + 1] - sfs[band];
      int base = long_end + (3 * sfs[band] - 3 * sfs[band0]);
      for (int w = 0; w < 3; ++w) {
        int lo = base + w * bw, hi = lo + bw;
        if (lo < zero_bound_r) {
          if (ms) apply_ms(lo, hi);
        } else {
          apply_is(lo, hi, sf_r.s[w][band < 12 ? band : 12],
                   ill_r.s[w][band < 12 ? band : 12]);
        }
      }
    }
  } else {
    int band = 0;
    while (band < 21 && sfl[band] < zero_bound_r) ++band;  // first whole band
    if (ms) apply_ms(0, sfl[band]);
    for (; band < 22; ++band)
      apply_is(sfl[band], sfl[band + 1],
               sf_r.l[band < 21 ? band : 21], ill_r.l[band < 21 ? band : 21]);
  }
}

// ---------------------------------------------------------------- transform

// Short-block spectral reorder: the bitstream carries short blocks in
// scalefactor-band-major order (per band: window 0 lines, window 1 lines,
// window 2 lines); the hybrid filterbank needs subband-interleaved order
// (sample 3*f + w for frequency line f, window w).
void reorder_short(const FrameInfo& f, const Granule& gi, float xr[576]) {
  if (gi.block_type != 2) return;
  const short* sfs = kSfbShort[f.sr_idx];
  int long_end = gi.mixed_block_flag ? 36 : 0;
  float tmp[576];
  memcpy(tmp, xr, sizeof(tmp));
  int band = 0;
  while (3 * sfs[band + 1] <= long_end) ++band;
  int src = long_end;
  for (; band < 13 && src < 576; ++band) {
    int bw = sfs[band + 1] - sfs[band];
    for (int w = 0; w < 3; ++w)
      for (int l = 0; l < bw && src < 576; ++l, ++src) {
        int fline = sfs[band] + l;
        xr[3 * fline + w] = tmp[src];
      }
  }
}

void antialias(const Granule& gi, float xr[576]) {
  const Tables& T = tables();
  int sblim = gi.block_type == 2 ? (gi.mixed_block_flag ? 1 : 0) : 31;
  for (int sb = 1; sb <= sblim; ++sb) {
    for (int i = 0; i < 8; ++i) {
      float a = xr[18 * sb - 1 - i];
      float b = xr[18 * sb + i];
      xr[18 * sb - 1 - i] = a * T.cs[i] - b * T.ca[i];
      xr[18 * sb + i] = b * T.cs[i] + a * T.ca[i];
    }
  }
}

// Hybrid filterbank: per-subband IMDCT + window + overlap-add.
// y[32][18] output time samples; overlap[32][18] persistent.
void hybrid(const Granule& gi, const float xr[576], float y[32][18], float overlap[32][18]) {
  const Tables& T = tables();
  for (int sb = 0; sb < 32; ++sb) {
    const float* X = xr + 18 * sb;
    int bt = gi.block_type;
    if (gi.mixed_block_flag && sb < 2) bt = 0;
    float out[36];
    if (bt == 2) {
      memset(out, 0, sizeof(out));
      for (int w = 0; w < 3; ++w) {
        for (int i = 0; i < 12; ++i) {
          float acc = 0.0f;
          for (int k = 0; k < 6; ++k) acc += X[k * 3 + w] * T.imdct12[i][k];
          out[6 + 6 * w + i] += acc * T.win[2][i];
        }
      }
    } else {
      for (int i = 0; i < 36; ++i) {
        float acc = 0.0f;
        for (int k = 0; k < 18; ++k) acc += X[k] * T.imdct36[i][k];
        out[i] = acc * T.win[bt][i];
      }
    }
    for (int i = 0; i < 18; ++i) {
      y[sb][i] = out[i] + overlap[sb][i];
      overlap[sb][i] = out[i + 18];
    }
  }
  // frequency inversion: odd subbands, odd time samples
  for (int sb = 1; sb < 32; sb += 2)
    for (int i = 1; i < 18; i += 2) y[sb][i] = -y[sb][i];
}

// Polyphase synthesis: one 18-slot granule of one channel -> 576 PCM samples.
struct Synth {
  float V[1024] = {0};

  void slot(const float S[32], float out[32]) {
    const Tables& T = tables();
    memmove(V + 64, V, 960 * sizeof(float));
    for (int i = 0; i < 64; ++i) {
      float acc = 0.0f;
      for (int k = 0; k < 32; ++k) acc += T.synth_n[i][k] * S[k];
      V[i] = acc;
    }
    float W[512];
    for (int b = 0; b < 8; ++b)
      for (int j = 0; j < 32; ++j) {
        W[b * 64 + j] = V[b * 128 + j] * T.dwin[b * 64 + j];
        W[b * 64 + 32 + j] = V[b * 128 + 96 + j] * T.dwin[b * 64 + 32 + j];
      }
    for (int j = 0; j < 32; ++j) {
      float acc = 0.0f;
      for (int b = 0; b < 16; ++b) acc += W[j + 32 * b];
      out[j] = acc;
    }
  }

  void granule(const float y[32][18], float out[576]) {
    float S[32];
    for (int t = 0; t < 18; ++t) {
      for (int sb = 0; sb < 32; ++sb) S[sb] = y[sb][t];
      slot(S, out + 32 * t);
    }
  }
};

// ---------------------------------------------------------------- decoder

struct Decoder {
  std::vector<uint8_t> res;       // bit reservoir (main data pool)
  float overlap[2][32][18] = {};  // IMDCT overlap per channel
  Synth synth[2];
  ScaleFactors prev_sf[2] = {};   // granule-0 scalefactors for scfsi
  std::vector<float> pcm;         // mono output
  int sample_rate = 0;
  int channels_seen = 0;

  bool decode_frame(const FrameInfo& f, const SideInfo& si, size_t md_start) {
    Bits b(res.data(), res.size());
    b.pos = md_start * 8;
    float y[32][18];
    float out[2][576];
    for (int g = 0; g < f.granules; ++g) {
      float xr[2][576];
      ScaleFactors sf[2], ill[2];
      int zero_bound[2] = {576, 576};
      for (int ch = 0; ch < f.channels; ++ch) {
        const Granule& gi_c = si.gr[g][ch];
        Granule gi = gi_c;  // LSF mutates preflag
        size_t gr_start = b.pos;
        size_t part23_end = gr_start + gi.part2_3_length;
        bool intensity_right = ch == 1 && f.mode == 1 && (f.mode_ext & 1);
        if (gi.part2_3_length == 0) {  // silent granule-channel
          memset(&sf[ch], 0, sizeof(sf[ch]));
          memset(&ill[ch], 0, sizeof(ill[ch]));
          if (f.version == 3 && g == 0) prev_sf[ch] = sf[ch];
          memset(xr[ch], 0, sizeof(xr[ch]));
          zero_bound[ch] = 0;
          continue;
        }
        if (f.version == 3) {
          read_scalefactors_v1(b, gi, si.scfsi[ch], g == 1 ? &prev_sf[ch] : nullptr,
                               sf[ch], g == 1);
          memset(&ill[ch], 0, sizeof(ill[ch]));
          if (g == 0) prev_sf[ch] = sf[ch];
          // intensity positions are MPEG-1 scalefacs; is_pos==7 is "illegal"
        } else {
          read_scalefactors_lsf(b, gi, intensity_right, sf[ch], ill[ch]);
        }
        if (b.pos > part23_end || b.overrun) return false;
        int is[576];
        int zb = read_spectrum(b, f, gi, part23_end, is);
        if (zb < 0) return false;
        zero_bound[ch] = zb;
        b.pos = part23_end;  // skip any stuffing
        requantize(f, gi, sf[ch], is, xr[ch]);
        // zero above the decoded region (defensive; is[] was zeroed)
      }
#if defined(DEV_TRACE) && DEV_TRACE
      fprintf(stderr, "gr %zu ch0 bt=%d mix=%d ws=%d sc=%d p23=%d bv=%d zb=%d\n",
              pcm.size() / 576, si.gr[g][0].block_type, si.gr[g][0].mixed_block_flag,
              si.gr[g][0].window_switching, si.gr[g][0].scalefac_compress,
              si.gr[g][0].part2_3_length, si.gr[g][0].big_values, zero_bound[0]);
#endif
      if (f.channels == 2)
        process_stereo(f, si.gr[g][1], sf[1], ill[1], zero_bound[1], xr);
      for (int ch = 0; ch < f.channels; ++ch) {
        const Granule& gi = si.gr[g][ch];
        reorder_short(f, gi, xr[ch]);
        antialias(gi, xr[ch]);
        hybrid(gi, xr[ch], y, overlap[ch]);
        synth[ch].granule(y, out[ch]);
      }
      size_t base = pcm.size();
      pcm.resize(base + 576);
      if (f.channels == 2) {
        for (int i = 0; i < 576; ++i) pcm[base + i] = 0.5f * (out[0][i] + out[1][i]);
      } else {
        memcpy(pcm.data() + base, out[0], 576 * sizeof(float));
      }
    }
    return true;
  }
};

bool looks_like_next_frame(const uint8_t* p, size_t avail, const FrameInfo& cur) {
  FrameInfo nxt;
  if (avail < 4) return true;  // end of buffer: accept
  return parse_header(p, avail, nxt) && nxt.sr == cur.sr && nxt.version == cur.version;
}

}  // namespace

bool mp3_decode_stream(const uint8_t* data, size_t size, std::vector<float>& mono,
                       int* sample_rate) {
  size_t pos = 0;
  // ID3v2 tag
  if (size >= 10 && !memcmp(data, "ID3", 3)) {
    size_t sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) |
                ((data[8] & 0x7F) << 7) | (data[9] & 0x7F);
    pos = 10 + sz + ((data[5] & 0x10) ? 10 : 0);
  }
  Decoder dec;
  bool first_audio_frame = true;
  while (pos + 4 <= size) {
    FrameInfo f;
    if (!parse_header(data + pos, size - pos, f)) {
      ++pos;  // resync scan
      continue;
    }
    if (pos + static_cast<size_t>(f.frame_bytes) > size) break;  // truncated tail
    if (!looks_like_next_frame(data + pos + f.frame_bytes, size - pos - f.frame_bytes, f)) {
      ++pos;  // false sync
      continue;
    }
    if (dec.sample_rate == 0) dec.sample_rate = f.sr;
    if (f.sr != dec.sample_rate) {  // mid-stream rate change unsupported; stop
      break;
    }
    size_t body = pos + 4 + (f.crc ? 2 : 0);
    Bits sb(data + body, f.side_bytes);
    SideInfo si;
    bool side_ok = read_side_info(sb, f, si);
    const uint8_t* md = data + body + f.side_bytes;
    size_t md_len = pos + f.frame_bytes - (body + f.side_bytes);
    // Xing/Info/VBRI metadata frame: skip entirely (incl. reservoir)
    if (first_audio_frame) {
      bool is_tag = (md_len >= 4 && (!memcmp(md, "Xing", 4) || !memcmp(md, "Info", 4)));
      if (!is_tag && f.version == 3 && md_len >= 36 - f.side_bytes &&
          pos + 36 + 4 <= size && !memcmp(data + pos + 36, "VBRI", 4))
        is_tag = true;
      if (is_tag) {
        pos += f.frame_bytes;
        continue;
      }
      first_audio_frame = false;
    }
    if (side_ok) {
      size_t prev_end = dec.res.size();
      dec.res.insert(dec.res.end(), md, md + md_len);
      if (static_cast<size_t>(si.main_data_begin) <= prev_end) {
        size_t start = prev_end - si.main_data_begin;
        dec.decode_frame(f, si, start);  // on failure: skip frame, keep sync
      }
      // trim the reservoir (main_data_begin is 9 bits; keep a safe window)
      if (dec.res.size() > 4096) {
        size_t drop = dec.res.size() - 2048;
        dec.res.erase(dec.res.begin(), dec.res.begin() + drop);
      }
    }
    pos += f.frame_bytes;
  }
  if (dec.sample_rate == 0) return false;
  *sample_rate = dec.sample_rate;
  mono = std::move(dec.pcm);
  return true;
}

extern "C" {

// In-memory decode entry (tests; also usable for network-fed streams).
// out == nullptr probes the decoded length.  Returns samples or -1.
long mp3_decode_mono_buf(const unsigned char* data, long size, float* out, long max_len,
                         int* sr) {
  std::vector<float> mono;
  int rate = 0;
  if (!mp3_decode_stream(data, static_cast<size_t>(size), mono, &rate)) return -1;
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
