// Chinese word segmenter — C++ replacement for the reference's Rust `rjieba`
// dependency (reference src/f5_tts/model/utils.py:10,163: rjieba.cut feeds the
// pinyin G2P).  Implements the jieba max-probability DAG/DP algorithm with
// HMM disabled, byte-for-byte compatible with python jieba.cut(HMM=False):
//   - prefix dictionary (every word prefix recorded, freq 0 when not a word)
//   - DAG over known prefixes, right-to-left Viterbi with log-freq scores,
//     ties broken toward the longer word (python tuple-max semantics)
//   - han-block splitting (CJK + [a-zA-Z0-9+#&._%-] runs), whitespace tokens
//     preserved, other chars emitted singly, single alnum runs merged.
//
// C API (ctypes-friendly):
//   void*  seg_create(const char* dict_path);
//   char*  seg_cut(void* handle, const char* utf8_text);  // '\x1e'-joined, malloc'd
//   void   seg_free_result(char* result);
//   void   seg_destroy(void* handle);

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------- utf8

// Decode UTF-8 into codepoints, keeping the original byte span of each.
struct U32Text {
  std::vector<char32_t> cp;
  std::vector<size_t> byte_start;  // size cp.size()+1 (last = total bytes)
};

U32Text decode_utf8(const std::string& s) {
  U32Text out;
  size_t i = 0;
  const size_t n = s.size();
  while (i < n) {
    unsigned char c = s[i];
    char32_t v = 0;
    size_t len = 1;
    if (c < 0x80) {
      v = c;
    } else if ((c >> 5) == 0x6) {
      v = c & 0x1F;
      len = 2;
    } else if ((c >> 4) == 0xE) {
      v = c & 0x0F;
      len = 3;
    } else if ((c >> 3) == 0x1E) {
      v = c & 0x07;
      len = 4;
    } else {  // invalid byte: emit replacement, advance one
      v = 0xFFFD;
      len = 1;
    }
    if (i + len > n) {
      v = 0xFFFD;
      len = 1;
    }
    for (size_t k = 1; k < len; ++k) v = (v << 6) | (s[i + k] & 0x3F);
    out.byte_start.push_back(i);
    out.cp.push_back(v);
    i += len;
  }
  out.byte_start.push_back(n);
  return out;
}

void append_utf8(std::string& out, char32_t v) {
  if (v < 0x80) {
    out.push_back(static_cast<char>(v));
  } else if (v < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (v >> 6)));
    out.push_back(static_cast<char>(0x80 | (v & 0x3F)));
  } else if (v < 0x10000) {
    out.push_back(static_cast<char>(0xE0 | (v >> 12)));
    out.push_back(static_cast<char>(0x80 | ((v >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (v & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xF0 | (v >> 18)));
    out.push_back(static_cast<char>(0x80 | ((v >> 12) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | ((v >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (v & 0x3F)));
  }
}

// jieba re_han_default char class: [一-鿕a-zA-Z0-9+#&._%\-]
bool is_han_block_char(char32_t c) {
  if (c >= 0x4E00 && c <= 0x9FD5) return true;
  if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')) return true;
  switch (c) {
    case '+': case '#': case '&': case '.': case '_': case '%': case '-':
      return true;
    default:
      return false;
  }
}

bool is_alnum_ascii(char32_t c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9');
}

// jieba re_skip_default: (\r\n|\s) — python \s on a single char
bool is_space_char(char32_t c) {
  switch (c) {
    case ' ': case '\t': case '\n': case '\r': case 0x0B: case 0x0C:
    case 0x1C: case 0x1D: case 0x1E: case 0x1F: case 0x85: case 0xA0:
      return true;
    default:
      return c == 0x2028 || c == 0x2029 || (c >= 0x2000 && c <= 0x200A) ||
             c == 0x1680 || c == 0x202F || c == 0x205F || c == 0x3000;
  }
}

// ------------------------------------------------------------------ segmenter

struct Segmenter {
  std::unordered_map<std::u32string, int64_t> freq;  // word or prefix (0)
  double logtotal = 0.0;

  bool load(const char* path) {
    std::ifstream in(path);
    if (!in.is_open()) return false;
    std::string line;
    int64_t total = 0;
    while (std::getline(in, line)) {
      if (!line.empty() && line.back() == '\r') line.pop_back();
      if (line.empty()) continue;
      std::istringstream ss(line);
      std::string word_utf8, freq_s;
      ss >> word_utf8 >> freq_s;
      if (word_utf8.empty() || freq_s.empty()) continue;
      int64_t f = strtoll(freq_s.c_str(), nullptr, 10);
      U32Text t = decode_utf8(word_utf8);
      std::u32string w(t.cp.begin(), t.cp.end());
      freq[w] = f;
      total += f;
      for (size_t ch = 0; ch + 1 < w.size(); ++ch) {
        std::u32string frag = w.substr(0, ch + 1);
        freq.emplace(frag, 0);  // keep existing full-word freq if present
      }
    }
    logtotal = std::log(static_cast<double>(total));
    return total > 0;
  }

  // Max-prob DP over one han block [lo, hi) of cps; append tokens.
  void cut_block(const std::vector<char32_t>& cp, size_t lo, size_t hi,
                 std::vector<std::u32string>& out) const {
    const size_t N = hi - lo;
    // DAG[k]: candidate word ends (inclusive, relative)
    std::vector<std::vector<uint32_t>> dag(N);
    std::u32string frag;
    for (size_t k = 0; k < N; ++k) {
      frag.assign(1, cp[lo + k]);
      size_t i = k;
      while (i < N) {
        auto it = freq.find(frag);
        if (it == freq.end()) break;
        if (it->second > 0) dag[k].push_back(static_cast<uint32_t>(i));
        ++i;
        if (i < N) frag.push_back(cp[lo + i]);
      }
      if (dag[k].empty()) dag[k].push_back(static_cast<uint32_t>(k));
    }
    // right-to-left Viterbi; tie-break toward larger end (python tuple max)
    std::vector<double> score(N + 1, 0.0);
    std::vector<uint32_t> next(N + 1, 0);
    std::u32string word;
    for (size_t idx = N; idx-- > 0;) {
      double best = -1e300;
      uint32_t best_x = dag[idx][0];
      for (uint32_t x : dag[idx]) {
        word.assign(cp.begin() + lo + idx, cp.begin() + lo + x + 1);
        auto it = freq.find(word);
        int64_t f = (it != freq.end() && it->second > 0) ? it->second : 1;
        double sc = std::log(static_cast<double>(f)) - logtotal + score[x + 1];
        if (sc > best || (sc == best && x > best_x)) {
          best = sc;
          best_x = x;
        }
      }
      score[idx] = best;
      next[idx] = best_x;
    }
    // emit, merging runs of single ascii-alnum chars (jieba __cut_DAG_NO_HMM)
    std::u32string buf;
    size_t x = 0;
    while (x < N) {
      size_t y = next[x] + 1;
      if (y - x == 1 && is_alnum_ascii(cp[lo + x])) {
        buf.push_back(cp[lo + x]);
      } else {
        if (!buf.empty()) {
          out.push_back(buf);
          buf.clear();
        }
        out.emplace_back(cp.begin() + lo + x, cp.begin() + lo + y);
      }
      x = y;
    }
    if (!buf.empty()) out.push_back(buf);
  }

  std::vector<std::u32string> cut(const std::string& text) const {
    U32Text t = decode_utf8(text);
    std::vector<std::u32string> out;
    const size_t n = t.cp.size();
    size_t i = 0;
    while (i < n) {
      if (is_han_block_char(t.cp[i])) {
        size_t j = i;
        while (j < n && is_han_block_char(t.cp[j])) ++j;
        cut_block(t.cp, i, j, out);
        i = j;
      } else {
        // non-han block: whitespace chars kept (\r\n pairs joined), others singly
        char32_t c = t.cp[i];
        if (c == '\r' && i + 1 < n && t.cp[i + 1] == '\n') {
          out.push_back(U"\r\n");
          i += 2;
        } else {
          out.push_back(std::u32string(1, c));
          ++i;
        }
      }
    }
    return out;
  }
};

}  // namespace

extern "C" {

void* seg_create(const char* dict_path) {
  auto* s = new Segmenter();
  if (!s->load(dict_path)) {
    delete s;
    return nullptr;
  }
  return s;
}

char* seg_cut(void* handle, const char* utf8_text) {
  auto* s = static_cast<Segmenter*>(handle);
  std::vector<std::u32string> toks = s->cut(std::string(utf8_text));
  std::string joined;
  for (size_t i = 0; i < toks.size(); ++i) {
    if (i) joined.push_back('\x1e');
    for (char32_t c : toks[i]) append_utf8(joined, c);
  }
  char* out = static_cast<char*>(malloc(joined.size() + 1));
  memcpy(out, joined.data(), joined.size());
  out[joined.size()] = '\0';
  return out;
}

void seg_free_result(char* result) { free(result); }

void seg_destroy(void* handle) { delete static_cast<Segmenter*>(handle); }

}  // extern "C"
