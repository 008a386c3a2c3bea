// Fast WordPiece tokenizer — native host-side tokenization.
//
// The reference delegates tokenization to HuggingFace's Rust tokenizers
// (reference: src/adaptive_classifier/classifier.py:85).  Host tokenization
// feeds the TPU's input pipeline, so it must not bound device throughput
// (SURVEY.md §7 risk list).  This implements the full BERT basic+WordPiece
// algorithm over UTF-8 — clean (control-delete, whitespace fold), CJK
// isolation, Unicode lowercasing (incl. the Final_Sigma rule), NFD
// strip-accents, Unicode punctuation split — matching the Python arbiter in
// models/tokenizer.py codepoint-for-codepoint (fuzz-verified in
// tests/test_native.py).  Unicode data lives in unicode_tables.h, generated
// from the arbiter's own unicodedata by gen_unicode_tables.py.
//
// wp_encode_batch fans rows out over a thread pool: tokenization is
// embarrassingly parallel across rows and the GIL is released during the
// ctypes call, so the host pipeline scales with cores.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "unicode_tables.h"

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = 1, cls_id = 2, sep_id = 3, pad_id = 0;
  bool do_lower = true;
  size_t max_chars_per_word = 100;
};

// ---------------------------------------------------------------------------
// Unicode predicates (binary search over generated ranges)
// ---------------------------------------------------------------------------

inline bool in_ranges(uint32_t cp, const CpRange* r, int n) {
  int lo = 0, hi = n - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (cp < r[mid].lo)
      hi = mid - 1;
    else if (cp > r[mid].hi)
      lo = mid + 1;
    else
      return true;
  }
  return false;
}

inline bool is_control(uint32_t cp) {  // category C*, except \t\n\r
  if (cp == '\t' || cp == '\n' || cp == '\r') return false;
  return in_ranges(cp, kCtrlRanges, kCtrlRanges_n);
}
inline bool is_whitespace(uint32_t cp) {
  if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') return true;
  return in_ranges(cp, kZsRanges, kZsRanges_n);
}
inline bool is_punct(uint32_t cp) {
  if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))
    return true;
  return in_ranges(cp, kPunctRanges, kPunctRanges_n);
}
inline bool is_mn(uint32_t cp) { return in_ranges(cp, kMnRanges, kMnRanges_n); }
inline bool is_cased(uint32_t cp) {
  return in_ranges(cp, kCasedRanges, kCasedRanges_n);
}
inline bool is_cjk(uint32_t cp) {  // models/tokenizer.py _is_cjk
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
         (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
         (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F);
}

// Lowercase one codepoint -> 1..3 codepoints (Python str.lower parity).
// `final_sigma`: U+03A3 preceded by a cased char and not followed by one.
inline int lower_cp(uint32_t cp, bool final_sigma, uint32_t out[3]) {
  if (cp < 128) {  // ASCII fast path
    out[0] = (cp >= 'A' && cp <= 'Z') ? cp + 32 : cp;
    return 1;
  }
  if (cp == 0x03A3) {  // GREEK CAPITAL SIGMA: Final_Sigma special case
    out[0] = final_sigma ? 0x03C2 : 0x03C3;
    return 1;
  }
  int lo = 0, hi = kLowerMap_n - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (cp < kLowerMap[mid].cp)
      hi = mid - 1;
    else if (cp > kLowerMap[mid].cp)
      lo = mid + 1;
    else {
      for (int i = 0; i < kLowerMap[mid].n; ++i) out[i] = kLowerMap[mid].out[i];
      return kLowerMap[mid].n;
    }
  }
  out[0] = cp;
  return 1;
}

// NFD canonical decomposition of one codepoint (recursively pre-expanded in
// the table; Hangul is algorithmic).  Returns number of codepoints.
inline int nfd_cp(uint32_t cp, uint32_t out[4]) {
  if (cp >= 0xAC00 && cp <= 0xD7A3) {  // Hangul syllable -> L V (T)
    uint32_t s = cp - 0xAC00;
    out[0] = 0x1100 + s / 588;
    out[1] = 0x1161 + (s % 588) / 28;
    uint32_t t = s % 28;
    if (t) {
      out[2] = 0x11A7 + t;
      return 3;
    }
    return 2;
  }
  if (cp < 0xC0) {  // below U+00C0 nothing decomposes
    out[0] = cp;
    return 1;
  }
  int lo = 0, hi = kDecompMap_n - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (cp < kDecompMap[mid].cp)
      hi = mid - 1;
    else if (cp > kDecompMap[mid].cp)
      lo = mid + 1;
    else {
      for (int i = 0; i < kDecompMap[mid].n; ++i) out[i] = kDecompMap[mid].out[i];
      return kDecompMap[mid].n;
    }
  }
  out[0] = cp;
  return 1;
}

// ---------------------------------------------------------------------------
// UTF-8
// ---------------------------------------------------------------------------

// Decode one codepoint at `i`; advances `i`.  Invalid bytes are skipped
// (Python hands us valid UTF-8 — encode(errors="ignore") — this is a guard).
inline bool utf8_next(const char* s, int64_t len, int64_t& i, uint32_t& cp) {
  while (i < len) {
    unsigned char c = static_cast<unsigned char>(s[i]);
    if (c < 0x80) {
      cp = c;
      ++i;
      return true;
    }
    int n = (c >= 0xF0) ? 4 : (c >= 0xE0) ? 3 : (c >= 0xC0) ? 2 : 0;
    if (n == 0 || i + n > len) {
      ++i;  // stray continuation / truncated sequence: skip byte
      continue;
    }
    uint32_t v = c & (0xFF >> (n + 1));
    bool ok = true;
    for (int k = 1; k < n; ++k) {
      unsigned char cc = static_cast<unsigned char>(s[i + k]);
      if ((cc & 0xC0) != 0x80) {
        ok = false;
        break;
      }
      v = (v << 6) | (cc & 0x3F);
    }
    if (!ok) {
      ++i;
      continue;
    }
    i += n;
    cp = v;
    return true;
  }
  return false;
}

inline void utf8_append(std::string& s, uint32_t cp) {
  if (cp < 0x80) {
    s.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    s.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    s.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    s.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    s.push_back(static_cast<char>(0xF0 | (cp >> 18)));
    s.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    s.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    s.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// ---------------------------------------------------------------------------
// WordPiece over one word (codepoint-boundary greedy longest match)
// ---------------------------------------------------------------------------

void wordpiece(const Tokenizer& t, const std::vector<uint32_t>& cps,
               std::vector<int32_t>& out) {
  if (cps.size() > t.max_chars_per_word) {
    out.push_back(t.unk_id);
    return;
  }
  // UTF-8 bytes + codepoint byte offsets (match boundaries = codepoints)
  std::string bytes;
  bytes.reserve(cps.size() * 2);
  std::vector<uint32_t> off;
  off.reserve(cps.size() + 1);
  for (uint32_t cp : cps) {
    off.push_back(static_cast<uint32_t>(bytes.size()));
    utf8_append(bytes, cp);
  }
  off.push_back(static_cast<uint32_t>(bytes.size()));

  size_t start = 0, n = cps.size();
  std::vector<int32_t> pieces;
  std::string sub;
  while (start < n) {
    size_t end = n;
    int32_t cur = -1;
    while (start < end) {
      sub.assign(start > 0 ? "##" : "");
      sub.append(bytes, off[start], off[end] - off[start]);
      auto it = t.vocab.find(sub);
      if (it != t.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out.push_back(t.unk_id);
      return;
    }
    pieces.push_back(cur);
    start = end;
  }
  out.insert(out.end(), pieces.begin(), pieces.end());
}

// Basic-token transform + punctuation split + WordPiece (the per-word tail
// of models/tokenizer.py _basic_tokenize).  `word` is a cleaned run of
// non-space codepoints (or one isolated CJK char).
void flush_word(const Tokenizer& t, const std::vector<uint32_t>& word,
                std::vector<int32_t>& ids, std::vector<uint32_t>& scratch) {
  if (word.empty()) return;
  scratch.clear();
  if (t.do_lower) {
    // lowercase (Final_Sigma-aware), then NFD, then strip Mn
    uint32_t lo[3], dc[4];
    for (size_t i = 0; i < word.size(); ++i) {
      bool final_sigma = false;
      if (word[i] == 0x03A3) {
        bool before = i > 0 && is_cased(word[i - 1]);
        bool after = i + 1 < word.size() && is_cased(word[i + 1]);
        final_sigma = before && !after;
      }
      int ln = lower_cp(word[i], final_sigma, lo);
      for (int a = 0; a < ln; ++a) {
        int dn = nfd_cp(lo[a], dc);
        for (int b = 0; b < dn; ++b)
          if (!is_mn(dc[b])) scratch.push_back(dc[b]);
      }
    }
  } else {
    scratch.assign(word.begin(), word.end());
  }
  // split on punctuation
  std::vector<uint32_t> cur;
  for (uint32_t cp : scratch) {
    if (is_punct(cp)) {
      if (!cur.empty()) {
        wordpiece(t, cur, ids);
        cur.clear();
      }
      std::vector<uint32_t> p(1, cp);
      wordpiece(t, p, ids);
    } else {
      cur.push_back(cp);
    }
  }
  if (!cur.empty()) wordpiece(t, cur, ids);
}

void encode_impl(const Tokenizer& t, const char* text, int64_t text_len,
                 std::vector<int32_t>& ids) {
  std::vector<uint32_t> word, scratch;
  word.reserve(32);
  int64_t i = 0;
  uint32_t cp;
  while (utf8_next(text, text_len, i, cp)) {
    if (cp == 0 || cp == 0xFFFD || is_control(cp)) continue;  // _clean deletes
    if (is_whitespace(cp)) {
      flush_word(t, word, ids, scratch);
      word.clear();
    } else if (is_cjk(cp)) {
      flush_word(t, word, ids, scratch);
      word.clear();
      word.push_back(cp);
      flush_word(t, word, ids, scratch);
      word.clear();
    } else {
      word.push_back(cp);
    }
  }
  flush_word(t, word, ids, scratch);
}

}  // namespace

extern "C" {

// vocab_data: newline-separated tokens, index = line number.
void* wp_create(const char* vocab_data, int64_t vocab_len, int do_lower) {
  auto* t = new Tokenizer();
  t->do_lower = do_lower != 0;
  std::string data(vocab_data, static_cast<size_t>(vocab_len));
  size_t pos = 0;
  int32_t idx = 0;
  while (pos <= data.size()) {
    size_t nl = data.find('\n', pos);
    if (nl == std::string::npos) nl = data.size();
    std::string tok = data.substr(pos, nl - pos);
    if (!tok.empty()) t->vocab.emplace(tok, idx);
    ++idx;
    if (nl >= data.size()) break;
    pos = nl + 1;
  }
  auto find_id = [&](const char* s, int32_t dflt) {
    auto it = t->vocab.find(s);
    return it == t->vocab.end() ? dflt : it->second;
  };
  t->unk_id = find_id("[UNK]", 1);
  t->cls_id = find_id("[CLS]", 2);
  t->sep_id = find_id("[SEP]", 3);
  t->pad_id = find_id("[PAD]", 0);
  return t;
}

void wp_free(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Returns 1 if the text is pure ASCII.  (Kept for ABI compatibility; the
// encoder is now exact for all UTF-8 text, not just ASCII.)
int wp_is_ascii(const char* text, int64_t len) {
  for (int64_t i = 0; i < len; ++i)
    if (static_cast<unsigned char>(text[i]) >= 128) return 0;
  return 1;
}

// Encode one text: [CLS] pieces... [SEP], truncated to max_len.
// Returns number of ids written.
int32_t wp_encode(void* handle, const char* text, int64_t text_len,
                  int32_t* out, int32_t max_len) {
  if (max_len < 2) return 0;  // no room for [CLS]+[SEP]: refuse, don't overflow
  const Tokenizer& t = *static_cast<Tokenizer*>(handle);
  std::vector<int32_t> ids;
  ids.reserve(64);
  encode_impl(t, text, text_len, ids);
  int32_t n = 0;
  out[n++] = t.cls_id;
  int32_t body = max_len - 2;
  for (size_t i = 0; i < ids.size() && static_cast<int32_t>(i) < body; ++i)
    out[n++] = ids[i];
  out[n++] = t.sep_id;
  return n;
}

// Batch encode into a padded [n, max_len] int32 matrix + per-row lengths.
// Rows are tokenized in parallel on a thread pool (the caller's ctypes FFI
// releases the GIL for the whole call).
void wp_encode_batch(void* handle, const char** texts, const int64_t* lens,
                     int32_t n, int32_t* out, int32_t* out_lens,
                     int32_t max_len) {
  Tokenizer& t = *static_cast<Tokenizer*>(handle);
  auto run = [&](int32_t i) {
    int32_t* row = out + static_cast<int64_t>(i) * max_len;
    for (int32_t j = 0; j < max_len; ++j) row[j] = t.pad_id;
    out_lens[i] = wp_encode(handle, texts[i], lens[i], row, max_len);
  };
  unsigned hw = std::thread::hardware_concurrency();
  int32_t workers = static_cast<int32_t>(hw ? hw : 1);
  if (workers > 16) workers = 16;
  if (workers > (n + 31) / 32) workers = (n + 31) / 32;  // ≥32 rows/thread
  if (workers <= 1) {
    for (int32_t i = 0; i < n; ++i) run(i);
    return;
  }
  std::atomic<int32_t> next{0};
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int32_t w = 0; w < workers; ++w)
    pool.emplace_back([&]() {
      for (int32_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) run(i);
    });
  for (auto& th : pool) th.join();
}

}  // extern "C"
