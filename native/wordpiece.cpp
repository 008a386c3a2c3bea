// Fast WordPiece tokenizer — native host-side tokenization.
//
// The reference delegates tokenization to HuggingFace's Rust tokenizers
// (reference: src/adaptive_classifier/classifier.py:85).  Host tokenization
// feeds the TPU's input pipeline, so it must not bound device throughput
// (SURVEY.md §7 risk list).  This implements the BERT basic+WordPiece
// algorithm for the ASCII fast path (identical output to the Python
// implementation in models/tokenizer.py, which remains the arbiter for
// non-ASCII text); exposed through a C ABI for ctypes.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = 1, cls_id = 2, sep_id = 3, pad_id = 0;
  bool do_lower = true;
  size_t max_chars_per_word = 100;
};

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// Greedy longest-match-first WordPiece over one word.
void wordpiece(const Tokenizer& t, const std::string& word,
               std::vector<int32_t>& out) {
  if (word.size() > t.max_chars_per_word) {
    out.push_back(t.unk_id);
    return;
  }
  size_t start = 0;
  std::vector<int32_t> pieces;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur = -1;
    std::string sub;
    while (start < end) {
      sub.assign(start > 0 ? "##" : "");
      sub.append(word, start, end - start);
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

// Returns 1 if the text is pure ASCII (the fast path is exact for ASCII).
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
  std::string word;
  word.reserve(32);

  auto flush = [&]() {
    if (!word.empty()) {
      wordpiece(t, word, ids);
      word.clear();
    }
  };

  for (int64_t i = 0; i < text_len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      flush();
    } else if (is_ascii_punct(c)) {
      flush();
      std::string p(1, static_cast<char>(c));
      wordpiece(t, p, ids);
    } else if (c < 32 || c == 127) {
      // control characters are DELETED, joining their neighbors — the
      // Python arbiter's _clean (BERT _clean_text) removes them without
      // splitting the word ("ab\x0bcd" -> "abcd", not "ab","cd")
      continue;
    } else {
      word.push_back(t.do_lower && c >= 'A' && c <= 'Z'
                         ? static_cast<char>(c - 'A' + 'a')
                         : static_cast<char>(c));
    }
  }
  flush();

  int32_t n = 0;
  out[n++] = t.cls_id;
  int32_t body = max_len - 2;
  for (size_t i = 0; i < ids.size() && static_cast<int32_t>(i) < body; ++i)
    out[n++] = ids[i];
  out[n++] = t.sep_id;
  return n;
}

// Batch encode into a padded [n, max_len] int32 matrix + per-row lengths.
void wp_encode_batch(void* handle, const char** texts, const int64_t* lens,
                     int32_t n, int32_t* out, int32_t* out_lens,
                     int32_t max_len) {
  Tokenizer& t = *static_cast<Tokenizer*>(handle);
  for (int32_t i = 0; i < n; ++i) {
    int32_t* row = out + static_cast<int64_t>(i) * max_len;
    for (int32_t j = 0; j < max_len; ++j) row[j] = t.pad_id;
    out_lens[i] = wp_encode(handle, texts[i], lens[i], row, max_len);
  }
}

}  // extern "C"
