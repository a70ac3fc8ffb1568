// Native WordPiece tokenizer fast path.
//
// The reference's data pipeline leans on torch's C++ DataLoader worker pool
// (reference: main_task_retrieval.py:38,217); this library is the equivalent
// native component for univl_tpu: tokenization is the dominant host-side
// cost per sample (HowTo100M re-tokenizes neighbor clips during transcript
// expansion), and the Python tokenizer holds the GIL.
//
// Scope: ASCII fast path implementing the exact BERT basic+wordpiece
// algorithm (lowercase, punctuation split, greedy longest-match with "##"
// continuations). Strings containing non-ASCII bytes are REJECTED (return
// -1) and the Python caller falls back to the full-Unicode Python
// implementation, so behavior is always correct.
//
// C API (ctypes):
//   void* wp_create(const char* vocab_newline_joined, int do_lower_case);
//   void  wp_free(void* handle);
//   int   wp_tokenize(void* handle, const char* text,
//                     int32_t* out_ids, int max_out);
//     returns #tokens written, or -1 if the text needs the Python fallback.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  bool lower;
  int32_t unk_id;
  static constexpr int kMaxCharsPerWord = 100;
};

inline bool is_ascii(unsigned char c) { return c < 0x80; }

inline bool is_space(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

inline bool is_ctrl(unsigned char c) {
  return c < 0x20 && !is_space(static_cast<char>(c));
}

inline bool is_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// Greedy longest-match WordPiece over one word; appends ids.
// Returns false if any piece is unknown (whole word -> UNK).
void wordpiece(const Tokenizer& tk, const std::string& word,
               std::vector<int32_t>* out) {
  if (word.size() > Tokenizer::kMaxCharsPerWord) {
    out->push_back(tk.unk_id);
    return;
  }
  std::vector<int32_t> pieces;
  size_t start = 0;
  const size_t n = word.size();
  while (start < n) {
    size_t end = n;
    int32_t cur = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = tk.vocab.find(sub);
      if (it != tk.vocab.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out->push_back(tk.unk_id);
      return;
    }
    pieces.push_back(cur);
    start = end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_newline_joined, int do_lower_case) {
  auto* tk = new Tokenizer();
  tk->lower = do_lower_case != 0;
  const char* p = vocab_newline_joined;
  int32_t idx = 0;
  while (*p) {
    const char* q = strchr(p, '\n');
    size_t len = q ? static_cast<size_t>(q - p) : strlen(p);
    // strip token like Python's str.strip()
    size_t b = 0, e = len;
    while (b < e && is_space(p[b])) ++b;
    while (e > b && is_space(p[e - 1])) --e;
    tk->vocab.emplace(std::string(p + b, e - b), idx);
    ++idx;
    if (!q) break;
    p = q + 1;
  }
  auto it = tk->vocab.find("[UNK]");
  tk->unk_id = it != tk->vocab.end() ? it->second : 0;
  return tk;
}

void wp_free(void* handle) { delete static_cast<Tokenizer*>(handle); }

int wp_tokenize(void* handle, const char* text, int32_t* out_ids, int max_out) {
  const Tokenizer& tk = *static_cast<Tokenizer*>(handle);
  std::vector<int32_t> ids;
  std::string word;

  auto flush = [&]() {
    if (!word.empty()) {
      wordpiece(tk, word, &ids);
      word.clear();
    }
  };

  for (const char* p = text; *p; ++p) {
    unsigned char c = static_cast<unsigned char>(*p);
    if (!is_ascii(c)) return -1;  // Python fallback handles Unicode
    if (c == 0 || is_ctrl(c)) continue;
    if (is_space(static_cast<char>(c))) {
      flush();
      continue;
    }
    if (is_punct(c)) {
      flush();
      word.push_back(static_cast<char>(c));
      flush();
      continue;
    }
    char ch = static_cast<char>(c);
    if (tk.lower && ch >= 'A' && ch <= 'Z') ch = static_cast<char>(ch - 'A' + 'a');
    word.push_back(ch);
  }
  flush();

  if (static_cast<int>(ids.size()) > max_out) return -1;
  memcpy(out_ids, ids.data(), ids.size() * sizeof(int32_t));
  return static_cast<int>(ids.size());
}

}  // extern "C"
