// Native WordPiece tokenizer — host-side hot loop for the TPU engine.
//
// Replaces the Rust `tokenizers` dependency the reference leans on via
// transformers/sentence-transformers (SURVEY.md §2.6). Semantics match
// tristage_rag_tpu/models/tokenizer.py::WordPieceTokenizer exactly
// (tests assert identical ids): NFD-free ASCII lowercase+strip-accent
// approximation is NOT used here — instead the Python layer passes
// pre-normalized text when lowercase mode is on, keeping one
// normalization implementation.
//
// C ABI (ctypes):
//   wp_create(vocab_blob, n_entries) -> handle
//     vocab_blob: n_entries of (uint32 id, uint32 len, bytes token)
//   wp_encode(handle, utf8_text, out_ids, capacity) -> n_ids
//   wp_destroy(handle)

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> map;
  int32_t unk_id = 0;
  int32_t max_chars_per_word = 100;
};

// Word/punct splitter matching the Python `\w+|[^\w\s]` regex over
// UTF-8: a "word" is a maximal run of alnum/underscore bytes or
// multibyte (non-ASCII) sequences; any other non-space byte is a
// single-char token.
inline bool is_ascii_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}
inline bool is_word_byte(unsigned char c) {
  return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
         (c >= 'A' && c <= 'Z') || c == '_' || c >= 0x80;
}

void split_words(std::string_view text, std::vector<std::string_view>* out) {
  size_t i = 0, n = text.size();
  while (i < n) {
    unsigned char c = text[i];
    if (is_ascii_space(c)) {
      ++i;
      continue;
    }
    if (is_word_byte(c)) {
      size_t start = i;
      while (i < n && is_word_byte(static_cast<unsigned char>(text[i]))) ++i;
      out->emplace_back(text.substr(start, i - start));
    } else {
      // single punctuation byte (or leading byte of a symbol)
      out->emplace_back(text.substr(i, 1));
      ++i;
    }
  }
}

void wordpiece(const Vocab& v, std::string_view word,
               std::vector<int32_t>* out) {
  if (word.size() > static_cast<size_t>(v.max_chars_per_word)) {
    out->push_back(v.unk_id);
    return;
  }
  std::vector<int32_t> ids;
  size_t start = 0;
  std::string buf;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur = -1;
    while (start < end) {
      buf.assign(start > 0 ? "##" : "");
      buf.append(word.substr(start, end - start));
      auto it = v.map.find(buf);
      if (it != v.map.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out->push_back(v.unk_id);
      return;
    }
    ids.push_back(cur);
    start = end;
  }
  out->insert(out->end(), ids.begin(), ids.end());
}

}  // namespace

extern "C" {

void* wp_create(const uint8_t* blob, int64_t blob_len, int32_t unk_id) {
  auto* v = new Vocab();
  v->unk_id = unk_id;
  int64_t off = 0;
  while (off + 8 <= blob_len) {
    uint32_t id, len;
    std::memcpy(&id, blob + off, 4);
    std::memcpy(&len, blob + off + 4, 4);
    off += 8;
    if (off + len > blob_len) break;
    v->map.emplace(
        std::string(reinterpret_cast<const char*>(blob + off), len),
        static_cast<int32_t>(id));
    off += len;
  }
  return v;
}

int64_t wp_encode(void* handle, const char* text, int64_t text_len,
                  int32_t* out_ids, int64_t capacity) {
  auto* v = static_cast<Vocab*>(handle);
  std::vector<std::string_view> words;
  split_words(std::string_view(text, text_len), &words);
  std::vector<int32_t> ids;
  ids.reserve(words.size() * 2);
  for (auto w : words) wordpiece(*v, w, &ids);
  int64_t n = std::min<int64_t>(ids.size(), capacity);
  std::memcpy(out_ids, ids.data(), n * sizeof(int32_t));
  return static_cast<int64_t>(ids.size());
}

void wp_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

}  // extern "C"
