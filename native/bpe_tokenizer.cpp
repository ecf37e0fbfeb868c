// CLIP BPE tokenizer core — native C++ implementation.
//
// The hot host-side loop of text preprocessing (the reference outsources it
// to HF transformers' Python/Rust tokenizer, reference utils.py:15-254;
// here the runtime is native per the framework mandate).  Exposed through a
// C ABI consumed via ctypes (powerpaint_tpu/text/native.py).
//
// Algorithm: standard CLIP byte-pair encoding — lowercase + whitespace
// cleanup, word regex, byte->unicode remap, greedy lowest-rank merges,
// "</w>" end-of-word marker.  Vocab/merges are loaded at runtime from the
// checkpoint's vocab.json + merges.txt (parsed in Python, passed in as
// flat arrays; this module owns only the hot loop).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, int32_t> merge_rank;  // "a b" -> rank
  int32_t bos = 49406;
  int32_t eos = 49407;
};

std::string merge_key(const std::string& a, const std::string& b) {
  std::string k;
  k.reserve(a.size() + b.size() + 1);
  k += a;
  k += ' ';
  k += b;
  return k;
}

// byte -> unicode-codepoint remap (CLIP/GPT-2 scheme), as UTF-8 strings
std::vector<std::string> byte_encoder() {
  std::vector<int> bs;
  for (int b = '!'; b <= '~'; ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<int> cs = bs;
  int n = 0;
  std::vector<bool> seen(256, false);
  for (int b : bs) seen[b] = true;
  for (int b = 0; b < 256; ++b) {
    if (!seen[b]) {
      bs.push_back(b);
      cs.push_back(256 + n++);
    }
  }
  std::vector<std::string> table(256);
  for (size_t i = 0; i < bs.size(); ++i) {
    int cp = cs[i];
    std::string u;
    if (cp < 0x80) {
      u += static_cast<char>(cp);
    } else if (cp < 0x800) {
      u += static_cast<char>(0xC0 | (cp >> 6));
      u += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
      u += static_cast<char>(0xE0 | (cp >> 12));
      u += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      u += static_cast<char>(0x80 | (cp & 0x3F));
    }
    table[bs[i]] = u;
  }
  return table;
}

const std::vector<std::string>& byte_table() {
  static const std::vector<std::string> t = byte_encoder();
  return t;
}

// greedy BPE on one word (already byte-remapped, split into unicode chars).
// Round semantics match HF exactly (tokenization_clip.py:417-457): pick the
// globally lowest-rank bigram, then one left-to-right pass replacing EVERY
// occurrence of that bigram, then recompute.  (One-at-a-time lowest-rank
// merging is NOT equivalent in general — merge order within a round differs
// when a merge creates a lower-ranked pair overlapping a later occurrence.)
void bpe_word(const Tokenizer& tk, std::vector<std::string> parts,
              std::vector<int32_t>* out) {
  if (parts.empty()) return;
  parts.back() += "</w>";
  while (parts.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = tk.merge_rank.find(merge_key(parts[i], parts[i + 1]));
      if (it != tk.merge_rank.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    const std::string first = parts[best_i];
    const std::string second = parts[best_i + 1];
    std::vector<std::string> merged;
    merged.reserve(parts.size());
    size_t i = 0;
    while (i < parts.size()) {
      if (i + 1 < parts.size() && parts[i] == first &&
          parts[i + 1] == second) {
        merged.push_back(first + second);
        i += 2;
      } else {
        merged.push_back(parts[i]);
        ++i;
      }
    }
    parts = std::move(merged);
  }
  for (const auto& p : parts) {
    auto it = tk.vocab.find(p);
    // unknown -> unk token (HF maps to <|endoftext|>)
    out->push_back(it != tk.vocab.end() ? it->second : tk.eos);
  }
}

bool is_letter(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c >= 0x80;
}
bool is_digit(unsigned char c) { return c >= '0' && c <= '9'; }
bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

// split one UTF-8 string into CLIP word-regex chunks:
// letters+ | single digit | other-punct-run (approximation of the CLIP
// pattern for the ASCII/UTF-8 text SD prompts use)
std::vector<std::string> split_words(const std::string& text) {
  std::vector<std::string> words;
  size_t i = 0;
  const size_t n = text.size();
  while (i < n) {
    unsigned char c = text[i];
    if (is_space(c)) {
      ++i;
      continue;
    }
    size_t j = i;
    if (is_letter(c)) {
      while (j < n && is_letter(static_cast<unsigned char>(text[j]))) ++j;
    } else if (is_digit(c)) {
      j = i + 1;  // single digit per token, like CLIP's \d
    } else {
      while (j < n) {
        unsigned char d = text[j];
        if (is_space(d) || is_letter(d) || is_digit(d)) break;
        ++j;
      }
    }
    words.emplace_back(text.substr(i, j - i));
    i = j;
  }
  return words;
}

}  // namespace

extern "C" {

// vocab_blob: NUL-separated token strings, ids are their order.
// merges_blob: NUL-separated "first second" strings, rank = order.
void* ppt_bpe_create(const char* vocab_blob, int64_t vocab_len,
                     int32_t vocab_count, const char* merges_blob,
                     int64_t merges_len, int32_t merges_count,
                     int32_t bos, int32_t eos) {
  auto* tk = new Tokenizer();
  tk->bos = bos;
  tk->eos = eos;
  {
    const char* p = vocab_blob;
    const char* end = vocab_blob + vocab_len;
    for (int32_t id = 0; id < vocab_count && p < end; ++id) {
      std::string tok(p);
      tk->vocab.emplace(std::move(tok), id);
      p += std::strlen(p) + 1;
    }
  }
  {
    const char* p = merges_blob;
    const char* end = merges_blob + merges_len;
    for (int32_t r = 0; r < merges_count && p < end; ++r) {
      tk->merge_rank.emplace(std::string(p), r);
      p += std::strlen(p) + 1;
    }
  }
  return tk;
}

void ppt_bpe_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode lowercased text into out_ids (caller-allocated, cap out_cap).
// Returns number of ids written (no bos/eos/padding — Python adds those).
// Encode ONE already-normalized, already-segmented word (a chunk produced by
// the CLIP word regex).  Byte-remap + greedy merges + vocab lookup happen
// here; normalization/segmentation stay in Python where the unicode tables
// live (text/tokenizer.py::segment_words — HF-identical).
void encode_word(const Tokenizer& tk, const std::string& word,
                 std::vector<int32_t>* ids) {
  // the two special literals survive BPE intact (HF pre-seeded cache)
  if (word == "<|startoftext|>") {
    ids->push_back(tk.bos);
    return;
  }
  if (word == "<|endoftext|>") {
    ids->push_back(tk.eos);
    return;
  }
  const auto& bt = byte_table();
  std::string remapped;
  for (unsigned char b : word) remapped += bt[b];
  std::vector<std::string> parts;
  size_t i = 0;
  while (i < remapped.size()) {
    unsigned char c = remapped[i];
    size_t len = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    parts.push_back(remapped.substr(i, len));
    i += len;
  }
  bpe_word(tk, std::move(parts), ids);
}

// Encode pre-segmented words (NUL-separated blob of n_words chunks) into
// out_ids.  Returns number of ids written (no bos/eos/padding).
int32_t ppt_bpe_encode_words(void* handle, const char* words_blob,
                             int32_t n_words, int32_t out_cap,
                             int32_t* out_ids) {
  const auto* tk = static_cast<Tokenizer*>(handle);
  std::vector<int32_t> ids;
  const char* p = words_blob;
  for (int32_t w = 0; w < n_words; ++w) {
    std::string word(p);
    p += word.size() + 1;
    encode_word(*tk, word, &ids);
  }
  int32_t n = static_cast<int32_t>(ids.size());
  if (n > out_cap) n = out_cap;
  std::memcpy(out_ids, ids.data(), n * sizeof(int32_t));
  return n;
}

int32_t ppt_bpe_encode(void* handle, const char* text, int32_t out_cap,
                       int32_t* out_ids) {
  const auto* tk = static_cast<Tokenizer*>(handle);
  std::string lowered;
  lowered.reserve(std::strlen(text));
  for (const char* p = text; *p; ++p) {
    char c = *p;
    if (c >= 'A' && c <= 'Z') c += 32;
    lowered += c;
  }
  std::vector<int32_t> ids;
  for (const auto& word : split_words(lowered)) {
    encode_word(*tk, word, &ids);
  }
  int32_t n = static_cast<int32_t>(ids.size());
  if (n > out_cap) n = out_cap;
  std::memcpy(out_ids, ids.data(), n * sizeof(int32_t));
  return n;
}

}  // extern "C"
