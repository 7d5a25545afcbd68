// Fast greedy-BPE encoder (C++), exact semantics of the reference encoder
// (llama2.ts:305-344) over UTF-16 code units:
//   - seed tokens: one vocab lookup per UTF-16 unit (JS charAt semantics)
//   - merge loop: repeatedly merge the adjacent pair whose concatenation has
//     the strictly highest score; ties -> earliest pair; lookups return the
//     FIRST index for duplicate vocab strings (Array.indexOf semantics)
//
// The reference does O(V) linear scans per lookup; tpu_llama's Python
// encoder uses dicts; this C++ version removes interpreter overhead for the
// serving admission path (tokenization shows up at continuous-batching
// rates).  Exposed via a minimal C ABI for ctypes (no pybind11 in image).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 bpe.cpp -o libtpu_llama_bpe.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Bpe {
  std::vector<std::u16string> vocab;
  std::vector<float> scores;
  std::unordered_map<std::u16string, int32_t> index;  // first occurrence
};

}  // namespace

extern "C" {

// vocab_data: concatenated UTF-16LE units of all tokens.
// offsets: n_vocab+1 prefix offsets (in units) into vocab_data.
void* bpe_create(const uint16_t* vocab_data, const int32_t* offsets,
                 int32_t n_vocab, const float* scores) {
  auto* b = new Bpe();
  b->vocab.reserve(n_vocab);
  b->scores.assign(scores, scores + n_vocab);
  for (int32_t i = 0; i < n_vocab; ++i) {
    const uint16_t* begin = vocab_data + offsets[i];
    const uint16_t* end = vocab_data + offsets[i + 1];
    b->vocab.emplace_back(reinterpret_cast<const char16_t*>(begin),
                          static_cast<size_t>(end - begin));
    b->index.emplace(b->vocab.back(), i);  // emplace keeps FIRST index
  }
  return b;
}

void bpe_free(void* handle) { delete static_cast<Bpe*>(handle); }

// Returns number of tokens, or -1 - position of the first unknown unit.
int32_t bpe_encode(void* handle, const uint16_t* text, int32_t text_len,
                   int32_t* out, int32_t out_cap) {
  auto* b = static_cast<Bpe*>(handle);
  std::vector<int32_t> toks;
  toks.reserve(text_len);
  for (int32_t i = 0; i < text_len; ++i) {
    std::u16string ch(1, static_cast<char16_t>(text[i]));
    auto it = b->index.find(ch);
    if (it == b->index.end()) return -1 - i;  // unknown char (llama2.ts:310)
    toks.push_back(it->second);
  }

  while (true) {
    float best_score = -1e10f;
    int32_t best_id = -1;
    int32_t best_idx = -1;
    for (size_t i = 0; i + 1 < toks.size(); ++i) {
      std::u16string merged = b->vocab[toks[i]] + b->vocab[toks[i + 1]];
      auto it = b->index.find(merged);
      if (it != b->index.end() && b->scores[it->second] > best_score) {
        best_score = b->scores[it->second];
        best_id = it->second;
        best_idx = static_cast<int32_t>(i);
      }
    }
    if (best_idx < 0) break;
    toks[best_idx] = best_id;
    toks.erase(toks.begin() + best_idx + 1);
  }

  int32_t n = static_cast<int32_t>(toks.size());
  if (n > out_cap) return -1000000000;  // caller buffer too small
  std::memcpy(out, toks.data(), n * sizeof(int32_t));
  return n;
}

}  // extern "C"
