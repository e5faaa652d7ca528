// Fast WordPiece tokenizer (C++, ctypes-bound).
//
// Host-side note tokenization is the CPU-bound stage of the ETL front-end
// (reference tokenizes with HF Python tokenizers inside the cohort builder,
// MIMIC-IV/cohort/build_cohort.py:42 bio_bert_chunks). This implements
// greedy longest-match WordPiece over a hash-indexed vocab with BERT basic
// tokenization (lowercase option, punctuation split, CJK isolation left out
// for clinical text), exposed through a minimal C API:
//
//   void* wp_create(const char* vocab_path, int lowercase);
//   int   wp_encode(void* h, const char* text, int* out_ids, int max_out);
//   int   wp_vocab_size(void* h);
//   void  wp_free(void* h);
//
// Build: g++ -O3 -std=c++17 -shared -fPIC wordpiece.cpp -o libwordpiece.so
// (driven lazily by multimodalrouting_tpu/data/native_tokenizer.py).

#include <algorithm>
#include <cctype>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct WordPiece {
  std::unordered_map<std::string, int> vocab;
  int unk_id = 100;  // [UNK]
  bool lowercase = true;
  size_t max_word_len = 100;
};

bool is_punct(unsigned char c) {
  return std::ispunct(c) != 0;
}

std::vector<std::string> basic_tokenize(const std::string& text, bool lowercase) {
  std::vector<std::string> out;
  std::string cur;
  auto flush = [&]() {
    if (!cur.empty()) {
      out.push_back(cur);
      cur.clear();
    }
  };
  for (unsigned char c : text) {
    if (std::isspace(c)) {
      flush();
    } else if (is_punct(c)) {
      flush();
      out.emplace_back(1, static_cast<char>(c));
    } else {
      cur.push_back(lowercase ? static_cast<char>(std::tolower(c)) : static_cast<char>(c));
    }
  }
  flush();
  return out;
}

// greedy longest-match-first WordPiece of one word
void wordpiece_word(const WordPiece& wp, const std::string& word,
                    std::vector<int>* ids) {
  if (word.size() > wp.max_word_len) {
    ids->push_back(wp.unk_id);
    return;
  }
  std::vector<int> pieces;
  size_t start = 0;
  while (start < word.size()) {
    size_t end = word.size();
    int cur_id = -1;
    while (start < end) {
      std::string sub = word.substr(start, end - start);
      if (start > 0) sub = "##" + sub;
      auto it = wp.vocab.find(sub);
      if (it != wp.vocab.end()) {
        cur_id = it->second;
        break;
      }
      --end;
    }
    if (cur_id < 0) {
      ids->push_back(wp.unk_id);
      return;  // whole word becomes UNK on any failure (BERT semantics)
    }
    pieces.push_back(cur_id);
    start = end;
  }
  ids->insert(ids->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_path, int lowercase) {
  std::ifstream f(vocab_path);
  if (!f.good()) return nullptr;
  auto* wp = new WordPiece();
  wp->lowercase = lowercase != 0;
  std::string line;
  int idx = 0;
  while (std::getline(f, line)) {
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r')) line.pop_back();
    wp->vocab.emplace(line, idx++);
  }
  auto unk = wp->vocab.find("[UNK]");
  if (unk != wp->vocab.end()) wp->unk_id = unk->second;
  return wp;
}

int wp_vocab_size(void* h) {
  if (!h) return 0;
  return static_cast<int>(static_cast<WordPiece*>(h)->vocab.size());
}

// Returns number of ids written (<= max_out); -1 on error.
int wp_encode(void* h, const char* text, int* out_ids, int max_out) {
  if (!h || !text || !out_ids) return -1;
  const auto& wp = *static_cast<WordPiece*>(h);
  std::vector<int> ids;
  for (const auto& word : basic_tokenize(text, wp.lowercase)) {
    wordpiece_word(wp, word, &ids);
    if (static_cast<int>(ids.size()) >= max_out) break;
  }
  int n = std::min<int>(static_cast<int>(ids.size()), max_out);
  std::memcpy(out_ids, ids.data(), n * sizeof(int));
  return n;
}

void wp_free(void* h) {
  delete static_cast<WordPiece*>(h);
}

}  // extern "C"
