// Word-level ARPA n-gram language model with Katz backoff.
// Native twin of dsjax/decode/lm.py (capability equivalent of the KenLM
// scorer the reference uses through ctcdecode, reference: decoder.py:69-74).
#pragma once

#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace dsjax {

class ArpaLM {
 public:
  // Returns nullptr-equivalent empty model on failure; check ok().
  explicit ArpaLM(const std::string& path);

  bool ok() const { return order_ > 0; }
  int order() const { return order_; }

  // log10 P(word | context), context given oldest-first. Applies Katz
  // backoff; OOV maps to <unk> when present else a -100 penalty.
  double score_word(const std::vector<std::string>& context,
                    const std::string& word) const;

  // natural-log convenience (decoder fuses in ln space)
  double score_word_ln(const std::vector<std::string>& context,
                       const std::string& word) const;

 private:
  struct Entry {
    float logp;
    float backoff;
  };
  // ngrams_[n-1]: map from space-joined n-gram to (logp, backoff)
  std::vector<std::unordered_map<std::string, Entry>> ngrams_;
  int order_ = 0;
  bool has_unk_ = false;

  double score_rec(const std::vector<std::string>& words, size_t start) const;
};

}  // namespace dsjax
