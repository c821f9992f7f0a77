#include "lm.h"

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>

namespace dsjax {

namespace {
constexpr double kLog10ToLn = 2.302585092994046;

std::string join(const std::vector<std::string>& words, size_t start,
                 size_t end) {
  std::string out;
  for (size_t i = start; i < end; ++i) {
    if (i > start) out.push_back(' ');
    out += words[i];
  }
  return out;
}
}  // namespace

ArpaLM::ArpaLM(const std::string& path) {
  std::ifstream f(path);
  if (!f.is_open()) return;
  std::string line;
  int cur = 0;
  enum { NONE, DATA, NGRAMS } section = NONE;
  while (std::getline(f, line)) {
    // strip trailing CR / whitespace
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n' ||
                             line.back() == ' '))
      line.pop_back();
    if (line.empty()) continue;
    if (line == "\\data\\") {
      section = DATA;
      continue;
    }
    if (line.size() > 8 && line[0] == '\\' &&
        line.compare(line.size() - 7, 7, "-grams:") == 0) {
      cur = std::atoi(line.c_str() + 1);
      while ((int)ngrams_.size() < cur) ngrams_.emplace_back();
      section = NGRAMS;
      continue;
    }
    if (line == "\\end\\") break;
    if (section != NGRAMS || cur == 0) continue;

    // fields: logp \t w1 [w2 ...] [\t backoff]  (tabs or spaces)
    std::istringstream ss(line);
    double logp;
    if (!(ss >> logp)) continue;
    std::vector<std::string> words(cur);
    bool bad = false;
    for (int i = 0; i < cur; ++i) {
      if (!(ss >> words[i])) {
        bad = true;
        break;
      }
    }
    if (bad) continue;
    double backoff = 0.0;
    ss >> backoff;  // optional
    Entry e{(float)logp, (float)backoff};
    ngrams_[cur - 1].emplace(join(words, 0, words.size()), e);
  }
  order_ = (int)ngrams_.size();
  has_unk_ = order_ >= 1 && ngrams_[0].count("<unk>") > 0;
}

double ArpaLM::score_rec(const std::vector<std::string>& words,
                         size_t start) const {
  size_t n = words.size() - start;
  if (n == 0) return -99.0;
  if ((int)n <= order_) {
    auto& table = ngrams_[n - 1];
    auto it = table.find(join(words, start, words.size()));
    if (it != table.end()) return it->second.logp;
  }
  if (n == 1) {
    if (has_unk_) return ngrams_[0].at("<unk>").logp;
    return -100.0;
  }
  // backoff weight of the context (words[start..end-1))
  double bo = 0.0;
  size_t ctx_n = n - 1;
  if ((int)ctx_n <= order_) {
    auto& table = ngrams_[ctx_n - 1];
    auto it = table.find(join(words, start, words.size() - 1));
    if (it != table.end()) bo = it->second.backoff;
  }
  return bo + score_rec(words, start + 1);
}

double ArpaLM::score_word(const std::vector<std::string>& context,
                          const std::string& word) const {
  std::vector<std::string> ngram;
  size_t ctx_keep =
      order_ > 1 ? std::min(context.size(), (size_t)(order_ - 1)) : 0;
  for (size_t i = context.size() - ctx_keep; i < context.size(); ++i)
    ngram.push_back(context[i]);
  ngram.push_back(word);
  return score_rec(ngram, 0);
}

double ArpaLM::score_word_ln(const std::vector<std::string>& context,
                             const std::string& word) const {
  return score_word(context, word) * kLog10ToLn;
}

}  // namespace dsjax
