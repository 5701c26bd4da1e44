#include "romap/bow.h"

#include <algorithm>
#include <cmath>
#include <cstring>

#include "romap/map.h"

namespace romap {

namespace {

inline void ToWords(const uint8_t* d, uint64_t w[4]) {
  std::memcpy(w, d, 32);
}

inline int Hamming(const uint64_t a[4], const uint64_t b[4]) {
  return __builtin_popcountll(a[0] ^ b[0]) + __builtin_popcountll(a[1] ^ b[1]) +
         __builtin_popcountll(a[2] ^ b[2]) + __builtin_popcountll(a[3] ^ b[3]);
}

}  // namespace

bool BowVocabulary::TrainAccumulate(const cv::Mat& descriptors) {
  if (trained_ || descriptors.empty()) return false;
  pending_.push_back(descriptors.clone());
  n_pending_ += descriptors.rows;
  if (n_pending_ < kTrainDescMin) return false;
  Train();
  return trained_;
}

void BowVocabulary::Train() {
  // gather all pending rows
  std::vector<std::array<uint64_t, 4>> data;
  data.reserve(n_pending_);
  for (const cv::Mat& m : pending_)
    for (int r = 0; r < m.rows; ++r) {
      std::array<uint64_t, 4> w;
      ToWords(m.ptr<uint8_t>(r), w.data());
      data.push_back(w);
    }
  pending_.clear();
  if (data.size() < static_cast<size_t>(kWords)) return;

  // deterministic spread init: every (n/kWords)-th descriptor
  const size_t stride = data.size() / kWords;
  for (int k = 0; k < kWords; ++k) words_[k] = data[k * stride];

  // k-majority iterations: assign by Hamming, medoid = per-bit majority
  std::vector<int> assign(data.size());
  for (int it = 0; it < kIters; ++it) {
    for (size_t i = 0; i < data.size(); ++i) {
      int best = 0, bd = 257;
      for (int k = 0; k < kWords; ++k) {
        int d = Hamming(data[i].data(), words_[k].data());
        if (d < bd) {
          bd = d;
          best = k;
        }
      }
      assign[i] = best;
    }
    std::vector<std::array<int, 256>> bitcount(kWords);
    std::vector<int> members(kWords, 0);
    for (auto& bc : bitcount) bc.fill(0);
    for (size_t i = 0; i < data.size(); ++i) {
      int k = assign[i];
      ++members[k];
      for (int b = 0; b < 256; ++b)
        if (data[i][b >> 6] >> (b & 63) & 1) ++bitcount[k][b];
    }
    for (int k = 0; k < kWords; ++k) {
      if (!members[k]) continue;  // keep the old medoid for empty words
      std::array<uint64_t, 4> m{};
      for (int b = 0; b < 256; ++b)
        if (2 * bitcount[k][b] > members[k]) m[b >> 6] |= 1ull << (b & 63);
      words_[k] = m;
    }
  }
  trained_ = true;
}

int BowVocabulary::Word(const uint8_t* desc) const {
  uint64_t q[4];
  ToWords(desc, q);
  int best = 0, bd = 257;
  for (int k = 0; k < kWords; ++k) {
    int d = Hamming(q, words_[k].data());
    if (d < bd) {
      bd = d;
      best = k;
    }
  }
  return best;
}

std::vector<int> BowVocabulary::WordsOf(const cv::Mat& descriptors) const {
  std::vector<int> words;
  if (!trained_ || descriptors.empty()) return words;
  words.resize(descriptors.rows);
  for (int r = 0; r < descriptors.rows; ++r)
    words[r] = Word(descriptors.ptr<uint8_t>(r));
  return words;
}

std::map<int, float> BowVocabulary::Vector(const cv::Mat& descriptors) const {
  std::map<int, float> v;
  if (!trained_ || descriptors.empty()) return v;
  for (int w : WordsOf(descriptors)) v[w] += 1.0f;
  for (auto& kv : v) kv.second /= descriptors.rows;
  return v;
}

void KeyFrameDatabase::Add(KeyFrame* kf) {
  if (!voc_->trained() || !kf) return;
  // cache per-descriptor words on the keyframe for O(shared-words) matching
  kf->bow_words = voc_->WordsOf(kf->descriptors);
  std::map<int, float> v;
  for (int w : kf->bow_words) v[w] += 1.0f;
  for (auto& kv : v) {
    kv.second /= kf->bow_words.size();
    inv_[kv.first].push_back({kf, kv.second});
  }
  ++n_kf_;
}

void KeyFrameDatabase::Clear() {
  for (auto& bucket : inv_) bucket.clear();
  n_kf_ = 0;
}

std::vector<KeyFrame*> KeyFrameDatabase::Query(const cv::Mat& descriptors,
                                               int top_k) const {
  std::vector<KeyFrame*> out;
  for (const auto& [s, kf] : QueryScored(descriptors, top_k))
    out.push_back(kf);
  return out;
}

std::vector<std::pair<float, KeyFrame*>> KeyFrameDatabase::QueryScored(
    const cv::Mat& descriptors, int top_k) const {
  std::vector<std::pair<float, KeyFrame*>> ranked;
  if (!voc_->trained() || n_kf_ == 0) return ranked;
  std::map<KeyFrame*, float, ById> score;
  for (const auto& kv : voc_->Vector(descriptors)) {
    const auto& bucket = inv_[kv.first];
    if (bucket.empty()) continue;
    // idf: words shared by most keyframes carry little place information
    float idf = std::log(static_cast<float>(n_kf_ + 1) / (bucket.size() + 1));
    float qi = kv.second * idf;
    for (const auto& e : bucket)
      if (!e.first->bad) score[e.first] += qi * e.second * idf;
  }
  ranked.reserve(score.size());
  for (const auto& kv : score) ranked.push_back({kv.second, kv.first});
  // id tiebreak keeps equal-score candidate order independent of heap
  // layout (see ById in types.h)
  std::sort(ranked.begin(), ranked.end(), [](const auto& a, const auto& b) {
    return a.first != b.first ? a.first > b.first
                              : a.second->id < b.second->id;
  });
  if (static_cast<int>(ranked.size()) > top_k) ranked.resize(top_k);
  return ranked;
}

}  // namespace romap
