// BoW-lite place recognition: a flat binary vocabulary trained online by
// k-majority over the session's own ORB descriptors, plus an inverted
// keyframe index with tf-idf scoring. Fills the role the reference's
// DBoW2 vocabulary + KeyFrameDatabase play for relocalization candidate
// selection (ref dependencies/DBoW2, src/KeyFrameDatabase.cc:1-311,
// src/System.cc:53-66) without shipping a pre-trained ORBvoc.bin: an
// object-mapping session sees a single environment, so a small vocabulary
// trained on its first keyframes reaches the same recall.
#pragma once

#include <array>
#include <cstdint>
#include <map>
#include <vector>

#include <opencv2/core.hpp>

namespace romap {

class KeyFrame;

class BowVocabulary {
 public:
  static constexpr int kWords = 256;
  static constexpr int kTrainDescMin = 8000;
  static constexpr int kIters = 4;

  bool trained() const { return trained_; }

  // Accumulate descriptors; trains once kTrainDescMin have been seen.
  // Returns true exactly once, on the call that trained the vocabulary.
  bool TrainAccumulate(const cv::Mat& descriptors);

  // Nearest word (medoid) by Hamming distance for one 32-byte ORB row.
  int Word(const uint8_t* desc) const;

  // Per-row word ids (the reference's DBoW2 FeatureVector role: groups
  // descriptors by word so matching is O(shared words), not O(N*M)).
  std::vector<int> WordsOf(const cv::Mat& descriptors) const;

  // L1-normalized word histogram (term frequencies) of a descriptor matrix.
  std::map<int, float> Vector(const cv::Mat& descriptors) const;

 private:
  void Train();

  std::vector<cv::Mat> pending_;
  int n_pending_ = 0;
  bool trained_ = false;
  std::array<std::array<uint64_t, 4>, kWords> words_{};
};

class KeyFrameDatabase {
 public:
  explicit KeyFrameDatabase(const BowVocabulary* voc) : voc_(voc) {}

  void Add(KeyFrame* kf);
  void Clear();

  // Top-k non-bad keyframes by tf-idf similarity to the query descriptors.
  std::vector<KeyFrame*> Query(const cv::Mat& descriptors, int top_k) const;

  // Same, with scores — lets the caller gate candidates by relative score
  // (the reference keeps candidates scoring >= 0.75x the best,
  // ref KeyFrameDatabase::DetectRelocalizationCandidates :250-310).
  std::vector<std::pair<float, KeyFrame*>> QueryScored(
      const cv::Mat& descriptors, int top_k) const;

  size_t size() const { return n_kf_; }

 private:
  const BowVocabulary* voc_;
  size_t n_kf_ = 0;
  std::array<std::vector<std::pair<KeyFrame*, float>>, BowVocabulary::kWords>
      inv_{};
};

}  // namespace romap
