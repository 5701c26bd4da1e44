// ORB feature extraction + descriptor matching primitives. The reference
// vendors ORB-SLAM2's 1134-line pyramid extractor; this rebuild uses
// OpenCV's cv::ORB with grid bucketing for spatial uniformity.
#pragma once

#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/features2d.hpp>

namespace romap {

class OrbExtractor {
 public:
  explicit OrbExtractor(int n_features = 1200, int grid = 4);

  void Extract(const cv::Mat& gray, std::vector<cv::KeyPoint>* kps,
               cv::Mat* desc) const;

 private:
  cv::Ptr<cv::ORB> orb_;
  int n_features_;
  int grid_;
};

// Hamming distance between two 1x32 ORB descriptors.
int DescriptorDistance(const cv::Mat& a, const cv::Mat& b);

}  // namespace romap
