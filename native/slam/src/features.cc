#include "romap/features.h"

#include <algorithm>

namespace romap {

OrbExtractor::OrbExtractor(int n_features, int grid)
    : n_features_(n_features), grid_(grid) {
  // over-detect, then bucket for spatial uniformity
  orb_ = cv::ORB::create(n_features * 2, /*scaleFactor=*/1.2f, /*nlevels=*/8,
                         /*edgeThreshold=*/19, /*firstLevel=*/0, /*WTA_K=*/2,
                         cv::ORB::HARRIS_SCORE, /*patchSize=*/31,
                         /*fastThreshold=*/12);
}

void OrbExtractor::Extract(const cv::Mat& gray, std::vector<cv::KeyPoint>* kps,
                           cv::Mat* desc) const {
  std::vector<cv::KeyPoint> raw;
  cv::Mat raw_desc;
  orb_->detectAndCompute(gray, cv::noArray(), raw, raw_desc);
  if (raw.empty()) {
    kps->clear();
    *desc = cv::Mat();
    return;
  }
  // bucket into grid x grid cells, keep the strongest per-cell quota
  const int cells = grid_ * grid_;
  const int quota = std::max(n_features_ / cells, 1);
  float cw = static_cast<float>(gray.cols) / grid_;
  float ch = static_cast<float>(gray.rows) / grid_;
  std::vector<std::vector<int>> buckets(cells);
  for (size_t i = 0; i < raw.size(); ++i) {
    int cx = std::min(static_cast<int>(raw[i].pt.x / cw), grid_ - 1);
    int cy = std::min(static_cast<int>(raw[i].pt.y / ch), grid_ - 1);
    buckets[cy * grid_ + cx].push_back(static_cast<int>(i));
  }
  std::vector<int> keep;
  for (auto& b : buckets) {
    std::sort(b.begin(), b.end(), [&](int a, int c) {
      return raw[a].response > raw[c].response;
    });
    for (int k = 0; k < std::min<int>(quota, b.size()); ++k)
      keep.push_back(b[k]);
  }
  std::sort(keep.begin(), keep.end());
  kps->clear();
  desc->create(static_cast<int>(keep.size()), raw_desc.cols, raw_desc.type());
  for (size_t i = 0; i < keep.size(); ++i) {
    kps->push_back(raw[keep[i]]);
    raw_desc.row(keep[i]).copyTo(desc->row(static_cast<int>(i)));
  }
}

int DescriptorDistance(const cv::Mat& a, const cv::Mat& b) {
  return static_cast<int>(cv::norm(a, b, cv::NORM_HAMMING));
}

}  // namespace romap
