// Shared test helper: Umeyama Sim(3) alignment of camera-center sets and
// the aligned ATE (the TUM-benchmark convention; matches the Python eval
// harness). A monocular (and especially a loop-closed) map is only defined
// up to a similarity gauge — raw world-frame differences conflate gauge
// freedom with inconsistency.
#pragma once

#include <algorithm>
#include <vector>

#include <opencv2/core.hpp>

namespace romap_test {

struct Sim3Alignment {
  double scale = 1.0;
  cv::Matx33d R = cv::Matx33d::eye();
  cv::Vec3d t{0, 0, 0};
  double ate = 0.0;  // mean |gt - (s*R*est + t)|

  cv::Vec3d Apply(const cv::Vec3d& est) const { return scale * (R * est) + t; }
};

// Finds (s, R, t) minimizing sum |gt_i - (s*R*est_i + t)|^2 (Umeyama 1991,
// with the determinant reflection guard), then reports the mean residual.
inline Sim3Alignment AlignSim3(const std::vector<cv::Vec3d>& gt,
                               const std::vector<cv::Vec3d>& est) {
  Sim3Alignment out;
  const size_t n = gt.size();
  if (n == 0 || est.size() != n) return out;
  cv::Vec3d mx(0, 0, 0), my(0, 0, 0);
  for (size_t k = 0; k < n; ++k) {
    mx += gt[k];
    my += est[k];
  }
  mx *= 1.0 / n;
  my *= 1.0 / n;
  cv::Matx33d cov = cv::Matx33d::zeros();
  double var_y = 0;
  for (size_t k = 0; k < n; ++k) {
    cov += (gt[k] - mx) * (est[k] - my).t();
    var_y += (est[k] - my).dot(est[k] - my);
  }
  cov *= 1.0 / n;
  var_y /= n;
  cv::Mat u, d, vt;
  cv::SVD::compute(cv::Mat(cov), d, u, vt, cv::SVD::FULL_UV);
  cv::Matx33d U(u.ptr<double>()), Vt(vt.ptr<double>());
  cv::Vec3d D(d.ptr<double>());
  cv::Matx33d fix = cv::Matx33d::eye();
  if (cv::determinant(cv::Mat(U)) * cv::determinant(cv::Mat(Vt)) < 0) {
    fix(2, 2) = -1;
    D[2] = -D[2];
  }
  out.R = U * fix * Vt;
  out.scale = (D[0] + D[1] + D[2]) / std::max(var_y, 1e-12);
  out.t = mx - out.scale * (out.R * my);
  double ate = 0;
  for (size_t k = 0; k < n; ++k) ate += cv::norm(gt[k] - out.Apply(est[k]));
  out.ate = ate / n;
  return out;
}

inline double AlignedATE(const std::vector<cv::Vec3d>& gt,
                         const std::vector<cv::Vec3d>& est) {
  return AlignSim3(gt, est).ate;
}

}  // namespace romap_test
