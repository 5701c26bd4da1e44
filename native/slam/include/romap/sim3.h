// Sim(3) — similarity transforms (scale + rotation + translation) and the
// solvers loop closing needs: closed-form Horn/Umeyama alignment of matched
// 3D point sets, a RANSAC wrapper with reprojection-gated inliers, and a
// Sim(3) pose-graph optimizer (Gauss-Newton, numeric Jacobians).
//
// Fills the role of the reference's Sim3Solver (ref src/Sim3Solver.cc:1-425,
// 3-point RANSAC with bidirectional reprojection checks) and of g2o's
// Sim3 vertex/edge stack used by Optimizer::OptimizeEssentialGraph
// (ref src/Optimizer.cc, src/LoopClosing.cc:402-585) — rebuilt on cv::Matx
// doubles, no g2o. Monocular SLAM accumulates SCALE drift as well as pose
// drift, which is why the loop transform has 7 DoF, not 6.
#pragma once

#include <set>
#include <vector>

#include <opencv2/core.hpp>

#include "romap/types.h"

namespace romap {

// Similarity transform p' = s * R * p + t (double precision — pose-graph
// residual assembly is ill-conditioned in float).
struct Sim3 {
  double s = 1.0;
  cv::Matx33d R = cv::Matx33d::eye();
  cv::Vec3d t{0, 0, 0};

  cv::Vec3d operator*(const cv::Vec3d& p) const { return s * (R * p) + t; }
  Sim3 operator*(const Sim3& o) const {
    return {s * o.s, R * o.R, s * (R * o.t) + t};
  }
  Sim3 inverse() const {
    cv::Matx33d Rt = R.t();
    return {1.0 / s, Rt, (-1.0 / s) * (Rt * t)};
  }

  static Sim3 FromSE3(const SE3& T) {
    Sim3 out;
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) out.R(r, c) = T.R(r, c);
      out.t[r] = T.t[r];
    }
    return out;
  }
  // Back to a rigid pose: the scale folds into the translation
  // (a world->camera Sim3 [s,R,t] localizes cameras identically to the
  // SE3 [R, t/s] — the convention the reference applies when writing
  // corrected keyframe poses, ref src/LoopClosing.cc:488-495).
  SE3 ToSE3() const {
    SE3 out;
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) out.R(r, c) = static_cast<float>(R(r, c));
      out.t[r] = static_cast<float>(t[r] / s);
    }
    return out;
  }
};

// Tangent-space coordinates: v = [u(translation), w(rotation), lambda(log
// scale)]. Exp/Log are exact (the translation block uses the series form of
// W = sum A^n/(n+1)!, A = lambda*I + [w]x).
using Sim3Tangent = cv::Vec<double, 7>;
Sim3 Sim3Exp(const Sim3Tangent& v);
Sim3Tangent Sim3Log(const Sim3& S);

// Closed-form Umeyama/Horn alignment with scale: finds S minimizing
// sum |dst_i - S * src_i|^2. Requires >= 3 non-degenerate points.
bool SolveSim3(const std::vector<cv::Vec3d>& src,
               const std::vector<cv::Vec3d>& dst, Sim3* out);

// RANSAC Sim3 between two cameras from matched 3D points expressed in each
// camera's frame (x1 ~ S12 * x2), inliers gated by reprojection error of
// the transformed point against the observed keypoint in BOTH images plus
// positive depth (the reference's bidirectional CheckInliers,
// ref src/Sim3Solver.cc:180-230).
struct Sim3RansacResult {
  Sim3 s12;
  std::vector<char> inliers;
  int n_inliers = 0;
};
Sim3RansacResult SolveSim3Ransac(const std::vector<cv::Vec3d>& x1,
                                 const std::vector<cv::Vec3d>& x2,
                                 const std::vector<cv::Point2f>& px1,
                                 const std::vector<cv::Point2f>& px2,
                                 const CameraModel& cam1,
                                 const CameraModel& cam2, int iters = 300,
                                 float px_thresh = 4.0f, uint32_t seed = 42);

// Levenberg-Marquardt polish of a RANSAC Sim3's ROTATION and TRANSLATION
// (the reference's Optimizer::OptimizeSim3, ref src/LoopClosing.cc:327-341):
// minimizes Huber-robustified bidirectional reprojection error over the
// inlier correspondences (x1 ~ S12 * x2, observed at px1/px2), plus
// optional forward-only matches (x2f projected through S12 against px1f —
// the wider projection-verified set that has no reverse observation).
//
// The SCALE is deliberately NOT optimized — it stays pinned at the input
// value (the caller's full-consensus Umeyama 3D-3D estimate, which
// SolveSim3Ransac already refits on all inliers). Loop view pairs have
// nearly coincident camera centers, so the reprojection objective is
// almost flat in scale (the reverse residual is EXACTLY scale-invariant:
// proj(lambda*v) = proj(v)); unpinned GN walked a 1.27-scale loop to 29.6,
// and even a 5%-sigma log-scale prior lost to the Huber-linear cost of
// wrong guided matches. The 3D-3D alignment is the one scale-observable
// measurement at a loop junction. Returns the final inlier count under
// `huber_px`.
int RefineSim3(Sim3* s12, const std::vector<cv::Vec3d>& x1,
               const std::vector<cv::Vec3d>& x2,
               const std::vector<cv::Point2f>& px1,
               const std::vector<cv::Point2f>& px2,
               const std::vector<char>& use, const CameraModel& cam1,
               const CameraModel& cam2,
               const std::vector<cv::Vec3d>& x2f = {},
               const std::vector<cv::Point2f>& px1f = {}, int iters = 10,
               float huber_px = 2.5f);

// Sim(3) pose graph: vertices are world->camera similarities, each edge
// constrains the relative transform S_ji = S_j * S_i^-1. Gauss-Newton with
// numeric Jacobians and dense normal equations — exact for the map sizes an
// object-mapping session produces (V <= a few hundred; the solve is
// O((7V)^3) per iteration). Indices in `fixed` are pinned (the loop
// keyframe pins both the gauge and the scale). Returns the final total
// squared residual.
struct Sim3Edge {
  int i = 0, j = 0;
  Sim3 s_ji;
  double weight = 1.0;
};
double OptimizeSim3Graph(std::vector<Sim3>* poses,
                         const std::vector<Sim3Edge>& edges,
                         const std::set<int>& fixed, int iters = 10);

}  // namespace romap
