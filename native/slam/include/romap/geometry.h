// Two-view initialization, triangulation and pose estimation built on
// OpenCV's calib3d (findEssentialMat/recoverPose/solvePnP) — replacing the
// reference's hand-rolled Initializer (931 LoC) and g2o pose optimization.
#pragma once

#include <vector>

#include "romap/frame.h"
#include "romap/types.h"

namespace romap {

// Two-view relative pose + 3D points from matched keypoints.
// On success fills t21 (frame1 -> frame2), per-match 3D points in frame1's
// camera coordinates, and an inlier mask. Scale: median point depth == 1.
bool InitializeTwoView(const Frame& f1, const Frame& f2,
                       const std::vector<int>& matches12, SE3* t21,
                       std::vector<Vec3>* points3d,
                       std::vector<bool>* inliers);

// Midpoint-free linear triangulation of one correspondence given world
// poses; returns false on low parallax / behind-camera / big reprojection.
bool TriangulatePoint(const SE3& tcw1, const CameraModel& cam1,
                      const cv::Point2f& uv1, const SE3& tcw2,
                      const CameraModel& cam2, const cv::Point2f& uv2,
                      Vec3* world, float max_reproj_px = 2.0f,
                      float min_parallax_deg = 1.0f);

// Pose from 3D-2D matches: RANSAC PnP + LM refinement. Marks outliers in
// frame.outlier and returns the inlier count; pose written to frame.tcw.
int OptimizePose(Frame* frame);

}  // namespace romap
