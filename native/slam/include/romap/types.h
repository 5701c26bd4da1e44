// Core value types of the SLAM frontend: small fixed-size linear algebra on
// cv::Matx (no Eigen in this image), rigid transforms, detections, cuboids.
//
// This is a ground-up C++17 rebuild of the behaviors of the reference's
// ORB-SLAM2 + RO-MAP object layer (reference: /root/reference/src,
// include/) — reimplemented against OpenCV types, not a translation.
#pragma once

#include <opencv2/core.hpp>

#include <cmath>
#include <cstdint>
#include <map>
#include <string>
#include <vector>

namespace romap {

// Deterministic ordering for pointer-keyed containers. Heap addresses vary
// with unrelated allocations (and run to run), so a std::map/set keyed on
// raw pointers iterates in an arbitrary order — which leaks into
// covisibility rankings, BA residual-assembly (float summation) order, and
// relocalization candidate order, making tracking results depend on memory
// layout (measured: a padding-only struct change moved tracking_test ATE
// 0.036 -> 0.130). Ordering by the stable creation id makes iteration
// reproducible; the address tiebreak only covers unregistered objects
// (id -1 in unit tests) where determinism is not required.
struct ById {
  template <class T>
  bool operator()(const T* a, const T* b) const {
    return a->id != b->id ? a->id < b->id : a < b;
  }
};

using Vec3 = cv::Vec3f;
using Mat3 = cv::Matx33f;
using Mat4 = cv::Matx44f;

// Rigid transform (rotation + translation), composable.
struct SE3 {
  Mat3 R = Mat3::eye();
  Vec3 t{0, 0, 0};

  Vec3 operator*(const Vec3& p) const { return R * p + t; }
  SE3 operator*(const SE3& o) const { return {R * o.R, R * o.t + t}; }
  SE3 inverse() const {
    Mat3 Rt = R.t();
    return {Rt, -(Rt * t)};
  }
  Mat4 matrix() const {
    Mat4 m = Mat4::eye();
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) m(r, c) = R(r, c);
      m(r, 3) = t[r];
    }
    return m;
  }
  static SE3 FromMatrix(const Mat4& m) {
    SE3 out;
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) out.R(r, c) = m(r, c);
      out.t[r] = m(r, 3);
    }
    return out;
  }
};

// Rotation about +z by yaw (the object layer estimates a 1-DoF rotation,
// ref Converter::eulerAnglesToMatrix usage in src/ObjectMap.cc:380).
inline Mat3 YawRotation(float yaw) {
  float c = std::cos(yaw), s = std::sin(yaw);
  return Mat3(c, -s, 0, s, c, 0, 0, 0, 1);
}

// Rotation -> quaternion (x, y, z, w), w >= 0 (for TUM-format export).
inline void RotToQuat(const Mat3& r, float q[4]) {
  float tr = r(0, 0) + r(1, 1) + r(2, 2);
  if (tr > 0) {
    float s = std::sqrt(tr + 1.0f) * 2;
    q[3] = 0.25f * s;
    q[0] = (r(2, 1) - r(1, 2)) / s;
    q[1] = (r(0, 2) - r(2, 0)) / s;
    q[2] = (r(1, 0) - r(0, 1)) / s;
  } else {
    int i = 0;
    if (r(1, 1) > r(0, 0)) i = 1;
    if (r(2, 2) > r(i, i)) i = 2;
    int j = (i + 1) % 3, k = (i + 2) % 3;
    float s = std::sqrt(std::max(r(i, i) - r(j, j) - r(k, k) + 1.0f, 1e-12f)) * 2;
    q[i] = 0.25f * s;
    q[j] = (r(j, i) + r(i, j)) / s;
    q[k] = (r(k, i) + r(i, k)) / s;
    q[3] = (r(k, j) - r(j, k)) / s;
  }
  if (q[3] < 0) {
    for (int n = 0; n < 4; ++n) q[n] = -q[n];
  }
}

// Camera intrinsics + image bounds (subset of the reference Frame members
// used by the object layer).
struct CameraModel {
  float fx = 0, fy = 0, cx = 0, cy = 0;
  float min_x = 0, min_y = 0, max_x = 0, max_y = 0;

  cv::Point2f Project(const Vec3& p_cam) const {
    float inv_z = 1.0f / p_cam[2];
    return {fx * p_cam[0] * inv_z + cx, fy * p_cam[1] * inv_z + cy};
  }
};

// 2D detection box with class/score/edge flags
// (ref include/ObjectFrame.h Bbox : cv::Rect).
struct Bbox {
  cv::Rect_<float> rect;
  int cls = -1;
  float confidence = 0.0f;
  bool edge = false;            // touches the image border
  bool edge_and_small = false;  // near border and small -> unreliable

  float IoU(const cv::Rect_<float>& other) const {
    float inter = (rect & other).area();
    float uni = rect.area() + other.area() - inter;
    return uni > 0 ? inter / uni : 0.0f;
  }
};

// Line segment set [n, 4] = (x1, y1, x2, y2), each left-to-right.
using Lines = std::vector<cv::Vec4f>;

// Oriented 3D bounding box (ref include/ObjectMap.h Cuboid).
struct Cuboid {
  SE3 t_obj_w;  // world -> object
  float a1 = 0, a2 = 0, a3 = 0;  // half extents
  float max_dist = 0;            // diagonal half length
  // per-axis extent provenance: true = silhouette-confirmed by
  // near-transverse views (trustworthy); false = point-cloud fallback
  // (observability-limited, typically biased short — consumers should pad)
  bool ext_tight[3] = {false, false, false};

  // world-frame corner k (k in [0,8))
  Vec3 Corner(int k) const {
    Vec3 local((k & 1) ? a1 : -a1, (k & 2) ? a2 : -a2, (k & 4) ? a3 : -a3);
    return t_obj_w.inverse() * local;
  }
};

}  // namespace romap
