#include "romap/geometry.h"

#include <opencv2/calib3d.hpp>

#include <algorithm>
#include <cmath>

namespace romap {

namespace {

cv::Mat K(const CameraModel& cam) {
  return (cv::Mat_<double>(3, 3) << cam.fx, 0, cam.cx, 0, cam.fy, cam.cy, 0, 0,
          1);
}

SE3 FromRt(const cv::Mat& r, const cv::Mat& t) {
  SE3 out;
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j)
      out.R(i, j) = static_cast<float>(r.at<double>(i, j));
    out.t[i] = static_cast<float>(t.at<double>(i));
  }
  return out;
}

}  // namespace

bool InitializeTwoView(const Frame& f1, const Frame& f2,
                       const std::vector<int>& matches12, SE3* t21,
                       std::vector<Vec3>* points3d,
                       std::vector<bool>* inliers) {
  std::vector<cv::Point2f> p1, p2;
  std::vector<int> src;
  for (size_t i = 0; i < matches12.size(); ++i) {
    if (matches12[i] < 0) continue;
    p1.push_back(f1.keypoints[i].pt);
    p2.push_back(f2.keypoints[matches12[i]].pt);
    src.push_back(static_cast<int>(i));
  }
  if (p1.size() < 30) return false;

  cv::Mat mask;
  cv::theRNG().state = 0xC0FFEEu + p1.size();
  cv::Mat e = cv::findEssentialMat(p1, p2, K(f1.cam), cv::RANSAC, 0.999, 1.0,
                                   mask);
  if (e.empty() || e.rows != 3) return false;
  cv::Mat r, t;
  int n_pose = cv::recoverPose(e, p1, p2, K(f1.cam), r, t, mask);
  if (n_pose < 50) return false;
  *t21 = FromRt(r, t);

  // triangulate inliers in frame1 coordinates
  cv::Mat proj1 = K(f1.cam) * cv::Mat::eye(3, 4, CV_64F);
  cv::Mat rt(3, 4, CV_64F);
  r.copyTo(rt(cv::Rect(0, 0, 3, 3)));
  t.copyTo(rt(cv::Rect(3, 0, 1, 3)));
  cv::Mat proj2 = K(f2.cam) * rt;
  cv::Mat pts4;
  cv::triangulatePoints(proj1, proj2, p1, p2, pts4);

  points3d->assign(matches12.size(), Vec3(0, 0, 0));
  inliers->assign(matches12.size(), false);
  std::vector<float> depths;
  int good = 0;
  for (int k = 0; k < pts4.cols; ++k) {
    if (!mask.at<uint8_t>(k)) continue;
    float w = pts4.at<float>(3, k);
    if (std::abs(w) < 1e-9f) continue;
    Vec3 x(pts4.at<float>(0, k) / w, pts4.at<float>(1, k) / w,
           pts4.at<float>(2, k) / w);
    if (x[2] <= 0.01f) continue;
    Vec3 x2 = (*t21) * x;
    if (x2[2] <= 0.01f) continue;
    // reprojection sanity
    cv::Point2f r1 = f1.cam.Project(x);
    cv::Point2f r2 = f2.cam.Project(x2);
    if (cv::norm(r1 - p1[k]) > 2.0 || cv::norm(r2 - p2[k]) > 2.0) continue;
    (*points3d)[src[k]] = x;
    (*inliers)[src[k]] = true;
    depths.push_back(x[2]);
    ++good;
  }
  if (good < 60) return false;

  // parallax gate: with a near-zero baseline recoverPose still "succeeds"
  // but the structure is garbage; require median triangulation parallax
  // of ~1 degree (ORB-SLAM2 guards its initializer the same way)
  {
    SE3 t12 = t21->inverse();
    Vec3 c2_in_1 = t12.t;  // camera-2 center in frame-1 coords
    std::vector<float> par;
    for (size_t i = 0; i < points3d->size(); ++i) {
      if (!(*inliers)[i]) continue;
      Vec3 r1 = (*points3d)[i];
      Vec3 r2 = (*points3d)[i] - c2_in_1;
      float c = r1.dot(r2) /
                std::sqrt(std::max(r1.dot(r1) * r2.dot(r2), 1e-18f));
      par.push_back(std::acos(std::min(std::max(c, -1.0f), 1.0f)));
    }
    std::nth_element(par.begin(), par.begin() + par.size() / 2, par.end());
    if (par[par.size() / 2] < 1.0f * static_cast<float>(M_PI) / 180.0f)
      return false;
  }

  // normalize scale: median depth = 1 (monocular gauge freedom)
  std::nth_element(depths.begin(), depths.begin() + depths.size() / 2,
                   depths.end());
  float med = depths[depths.size() / 2];
  if (med < 1e-6f) return false;
  float inv = 1.0f / med;
  for (size_t i = 0; i < points3d->size(); ++i)
    if ((*inliers)[i]) (*points3d)[i] *= inv;
  t21->t *= inv;
  return true;
}

bool TriangulatePoint(const SE3& tcw1, const CameraModel& cam1,
                      const cv::Point2f& uv1, const SE3& tcw2,
                      const CameraModel& cam2, const cv::Point2f& uv2,
                      Vec3* world, float max_reproj_px, float min_parallax_deg) {
  // rays in world frame
  SE3 twc1 = tcw1.inverse(), twc2 = tcw2.inverse();
  Vec3 d1 = twc1.R * Vec3((uv1.x - cam1.cx) / cam1.fx,
                          (uv1.y - cam1.cy) / cam1.fy, 1.0f);
  Vec3 d2 = twc2.R * Vec3((uv2.x - cam2.cx) / cam2.fx,
                          (uv2.y - cam2.cy) / cam2.fy, 1.0f);
  float cosang = d1.dot(d2) / std::sqrt(d1.dot(d1) * d2.dot(d2));
  if (cosang > std::cos(min_parallax_deg * M_PI / 180.0)) return false;

  // linear DLT with the two projection equations
  cv::Matx44f a;
  auto fill = [&](int row, const SE3& tcw, const CameraModel& cam,
                  const cv::Point2f& uv) {
    float x = (uv.x - cam.cx) / cam.fx;
    float y = (uv.y - cam.cy) / cam.fy;
    for (int c = 0; c < 3; ++c) {
      a(row, c) = x * tcw.R(2, c) - tcw.R(0, c);
      a(row + 1, c) = y * tcw.R(2, c) - tcw.R(1, c);
    }
    a(row, 3) = x * tcw.t[2] - tcw.t[0];
    a(row + 1, 3) = y * tcw.t[2] - tcw.t[1];
  };
  fill(0, tcw1, cam1, uv1);
  fill(2, tcw2, cam2, uv2);
  cv::Matx44f u, vt;
  cv::Matx41f w;
  cv::SVD::compute(a, w, u, vt, cv::SVD::MODIFY_A | cv::SVD::FULL_UV);
  if (std::abs(vt(3, 3)) < 1e-9f) return false;
  Vec3 p(vt(3, 0) / vt(3, 3), vt(3, 1) / vt(3, 3), vt(3, 2) / vt(3, 3));

  Vec3 c1 = tcw1 * p, c2 = tcw2 * p;
  if (c1[2] <= 0.01f || c2[2] <= 0.01f) return false;
  if (cv::norm(cam1.Project(c1) - uv1) > max_reproj_px) return false;
  if (cv::norm(cam2.Project(c2) - uv2) > max_reproj_px) return false;
  *world = p;
  return true;
}

int OptimizePose(Frame* frame) {
  std::vector<cv::Point3f> obj;
  std::vector<cv::Point2f> img;
  std::vector<int> src;
  for (size_t i = 0; i < frame->points.size(); ++i) {
    MapPoint* mp = frame->points[i];
    if (!mp || mp->bad) continue;
    obj.emplace_back(mp->pos[0], mp->pos[1], mp->pos[2]);
    img.push_back(frame->keypoints[i].pt);
    src.push_back(static_cast<int>(i));
  }
  frame->outlier.assign(frame->points.size(), false);
  if (obj.size() < 8) return 0;

  cv::Mat rvec, tvec;
  {  // initial guess from the current pose
    cv::Matx33d rd;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) rd(i, j) = frame->tcw.R(i, j);
    cv::Rodrigues(rd, rvec);
    tvec = (cv::Mat_<double>(3, 1) << frame->tcw.t[0], frame->tcw.t[1],
            frame->tcw.t[2]);
  }
  std::vector<int> inlier_idx;
  // pin OpenCV's global RNG so RANSAC (and thus the whole pipeline) is
  // reproducible run-to-run; seeded per-call from deterministic state
  cv::theRNG().state = 0x12345678u + static_cast<uint64_t>(obj.size()) * 2654435761u;
  bool ok = cv::solvePnPRansac(obj, img, K(frame->cam), cv::noArray(), rvec,
                               tvec, frame->pose_valid, 100, 3.0f, 0.99,
                               inlier_idx, cv::SOLVEPNP_ITERATIVE);
  if (!ok || inlier_idx.size() < 8) return 0;

  std::vector<cv::Point3f> obj_in;
  std::vector<cv::Point2f> img_in;
  for (int k : inlier_idx) {
    obj_in.push_back(obj[k]);
    img_in.push_back(img[k]);
  }
  cv::solvePnPRefineLM(obj_in, img_in, K(frame->cam), cv::noArray(), rvec,
                       tvec);

  cv::Mat rmat;
  cv::Rodrigues(rvec, rmat);
  frame->tcw = FromRt(rmat, tvec);
  frame->pose_valid = true;

  // mark outliers + drop their associations
  std::vector<bool> is_inlier(obj.size(), false);
  for (int k : inlier_idx) is_inlier[k] = true;
  int n = 0;
  for (size_t k = 0; k < src.size(); ++k) {
    if (is_inlier[k]) {
      ++n;
    } else {
      frame->outlier[src[k]] = true;
      frame->points[src[k]] = nullptr;
    }
  }
  return n;
}

}  // namespace romap
