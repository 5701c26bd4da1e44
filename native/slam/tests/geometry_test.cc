// Geometry unit tests on exact synthetic correspondences: two-view init
// recovers the relative pose/structure up to scale; triangulation and PnP
// recover known ground truth.

#include <cmath>
#include <cstdio>
#include <random>

#include "romap/geometry.h"
#include "romap/types.h"

#define CHECK(cond)                                                        \
  do {                                                                     \
    if (!(cond)) {                                                         \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      return 1;                                                            \
    }                                                                      \
  } while (0)

using namespace romap;

namespace {

std::mt19937 rng(1);

CameraModel Cam() { return {320, 320, 320, 240, 0, 0, 640, 480}; }

Frame MakeFrame(const SE3& tcw, const std::vector<Vec3>& world, long id) {
  Frame f;
  f.id = id;
  f.cam = Cam();
  f.tcw = tcw;
  f.pose_valid = true;
  for (const Vec3& w : world) {
    cv::Point2f uv = f.cam.Project(tcw * w);
    cv::KeyPoint kp;
    kp.pt = uv;
    f.keypoints.push_back(kp);
  }
  f.points.assign(world.size(), nullptr);
  f.outlier.assign(world.size(), false);
  return f;
}

int TestTwoViewInit() {
  std::uniform_real_distribution<float> ux(-1.5f, 1.5f), uz(3.0f, 7.0f);
  std::vector<Vec3> world;
  for (int i = 0; i < 120; ++i) world.push_back({ux(rng), ux(rng), uz(rng)});

  SE3 tcw1;  // identity
  SE3 tcw2;
  tcw2.R = YawRotation(0.06f);
  tcw2.t = Vec3(-0.4f, 0.03f, 0.05f);

  Frame f1 = MakeFrame(tcw1, world, 0);
  Frame f2 = MakeFrame(tcw2, world, 1);
  std::vector<int> matches(world.size());
  for (size_t i = 0; i < world.size(); ++i) matches[i] = static_cast<int>(i);

  SE3 t21;
  std::vector<Vec3> pts;
  std::vector<bool> inl;
  CHECK(InitializeTwoView(f1, f2, matches, &t21, &pts, &inl));
  int n_in = 0;
  for (bool b : inl) n_in += b;
  CHECK(n_in > 80);
  // rotation matches ground truth
  Mat3 rel = t21.R.t() * tcw2.R;
  CHECK(std::abs(std::atan2(rel(1, 0), rel(0, 0))) < 0.01f);
  // translation direction matches (scale is free)
  Vec3 t_est = t21.t;
  Vec3 t_true = tcw2.t;
  float cosang = t_est.dot(t_true) /
                 std::sqrt(t_est.dot(t_est) * t_true.dot(t_true));
  CHECK(cosang > 0.999f);
  // structure is consistent up to one global scale
  float scale_sum = 0;
  int cnt = 0;
  for (size_t i = 0; i < world.size(); ++i) {
    if (!inl[i]) continue;
    scale_sum += world[i][2] / pts[i][2];
    ++cnt;
  }
  float scale = scale_sum / cnt;
  for (size_t i = 0; i < world.size(); ++i) {
    if (!inl[i]) continue;
    CHECK(cv::norm(pts[i] * scale - world[i]) < 0.05f);
  }
  return 0;
}

int TestTriangulation() {
  CameraModel cam = Cam();
  SE3 tcw1;
  SE3 tcw2;
  tcw2.t = Vec3(-0.5f, 0, 0);
  Vec3 w(0.3f, -0.2f, 4.0f);
  cv::Point2f uv1 = cam.Project(tcw1 * w);
  cv::Point2f uv2 = cam.Project(tcw2 * w);
  Vec3 est;
  CHECK(TriangulatePoint(tcw1, cam, uv1, tcw2, cam, uv2, &est));
  CHECK(cv::norm(est - w) < 0.01f);
  // zero baseline -> rejected by parallax
  Vec3 dummy;
  CHECK(!TriangulatePoint(tcw1, cam, uv1, tcw1, cam, uv1, &dummy));
  return 0;
}

int TestOptimizePose() {
  std::uniform_real_distribution<float> ux(-1.5f, 1.5f), uz(3.0f, 7.0f);
  std::vector<Vec3> world;
  for (int i = 0; i < 60; ++i) world.push_back({ux(rng), ux(rng), uz(rng)});
  SE3 true_tcw;
  true_tcw.R = YawRotation(0.1f);
  true_tcw.t = Vec3(0.2f, -0.1f, 0.3f);
  Frame f = MakeFrame(true_tcw, world, 7);

  // attach map points; corrupt a few associations (outliers)
  std::vector<MapPoint> mps(world.size());
  for (size_t i = 0; i < world.size(); ++i) {
    mps[i].pos = world[i];
    f.points[i] = &mps[i];
  }
  for (int k = 0; k < 6; ++k) mps[k].pos += Vec3(1.5f, -2.0f, 1.0f);

  // perturb the initial pose
  f.tcw.t += Vec3(0.05f, 0.05f, -0.05f);
  int n = OptimizePose(&f);
  CHECK(n >= 50);
  CHECK(cv::norm(f.tcw.t - true_tcw.t) < 0.01f);
  Mat3 rel = f.tcw.R.t() * true_tcw.R;
  CHECK(std::abs(std::atan2(rel(1, 0), rel(0, 0))) < 0.005f);
  // the corrupted points were flagged
  for (int k = 0; k < 6; ++k) CHECK(f.outlier[k]);
  return 0;
}

}  // namespace

int main() {
  int rc = 0;
  rc |= TestTwoViewInit();
  rc |= TestTriangulation();
  rc |= TestOptimizePose();
  if (rc == 0) std::printf("geometry_test: ALL OK\n");
  return rc;
}
