// Loop closing: Sim(3) algebra (exp/log, Horn alignment, RANSAC), the
// essential-graph optimizer, and the full LoopCloser pipeline on a
// synthetic drifted loop — the rebuilt equivalent of the reference's
// Sim3Solver + LoopClosing + OptimizeEssentialGraph stack
// (ref src/Sim3Solver.cc, src/LoopClosing.cc, src/Optimizer.cc), which the
// reference ships but never exercises (insertion starved,
// ref src/LocalMapping.cc:100-101).

#include <cmath>
#include <cstdio>
#include <random>

#include "romap/loop_closing.h"
#include "romap/map.h"
#include "romap/sim3.h"
#include "align_util.h"

#define CHECK(cond)                                                        \
  do {                                                                     \
    if (!(cond)) {                                                         \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      return 1;                                                            \
    }                                                                      \
  } while (0)

using namespace romap;

namespace {

std::mt19937 rng(11);

cv::Vec3d RandVec(double scale) {
  std::uniform_real_distribution<double> u(-scale, scale);
  return {u(rng), u(rng), u(rng)};
}

Sim3 RandSim3() {
  Sim3Tangent v;
  const cv::Vec3d t = RandVec(1.0), w = RandVec(0.8);
  std::uniform_real_distribution<double> lam(-0.3, 0.3);
  v = {t[0], t[1], t[2], w[0], w[1], w[2], lam(rng)};
  return Sim3Exp(v);
}

double PoseErr(const Sim3& a, const Sim3& b) {
  const Sim3Tangent d = Sim3Log(a * b.inverse());
  return cv::norm(d);
}

using romap_test::AlignedATE;

int TestExpLog() {
  for (int i = 0; i < 200; ++i) {
    const cv::Vec3d u = RandVec(2.0);
    // log is the principal branch: keep the rotation under pi
    cv::Vec3d w = RandVec(1.0);
    const double n = cv::norm(w);
    if (n > 1e-9) w *= std::uniform_real_distribution<double>(0, 2.9)(rng) / n;
    std::uniform_real_distribution<double> lam(-0.5, 0.5);
    Sim3Tangent v{u[0], u[1], u[2], w[0], w[1], w[2], lam(rng)};
    const Sim3Tangent back = Sim3Log(Sim3Exp(v));
    CHECK(cv::norm(back - v) < 1e-8);
  }
  // compose/inverse sanity
  const Sim3 a = RandSim3(), b = RandSim3();
  const cv::Vec3d p = RandVec(3.0);
  CHECK(cv::norm((a * b) * p - a * (b * p)) < 1e-9);
  CHECK(cv::norm(a.inverse() * (a * p) - p) < 1e-9);
  std::printf("exp/log roundtrip: ok\n");
  return 0;
}

int TestHorn() {
  for (int trial = 0; trial < 20; ++trial) {
    const Sim3 truth = RandSim3();
    std::vector<cv::Vec3d> src, dst;
    for (int i = 0; i < 50; ++i) {
      src.push_back(RandVec(4.0));
      dst.push_back(truth * src.back());
    }
    Sim3 est;
    CHECK(SolveSim3(src, dst, &est));
    CHECK(PoseErr(est, truth) < 1e-9);
  }
  std::printf("Horn alignment: ok\n");
  return 0;
}

int TestRansac() {
  CameraModel cam;
  cam.fx = cam.fy = 300;
  cam.cx = 320;
  cam.cy = 240;
  // truth: camera2 sees the same cloud as camera1 through S12^-1
  Sim3Tangent vt{0.4, -0.2, 0.3, 0.05, 0.3, -0.1, 0.15};
  const Sim3 s12 = Sim3Exp(vt);
  const Sim3 s21 = s12.inverse();
  std::vector<cv::Vec3d> x1, x2;
  std::vector<cv::Point2f> px1, px2;
  std::uniform_real_distribution<double> u(-1.5, 1.5), z(3.0, 7.0);
  std::uniform_real_distribution<double> coin(0, 1);
  int n_out = 0;
  for (int i = 0; i < 120; ++i) {
    cv::Vec3d a{u(rng), u(rng), z(rng)};  // in camera-1 frame
    cv::Vec3d b = s21 * a;
    if (coin(rng) < 0.35) {  // outlier: corrupt the camera-2 side
      b += RandVec(1.0) + cv::Vec3d(0.3, 0.3, 0.3);
      ++n_out;
    }
    x1.push_back(a);
    x2.push_back(b);
    px1.push_back(cam.Project(Vec3(a[0], a[1], a[2])));
    px2.push_back(cam.Project(Vec3(b[0], b[1], b[2])));
  }
  const auto res = SolveSim3Ransac(x1, x2, px1, px2, cam, cam, 300, 4.0f, 7);
  CHECK(res.n_inliers >= 120 - n_out - 5);
  CHECK(PoseErr(res.s12, s12) < 1e-6);
  std::printf("Sim3 RANSAC: %d/%d inliers (%d outliers injected)\n",
              res.n_inliers, 120, n_out);
  return 0;
}

int TestPoseGraph() {
  // 40 poses around a circle with accumulating rotation + scale drift on
  // the odometry; one exact loop edge last->first. The optimizer must pull
  // the drifted endpoint back onto the loop.
  const int N = 40;
  const double R = 3.0;
  std::vector<Sim3> truth(N), drifted(N);
  for (int k = 0; k < N; ++k) {
    const double th = 2.0 * M_PI * k / N;
    SE3 twc;
    const Vec3 x(-std::sin(th), std::cos(th), 0);
    const Vec3 y(0, 0, 1);
    const Vec3 z(std::cos(th), std::sin(th), 0);
    for (int r = 0; r < 3; ++r) {
      twc.R(r, 0) = x[r];
      twc.R(r, 1) = y[r];
      twc.R(r, 2) = z[r];
    }
    twc.t = Vec3(R * std::cos(th), R * std::sin(th), 0);
    truth[k] = Sim3::FromSE3(twc.inverse());
  }
  drifted[0] = truth[0];
  Sim3Tangent dv{0.004, 0, 0, 0, 0.005, 0, 0.008};  // per-step drift
  const Sim3 d = Sim3Exp(dv);
  for (int k = 1; k < N; ++k) {
    const Sim3 rel = truth[k] * truth[k - 1].inverse();
    drifted[k] = d * rel * drifted[k - 1];
  }
  auto center = [](const Sim3& s) { return s.inverse() * cv::Vec3d(0, 0, 0); };
  const double before = cv::norm(center(drifted[N - 1]) - center(truth[N - 1]));

  std::vector<Sim3Edge> edges;
  for (int k = 1; k < N; ++k)
    edges.push_back({k - 1, k, drifted[k] * drifted[k - 1].inverse(), 1.0});
  edges.push_back({0, N - 1, truth[N - 1] * truth[0].inverse(), 4.0});

  std::vector<Sim3> poses = drifted;
  OptimizeSim3Graph(&poses, edges, {0}, 15);

  double after_rmse = 0, before_rmse = 0;
  for (int k = 0; k < N; ++k) {
    before_rmse += cv::norm(center(drifted[k]) - center(truth[k]));
    after_rmse += cv::norm(center(poses[k]) - center(truth[k]));
  }
  before_rmse /= N;
  after_rmse /= N;
  const double after = cv::norm(center(poses[N - 1]) - center(truth[N - 1]));
  std::printf(
      "pose graph: endpoint %.3f -> %.3f m, mean %.3f -> %.3f m, "
      "end scale %.4f -> %.4f\n",
      before, after, before_rmse, after_rmse, drifted[N - 1].s, poses[N - 1].s);
  CHECK(after < 0.2 * before);
  CHECK(after_rmse < 0.5 * before_rmse);
  CHECK(std::abs(std::log(poses[N - 1].s)) <
        0.25 * std::abs(std::log(drifted[N - 1].s)));
  return 0;
}

// ---- end-to-end: a drifted SLAM-style map around a loop ------------------

struct LoopWorld {
  Map map;
  BowVocabulary voc;
  KeyFrameDatabase kfdb{&voc};
  std::vector<SE3> true_tcw;
  std::vector<KeyFrame*> kfs;
};

int TestLoopCloserEndToEnd() {
  LoopWorld w;
  CameraModel cam;
  cam.fx = cam.fy = 300;
  cam.cx = 320;
  cam.cy = 240;
  cam.max_x = 640;
  cam.max_y = 480;

  // wall cylinder (radius 6) of uniquely-descriptored points; cameras on an
  // inner circle (radius 3) looking radially outward
  const int kAngles = 160, kHeights = 5;
  struct WallPoint {
    Vec3 pos;
    cv::Mat desc;           // 1x32
    MapPoint* live = nullptr;  // current map entry
    int created_at = -1000;
  };
  std::vector<WallPoint> wall;
  std::uniform_int_distribution<int> byte(0, 255);
  for (int a = 0; a < kAngles; ++a) {
    for (int h = 0; h < kHeights; ++h) {
      const double phi = 2.0 * M_PI * a / kAngles;
      WallPoint p;
      p.pos = Vec3(6 * std::cos(phi), 6 * std::sin(phi), -1.0f + 0.5f * h);
      p.desc = cv::Mat(1, 32, CV_8U);
      for (int b = 0; b < 32; ++b)
        p.desc.at<uint8_t>(0, b) = static_cast<uint8_t>(byte(rng));
      wall.push_back(p);
    }
  }

  // camera path: 24 keyframes per revolution, 28 total (4 revisit the start)
  const int kPerRev = 24, N = 28;
  std::vector<SE3> drift_tcw(N);
  w.true_tcw.resize(N);
  for (int k = 0; k < N; ++k) {
    const double th = 2.0 * M_PI * k / kPerRev;
    SE3 twc;
    const Vec3 x(-std::sin(th), std::cos(th), 0);
    const Vec3 y(0, 0, 1);
    const Vec3 z(std::cos(th), std::sin(th), 0);
    for (int r = 0; r < 3; ++r) {
      twc.R(r, 0) = x[r];
      twc.R(r, 1) = y[r];
      twc.R(r, 2) = z[r];
    }
    twc.t = Vec3(3 * std::cos(th), 3 * std::sin(th), 0);
    w.true_tcw[k] = twc.inverse();
  }
  // odometry drift: small yaw + 1% translation scale per step
  drift_tcw[0] = w.true_tcw[0];
  for (int k = 1; k < N; ++k) {
    SE3 rel = w.true_tcw[k] * w.true_tcw[k - 1].inverse();
    SE3 noise;
    noise.R = Mat3(std::cos(0.006f), 0, std::sin(0.006f), 0, 1, 0,
                   -std::sin(0.006f), 0, std::cos(0.006f));
    rel.t *= 1.01f;
    drift_tcw[k] = noise * rel * drift_tcw[k - 1];
  }

  // build the drifted map: camera-frame geometry is exact (perfect depth),
  // world placement uses the drifted pose — the map a drifting monocular
  // front-end actually builds. A wall point re-observed within 3 keyframes
  // of its creation reuses the entry (association works at small drift);
  // beyond that it gets re-triangulated as a DUPLICATE (the loop situation).
  cv::Mat all_desc;
  for (int k = 0; k < N; ++k) {
    KeyFrame* kf = w.map.CreateKeyFrame();
    kf->frame_id = k;
    kf->timestamp = k;
    kf->cam = cam;
    kf->tcw = drift_tcw[k];
    std::vector<cv::Mat> rows;
    for (auto& p : wall) {
      const Vec3 c_true = w.true_tcw[k] * p.pos;
      if (c_true[2] < 1.0f) continue;
      const cv::Point2f px = cam.Project(c_true);
      if (px.x < 10 || px.x > 630 || px.y < 10 || px.y > 470) continue;
      const int idx = static_cast<int>(kf->keypoints.size());
      kf->keypoints.push_back(cv::KeyPoint(px, 31.0f));
      rows.push_back(p.desc);
      MapPoint* mp;
      if (p.live && k - p.created_at <= 3) {
        mp = p.live;
      } else {
        // triangulated at the LOCAL map scale, which drifts with the
        // odometry baselines (1.01x per step) — monocular scale drift
        const float sigma = std::pow(1.01f, static_cast<float>(k));
        mp = w.map.CreatePoint(kf->Twc() * (sigma * c_true), p.desc);
        mp->first_kf_id = kf->id;
        p.live = mp;
        p.created_at = k;
      }
      mp->obs[kf] = idx;
      kf->points.push_back(mp);
      kf->bbox_assignment.push_back(-1);
    }
    kf->descriptors.create(static_cast<int>(rows.size()), 32, CV_8U);
    for (size_t r = 0; r < rows.size(); ++r)
      rows[r].copyTo(kf->descriptors.row(static_cast<int>(r)));
    all_desc.push_back(kf->descriptors);
    w.kfs.push_back(kf);
  }
  while (!w.voc.trained()) w.voc.TrainAccumulate(all_desc);
  for (KeyFrame* kf : w.kfs) w.kfdb.Add(kf);

  auto ate = [&](int from, int to) {
    std::vector<cv::Vec3d> gt, est;
    for (int k = from; k < to; ++k) {
      const Vec3 g = w.true_tcw[k].inverse().t, e = w.kfs[k]->Twc().t;
      gt.push_back({g[0], g[1], g[2]});
      est.push_back({e[0], e[1], e[2]});
    }
    return AlignedATE(gt, est);
  };
  const double all_before = ate(0, N);
  const size_t points_before = w.map.Points().size();

  LoopClosingConfig cfg;
  LoopCloser closer(&w.map, &w.kfdb, cfg);
  LoopCloser::Result res;
  for (int k = N - 3; k < N; ++k) {  // consistency needs 3 consecutive hits
    res = closer.Process(w.kfs[k]);
    if (res.corrected) break;
  }
  CHECK(res.corrected);
  CHECK(res.matched != nullptr);
  CHECK(res.matched->id <= 4);  // matched the revisited start region
  CHECK(res.inliers >= cfg.min_sim3_inliers);

  if (std::getenv("ROMAP_SLAM_DEBUG")) {
    for (int k = 0; k < N; ++k) {
      const Vec3 d = w.kfs[k]->Twc().t - w.true_tcw[k].inverse().t;
      std::printf("  kf %2d err %.3f\n", k, std::sqrt(d.dot(d)));
    }
  }
  const double all_after = ate(0, N);
  const size_t points_after = w.map.Points().size();
  std::printf(
      "loop e2e: matched kf=%ld inliers=%d scale=%.4f drift=%.1fpx | "
      "Sim3-aligned ATE %.3f -> %.3f, points %zu -> %zu\n",
      res.matched->id, res.inliers, res.s12.s, res.drift_px, all_before,
      all_after, points_before, points_after);
  CHECK(all_after < 0.5 * all_before);  // drift spread around the loop
  CHECK(points_after + 20 <= points_before);  // duplicates fused
  // the loop transform's scale must undo the accumulated 1.01^24 ~ 1.27
  CHECK(res.s12.s > 1.1);
  return 0;
}

}  // namespace

int main() {
  if (TestExpLog()) return 1;
  if (TestHorn()) return 1;
  if (TestRansac()) return 1;
  if (TestPoseGraph()) return 1;
  if (TestLoopCloserEndToEnd()) return 1;
  std::printf("loop_test: all ok\n");
  return 0;
}
