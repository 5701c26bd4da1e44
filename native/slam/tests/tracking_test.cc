// End-to-end tracking test on a synthetic rendered sequence: a dotted
// "room" (point-sprite walls for ORB texture) plus one textured sphere
// object with detection boxes + instance masks. Verifies: initialization,
// per-frame tracking with small ATE vs ground truth (up to monocular
// scale), and object-landmark creation near the true object.

#include <cmath>
#include <string>
#include <cstdio>
#include <random>
#include <thread>

#include <opencv2/imgproc.hpp>

#include "romap/tracking.h"
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

constexpr int W = 640, H = 480;

struct Sphere {
  Vec3 center;
  float r;
  uint8_t mask_val;  // instance-mask value (also the detection class here)
  int tex;           // checker phase so objects look different to ORB
};

struct World {
  std::vector<Vec3> dots;      // wall texture points
  std::vector<int> dot_shade;  // intensity
  Vec3 sphere_center{0.0f, 0.3f, 5.0f};
  float sphere_r = 0.45f;
  std::vector<Sphere> spheres;
};

World MakeWorld() {
  World w;
  std::mt19937 rng(3);
  std::uniform_real_distribution<float> ux(-4, 4), uy(-2.5, 2.5);
  std::uniform_int_distribution<int> shade(40, 220);
  // back wall z=8, side walls x=+-4, floor y=2.5
  for (int i = 0; i < 700; ++i) {
    w.dots.push_back({ux(rng), uy(rng), 8.0f});
    w.dot_shade.push_back(shade(rng));
  }
  // distinctive landmarks: clustered dot triplets (unique constellations)
  for (int i = 0; i < 120; ++i) {
    Vec3 base{ux(rng), uy(rng), 8.0f};
    for (int k = 0; k < 3; ++k) {
      w.dots.push_back(base + Vec3(0.02f * (i % 7) * k, 0.015f * ((i+k) % 5), 0));
      w.dot_shade.push_back(shade(rng));
    }
  }
  for (int i = 0; i < 250; ++i) {
    float z = 2.0f + 6.0f * (i % 50) / 50.0f;
    w.dots.push_back({i % 2 ? 4.0f : -4.0f, uy(rng), z});
    w.dot_shade.push_back(shade(rng));
    w.dots.push_back({ux(rng), 2.5f, 2.0f + 6.0f * ((i * 7) % 50) / 50.0f});
    w.dot_shade.push_back(shade(rng));
  }
  w.spheres.push_back({w.sphere_center, w.sphere_r, 63, 0});
  return w;
}

SE3 CameraPose(int i) {
  // slow sideways arc with slight yaw, looking roughly down +z
  float t = i * 0.04f;
  SE3 twc;
  twc.R = YawRotation(0.0f);
  // rotate about y by small angle: camera x-z plane
  float a = 0.08f * std::sin(t * 2.0f) + 0.02f * i * 0.04f;
  twc.R = Mat3(std::cos(a), 0, std::sin(a), 0, 1, 0, -std::sin(a), 0,
               std::cos(a));
  twc.t = Vec3(1.2f * std::sin(t), 0.2f * std::sin(t * 1.3f), 0.3f * t);
  return twc;  // camera-to-world
}

void Render(const World& w, const SE3& twc, cv::Mat* gray, cv::Mat* instance,
            std::vector<Detection>* dets, std::vector<bool>* visible) {
  CameraModel cam{520, 520, 320, 240, 0, 0, W, H};
  SE3 tcw = twc.inverse();
  *gray = cv::Mat(H, W, CV_8UC1, cv::Scalar(235));
  *instance = cv::Mat::zeros(H, W, CV_8UC1);

  for (size_t i = 0; i < w.dots.size(); ++i) {
    Vec3 c = tcw * w.dots[i];
    if (c[2] < 0.3f) continue;
    cv::Point2f uv = cam.Project(c);
    if (uv.x < -5 || uv.y < -5 || uv.x > W + 5 || uv.y > H + 5) continue;
    int r = std::max(2, static_cast<int>(9.0f / c[2]));
    cv::circle(*gray, uv, r, cv::Scalar(w.dot_shade[i]), -1);
  }

  // textured spheres: per-pixel ray-march, nearest hit wins
  Vec3 cam_pos = twc.t;
  size_t ns = w.spheres.size();
  std::vector<float> min_x(ns, W), min_y(ns, H), max_x(ns, -1), max_y(ns, -1);
  for (int py = 0; py < H; ++py) {
    for (int px = 0; px < W; ++px) {
      Vec3 d_cam((px - cam.cx) / cam.fx, (py - cam.cy) / cam.fy, 1.0f);
      Vec3 d = twc.R * d_cam;
      d *= 1.0f / std::sqrt(d.dot(d));
      float best_t = 1e30f;
      int best_s = -1;
      for (size_t s = 0; s < ns; ++s) {
        Vec3 oc = cam_pos - w.spheres[s].center;
        float b = oc.dot(d);
        float c2 = oc.dot(oc) - w.spheres[s].r * w.spheres[s].r;
        float disc = b * b - c2;
        if (disc <= 0) continue;
        float t = -b - std::sqrt(disc);
        if (t < 0.3f || t >= best_t) continue;
        best_t = t;
        best_s = static_cast<int>(s);
      }
      if (best_s < 0) continue;
      const Sphere& sp = w.spheres[best_s];
      Vec3 p = cam_pos + d * best_t - sp.center;
      // high-frequency texture: checker on the surface
      int cx = static_cast<int>((p[0] + 1) * 14) + static_cast<int>((p[1] + 1) * 14) +
               static_cast<int>((p[2] + 1) * 14);
      gray->at<uint8_t>(py, px) = ((cx + sp.tex) % 2) ? 60 : 170;
      instance->at<uint8_t>(py, px) = sp.mask_val;
      min_x[best_s] = std::min(min_x[best_s], static_cast<float>(px));
      max_x[best_s] = std::max(max_x[best_s], static_cast<float>(px));
      min_y[best_s] = std::min(min_y[best_s], static_cast<float>(py));
      max_y[best_s] = std::max(max_y[best_s], static_cast<float>(py));
    }
  }
  dets->assign(ns, Detection());
  visible->assign(ns, false);
  for (size_t s = 0; s < ns; ++s) {
    (*visible)[s] = max_x[s] > 0 && (max_x[s] - min_x[s]) > 24;
    if ((*visible)[s]) {
      (*dets)[s].rect = {min_x[s], min_y[s], max_x[s] - min_x[s] + 1,
                         max_y[s] - min_y[s] + 1};
      (*dets)[s].cls = w.spheres[s].mask_val;
      (*dets)[s].confidence = 0.9f;
    }
  }
}

// Two same-class objects: the association layer (IoU + shared points +
// t-test, ObjectPipeline) must keep them apart and localize both, and the
// double-t-test/cuboid-overlap merge must NOT fuse them.
int RunTwoObjects() {
  World world = MakeWorld();
  world.spheres.push_back({{1.7f, 0.1f, 5.6f}, 0.38f, 63, 1});
  TrackingConfig cfg;
  cfg.cam = {520, 520, 320, 240, 0, 0, W, H};
  cfg.max_frames_between_kf = 5;
  Tracker tracker(cfg);
  std::vector<SE3> gt, est;
  int tracked = 0;
  for (int i = 0; i < 90; ++i) {
    SE3 twc = CameraPose(i);
    cv::Mat gray, instance;
    std::vector<Detection> sdets;
    std::vector<bool> svis;
    Render(world, twc, &gray, &instance, &sdets, &svis);
    std::vector<Detection> dets;
    for (size_t s = 0; s < svis.size(); ++s)
      if (svis[s]) dets.push_back(sdets[s]);
    auto pose = tracker.Track(gray, instance, dets, i * 0.1, gray);
    if (pose) {
      ++tracked;
      gt.push_back(twc.inverse());
      est.push_back(*pose);
    }
  }
  tracker.FinalBundleAdjust();
  std::printf("[two-objects] tracked %d/90\n", tracked);
  CHECK(tracked > 60);
  // monocular scale from camera-center displacements
  std::vector<float> ratios;
  Vec3 g0 = gt.front().inverse().t, e0 = est.front().inverse().t;
  for (size_t k = 1; k < gt.size(); ++k) {
    float gn = static_cast<float>(cv::norm(gt[k].inverse().t - g0));
    float en = static_cast<float>(cv::norm(est[k].inverse().t - e0));
    if (en > 1e-5f && gn > 1e-3f) ratios.push_back(gn / en);
  }
  std::nth_element(ratios.begin(), ratios.begin() + ratios.size() / 2,
                   ratios.end());
  float scale = ratios[ratios.size() / 2];
  auto objects = tracker.map().Objects();
  std::printf("[two-objects] objects: %zu (scale %.3f)\n", objects.size(),
              scale);
  CHECK(objects.size() == 2);  // associated apart, never merged
  // each landmark sits near ITS sphere (greedy nearest assignment)
  std::vector<bool> taken(world.spheres.size(), false);
  for (ObjectMap* obj : objects) {
    Vec3 c = obj->t_obj_w.inverse().t * scale;
    int best = -1;
    float best_d = 1e30f;
    for (size_t s = 0; s < world.spheres.size(); ++s) {
      if (taken[s]) continue;
      float d = static_cast<float>(cv::norm(c - world.spheres[s].center));
      if (d < best_d) {
        best_d = d;
        best = static_cast<int>(s);
      }
    }
    CHECK(best >= 0);
    taken[best] = true;
    std::printf("[two-objects] object %ld -> sphere %d, center err %.3f "
                "(%zu pts)\n",
                obj->id, best, best_d, obj->points.size());
    CHECK(best_d < 0.25f);
    CHECK(obj->points.size() > 10);
  }
  std::printf("[two-objects] OK\n");
  return 0;
}

// Exploratory ring: the camera circles inside a dotted wall cylinder,
// looking radially outward — structure leaves the view, then the start
// region is re-seen after a full revolution. With loop closing enabled the
// detector must FIRE through the production Tracker path (MappingStep ->
// LoopCloser::Process), correct the junction drift (~30 px), and leave a
// self-consistent map (global BA converges to ~1 px RMSE).
//
// Measured honestly (ARCHITECTURE decision record): on THIS noise-free
// synthetic the no-loop odometry barely drifts (Sim3-aligned ATE ~0.06 m),
// and the closure's redistribution noise lands the corrected map at
// ~0.2-0.27 m (1.3% of the 19 m trajectory — ORB-SLAM-typical territory).
// Loop closing pays off on genuinely drifting sequences; the bound below
// asserts the machinery is SOUND (fires once, doesn't tear or re-tear the
// map), not that it beats a near-perfect baseline. Knobs for drift studies:
// ROMAP_RING_DOTS (sparser texture -> more drift, but the self-similar
// dots alias ORB descriptors and starve Sim3 RANSAC below ~5000),
// ROMAP_RING_NOISE (image noise sigma; >4 breaks ORB on this texture),
// ROMAP_NO_LOOP / ROMAP_LOOP_NO_GBA / ROMAP_LOOP_NO_FUSE /
// ROMAP_LOOP_FORCE_UNIT_SCALE (stage isolation).
int RunLoopRing(bool async) {
  // wall cylinder radius 6 dotted with random sprites; camera circle r=3
  std::mt19937 rng(9);
  std::uniform_real_distribution<float> uphi(0, 2 * static_cast<float>(M_PI));
  std::uniform_real_distribution<float> uz(-1.3f, 1.3f);
  std::uniform_int_distribution<int> shade(30, 220);
  std::vector<Vec3> dots;
  std::vector<int> dot_shade;
  const int n_dots = std::getenv("ROMAP_RING_DOTS")
                         ? std::atoi(std::getenv("ROMAP_RING_DOTS"))
                         : 6500;
  for (int i = 0; i < n_dots; ++i) {
    float phi = uphi(rng);
    dots.push_back({6.0f * std::cos(phi), 6.0f * std::sin(phi), uz(rng)});
    dot_shade.push_back(shade(rng));
  }
  CameraModel cam{520, 520, 320, 240, 0, 0, W, H};
  // ~400 frames/revolution keeps per-frame image motion near the matcher's
  // comfort zone (~12 px: 6 px translation + 6 px rotation at f=520, z=3)
  constexpr int kFramesPerRev = 400;
  auto ring_pose = [](int i) {  // camera-to-world
    float th = 2.0f * static_cast<float>(M_PI) * i / kFramesPerRev;
    SE3 twc;
    const Vec3 x(-std::sin(th), std::cos(th), 0);  // tangent
    const Vec3 y(0, 0, 1);
    const Vec3 z(std::cos(th), std::sin(th), 0);  // radial outward = view
    for (int r = 0; r < 3; ++r) {
      twc.R(r, 0) = x[r];
      twc.R(r, 1) = y[r];
      twc.R(r, 2) = z[r];
    }
    twc.t = Vec3(3 * std::cos(th), 3 * std::sin(th), 0);
    return twc;
  };
  // sensor noise makes the odometry drift for real (a noise-free render
  // tracks almost perfectly, leaving a loop closure nothing to fix);
  // ROMAP_RING_NOISE overrides the sigma (0 = clean)
  const double noise_sigma =
      std::getenv("ROMAP_RING_NOISE") ? std::atof(std::getenv("ROMAP_RING_NOISE")) : 0.0;
  cv::RNG noise_rng(77);
  auto render = [&](const SE3& twc, cv::Mat* gray) {
    SE3 tcw = twc.inverse();
    *gray = cv::Mat(H, W, CV_8UC1, cv::Scalar(235));
    for (size_t i = 0; i < dots.size(); ++i) {
      Vec3 c = tcw * dots[i];
      if (c[2] < 0.3f) continue;
      cv::Point2f uv = cam.Project(c);
      if (uv.x < -5 || uv.y < -5 || uv.x > W + 5 || uv.y > H + 5) continue;
      int r = std::max(2, static_cast<int>(9.0f / c[2]));
      cv::circle(*gray, uv, r, cv::Scalar(dot_shade[i]), -1);
    }
    if (noise_sigma > 0) {
      cv::Mat n(H, W, CV_16SC1);
      noise_rng.fill(n, cv::RNG::NORMAL, 0, noise_sigma);
      cv::Mat g16;
      gray->convertTo(g16, CV_16SC1);
      g16 += n;
      g16.convertTo(*gray, CV_8UC1);  // saturating
    }
  };

  TrackingConfig cfg;
  cfg.cam = cam;
  cfg.max_frames_between_kf = 5;
  // ROMAP_NO_LOOP=1 runs the same ring without the closer (drift A/B);
  // ROMAP_LOOP_NO_GBA=1 skips the post-graph global BA (stage isolation)
  cfg.enable_loop_closing = std::getenv("ROMAP_NO_LOOP") == nullptr;
  cfg.loop.run_global_ba = std::getenv("ROMAP_LOOP_NO_GBA") == nullptr;
  Tracker tracker(cfg);
  if (async) tracker.StartMapping();

  const int n_frames = kFramesPerRev + 60;  // full revolution + revisit arc
  int tracked = 0;
  for (int i = 0; i < n_frames; ++i) {
    SE3 twc = ring_pose(i);
    cv::Mat gray;
    render(twc, &gray);
    cv::Mat instance = cv::Mat::zeros(H, W, CV_8UC1);
    if (tracker.Track(gray, instance, {}, i * 0.1, gray)) ++tracked;
  }
  if (async) tracker.StopMapping();
  std::printf("[loop-ring] tracked %d/%d, %zu keyframes, loops closed %ld\n",
              tracked, n_frames, tracker.map().KeyFrames().size(),
              tracker.loops_closed());
  CHECK(tracked > n_frames * 3 / 4);
  if (!std::getenv("ROMAP_NO_LOOP")) CHECK(tracker.loops_closed() >= 1);

  // Sim(3)-aligned ATE (Umeyama, the TUM-benchmark convention — same math
  // as the Python eval harness) over the final recomposed trajectory: the
  // loop correction must leave a consistent map, not tear it.
  auto snap = tracker.Snapshot();
  CHECK(!snap.trajectory.empty());
  std::vector<cv::Vec3d> gt_c, est_c;
  for (const auto& s : snap.trajectory) {
    int idx = static_cast<int>(s.t / 0.1 + 0.5);
    const Vec3 g = ring_pose(idx).t;         // GT camera center
    const Vec3 e = s.tcw.inverse().t;        // estimated camera center
    gt_c.push_back({g[0], g[1], g[2]});
    est_c.push_back({e[0], e[1], e[2]});
  }
  const size_t n = gt_c.size();
  const romap_test::Sim3Alignment align = romap_test::AlignSim3(gt_c, est_c);
  const double ate = align.ate;
  if (std::getenv("ROMAP_RING_PROFILE")) {  // aligned error along the ring
    for (size_t k = 0; k < n; k += 25)
      std::printf("[ring-profile] t=%.1f err=%.3f\n", snap.trajectory[k].t,
                  cv::norm(gt_c[k] - align.Apply(est_c[k])));
  }
  std::printf("[loop-ring] scale %.3f, Sim3-aligned ATE %.3f m over %zu frames\n",
              align.scale, ate, n);
  // run-to-run spread (especially --async: the correction lands mid-stream
  // on the mapping thread) observed 0.20-0.40 m; no-loop baseline ~0.06 m.
  // This bounds "sound, not torn", per the header comment.
  CHECK(ate < 0.45);
  std::printf("[loop-ring] OK\n");
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  // --async: run the mapping step on its own thread (the reference's
  // LocalMapping-thread shape) — same checks must pass.
  // --two: two-object association scenario only.
  bool async = argc > 1 && std::string(argv[1]) == "--async";
  if (argc > 1 && std::string(argv[1]) == "--two") {
    int rc = RunTwoObjects();
    if (rc == 0) std::printf("tracking_test: ALL OK\n");
    return rc;
  }
  // --loop [--async]: exploratory ring — the loop closer must fire through
  // the production MappingStep path and leave a consistent map
  if (argc > 1 && std::string(argv[1]) == "--loop") {
    int rc = RunLoopRing(argc > 2 && std::string(argv[2]) == "--async");
    if (rc == 0) std::printf("tracking_test: ALL OK\n");
    return rc;
  }
  World world = MakeWorld();
  TrackingConfig cfg;
  cfg.cam = {520, 520, 320, 240, 0, 0, W, H};
  cfg.max_frames_between_kf = 5;
  cfg.nerf_angle_change = 0.05f;
  cfg.min_bboxes_for_nerf = 6;  // small sequence: exercise the trigger
  // ROMAP_LOOP_CLOSING=1 runs the detector on every keyframe through the
  // full pipeline (the room orbit keeps structure covisible, so no loop
  // fires — this exercises the detection path for regressions/races)
  cfg.enable_loop_closing = std::getenv("ROMAP_LOOP_CLOSING") != nullptr;
  Tracker tracker(cfg);
  if (async) tracker.StartMapping();

  int created_nerfs = 0, bbox_pushes = 0;
  tracker.hooks.create_nerf = [&](ObjectMap*) { return created_nerfs++; };
  tracker.hooks.update_bboxes =
      [&](ObjectMap*, const std::vector<std::array<int64_t, 5>>& rows) {
        bbox_pushes += static_cast<int>(rows.size());
      };
  tracker.hooks.on_keyframe = [](const KeyFrame&, const cv::Mat&, const cv::Mat&,
                                 const cv::Mat&) {};
  // on_frame contract (dense-view uploads): fires once per tracked frame
  // with the frame images, and flags keyframe frames so uploaders skip them
  int frame_hooks = 0, frame_hook_kfs = 0, frame_hook_obs = 0;
  bool frame_hook_imgs_ok = true;
  tracker.hooks.on_frame = [&](double, const SE3&, const cv::Mat& rgb,
                               const cv::Mat& inst,
                               const std::vector<std::pair<ObjectMap*, Bbox>>&
                                   obs,
                               bool was_kf) {
    ++frame_hooks;
    if (was_kf) ++frame_hook_kfs;
    frame_hook_obs += static_cast<int>(obs.size());
    if (rgb.empty() || inst.empty()) frame_hook_imgs_ok = false;
  };

  // 90 frames by default; ROMAP_TEST_FRAMES overrides for drift studies
  // (e.g. the loop-closing-omission measurement in ARCHITECTURE.md)
  int n_frames = 90;
  if (const char* nf = std::getenv("ROMAP_TEST_FRAMES"))
    n_frames = std::atoi(nf);
  std::vector<SE3> gt, est;
  std::vector<int> est_idx;
  int tracked = 0, tracked_after_blackout = 0;
  for (int i = 0; i < n_frames; ++i) {
    SE3 twc = CameraPose(i);
    cv::Mat gray, instance;
    std::vector<Detection> sdets;
    std::vector<bool> svis;
    Render(world, twc, &gray, &instance, &sdets, &svis);
    // blackout: 6 frames of darkness mid-sequence — tracking must go lost
    // and RELOCALIZE when imagery returns (the camera arc re-visits viewed
    // structure), instead of drifting on a dead motion model
    if (i >= 58 && i < 64) {
      gray = cv::Mat::zeros(gray.size(), CV_8U);
      instance = cv::Mat::zeros(instance.size(), CV_8U);
      svis.assign(svis.size(), false);
    }
    std::vector<Detection> dets;
    for (size_t s = 0; s < svis.size(); ++s)
      if (svis[s]) dets.push_back(sdets[s]);
    auto pose = tracker.Track(gray, instance, dets, i * 0.1, gray);
    if (pose) {
      ++tracked;
      if (i >= 64) ++tracked_after_blackout;
      gt.push_back(twc.inverse());
      est.push_back(*pose);
      est_idx.push_back(i);
    }
  }
  if (async) tracker.StopMapping();
  tracker.FinalBundleAdjust();  // mono_tum's shutdown order; must not throw
  std::printf("relocalized: tracked %d frames after the blackout\n",
              tracked_after_blackout);
  CHECK(tracked_after_blackout >= 15);  // recovered within ~10 frames
  std::printf("tracked %d/%d frames, state=%d\n", tracked, n_frames,
              static_cast<int>(tracker.state()));
  CHECK(tracked > n_frames * 2 / 3);
  CHECK(tracker.state() == Tracker::State::kOk);

  // ATE up to monocular scale: align est translation scale to GT using
  // median ratio of camera-center displacements from the first pose
  std::vector<float> ratios;
  Vec3 g0 = gt.front().inverse().t, e0 = est.front().inverse().t;
  for (size_t k = 1; k < gt.size(); ++k) {
    float gn = static_cast<float>(cv::norm(gt[k].inverse().t - g0));
    float en = static_cast<float>(cv::norm(est[k].inverse().t - e0));
    if (en > 1e-5f && gn > 1e-3f) ratios.push_back(gn / en);
  }
  CHECK(ratios.size() > 10);
  std::nth_element(ratios.begin(), ratios.begin() + ratios.size() / 2,
                   ratios.end());
  float scale = ratios[ratios.size() / 2];
  float ate = 0;
  for (size_t k = 0; k < gt.size(); ++k) {
    Vec3 gc = gt[k].inverse().t - g0;
    Vec3 ec = (est[k].inverse().t - e0) * scale;
    ate += static_cast<float>(cv::norm(gc - ec));
  }
  ate /= gt.size();
  std::printf("ATE (scale-aligned): %.4f m over %zu poses (scale %.3f)\n", ate,
              gt.size(), scale);
  // ~4% drift over a 2.5 m trajectory on blob-textured synthetic imagery
  // (keypoint localization noise dominates). This is the harsh metric:
  // at-track-time FrameTrajectory poses, NOT the BA-refined keyframe
  // trajectory. In --async mode on a single-core box the mapping thread
  // can starve on the worst schedules, so tracking runs further ahead of
  // BA corrections and the recorded drift grows — wider gate there.
  CHECK(ate < (async ? 0.30f : 0.15f));

  // BA-recomposed trajectory (Snapshot composes each frame through its
  // reference keyframe, refined by FinalBundleAdjust above): the export
  // metric — must beat (or at worst match) the harsh at-track-time ATE
  {
    auto snap = tracker.Snapshot();
    std::map<double, SE3> by_t;
    for (const auto& st : snap.trajectory) by_t[st.t] = st.tcw;
    float ate_r = 0;
    int n_r = 0;
    for (size_t k = 0; k < gt.size(); ++k) {
      auto it = by_t.find(est_idx[k] * 0.1);
      if (it == by_t.end()) continue;
      Vec3 gc = gt[k].inverse().t - g0;
      Vec3 ec = (it->second.inverse().t - e0) * scale;
      ate_r += static_cast<float>(cv::norm(gc - ec));
      ++n_r;
    }
    CHECK(n_r > 0);
    ate_r /= n_r;
    std::printf("ATE (BA-recomposed): %.4f m over %d poses\n", ate_r, n_r);
    CHECK(ate_r < ate * 1.10f + 0.005f);  // small slack: scale fit is raw's
  }

  // object landmark near the true sphere (in the SLAM's scaled world)
  auto objects = tracker.map().Objects();
  std::printf("objects: %zu\n", objects.size());
  CHECK(!objects.empty());
  ObjectMap* obj = objects.front();
  CHECK(obj->cls == 63);
  CHECK(obj->points.size() > 15);
  Vec3 center_est = obj->t_obj_w.inverse().t * scale + g0 * 0.0f;
  // compare in the GT frame: scale est world by `scale` (gauge alignment is
  // identity here because both worlds share the first camera at identity)
  float center_err = static_cast<float>(
      cv::norm(center_est - world.sphere_center));
  std::printf("object center err: %.3f (est %.2f %.2f %.2f)\n", center_err,
              center_est[0], center_est[1], center_est[2]);
  // the silhouette-cone center refinement corrects the visible-surface
  // depth bias; round-1 (point-extent midpoint only) measured 0.21 here.
  // Sync measures 0.076; async depends on which keyframes land before the
  // final shape pass (0.07 typically, up to ~0.13 on slow schedules) — the
  // gate covers the worst observed schedule.
  CHECK(center_err < 0.15f);
  obj->EstimateShape();
  std::printf("half extents: %.2f %.2f %.2f (true r=%.2f), nerfs=%d pushes=%d\n",
              obj->shape.a1 * scale, obj->shape.a2 * scale,
              obj->shape.a3 * scale, world.sphere_r, created_nerfs,
              bbox_pushes);
  // transverse extents (a1/a2): silhouette-bounded, gated at +-15% relative
  // (round 3: measured ~0.43 vs true 0.45 on sync and async runs)
  CHECK(std::abs(obj->shape.a1 * scale - world.sphere_r) <
        0.15f * world.sphere_r);
  CHECK(std::abs(obj->shape.a2 * scale - world.sphere_r) <
        0.15f * world.sphere_r);
  // the depth axis is foreshortened in EVERY view of this ~27-degree arc —
  // neither features (visible-hemisphere cloud, EIF-trimmed tails) nor
  // silhouettes (a pancake and a sphere cast near-identical boxes here)
  // observe it fully. The blind-axis floor (0.8x the min silhouette-
  // confirmed transverse extent, ObjectMap::ProbeShape) bounds the error
  // band at +-25%: never inflated past the transverse scale, never short
  // enough to clip the NeRF training volume.
  CHECK(obj->shape.a3 * scale - world.sphere_r < 0.15f * world.sphere_r);
  CHECK(world.sphere_r - obj->shape.a3 * scale < 0.25f * world.sphere_r);
  CHECK(created_nerfs >= 1);
  CHECK(bbox_pushes >= 6);
  // dense-view hook: every tracked frame fired exactly once (minus the two
  // initializer frames, which return before the hook site), keyframe frames
  // are flagged, and object observations flow through
  std::printf("on_frame: %d fired, %d keyframes, %d obs\n", frame_hooks,
              frame_hook_kfs, frame_hook_obs);
  CHECK(frame_hooks >= tracked - 2 && frame_hooks <= tracked);
  CHECK(frame_hook_kfs >= 5);
  CHECK(frame_hook_obs > frame_hooks / 2);
  CHECK(frame_hook_imgs_ok);

  {
    auto sp = tracker.stage_split();
    if (sp.frames > 0)
      std::printf(
          "tracking split (mean ms/frame, %u host cores): build %.1f, "
          "match %.1f, objects %.1f, keyframe %.1f\n",
          std::thread::hardware_concurrency(),
          sp.build / sp.frames / 1e3, sp.match / sp.frames / 1e3,
          sp.objects / sp.frames / 1e3, sp.keyframe / sp.frames / 1e3);
  }
  std::printf("tracking_test: ALL OK\n");
  return 0;
}
