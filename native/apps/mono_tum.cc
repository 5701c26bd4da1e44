// Online RO-MAP pipeline: monocular SLAM frontend + TPU NeRF backend.
// The rebuilt equivalent of the reference's mono_tum example
// (ref examples/Monocular/mono_tum.cc): reads a dataset in the reference's
// on-disk layout (config.yaml, img.txt, rgb/, instance/, bbox/<stamp>.txt),
// tracks every frame, streams keyframes + object bboxes into the NeRF
// runtime, then renders held-out evaluation artifacts and saves TUM
// trajectories + objects.txt.
//
// usage: mono_tum <dataset> <runtime_socket|none> [train_iters] [out_dir]
//        [max_frames]

#include <cmath>
#include <cstdio>
#include <fstream>
#include <algorithm>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "monerf/nerf_manager.h"
#include "romap/tracking.h"

using namespace romap;

namespace {

struct DatasetConfig {
  float fx = 0, fy = 0, cx = 0, cy = 0;
  int h = 0, w = 0;
  std::vector<std::string> stamps;
  std::vector<std::string> names;
  // RO-MAP knobs (full key parity with ref src/Tracking.cc:139-195 and
  // src/System.cc:120-126); defaults match the rebuilt pipeline's.
  int orb_features = 2000;       // ORBextractor.nFeatures
  bool extend_box = false;       // ExtendBox: inflate detections by 10 px
  bool check_box_edge = true;    // CheckBoxEdge
  std::set<int> ignore_category; // IgnoreCategory
  int box_map_points = 10;       // BoxMapPoints
  int min_continue_obs = 3;      // Minimum.continue.obs
  float add_mps_dist = 2.0f;     // Add.MPs.distance.multiple
  float merge_mps_dist = 3.0f;   // Merge.MPs.distance.multiple
  bool merge_diff_class = false; // Merge.Different.class
  float eif_threshold = 0.58f;   // EIFthreshold
  bool check_mps_obs = false;    // CheckMPsObs
  int eif_obs_numbers = 10;      // EIFObsNumbers
  float nerf_angle_change = 0.05f;  // NeRF.AngleChange
  bool use_sparse_depth = false;    // NeRF.UseSparseDepth
  int train_step_iterations = 100;  // NeRF.TrainStepIterations
};

DatasetConfig ReadDataset(const std::string& root) {
  DatasetConfig out;
  std::ifstream cfg(root + "/config.yaml");
  std::string line;
  while (std::getline(cfg, line)) {
    std::stringstream s(line);
    std::string key;
    if (!(s >> key)) continue;
    auto val = [&]() {
      float v = 0;
      s >> v;
      return v;
    };
    if (key == "Camera.fx:") out.fx = val();
    else if (key == "Camera.fy:") out.fy = val();
    else if (key == "Camera.cx:") out.cx = val();
    else if (key == "Camera.cy:") out.cy = val();
    else if (key == "Camera.H:") out.h = static_cast<int>(val());
    else if (key == "Camera.W:") out.w = static_cast<int>(val());
    else if (key == "ORBextractor.nFeatures:") out.orb_features = (int)val();
    else if (key == "ExtendBox:") out.extend_box = val() != 0;
    else if (key == "CheckBoxEdge:") out.check_box_edge = val() != 0;
    else if (key == "IgnoreCategory:") {  // inline list: [41, 73] or 41 73
      std::string rest;
      std::getline(s, rest);
      std::stringstream rs(rest);
      std::string tok;
      while (rs >> tok) {
        tok.erase(std::remove_if(tok.begin(), tok.end(),
                                 [](char c) { return c == '[' || c == ']' ||
                                              c == ','; }),
                  tok.end());
        if (!tok.empty()) out.ignore_category.insert(std::atoi(tok.c_str()));
      }
    }
    else if (key == "BoxMapPoints:") out.box_map_points = (int)val();
    else if (key == "Minimum.continue.obs:") out.min_continue_obs = (int)val();
    else if (key == "Add.MPs.distance.multiple:") out.add_mps_dist = val();
    else if (key == "Merge.MPs.distance.multiple:") out.merge_mps_dist = val();
    else if (key == "Merge.Different.class:") out.merge_diff_class = val() != 0;
    else if (key == "EIFthreshold:") out.eif_threshold = val();
    else if (key == "CheckMPsObs:") out.check_mps_obs = val() != 0;
    else if (key == "EIFObsNumbers:") out.eif_obs_numbers = (int)val();
    else if (key == "NeRF.AngleChange:") out.nerf_angle_change = val();
    else if (key == "NeRF.UseSparseDepth:") out.use_sparse_depth = val() != 0;
    else if (key == "NeRF.TrainStepIterations:")
      out.train_step_iterations = (int)val();
  }
  std::ifstream imgs(root + "/img.txt");
  while (std::getline(imgs, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::stringstream s(line);
    std::string stamp, name;
    s >> stamp >> name;
    out.stamps.push_back(stamp);
    out.names.push_back(name);
  }
  return out;
}

std::vector<Detection> ReadBboxFile(const std::string& path,
                                    const DatasetConfig& ds) {
  std::vector<Detection> out;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    std::stringstream s(line);
    float cls, x, y, w, h, conf = 1.0f;
    if (!(s >> cls >> x >> y >> w >> h)) continue;
    s >> conf;
    Detection d;
    if (ds.extend_box) {
      // ref Tracking.cc:370-377: inflate each detection by 10 px per side
      float nx = std::max(0.f, x - 10), ny = std::max(0.f, y - 10);
      d.rect = {nx, ny, std::min(static_cast<float>(ds.w - 1) - nx, w + 20),
                std::min(static_cast<float>(ds.h - 1) - ny, h + 20)};
    } else {
      d.rect = {x, y, w, h};
    }
    d.cls = static_cast<int>(cls);
    d.confidence = conf;
    out.push_back(d);
  }
  return out;
}

monerf::Mat4 ToMat4(const SE3& t) {
  monerf::Mat4 m;
  Mat4 src = t.matrix();
  for (int i = 0; i < 16; ++i) m.m[i] = src.val[i];
  return m;
}

void SaveTrajectoryTUM(const std::string& path,
                       const std::vector<Tracker::Stamped>& traj) {
  std::ofstream f(path);
  for (const auto& s : traj) {
    SE3 twc = s.tcw.inverse();
    float q[4];
    RotToQuat(twc.R, q);
    char buf[256];
    std::snprintf(buf, sizeof(buf), "%.6f %.7f %.7f %.7f %.7f %.7f %.7f %.7f\n",
                  s.t, twc.t[0], twc.t[1], twc.t[2], q[0], q[1], q[2], q[3]);
    f << buf;
  }
}

void SaveKeyFrameTrajectoryTUM(
    const std::string& path,
    const std::vector<Tracker::MapSnapshot::KF>& kfs) {
  // ref System::SaveKeyFrameTrajectoryTUM src/System.cc:431-466
  std::ofstream f(path);
  for (const auto& kf : kfs) {
    SE3 twc = kf.tcw.inverse();
    float q[4];
    RotToQuat(twc.R, q);
    char buf[256];
    std::snprintf(buf, sizeof(buf), "%.6f %.7f %.7f %.7f %.7f %.7f %.7f %.7f\n",
                  kf.t, twc.t[0], twc.t[1], twc.t[2], q[0], q[1], q[2], q[3]);
    f << buf;
  }
}

void SaveObjects(const std::string& path,
                 const std::vector<Tracker::MapSnapshot::Obj>& objs) {
  // ref System::SaveObjects src/System.cc:529-563: ID class t q a1 a2 a3
  std::ofstream f(path);
  for (const auto& o : objs) {
    SE3 two = o.t_obj_w.inverse();
    float q[4];
    RotToQuat(two.R, q);
    char buf[256];
    std::snprintf(buf, sizeof(buf),
                  "%ld %d %.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n",
                  o.id, o.cls, two.t[0], two.t[1], two.t[2], q[0], q[1], q[2],
                  q[3], o.a1, o.a2, o.a3);
    f << buf;
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <dataset> <runtime_socket|none> [train_iters] "
                 "[out_dir] [max_frames]\n",
                 argv[0]);
    return 2;
  }
  std::string dataset = argv[1];
  std::string socket = argv[2];
  int train_iters = argc > 3 ? std::atoi(argv[3]) : 100;
  std::string out_dir = argc > 4 ? argv[4] : "./output";
  DatasetConfig ds = ReadDataset(dataset);
  size_t max_frames = argc > 5 ? std::atoi(argv[5]) : ds.stamps.size();
  if (ds.stamps.empty() || ds.w == 0) {
    std::fprintf(stderr, "dataset read failed: %s\n", dataset.c_str());
    return 1;
  }
  std::printf("dataset: %zu frames %dx%d\n", ds.stamps.size(), ds.w, ds.h);

  TrackingConfig cfg;
  cfg.cam = {ds.fx, ds.fy, ds.cx, ds.cy,
             0, 0, static_cast<float>(ds.w), static_cast<float>(ds.h)};
  cfg.n_features = ds.orb_features;
  cfg.max_frames_between_kf = 5;
  cfg.nerf_angle_change = ds.nerf_angle_change;
  cfg.min_bboxes_for_nerf = 12;  // must exceed the runtime >10-bbox gate
  cfg.ignore_classes = ds.ignore_category;
  cfg.min_points_new_object = ds.box_map_points;
  cfg.min_continue_obs = ds.min_continue_obs;
  if (!ds.check_box_edge) cfg.edge_margin = 0;
  cfg.object.eif_threshold = ds.eif_threshold;
  cfg.object.eif_obs_numbers = ds.eif_obs_numbers;
  cfg.object.check_mps_obs = ds.check_mps_obs;
  cfg.object.add_mps_dist_multiple = ds.add_mps_dist;
  cfg.object.merge_mps_dist_multiple = ds.merge_mps_dist;
  cfg.object.merge_different_class = ds.merge_diff_class;
  if (argc <= 3) train_iters = ds.train_step_iterations;
  Tracker tracker(cfg);
  tracker.StartMapping();  // mapping thread (ref System.cc:84-96)

  std::unique_ptr<monerf::NerfManagerOnline> mgr;
  int kf_serial = 0;
  std::map<long long, int> stamp_us_to_img;
  std::map<const ObjectMap*, int> nerf_idx;

  if (socket != "none") {
    mgr.reset(new monerf::NerfManagerOnline(socket, ds.use_sparse_depth,
                                            train_iters, /*capacity=*/8));
    mgr->Init();
    // preallocated keyframe budget: nimages/2 + 8 — a deliberately looser
    // bound than the reference's nimages/3 (ref src/System.cc:135-138)
    // because our keyframe policy fires more often on short sequences; the
    // store grows if it overflows either way.
    mgr->DatasetInit(ds.fx, ds.fy, ds.cx, ds.cy, ds.h, ds.w,
                     std::max<size_t>(ds.stamps.size() / 2 + 8, 16));
    mgr->StartBackgroundTraining();

    tracker.hooks.on_keyframe = [&](const KeyFrame& f, const cv::Mat& rgb,
                                    const cv::Mat& instance,
                                    const cv::Mat& sparse_depth) {
      int img_id = kf_serial++;
      stamp_us_to_img[static_cast<long long>(f.timestamp * 1e6)] = img_id;
      char stamp[64];
      std::snprintf(stamp, sizeof(stamp), "%.6f", f.timestamp);
      cv::Mat rgb_order;
      cv::cvtColor(rgb, rgb_order, cv::COLOR_BGR2RGB);
      SE3 twc = f.tcw.inverse();
      // NeRF.UseSparseDepth: ship the BA-refined sparse depth as a NeRF
      // supervision channel (ref src/LocalMapping.cc:1122-1180 uploads
      // KeyFrame::GenerateSparseDepthImg output; consumed by the L1 depth
      // loss, ref Core/src/nerf_model.cu:869-871). Zero pixels mean
      // "no supervision" on both sides.
      const float* depth_ptr = nullptr;
      cv::Mat depth_cont;
      if (ds.use_sparse_depth && !sparse_depth.empty()) {
        depth_cont = sparse_depth.isContinuous() ? sparse_depth
                                                 : sparse_depth.clone();
        depth_ptr = depth_cont.ptr<float>(0);
      }
      mgr->NewFrameToDataset(img_id, stamp, rgb_order.data, instance.data,
                             depth_ptr, ToMat4(twc));
    };
    tracker.hooks.create_nerf = [&](ObjectMap* obj) {
      // Round-1 margin: sparse monocular clouds cover only the seen faces,
      // so the cuboid underestimates the object; a generous margin keeps the
      // whole object inside the NeRF volume (the reference's 1.1x assumes a
      // mature point cloud; shrink this as the object layer improves).
      float m = 2.0f;
      monerf::BoundingBox bb{
          {-m * obj->shape.a1, -m * obj->shape.a2, -m * obj->shape.a3},
          {m * obj->shape.a1, m * obj->shape.a2, m * obj->shape.a3}};
      int idx = static_cast<int>(
          mgr->CreateNeRF(obj->cls, ToMat4(obj->shape.t_obj_w), bb));
      nerf_idx[obj] = idx;
      std::printf("Create NeRF %d for object %ld (class %d)\n", idx, obj->id,
                  obj->cls);
      return idx;
    };
    tracker.hooks.update_bboxes =
        [&](ObjectMap* obj, const std::vector<std::array<int64_t, 5>>& rows) {
          std::vector<monerf::FrameIdAndBbox> boxes;
          for (const auto& r : rows) {
            auto it = stamp_us_to_img.find(r[0]);
            if (it == stamp_us_to_img.end()) continue;
            boxes.push_back({static_cast<uint32_t>(it->second),
                             static_cast<uint32_t>(std::max<int64_t>(r[1], 0)),
                             static_cast<uint32_t>(std::max<int64_t>(r[2], 0)),
                             static_cast<uint32_t>(r[3]),
                             static_cast<uint32_t>(r[4])});
          }
          if (!boxes.empty() && nerf_idx.count(obj))
            mgr->UpdateNeRFBbox(nerf_idx[obj], boxes, /*train_step=*/1);
        };
    tracker.hooks.on_reset = [&] {
      // early-loss map reset invalidates every ObjectMap*/stamp we cached
      nerf_idx.clear();
    };
    tracker.hooks.update_poses =
        [&](const std::vector<std::pair<double, SE3>>& refined) {
          // rewrite already-uploaded keyframe poses with the BA-refined ones
          // (the frame store window is contiguous in upload serials)
          std::vector<std::pair<int, SE3>> got;
          for (const auto& [t, twc] : refined) {
            auto it =
                stamp_us_to_img.find(static_cast<long long>(t * 1e6));
            if (it != stamp_us_to_img.end()) got.push_back({it->second, twc});
          }
          if (got.empty()) return;
          std::sort(got.begin(), got.end(),
                    [](const auto& a, const auto& b) { return a.first < b.first; });
          size_t start = got.size() - 1;  // longest contiguous suffix
          while (start > 0 && got[start - 1].first + 1 == got[start].first)
            --start;
          std::vector<monerf::Mat4> poses;
          for (size_t i = start; i < got.size(); ++i)
            poses.push_back(ToMat4(got[i].second));
          mgr->UpdateDataset(
              static_cast<unsigned>(got.back().first + 1),
              static_cast<unsigned>(poses.size()), poses);
        };
  }

  // live viewer dump: every N frames rewrite the artifact text files so
  // `python -m romap_tpu.utils.webviewer <out_dir>` shows the session live
  // (env ROMAP_LIVE_DUMP=N; the reference's Pangolin window equivalent).
  int live_dump = 0;
  if (const char* ld = std::getenv("ROMAP_LIVE_DUMP")) live_dump = std::atoi(ld);
  auto dump_state = [&]() {
    // Snapshot() copies under the map mutex — safe against the live mapping
    // thread (BA rewrites poses/positions concurrently).
    Tracker::MapSnapshot s = tracker.Snapshot();
    SaveTrajectoryTUM(out_dir + "/FrameTrajectory.txt", s.trajectory);
    SaveKeyFrameTrajectoryTUM(out_dir + "/KeyFrameTrajectory.txt", s.keyframes);
    SaveObjects(out_dir + "/objects.txt", s.objects);
    FILE* f = std::fopen((out_dir + "/map_points.txt").c_str(), "w");
    if (!f) return;
    for (const Vec3& p : s.points)
      std::fprintf(f, "%.4f %.4f %.4f\n", p[0], p[1], p[2]);
    std::fclose(f);
  };

  // main loop (ref examples/Monocular/mono_tum.cc:85-103)
  int tracked = 0;
  for (size_t i = 0; i < std::min(max_frames, ds.stamps.size()); ++i) {
    cv::Mat bgr = cv::imread(dataset + "/rgb/" + ds.names[i], cv::IMREAD_COLOR);
    cv::Mat instance =
        cv::imread(dataset + "/instance/" + ds.names[i], cv::IMREAD_UNCHANGED);
    if (bgr.empty()) {
      std::fprintf(stderr, "missing image %s\n", ds.names[i].c_str());
      return 1;
    }
    cv::Mat gray;
    cv::cvtColor(bgr, gray, cv::COLOR_BGR2GRAY);
    auto dets = ReadBboxFile(dataset + "/bbox/" + ds.stamps[i] + ".txt", ds);
    double t = std::atof(ds.stamps[i].c_str());
    if (tracker.Track(gray, instance, dets, t, bgr)) ++tracked;
    if (live_dump > 0 && i % live_dump == 0) dump_state();
  }
  tracker.StopMapping();  // drain the keyframe queue before finalizing
  tracker.FinalBundleAdjust();  // full-window BA + NeRF-store pose rewrite
  tracker.FinalizeObjects();
  std::printf("tracked %d frames; objects: %zu; keyframes: %zu\n", tracked,
              tracker.map().Objects().size(), tracker.map().NumKeyFrames());

  if (mgr) {
    mgr->WaitThreadsEnd();  // ref SLAM.FinishNeRFs
    {
      std::vector<float> losses = mgr->GetLosses();
      for (size_t k = 0; k < losses.size(); ++k)
        std::printf("nerf %zu final loss: %f\n", k, losses[k]);
    }
    // held-out evaluation renders per NeRF'd object
    // (ref System::RenderNeRFsTest src/System.cc:570-611)
    for (ObjectMap* obj : tracker.map().Objects()) {
      if (!obj->have_nerf || !nerf_idx.count(obj)) continue;
      std::vector<std::string> stamps;
      std::vector<monerf::FrameIdAndBbox> boxes;
      std::vector<monerf::Mat4> twcs;
      for (const auto& kv : obj->history_bbox) {
        if (obj->keyframe_history_bbox.count(kv.first)) continue;  // held-out
        char stamp[64];
        std::snprintf(stamp, sizeof(stamp), "%.6f", kv.first);
        stamps.push_back(stamp);
        const auto& r = kv.second.rect;
        boxes.push_back({0, static_cast<uint32_t>(std::max(r.x, 0.0f)),
                         static_cast<uint32_t>(std::max(r.y, 0.0f)),
                         static_cast<uint32_t>(r.height),
                         static_cast<uint32_t>(r.width)});
        monerf::Mat4 m;
        const Mat4& src = obj->history_twc.at(kv.first);
        for (int k = 0; k < 16; ++k) m.m[k] = src.val[k];
        twcs.push_back(m);
        if (stamps.size() >= 8) break;  // a handful of eval views
      }
      float radius = 5.0f * obj->shape.max_dist;
      std::printf("render test: object %ld -> %zu views\n", obj->id,
                  stamps.size());
      mgr->RenderNeRFsTest(out_dir, nerf_idx[obj], stamps, boxes, twcs, radius,
                           /*video=*/false);
    }
  }

  dump_state();  // FrameTrajectory.txt + objects.txt + map_points.txt
  std::printf("saved trajectories + objects to %s\n", out_dir.c_str());
  return 0;
}
