#include "romap/tracking.h"
#include <cstdio>
#include <cstdlib>

#include <algorithm>
#include <array>
#include <cmath>

#include <opencv2/imgproc.hpp>

#include "romap/geometry.h"
#include "romap/matcher.h"
#include "romap/optimizer.h"
#include "romap/t_table.h"

namespace romap {

Tracker::Tracker(const TrackingConfig& cfg)
    : cfg_(cfg), orb_(cfg.n_features) {
  cv::setNumThreads(1);   // deterministic OpenCV ops
  cv::setRNGSeed(12345);  // deterministic RANSAC
}

std::vector<Detection> Tracker::FilterDetections(
    const std::vector<Detection>& in) const {
  // ref src/Tracking.cc:393-469: drop ignored classes, boxes at the image
  // edge, too-large / too-small boxes, and mutually-overlapping pairs.
  std::vector<Detection> out;
  const auto& cam = cfg_.cam;
  float img_area = (cam.max_x - cam.min_x) * (cam.max_y - cam.min_y);
  for (const Detection& d : in) {
    if (cfg_.ignore_classes.count(d.cls)) continue;
    float area = d.rect.area();
    if (area > img_area * cfg_.max_box_area_ratio) continue;
    if (area < img_area * cfg_.min_box_area_ratio) continue;
    out.push_back(d);
  }
  // mutual-overlap filter: drop BOTH when IoU > threshold (ambiguous)
  std::vector<bool> drop(out.size(), false);
  for (size_t i = 0; i < out.size(); ++i) {
    for (size_t j = i + 1; j < out.size(); ++j) {
      float inter = (out[i].rect & out[j].rect).area();
      float uni = out[i].rect.area() + out[j].rect.area() - inter;
      if (uni > 0 && inter / uni > cfg_.mutual_iou_filter)
        drop[i] = drop[j] = true;
    }
  }
  std::vector<Detection> final_out;
  for (size_t i = 0; i < out.size(); ++i)
    if (!drop[i]) final_out.push_back(out[i]);
  return final_out;
}

void Tracker::BuildFrame(const cv::Mat& gray, const cv::Mat& instance,
                         const std::vector<Detection>& detections,
                         double timestamp) {
  static long next_frame_id = 0;
  cur_ = Frame();
  cur_.id = next_frame_id++;
  cur_.timestamp = timestamp;
  cur_.cam = cfg_.cam;
  orb_.Extract(gray, &cur_.keypoints, &cur_.descriptors);
  cur_.points.assign(cur_.keypoints.size(), nullptr);
  cur_.outlier.assign(cur_.keypoints.size(), false);

  const auto& cam = cfg_.cam;
  for (const Detection& d : FilterDetections(detections)) {
    ObjectFrame of;
    of.frame_id = cur_.id;
    of.bbox.rect = d.rect;
    of.bbox.cls = d.cls;
    of.bbox.confidence = d.confidence;
    of.bbox.edge = d.rect.x <= cam.min_x + cfg_.edge_margin ||
                   d.rect.y <= cam.min_y + cfg_.edge_margin ||
                   d.rect.x + d.rect.width >= cam.max_x - cfg_.edge_margin ||
                   d.rect.y + d.rect.height >= cam.max_y - cfg_.edge_margin;
    of.bbox.edge_and_small =
        of.bbox.edge &&
        d.rect.area() <
            0.05f * (cam.max_x - cam.min_x) * (cam.max_y - cam.min_y);
    cur_.detections.push_back(std::move(of));
  }

  // line segments (ref line_lbd usage src/Tracking.cc:476-492)
  if (!cur_.detections.empty()) {
    static cv::Ptr<cv::LineSegmentDetector> lsd =
        cv::createLineSegmentDetector(cv::LSD_REFINE_NONE);
    std::vector<cv::Vec4f> raw;
    lsd->detect(gray, raw);
    cur_.lines = MergeLines({raw.begin(), raw.end()});
    cur_.AssignLinesToBoxes();
  }
  cur_.AssignFeaturesToBoxes(instance);
}

bool Tracker::Initialize() {
  if (!has_init_ref_) {
    if (cur_.keypoints.size() < 100) return false;
    init_ref_ = cur_;
    has_init_ref_ = true;
    return false;
  }
  std::vector<int> matches12;
  int n = SearchForInitialization(init_ref_, cur_, &matches12);
  if (n < 60) {
    init_ref_ = cur_;  // restart from the current frame
    return false;
  }
  SE3 t21;
  std::vector<Vec3> pts;
  std::vector<bool> inliers;
  if (!InitializeTwoView(init_ref_, cur_, matches12, &t21, &pts, &inliers))
    return false;

  // build the initial map: two keyframes + triangulated points
  init_ref_.tcw = SE3();
  init_ref_.pose_valid = true;
  cur_.tcw = t21;
  cur_.pose_valid = true;

  KeyFrame* kf1 = map_.CreateKeyFrame();
  KeyFrame* kf2 = map_.CreateKeyFrame();
  for (KeyFrame* kf : {kf1, kf2}) {
    const Frame& f = (kf == kf1) ? init_ref_ : cur_;
    kf->frame_id = f.id;
    kf->timestamp = f.timestamp;
    kf->tcw = f.tcw;
    kf->cam = f.cam;
    kf->keypoints = f.keypoints;
    kf->descriptors = f.descriptors.clone();
    kf->points.assign(f.keypoints.size(), nullptr);
    kf->bbox_assignment = f.bbox_assignment;
  }
  for (size_t i = 0; i < matches12.size(); ++i) {
    if (!inliers[i]) continue;
    MapPoint* mp = map_.CreatePoint(pts[i],
                                    init_ref_.descriptors.row(static_cast<int>(i)));
    mp->first_kf_id = kf1->id;
    mp->obs[kf1] = static_cast<int>(i);
    mp->obs[kf2] = matches12[i];
    kf1->points[i] = mp;
    kf2->points[matches12[i]] = mp;
    cur_.points[matches12[i]] = mp;
  }
  last_kf_ = kf2;
  init_frame_id_ = cur_.id;
  frames_since_kf_ = 0;
  state_ = State::kOk;
  return true;
}

bool Tracker::TrackWithMotionModel() {
  cur_.tcw = has_velocity_ ? velocity_ * last_.tcw : last_.tcw;
  cur_.pose_valid = true;
  int n = SearchByProjectionLastFrame(cur_, last_, 16.0f);
  if (n < 20) {
    std::fill(cur_.points.begin(), cur_.points.end(), nullptr);
    n = SearchByProjectionLastFrame(cur_, last_, 32.0f);
  }
  if (n < 15) return false;
  return OptimizePose(&cur_) >= 10;
}

bool Tracker::TrackLocalMap() {
  // local points: everything observed by recent keyframes' covisibles —
  // at object-mapping scale the whole map is small, use it directly.
  int n = SearchByProjectionMapPoints(cur_, map_.Points(), 8.0f);
  (void)n;
  int inliers = OptimizePose(&cur_);
  for (size_t i = 0; i < cur_.points.size(); ++i)
    if (cur_.points[i] && !cur_.outlier[i]) cur_.points[i]->n_found++;
  return inliers >= 15;
}

void Tracker::ObjectPipeline(const cv::Mat& /*instance*/) {
  // 1. bind this frame's tracked map points to detections
  //    (ref src/Tracking.cc:1295-1317)
  for (size_t i = 0; i < cur_.keypoints.size(); ++i) {
    int b = cur_.bbox_assignment[i];
    if (b < 0 || !cur_.points[i] || cur_.outlier[i]) continue;
    cur_.detections[b].points.push_back(cur_.points[i]);
  }
  FrameContext ctx{cur_.id, cur_.timestamp, cur_.tcw, cur_.cam, cur_.lines};

  for (ObjectFrame& det : cur_.detections) {
    if (std::getenv("ROMAP_SLAM_DEBUG")) {
      int in_box = 0, in_box_mp = 0;
      for (size_t i = 0; i < cur_.keypoints.size(); ++i) {
        if (cur_.bbox_assignment[i] >= 0) ++in_box;
        if (cur_.bbox_assignment[i] >= 0 && cur_.points[i]) ++in_box_mp;
      }
      std::printf("[obj det frame %ld] cls=%d rect=(%.0f %.0f %.0f %.0f) "
                  "kps_in_boxes=%d with_mp=%d det_pts=%zu\n",
                  cur_.id, det.bbox.cls, det.bbox.rect.x, det.bbox.rect.y,
                  det.bbox.rect.width, det.bbox.rect.height, in_box, in_box_mp,
                  det.points.size());
    }
    if (det.points.size() < 4) {
      det.bad = true;
      continue;
    }
    det.FilterPointsByBoxPlot(cur_.tcw);  // ref ObjectFrame.cc:137-180
    det.ComputeStats();
    det.ProjectPointsBbox(ctx);
  }

  if (cur_.id <= init_frame_id_ + cfg_.init_after_frames) return;

  auto objects = map_.Objects();
  std::vector<ObjectMap*> seen_this_frame;

  for (ObjectFrame& det : cur_.detections) {
    if (det.bad) continue;
    ObjectMap* assoc = nullptr;

    // --- consecutive association: bbox IoU + shared points
    //     (ref Tracking.cc:1437-1494) ---
    ObjectMap* best_iou_obj = nullptr;
    float best_iou = 0;
    ObjectMap* best_share_obj = nullptr;
    int best_share = 0;
    std::set<MapPoint*> det_pts(det.points.begin(), det.points.end());
    for (ObjectMap* obj : objects) {
      if (obj->cls != det.bbox.cls) continue;
      bool consecutive = cur_.id - obj->latest_obs_frame_id <= 2;
      if (consecutive) {
        float iou = det.bbox.IoU(obj->last_bbox.rect);
        if (iou > best_iou) {
          best_iou = iou;
          best_iou_obj = obj;
        }
      }
      int share = 0;
      for (MapPoint* p : obj->points)
        if (det_pts.count(p)) ++share;
      if (share > static_cast<int>(det_pts.size()) / 3 && share > best_share) {
        best_share = share;
        best_share_obj = obj;
      }
    }
    if (best_iou > 0.7f && best_iou_obj->WhetherAssociation(det, ctx)) {
      assoc = best_iou_obj;
    } else if (best_iou > 0 && best_share > 0 && best_iou_obj == best_share_obj &&
               best_iou_obj->WhetherAssociation(det, ctx)) {
      assoc = best_iou_obj;
    } else if (!assoc && best_share_obj &&
               best_share_obj->WhetherAssociation(det, ctx)) {
      assoc = best_share_obj;
    }

    // --- non-consecutive: t-test on historical position means
    //     (ref Tracking.cc:1562-1637) ---
    if (!assoc) {
      std::vector<ObjectMap*> possible;
      for (ObjectMap* obj : objects) {
        if (obj->cls != det.bbox.cls) continue;
        if (obj->latest_obs_frame_id == cur_.id) continue;
        if (obj->history_pos.size() < 2 || obj->n_obs <= 6) continue;
        obj->ComputeHistoryStats();
        float tv[3];
        bool ok = true;
        for (int a = 0; a < 3; ++a) {
          float sd = std::max(obj->history_pos_std[a], 1e-4f);
          tv[a] = std::sqrt(static_cast<float>(obj->n_obs)) *
                  std::abs(obj->history_pos_mean[a] - det.pos_mean[a]) / sd;
        }
        int dof = std::min(100, obj->n_obs - 1);
        float th05 = t_critical(dof, 0);
        if (tv[0] < th05 && tv[1] < th05 && tv[2] < th05) {
          possible.push_back(obj);
          continue;
        }
        (void)ok;
        // reprojection-overlap rescue at alpha = 0.001 (ref :1621-1637)
        obj->ProjectPointsBbox(ctx);
        float inter = (obj->projected_rect & det.bbox.rect).area();
        float uni = obj->projected_rect.area() + det.bbox.rect.area() - inter;
        if (uni > 0 && inter / uni > 0.3f) {
          float th001 = t_critical(dof, 2);
          if ((tv[0] < th001 && tv[1] < th001 && tv[2] < th001) ||
              (tv[0] + tv[1] + tv[2]) / 3 < 2 * th001)
            possible.push_back(obj);
        }
      }
      std::sort(possible.begin(), possible.end(),
                [](ObjectMap* a, ObjectMap* b) { return a->n_obs > b->n_obs; });
      for (ObjectMap* cand : possible) {
        if (cand->WhetherAssociation(det, ctx)) {
          assoc = cand;
          break;
        }
      }
    }

    // --- update or create (ref Tracking.cc:1721-1800) ---
    if (!assoc) {
      if (det.points.size() < static_cast<size_t>(cfg_.min_points_new_object) ||
          det.bbox.edge)
        continue;
      assoc = map_.CreateObject(det.bbox.cls, cur_.id, cfg_.object);
    }
    assoc->AddNewPoints(det.points, cur_.id);
    assoc->n_obs += 1;
    assoc->latest_obs_frame_id = cur_.id;
    assoc->last_last_bbox = assoc->last_bbox;
    assoc->last_bbox = det.bbox;
    assoc->latest_lines = det.lines;
    assoc->history_pos.push_back(det.pos_mean);
    assoc->FilterOutliersReprojection(ctx);
    assoc->EIFFilterOutliers();
    assoc->ComputeMeanStd();
    assoc->ComputeHistoryStats();
    assoc->EstimatePose(ctx);
    assoc->InsertHistoryBboxAndTwc(ctx, det.bbox);
    seen_this_frame.push_back(assoc);
  }

  // covisibility update (ref UpdateCovRelation)
  for (ObjectMap* obj : seen_this_frame)
    for (ObjectMap* other : seen_this_frame)
      if (other != obj) obj->appear_same_times[other]++;
}

bool Tracker::NeedKeyFrame() const {
  if (frames_since_kf_ >= cfg_.max_frames_between_kf) return true;
  if (!last_kf_) return true;
  int tracked = 0;
  for (size_t i = 0; i < cur_.points.size(); ++i)
    if (cur_.points[i] && !cur_.outlier[i]) ++tracked;
  int ref = std::max(last_kf_->TrackedPoints(), 1);
  return tracked < cfg_.kf_tracked_ratio * ref && frames_since_kf_ >= 2;
}

cv::Mat Tracker::SparseDepth(const KeyFrame& kf) const {
  // project the keyframe's map points; depth at their pixels
  // (ref KeyFrame::GenerateSparseDepthImg src/KeyFrame.cc:665-695)
  int h = static_cast<int>(kf.cam.max_y), w = static_cast<int>(kf.cam.max_x);
  cv::Mat depth = cv::Mat::zeros(h, w, CV_32F);
  for (size_t i = 0; i < kf.points.size(); ++i) {
    const MapPoint* p = kf.points[i];
    if (!p || p->bad) continue;
    Vec3 c = kf.tcw * p->pos;
    if (c[2] <= 0) continue;
    int x = static_cast<int>(kf.keypoints[i].pt.x);
    int y = static_cast<int>(kf.keypoints[i].pt.y);
    if (x >= 0 && y >= 0 && x < w && y < h) depth.at<float>(y, x) = c[2];
  }
  return depth;
}

KeyFrame* Tracker::MakeKeyFrame(const cv::Mat& rgb, const cv::Mat& instance) {
  KeyFrame* kf = map_.CreateKeyFrame();
  kf->frame_id = cur_.id;
  kf->timestamp = cur_.timestamp;
  kf->tcw = cur_.tcw;
  kf->cam = cur_.cam;
  kf->keypoints = cur_.keypoints;
  kf->descriptors = cur_.descriptors.clone();
  kf->points = cur_.points;
  kf->bbox_assignment = cur_.bbox_assignment;
  for (size_t i = 0; i < kf->points.size(); ++i) {
    if (kf->points[i] && !cur_.outlier[i]) {
      kf->points[i]->obs[kf] = static_cast<int>(i);
      // refresh the representative descriptor to the latest view — stale
      // descriptors stop matching once the viewpoint rotates (ORB-SLAM2
      // recomputes the median descriptor; latest-view works as well here)
      kf->points[i]->descriptor = kf->descriptors.row(static_cast<int>(i)).clone();
    } else {
      kf->points[i] = nullptr;
    }
  }
  return kf;
}

void Tracker::MappingStep(KeyFrame* kf, const cv::Mat& rgb,
                          const cv::Mat& instance) {
  // triangulate new points against recent keyframes
  // (ref LocalMapping::CreateNewMapPoints searches covisible neighbors)
  {
    auto all_kfs = map_.KeyFrames();
    int n_prev = std::min<int>(3, static_cast<int>(all_kfs.size()) - 1);
    for (int k = 1; k <= n_prev; ++k) {
      KeyFrame* prev = all_kfs[all_kfs.size() - 1 - k];
      if (prev == kf) continue;
      std::vector<std::pair<int, int>> matches;
      SearchForTriangulation(*prev, *kf, &matches);
      for (const auto& [i1, i2] : matches) {
        if (prev->points[i1] || kf->points[i2]) continue;
        Vec3 world;
        if (!TriangulatePoint(prev->tcw, prev->cam, prev->keypoints[i1].pt,
                              kf->tcw, kf->cam, kf->keypoints[i2].pt, &world))
          continue;
        MapPoint* mp = map_.CreatePoint(world, prev->descriptors.row(i1));
        mp->first_kf_id = prev->id;
        mp->obs[prev] = i1;
        mp->obs[kf] = i2;
        prev->points[i1] = mp;
        kf->points[i2] = mp;
      }
    }
  }

  // local bundle adjustment over the recent keyframe window
  // (ref Optimizer::LocalBundleAdjustment via LocalMapping.cc:93)
  std::vector<KeyFrame*> ba_window;
  {
    auto all_kfs = map_.KeyFrames();
    size_t window = std::min<size_t>(all_kfs.size(), 10);
    std::vector<KeyFrame*> local(all_kfs.end() - window, all_kfs.end());
    std::set<KeyFrame*> fixed;
    fixed.insert(local.front());
    if (local.size() > 2) fixed.insert(local[1]);
    BAStats s1 = LocalBundleAdjust(local, fixed, /*iters=*/4);
    BAStats s2 = LocalBundleAdjust(local, fixed, /*iters=*/3);  // post-strip
    ba_window = local;
    if (std::getenv("ROMAP_SLAM_DEBUG")) {
      std::printf(
          "[BA kf=%ld] window=%zu pts=%d obs=%d rmse %.2f->%.2f | "
          "pass2 pts=%d obs=%d rmse %.2f->%.2f map=%zu\n",
          kf->id, local.size(), s1.n_points, s1.n_obs, s1.initial_rmse_px,
          s1.final_rmse_px, s2.n_points, s2.n_obs, s2.initial_rmse_px,
          s2.final_rmse_px, map_.Points().size());
    }
  }

  // Upload the keyframe to the NeRF runtime only now, with the BA-refined
  // pose and BA-refined sparse depth (the reference's LocalMapping uploads
  // after LocalBA for the same reason, ref LocalMapping.cc:74-105); then
  // rewrite the rest of the BA window's already-uploaded poses.
  cur_.tcw = kf->tcw;  // keep the tracker's view of this frame consistent
  if (hooks.on_keyframe && !rgb.empty())
    hooks.on_keyframe(*kf, rgb, instance, SparseDepth(*kf));
  if (hooks.update_poses) {
    std::vector<std::pair<double, SE3>> refined;
    refined.reserve(ba_window.size());
    for (KeyFrame* k : ba_window)
      refined.push_back({k->timestamp, k->Twc()});
    hooks.update_poses(refined);
  }

  // keyframe-side object updates (ref LocalMapping::UpdateObjSizeAndPose)
  FrameContext ctx{cur_.id, cur_.timestamp, kf->tcw, kf->cam, cur_.lines};
  for (ObjectMap* obj : map_.Objects()) {
    if (obj->history_bbox.count(kf->timestamp)) {
      obj->keyframe_history_bbox[kf->timestamp] =
          obj->history_bbox[kf->timestamp];
      obj->keyframe_bbox_pending[kf->timestamp] =
          obj->history_bbox[kf->timestamp];
      obj->EstimateShape();
    }
  }

  // cuboid-overlap merge / false-object cull
  // (ref LocalMapping::MergeOverlapObjects :959-1107, simplified to the
  // center-containment + same-class rule)
  auto objs = map_.Objects();
  for (size_t i = 0; i < objs.size(); ++i) {
    for (size_t j = i + 1; j < objs.size(); ++j) {
      ObjectMap *a = objs[i], *b = objs[j];
      if (a->IsBad() || b->IsBad()) continue;
      if (a->cls != b->cls && !cfg_.object.merge_different_class) continue;
      // center + reach, falling back to the midpoint pose / axis length for
      // objects whose refined shape does not exist yet
      auto center_reach = [](const ObjectMap* o) {
        if (o->first_init)
          return std::make_pair(o->t_obj_w.inverse().t, o->axis_length);
        return std::make_pair(o->shape.t_obj_w.inverse().t, o->shape.max_dist);
      };
      auto [ca, ra] = center_reach(a);
      auto [cb, rb] = center_reach(b);
      Vec3 dc = ca - cb;
      float dist = std::sqrt(dc.dot(dc));
      // same-class cuboids whose centers sit well inside each other's
      // diagonal reach are one physical object (the reference samples the
      // cuboid volume overlap > 0.3; this center-distance test is the cheap
      // equivalent at these scales)
      if (ra <= 0 || rb <= 0) continue;
      bool overlap = dist < 0.75f * (ra + rb);
      if (!overlap) continue;
      ObjectMap* keep = a->n_obs >= b->n_obs ? a : b;
      ObjectMap* gone = keep == a ? b : a;
      if (gone->have_nerf) continue;  // never cull a NeRF'd object
      keep->Merge(gone, kf->timestamp);
      gone->SetBad("merged into overlap");
    }
  }

  TriggerNerf(kf);
  last_kf_ = kf;
  frames_since_kf_ = 0;
}

void Tracker::TriggerNerf(KeyFrame* kf) {
  if (!hooks.create_nerf) return;
  for (ObjectMap* obj : map_.Objects()) {
    if (obj->keyframe_bbox_pending.empty()) continue;
    // viewing direction from camera to object center
    Vec3 center = obj->first_init ? obj->t_obj_w.inverse().t
                                  : obj->shape.t_obj_w.inverse().t;
    Vec3 dir = center - kf->Twc().t;
    float n = std::sqrt(dir.dot(dir));
    if (n < 1e-6f) continue;
    dir *= 1.0f / n;

    if (!obj->have_nerf) {
      if (!first_view_dir_.count(obj)) {
        first_view_dir_[obj] = dir;
        continue;
      }
      float cosang = dir.dot(first_view_dir_[obj]);
      bool angle_ok = cosang < std::cos(2.0f * cfg_.nerf_angle_change);
      if (std::getenv("ROMAP_SLAM_DEBUG"))
        std::printf("[nerf trig obj %ld] cos=%.4f need<%.4f pending=%zu\n",
                    obj->id, cosang, std::cos(2.0f * cfg_.nerf_angle_change),
                    obj->keyframe_bbox_pending.size());
      if (angle_ok && static_cast<int>(obj->keyframe_bbox_pending.size()) >=
                          cfg_.min_bboxes_for_nerf) {
        int idx = hooks.create_nerf(obj);
        if (idx >= 0) {
          obj->have_nerf = true;
          obj->nerf_index = idx;
          std::vector<std::array<int64_t, 5>> rows;
          for (const auto& kv : obj->keyframe_bbox_pending) {
            const auto& r = kv.second.rect;
            rows.push_back({static_cast<int64_t>(kv.first * 1e6),
                            static_cast<int64_t>(r.x),
                            static_cast<int64_t>(r.y),
                            static_cast<int64_t>(r.height),
                            static_cast<int64_t>(r.width)});
          }
          hooks.update_bboxes(obj, rows);
          obj->keyframe_bbox_pending.clear();
          last_pushed_dir_[obj] = dir;
        }
      }
    } else {
      float cosang = last_pushed_dir_.count(obj)
                         ? dir.dot(last_pushed_dir_[obj])
                         : -1.0f;
      if (cosang < std::cos(cfg_.nerf_angle_change)) {
        std::vector<std::array<int64_t, 5>> rows;
        for (const auto& kv : obj->keyframe_bbox_pending) {
          const auto& r = kv.second.rect;
          rows.push_back({static_cast<int64_t>(kv.first * 1e6),
                          static_cast<int64_t>(r.x),
                          static_cast<int64_t>(r.y),
                          static_cast<int64_t>(r.height),
                          static_cast<int64_t>(r.width)});
        }
        if (hooks.update_bboxes) hooks.update_bboxes(obj, rows);
        obj->keyframe_bbox_pending.clear();
        last_pushed_dir_[obj] = dir;
      }
    }
  }
}

void Tracker::FinalizeObjects() {
  FrameContext ctx{cur_.id, cur_.timestamp, cur_.tcw, cur_.cam, {}};
  for (ObjectMap* obj : map_.Objects()) {
    obj->EIFFilterOutliers();
    obj->EstimateShape();
    std::printf(
        "object %ld: class %d obs %d pts %zu nerf %d pending %zu kf_boxes %zu\n",
        obj->id, obj->cls, obj->n_obs, obj->points.size(),
        obj->have_nerf ? 1 : 0, obj->keyframe_bbox_pending.size(),
        obj->keyframe_history_bbox.size());
  }
}

std::optional<SE3> Tracker::Track(const cv::Mat& gray, const cv::Mat& instance,
                                  const std::vector<Detection>& detections,
                                  double timestamp, const cv::Mat& rgb) {
  BuildFrame(gray, instance, detections, timestamp);

  if (state_ == State::kNotInitialized) {
    if (Initialize()) {
      trajectory_.push_back({timestamp, cur_.tcw});
      last_ = cur_;
      return cur_.tcw;
    }
    last_ = cur_;
    return std::nullopt;
  }

  bool ok = TrackWithMotionModel();
  if (ok) ok = TrackLocalMap();
  if (std::getenv("ROMAP_SLAM_DEBUG")) {
    int tracked = 0;
    for (size_t i = 0; i < cur_.points.size(); ++i)
      if (cur_.points[i] && !cur_.outlier[i]) ++tracked;
    std::printf("[frame %ld] ok=%d tracked=%d pose_t=(%.2f %.2f %.2f)\n",
                cur_.id, ok ? 1 : 0, tracked, cur_.tcw.t[0], cur_.tcw.t[1],
                cur_.tcw.t[2]);
  }
  if (!ok) {
    state_ = State::kLost;
    has_velocity_ = false;
    last_ = cur_;
    return std::nullopt;
  }
  state_ = State::kOk;

  ObjectPipeline(instance);

  velocity_ = cur_.tcw * last_.tcw.inverse();
  has_velocity_ = true;
  ++frames_since_kf_;
  if (NeedKeyFrame()) {
    KeyFrame* kf = MakeKeyFrame(rgb, instance);
    MappingStep(kf, rgb, instance);
  }
  trajectory_.push_back({timestamp, cur_.tcw});
  last_ = cur_;
  return cur_.tcw;
}

}  // namespace romap
