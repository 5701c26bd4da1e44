#include "romap/tracking.h"

#include <chrono>
#include <cstdio>
#include <cstdlib>

#include <algorithm>
#include <array>
#include <cmath>
#include <limits>

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

  // line segments (ref line_lbd usage src/Tracking.cc:476-492). Lines only
  // matter when BOTH endpoints land inside a detection box
  // (AssignLinesToBoxes), so detect per padded box ROI instead of the full
  // frame — measured 27 ms/frame full-frame vs ~area-proportional per-ROI
  // at 480p. Falls back to one full-frame pass when boxes cover most of
  // the image (or ROMAP_LSD_FULL=1 for A/B).
  if (!cur_.detections.empty()) {
    static cv::Ptr<cv::LineSegmentDetector> lsd =
        cv::createLineSegmentDetector(cv::LSD_REFINE_NONE);
    std::vector<cv::Vec4f> raw;
    float roi_area = 0.f;
    std::vector<cv::Rect> rois;
    for (const ObjectFrame& of : cur_.detections) {
      cv::Rect_<float> r = of.bbox.rect;
      float px = 0.05f * r.width, py = 0.05f * r.height;
      cv::Rect roi(static_cast<int>(r.x - px), static_cast<int>(r.y - py),
                   static_cast<int>(r.width + 2 * px),
                   static_cast<int>(r.height + 2 * py));
      roi &= cv::Rect(0, 0, gray.cols, gray.rows);
      if (roi.area() <= 0) continue;
      rois.push_back(roi);
      roi_area += static_cast<float>(roi.area());
    }
    bool full = std::getenv("ROMAP_LSD_FULL") != nullptr ||
                roi_area > 0.5f * gray.cols * gray.rows;
    if (full) {
      lsd->detect(gray, raw);
    } else {
      for (const cv::Rect& roi : rois) {
        std::vector<cv::Vec4f> part;
        lsd->detect(gray(roi), part);
        for (cv::Vec4f& l : part)
          raw.emplace_back(l[0] + roi.x, l[1] + roi.y, l[2] + roi.x,
                           l[3] + roi.y);
      }
    }
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

bool Tracker::TrackReferenceKeyFrame() {
  // second tracking mode before declaring loss (ref Tracking.cc:566-600):
  // brute-force match the reference keyframe's map points, PnP from there.
  if (!last_kf_ || last_kf_->bad) return false;
  std::fill(cur_.points.begin(), cur_.points.end(), nullptr);
  int n = SearchByBruteForce(cur_, *last_kf_);
  if (n < 15) return false;
  cur_.tcw = last_kf_->tcw;
  cur_.pose_valid = true;
  return OptimizePose(&cur_) >= 10;
}

bool Tracker::Relocalize() {
  // ref Tracking::Relocalization (src/Tracking.cc:566-623 + PnPsolver.cc):
  // once the online vocabulary has trained, candidates come from the BoW
  // inverted index, gated by relative score (>= 0.75x the best vote, the
  // reference's KeyFrameDatabase minScore rule :250-310) and matched via
  // word buckets (SearchByBow, O(shared words)) — per-lost-frame cost is
  // bounded by kMaxCandidates regardless of map size. Before the
  // vocabulary trains, the most recent keyframes are brute-forced.
  constexpr int kMaxCandidates = 5;
  std::vector<KeyFrame*> kfs;
  std::vector<int> cur_words;
  if (voc_.trained()) {
    auto scored = kfdb_.QueryScored(cur_.descriptors, kMaxCandidates);
    if (!scored.empty()) {
      float min_score = 0.75f * scored.front().first;
      for (const auto& [s, kf] : scored)
        if (s >= min_score) kfs.push_back(kf);
    }
    cur_words = voc_.WordsOf(cur_.descriptors);
  }
  bool bow = !kfs.empty();
  KeyFrame* recency_supplement = nullptr;
  if (!bow) {  // cold vocabulary: fall back to the recent keyframes
    auto recent = map_.KeyFrames();
    for (auto it = recent.rbegin();
         it != recent.rend() && kfs.size() < kMaxCandidates; ++it)
      kfs.push_back(*it);
  } else {
    // always keep the most recent keyframe as a candidate: in a
    // perceptually aliased scene the BoW votes can all select far-away
    // look-alikes, while the nearest keyframe is the likeliest recovery
    auto recent = map_.KeyFrames();
    for (auto it = recent.rbegin(); it != recent.rend(); ++it) {
      if ((*it)->bad) continue;
      recency_supplement = *it;
      if (std::find(kfs.begin(), kfs.end(), *it) == kfs.end())
        kfs.push_back(*it);
      break;
    }
  }
  for (KeyFrame* kf : kfs) {
    std::fill(cur_.points.begin(), cur_.points.end(), nullptr);
    int n = bow ? SearchByBow(cur_, cur_words, *kf)
                : SearchByBruteForce(cur_, *kf);
    if (bow && n < 15 && (kf == kfs.front() || kf == recency_supplement)) {
      // word quantization can starve matches on a true candidate — the
      // reference widens with SearchByProjection; one brute pass on the
      // top-voted keyframe (and the recency supplement) serves the same
      // rescue role with bounded per-lost-frame cost. Restart from a
      // clean slate: mixing bow and brute assignments would let a worse
      // brute match silently displace a bow match.
      std::fill(cur_.points.begin(), cur_.points.end(), nullptr);
      n = SearchByBruteForce(cur_, *kf);
    }
    if (n < 15) continue;
    cur_.tcw = kf->tcw;  // initial guess; PnP-RANSAC re-derives it
    cur_.pose_valid = true;
    if (OptimizePose(&cur_) >= 10) {
      if (std::getenv("ROMAP_SLAM_DEBUG"))
        std::printf("[reloc frame %ld] recovered from kf %ld (%d matches%s)\n",
                    cur_.id, kf->id, n, bow ? ", bow" : "");
      last_reloc_frame_ = cur_.id;
      return true;
    }
  }
  return false;
}

void Tracker::Reset() {
  // early tracking loss invalidates the young map (ref Tracking.cc:728-737:
  // "Track lost soon after initialisation, reseting...")
  if (hooks.on_reset) hooks.on_reset();
  {
    std::lock_guard<std::mutex> ql(queue_mutex_);
    kf_queue_.clear();  // queued KeyFrame* die with the map
  }
  // The reference drops the pre-reset trajectory entirely (ref
  // src/Tracking.cc:2402-2404 clears the relative-pose lists). Keeping
  // them frozen mixes two monocular gauges in one file — the new map
  // initializes at an unrelated arbitrary scale, so any Sim(3)-aligned
  // ATE over the combined trajectory is meaningless (measured: a mid-run
  // reset scored 1.19 m "ATE" on an otherwise healthy session).
  trajectory_.clear();
  map_.Clear();
  kfdb_.Clear();  // indexed KeyFrame* die with the map (vocab stays trained)
  recent_points_.clear();
  first_view_dir_.clear();
  last_pushed_dir_.clear();
  last_kf_ = nullptr;
  has_velocity_ = false;
  has_init_ref_ = false;
  std::fill(cur_.points.begin(), cur_.points.end(), nullptr);
  last_ = Frame();
  state_ = State::kNotInitialized;
}

bool Tracker::TrackLocalMap() {
  // local points: everything observed by recent keyframes' covisibles —
  // at object-mapping scale the whole map is small, use it directly.
  int n = SearchByProjectionMapPoints(cur_, map_.Points(), 8.0f);
  (void)n;
  int inliers = OptimizePose(&cur_);
  for (size_t i = 0; i < cur_.points.size(); ++i)
    if (cur_.points[i] && !cur_.outlier[i]) cur_.points[i]->n_found++;
  // Weakly-constrained poses diverge: a 15-inlier frame was measured
  // emitting a 4.5 m pose outlier into an otherwise 0.05 m-ATE trajectory.
  // Reference thresholds (ref src/Tracking.cc:1283-1291): <50 inliers
  // within the fps-wide window after a relocalization (ref Tracking.cc:
  // 1822: mnLastRelocFrameId + mMaxFrames, mMaxFrames = camera fps),
  // <30 otherwise -> frame fails, tracker falls back (motion model next
  // frame, or kLost -> relocalize).
  if (cur_.id < last_reloc_frame_ + cfg_.reloc_strict_frames && inliers < 50)
    return false;
  return inliers >= 30;
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
        // motion-extrapolated bbox (ref Tracking.cc:1437-1475): predict the
        // current box from the last two detections' motion, so fast camera
        // or object motion does not break the IoU gate.
        cv::Rect_<float> pred = obj->last_bbox.rect;
        if (obj->last_bbox_frame >= 0 && obj->last_last_bbox_frame >= 0 &&
            obj->last_bbox_frame > obj->last_last_bbox_frame) {
          const auto& r1 = obj->last_bbox.rect;
          const auto& r0 = obj->last_last_bbox.rect;
          float dt = static_cast<float>(cur_.id - obj->last_bbox_frame) /
                     static_cast<float>(obj->last_bbox_frame -
                                        obj->last_last_bbox_frame);
          pred.x = r1.x + dt * (r1.x - r0.x);
          pred.y = r1.y + dt * (r1.y - r0.y);
          pred.width = std::max(8.f, r1.width + dt * (r1.width - r0.width));
          pred.height = std::max(8.f, r1.height + dt * (r1.height - r0.height));
        }
        float iou = det.bbox.IoU(pred);
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
    assoc->last_last_bbox_frame = assoc->last_bbox_frame;
    assoc->last_bbox = det.bbox;
    assoc->last_bbox_frame = cur_.id;
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

KeyFrame* Tracker::MakeKeyFrame(const cv::Mat& /*rgb*/, const cv::Mat& /*instance*/) {
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
  // place recognition: feed the vocabulary; once it trains, backfill the
  // inverted index with every existing keyframe, then index incrementally
  if (voc_.TrainAccumulate(kf->descriptors)) {
    for (KeyFrame* old : map_.KeyFrames()) kfdb_.Add(old);
  } else if (voc_.trained()) {
    kfdb_.Add(kf);
  }
  return kf;
}

void Tracker::MappingStep(KeyFrame* kf, const cv::Mat& rgb,
                          const cv::Mat& instance, const Lines& lines) {
  // In async mode the whole map-mutating body runs under map_mutex_
  // (tracking holds the same lock for its map reads); the keyframe-upload
  // hooks release it so socket I/O never stalls tracking.
  std::unique_lock<std::mutex> lk(map_mutex_, std::defer_lock);
  if (mapping_async_) lk.lock();

  // recent-map-point culling (ref LocalMapping::MapPointCulling,
  // src/LocalMapping.cc:231): a young point must keep a >25% found ratio
  // and gain a third observation within 2 keyframes of creation; survivors
  // graduate from monitoring after 3 keyframes.
  {
    std::vector<std::pair<MapPoint*, long>> still;
    if (std::getenv("ROMAP_NO_MPCULL")) recent_points_.clear();
    for (auto& [p, created] : recent_points_) {
      if (p->bad) continue;
      long age = kf->id - created;
      if (p->FoundRatio() < 0.25f) {
        map_.EraseMapPoint(p);
      } else if (age >= 3 && p->obs.size() <= 2 && p->FoundRatio() < 0.5f) {
        // the reference culls at age 2 / obs <= 2 (LocalMapping.cc:231) but
        // re-observes points against ~20 neighbors in SearchInNeighbors; our
        // 5-neighbor fuse is narrower, so require a weak found ratio too or
        // healthy object-surface points get purged (measured: object-center
        // error 0.04 -> 0.35 with the strict rule on the synthetic orbit)
        map_.EraseMapPoint(p);
      } else if (age < 3) {
        still.push_back({p, created});
      }
    }
    recent_points_.swap(still);
  }

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
        recent_points_.push_back({mp, kf->id});
      }
    }
  }

  // duplicate-landmark fusion with covisible neighbors (ref
  // LocalMapping::SearchInNeighbors + ORBmatcher::Fuse,
  // src/LocalMapping.cc:515): project neighbors' points into this keyframe
  // and this keyframe's points into the neighbors; same-feature hits merge.
  if (!std::getenv("ROMAP_NO_FUSE")) {
    auto neighbors = kf->Covisible(15);
    if (neighbors.size() > 5) neighbors.resize(5);
    std::vector<MapPoint*> own;
    for (MapPoint* p : kf->points)
      if (p && !p->bad) own.push_back(p);
    for (KeyFrame* nb : neighbors) {
      if (nb == kf || nb->bad) continue;
      std::vector<MapPoint*> theirs;
      for (MapPoint* p : nb->points)
        if (p && !p->bad) theirs.push_back(p);
      FuseByProjection(kf, theirs, 3.0f, &map_);
      FuseByProjection(nb, own, 3.0f, &map_);
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
  // rewrite the rest of the BA window's already-uploaded poses. The socket
  // I/O runs OUTSIDE the map lock in async mode — the hook gets a shallow
  // keyframe header (id/stamp/pose/cam) so no live map state is shared.
  if (!mapping_async_)
    cur_.tcw = kf->tcw;  // keep the tracker's view of this frame consistent
  KeyFrame header;
  header.id = kf->id;
  header.frame_id = kf->frame_id;
  header.timestamp = kf->timestamp;
  header.tcw = kf->tcw;
  header.cam = kf->cam;
  cv::Mat sparse_depth = SparseDepth(*kf);
  std::vector<std::pair<double, SE3>> refined;
  refined.reserve(ba_window.size());
  for (KeyFrame* k : ba_window)
    refined.push_back({k->timestamp, k->Twc()});
  if (lk.owns_lock()) lk.unlock();
  if (hooks.on_keyframe && !rgb.empty())
    hooks.on_keyframe(header, rgb, instance, sparse_depth);
  if (hooks.update_poses && !refined.empty()) hooks.update_poses(refined);
  if (mapping_async_) lk.lock();

  // redundant-keyframe culling (ref LocalMapping::KeyFrameCulling,
  // src/LocalMapping.cc:693): a local keyframe 90% of whose tracked points
  // are observed by >= 3 other keyframes adds nothing — retire it. Never
  // the gauge pair, the newest, or the tracker's reference keyframe.
  for (KeyFrame* kf2 : ba_window) {
    if (std::getenv("ROMAP_NO_KFCULL")) break;
    if (kf2->id <= 1 || kf2 == kf || kf2 == last_kf_ || kf2->bad) continue;
    int total = 0, redundant = 0;
    for (MapPoint* p : kf2->points) {
      if (!p || p->bad) continue;
      ++total;
      if (p->obs.size() >= 4) ++redundant;  // 3 others + this one
    }
    if (total > 20 && redundant > 0.9f * total) map_.EraseKeyFrame(kf2);
  }

  // keyframe-side object updates (ref LocalMapping::UpdateObjSizeAndPose)
  FrameContext ctx{kf->frame_id, kf->timestamp, kf->tcw, kf->cam, lines};
  for (ObjectMap* obj : map_.Objects()) {
    if (obj->history_bbox.count(kf->timestamp)) {
      obj->keyframe_history_bbox[kf->timestamp] =
          obj->history_bbox[kf->timestamp];
      obj->keyframe_bbox_pending[kf->timestamp] =
          obj->history_bbox[kf->timestamp];
      obj->EstimateShape();
    }
  }

  // double t-test merge (ref LocalMapping::MergeObjects :874-958):
  // same-class objects whose history-position means lie within each
  // OTHER's t-confidence region at alpha=.001 on all three axes — in both
  // directions — are one object.
  auto t_pass = [](const ObjectMap* x, const ObjectMap* y) {
    if (x->n_obs < 5) return false;
    int dof = std::min(100, x->n_obs - 1);
    float th = t_critical(dof, 2);  // alpha = .001 column
    for (int a = 0; a < 3; ++a) {
      float sd = std::max(x->history_pos_std[a], 1e-4f);
      float t = std::sqrt(static_cast<float>(x->n_obs)) *
                std::abs(x->history_pos_mean[a] - y->history_pos_mean[a]) / sd;
      if (t >= th) return false;
    }
    return true;
  };
  auto objs = map_.Objects();
  for (size_t i = 0; i < objs.size(); ++i) {
    for (size_t j = i + 1; j < objs.size(); ++j) {
      ObjectMap *a = objs[i], *b = objs[j];
      if (a->IsBad() || b->IsBad()) continue;
      if (a->cls != b->cls && !cfg_.object.merge_different_class) continue;
      a->ComputeHistoryStats();
      b->ComputeHistoryStats();
      if (!(t_pass(a, b) && t_pass(b, a))) continue;
      ObjectMap* keep = a->n_obs >= b->n_obs ? a : b;
      ObjectMap* gone = keep == a ? b : a;
      if (gone->have_nerf) continue;  // never cull a NeRF'd object
      keep->Merge(gone, kf->timestamp);
      gone->SetBad("merged by double t-test");
    }
  }

  // cuboid-overlap merge / false-object cull (ref
  // LocalMapping::MergeOverlapObjects :959-1107): sampled cuboid-volume
  // overlap > 0.3 in either direction; fall back to a center-distance test
  // while either object's refined cuboid does not exist yet.
  objs = map_.Objects();
  for (size_t i = 0; i < objs.size(); ++i) {
    for (size_t j = i + 1; j < objs.size(); ++j) {
      ObjectMap *a = objs[i], *b = objs[j];
      if (a->IsBad() || b->IsBad()) continue;
      if (a->cls != b->cls && !cfg_.object.merge_different_class) continue;
      bool overlap;
      if (!a->first_init && !b->first_init) {
        overlap = std::max(a->CuboidOverlapRatio(b),
                           b->CuboidOverlapRatio(a)) > 0.3f;
      } else {
        auto center_reach = [](const ObjectMap* o) {
          if (o->first_init)
            return std::make_pair(o->t_obj_w.inverse().t, o->axis_length);
          return std::make_pair(o->shape.t_obj_w.inverse().t,
                                o->shape.max_dist);
        };
        auto [ca, ra] = center_reach(a);
        auto [cb, rb] = center_reach(b);
        Vec3 dc = ca - cb;
        if (ra <= 0 || rb <= 0) continue;
        overlap = std::sqrt(dc.dot(dc)) < 0.75f * (ra + rb);
      }
      if (!overlap) continue;
      ObjectMap* keep = a->n_obs >= b->n_obs ? a : b;
      ObjectMap* gone = keep == a ? b : a;
      if (gone->have_nerf) continue;  // never cull a NeRF'd object
      keep->Merge(gone, kf->timestamp);
      gone->SetBad("merged into overlap");
    }
  }

  // loop closing (opt-in — the reference ships LoopClosing.cc but starves
  // it, ref src/LocalMapping.cc:100-101; see romap/loop_closing.h). Runs
  // under the map lock in async mode: correction rewrites keyframe poses
  // and point positions in place.
  if (cfg_.enable_loop_closing) {
    if (!loop_closer_)
      loop_closer_ = std::make_unique<LoopCloser>(&map_, &kfdb_, cfg_.loop);
    LoopCloser::Result lres = loop_closer_->Process(kf);
    if (lres.corrected) {
      ++loops_closed_;
      if (std::getenv("ROMAP_SLAM_DEBUG"))
        std::printf(
            "[loop kf=%ld t=%.1f] matched kf=%ld t=%.1f inliers=%d scale=%.4f "
            "drift=%.1fpx\n",
            kf->id, kf->timestamp, lres.matched->id, lres.matched->timestamp,
            lres.inliers, lres.s12.s, lres.drift_px);
      if (!mapping_async_) {
        cur_.tcw = kf->tcw;      // the tracker's view of this frame moved
        has_velocity_ = false;   // the motion model is stale after the jump
      }
      // every already-uploaded NeRF pose changed — rewrite them all
      // (socket I/O outside the map lock, like the post-BA upload above)
      if (hooks.update_poses) {
        std::vector<std::pair<double, SE3>> all;
        for (KeyFrame* k : map_.KeyFrames()) all.push_back({k->timestamp, k->Twc()});
        if (lk.owns_lock()) lk.unlock();
        hooks.update_poses(all);
        if (mapping_async_) lk.lock();
      }
    }
  }

  TriggerNerf(kf);
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
      // Grow-triggered volume check: the stored shape froze at creation
      // (ref ObjectMap.cc:661-662) but the live probe keeps improving as
      // points accumulate — an immature creation-time shape otherwise
      // squashes the training volume forever (measured 7 dB vs 24 dB
      // online). The client owns the margin policy and the hysteresis;
      // true = it re-sent the volume, adopt the probe so SLAM state and
      // the runtime stay in lockstep.
      if (hooks.update_volume) {
        Cuboid probe;
        if (obj->ProbeShape(&probe)) {
          // offer the probe on extent growth OR center drift: early cloud
          // centers are biased toward the visible surface, so the center
          // keeps moving as points accumulate even when extents don't —
          // a mis-centered (if large enough) volume still clips the object
          const Vec3 pc = probe.t_obj_w.inverse().t;
          const Vec3 sc = obj->shape.t_obj_w.inverse().t;
          const float me =
              std::max({obj->shape.a1, obj->shape.a2, obj->shape.a3});
          const bool grew = probe.a1 > obj->shape.a1 ||
                            probe.a2 > obj->shape.a2 ||
                            probe.a3 > obj->shape.a3;
          const bool moved = cv::norm(pc - sc) > 0.05f * me;
          if ((grew || moved) && hooks.update_volume(obj, probe))
            obj->shape = probe;
        }
      }
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

Tracker::Stamped Tracker::MakeStamped(double timestamp) const {
  Stamped s{timestamp, cur_.tcw};
  if (last_kf_) {
    s.ref_kf = last_kf_;
    s.t_cr = cur_.tcw * last_kf_->Twc();
  }
  return s;
}

Tracker::MapSnapshot Tracker::Snapshot() {
  std::unique_lock<std::mutex> lk(map_mutex_, std::defer_lock);
  if (mapping_async_) lk.lock();
  MapSnapshot s;
  s.trajectory = trajectory_;
  // recompose each frame pose from its reference keyframe's CURRENT pose
  // (local/final BA moves keyframes after the frame was tracked) — the
  // SaveTrajectoryTUM composition, ref src/System.cc:412-443
  for (Stamped& st : s.trajectory)
    if (st.ref_kf) st.tcw = st.t_cr * st.ref_kf->tcw;
  for (const KeyFrame* kf : map_.KeyFrames())
    s.keyframes.push_back({kf->timestamp, kf->tcw});
  for (const MapPoint* p : map_.Points()) s.points.push_back(p->pos);
  for (const ObjectMap* o : map_.Objects())
    s.objects.push_back({o->id, o->cls, o->shape.t_obj_w, o->shape.a1,
                         o->shape.a2, o->shape.a3});
  return s;
}

void Tracker::StartMapping() {
  if (mapping_thread_.joinable()) return;
  mapping_finish_ = false;
  mapping_async_ = true;
  mapping_thread_ = std::thread(&Tracker::MappingLoop, this);
}

void Tracker::StopMapping() {
  if (!mapping_thread_.joinable()) return;
  {
    std::lock_guard<std::mutex> ql(queue_mutex_);
    mapping_finish_ = true;
  }
  queue_cv_.notify_all();
  queue_drain_cv_.notify_all();
  mapping_thread_.join();  // the loop drains the queue before exiting
  mapping_async_ = false;
}

void Tracker::MappingLoop() {
  for (;;) {
    PendingKF job;
    {
      std::unique_lock<std::mutex> ql(queue_mutex_);
      queue_cv_.wait(ql, [&] { return mapping_finish_ || !kf_queue_.empty(); });
      if (kf_queue_.empty()) {
        if (mapping_finish_) return;
        continue;
      }
      job = std::move(kf_queue_.front());
      kf_queue_.pop_front();
      ++mapping_in_flight_;
    }
    auto t0 = std::chrono::steady_clock::now();
    MappingStep(job.kf, job.rgb, job.instance, job.lines);
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    {
      std::lock_guard<std::mutex> ql(queue_mutex_);
      mapping_ms_.push_back(ms);
      --mapping_in_flight_;
    }
    queue_drain_cv_.notify_all();  // a backpressured Track() may be waiting
  }
}

size_t Tracker::QueueDepth() {
  std::lock_guard<std::mutex> ql(queue_mutex_);
  return kf_queue_.size() + mapping_in_flight_;
}

std::vector<double> Tracker::mapping_ms() {
  std::lock_guard<std::mutex> ql(queue_mutex_);
  return mapping_ms_;
}

void Tracker::FinalBundleAdjust() {
  std::vector<std::pair<double, SE3>> refined;
  {
    std::lock_guard<std::mutex> lk(map_mutex_);
    auto kfs = map_.KeyFrames();
    if (kfs.size() < 3) return;
    // pin the gauge on the first two keyframes (scale + origin)
    std::set<KeyFrame*> fixed{kfs[0], kfs[1]};
    std::map<KeyFrame*, SE3> pre_ba;
    for (KeyFrame* k : kfs) pre_ba[k] = k->tcw;
    BAStats s1 = LocalBundleAdjust(kfs, fixed, /*iters=*/6);
    BAStats s2 = LocalBundleAdjust(kfs, fixed, /*iters=*/4);  // post-strip
    std::printf("[final BA] kfs=%zu pts=%d obs=%d rmse %.2f->%.2f->%.2f px\n",
                kfs.size(), s2.n_points, s2.n_obs, s1.initial_rmse_px,
                s1.final_rmse_px, s2.final_rmse_px);
    // culled keyframes don't participate in BA but trajectory entries may
    // still compose through them — drag each along by its nearest-in-time
    // surviving keyframe's correction (first-order stand-in for ORB-SLAM's
    // parent-chain reanchoring, ref KeyFrame::SetBadFlag src/KeyFrame.cc)
    for (KeyFrame* k : map_.AllKeyFrames()) {
      if (!k->bad) continue;
      KeyFrame* near = nullptr;
      double best = std::numeric_limits<double>::max();
      for (KeyFrame* g : kfs) {
        double d = std::abs(g->timestamp - k->timestamp);
        if (d < best) { best = d; near = g; }
      }
      // preserve the camera-to-camera relative pose to the anchor:
      // tcw_k' = (tcw_k * Twc_near) * tcw_near'
      if (near) k->tcw = k->tcw * pre_ba[near].inverse() * near->tcw;
    }
    refined.reserve(kfs.size());
    for (KeyFrame* k : kfs) refined.push_back({k->timestamp, k->Twc()});
  }
  // rewrite every uploaded keyframe pose in the NeRF store (the runtime
  // ignores stamps it has not seen), outside the map lock
  if (hooks.update_poses && !refined.empty()) hooks.update_poses(refined);
}

void Tracker::FinalizeObjects() {
  FrameContext ctx{cur_.id, cur_.timestamp, cur_.tcw, cur_.cam, {}};
  for (ObjectMap* obj : map_.Objects()) {
    // retire end-of-sequence ghosts that never met the continue-obs rule
    // (ref Minimum.continue.obs, src/Tracking.cc:1740-1760: objects need
    // repeated observations before they count; a landmark created from the
    // last frames can end the run below that bar)
    if (!obj->have_nerf && obj->n_obs < cfg_.min_continue_obs) {
      obj->SetBad("finalize: obs below Minimum.continue.obs");
      continue;
    }
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
  using Clock = std::chrono::steady_clock;
  auto us_since = [](Clock::time_point t0) {
    return std::chrono::duration<double, std::micro>(Clock::now() - t0)
        .count();
  };
  ++stages_.frames;
  auto b0 = Clock::now();
  BuildFrame(gray, instance, detections, timestamp);
  stages_.build += us_since(b0);

  // Backpressure BEFORE taking the map lock (the mapper needs it to make
  // progress): block until the mapping thread is within max_kf_behind
  // keyframes of the tracker. See TrackingConfig::max_kf_behind.
  if (mapping_async_ && cfg_.max_kf_behind >= 0) {
    auto w0 = Clock::now();
    std::unique_lock<std::mutex> ql(queue_mutex_);
    queue_drain_cv_.wait(ql, [&] {
      return mapping_finish_ ||
             static_cast<int>(kf_queue_.size()) + mapping_in_flight_ <=
                 cfg_.max_kf_behind;
    });
    stages_.wait += us_since(w0);
  }

  std::unique_lock<std::mutex> maplk(map_mutex_, std::defer_lock);
  if (mapping_async_) maplk.lock();

  if (state_ == State::kNotInitialized) {
    if (Initialize()) {
      trajectory_.push_back(MakeStamped(timestamp));
      last_ = cur_;
      return cur_.tcw;
    }
    last_ = cur_;
    return std::nullopt;
  }

  bool ok;
  auto m0 = Clock::now();
  if (state_ == State::kLost) {
    ok = Relocalize();
    if (ok) has_velocity_ = false;  // stale velocity after a gap
  } else {
    ok = TrackWithMotionModel();
    if (!ok) ok = TrackReferenceKeyFrame();
  }
  if (ok) ok = TrackLocalMap();
  stages_.match += us_since(m0);
  if (std::getenv("ROMAP_SLAM_DEBUG")) {
    int tracked = 0;
    for (size_t i = 0; i < cur_.points.size(); ++i)
      if (cur_.points[i] && !cur_.outlier[i]) ++tracked;
    std::printf("[frame %ld] ok=%d tracked=%d pose_t=(%.2f %.2f %.2f)\n",
                cur_.id, ok ? 1 : 0, tracked, cur_.tcw.t[0], cur_.tcw.t[1],
                cur_.tcw.t[2]);
  }
  if (!ok) {
    // lost soon after initialization: the young map is junk — rebuild it
    // from scratch (ref Tracking.cc:728-737)
    if (state_ == State::kOk && cur_.id - init_frame_id_ < 20) {
      Reset();
      return std::nullopt;
    }
    state_ = State::kLost;
    has_velocity_ = false;
    last_ = cur_;
    return std::nullopt;
  }
  state_ = State::kOk;

  {
    auto a0 = std::chrono::steady_clock::now();
    ObjectPipeline(instance);
    double a_us = std::chrono::duration<double, std::micro>(
                      std::chrono::steady_clock::now() - a0)
                      .count();
    assoc_us_total_ += a_us;
    stages_.objects += a_us;
    ++assoc_frames_;
  }

  velocity_ = cur_.tcw * last_.tcw.inverse();
  has_velocity_ = true;
  ++frames_since_kf_;
  bool made_kf = false;
  if (NeedKeyFrame()) {
    auto k0 = Clock::now();
    KeyFrame* kf = MakeKeyFrame(rgb, instance);
    last_kf_ = kf;
    frames_since_kf_ = 0;
    made_kf = true;
    if (mapping_async_) {
      {
        std::lock_guard<std::mutex> ql(queue_mutex_);
        kf_queue_.push_back({kf, rgb.clone(), instance.clone(), cur_.lines});
      }
      queue_cv_.notify_one();
    } else {
      MappingStep(kf, rgb, instance, cur_.lines);
    }
    stages_.keyframe += us_since(k0);
  }
  trajectory_.push_back(MakeStamped(timestamp));
  last_ = cur_;
  if (hooks.on_frame) {
    // gather this frame's object observations under the map lock, then run
    // the hook (socket I/O) outside it — same discipline as on_keyframe
    std::vector<std::pair<ObjectMap*, Bbox>> obs;
    for (ObjectMap* obj : map_.Objects()) {
      auto it = obj->history_bbox.find(timestamp);
      if (it != obj->history_bbox.end()) obs.push_back({obj, it->second});
    }
    SE3 tcw = cur_.tcw;
    if (maplk.owns_lock()) maplk.unlock();
    hooks.on_frame(timestamp, tcw, rgb, instance, obs, made_kf);
  }
  return cur_.tcw;
}

}  // namespace romap
