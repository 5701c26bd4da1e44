// Map structures of the rebuilt monocular SLAM: keyframes + map points +
// object landmarks. Behavior modeled on ORB-SLAM2's Map/KeyFrame
// (ref include/Map.h, include/KeyFrame.h) but lean: covisibility is
// recomputed on demand, ownership is explicit (the Map owns everything).
#pragma once

#include <algorithm>
#include <memory>
#include <mutex>
#include <set>
#include <vector>

#include <opencv2/core.hpp>

#include "romap/map_point.h"
#include "romap/object_map.h"
#include "romap/types.h"

namespace romap {

class KeyFrame {
 public:
  long id = 0;
  long frame_id = 0;
  double timestamp = 0;
  SE3 tcw;
  CameraModel cam;
  std::vector<cv::KeyPoint> keypoints;
  cv::Mat descriptors;                // N x 32
  std::vector<MapPoint*> points;      // per keypoint, nullptr if none
  std::vector<int> bbox_assignment;   // per keypoint: detection idx or -1
  std::vector<int> bow_words;         // per keypoint BoW word (set by
                                      // KeyFrameDatabase::Add; empty before
                                      // the vocabulary trains)
  bool bad = false;

  SE3 Twc() const { return tcw.inverse(); }

  // keyframes sharing >= min_shared map points, most-shared first
  std::vector<KeyFrame*> Covisible(int min_shared = 15) const;

  int TrackedPoints(int min_obs = 1) const {
    int n = 0;
    for (const MapPoint* p : points)
      if (p && !p->bad && static_cast<int>(p->obs.size()) >= min_obs) ++n;
    return n;
  }
};

class Map {
 public:
  MapPoint* CreatePoint(const Vec3& pos, const cv::Mat& desc) {
    auto mp = std::make_unique<MapPoint>();
    mp->id = next_point_id_++;
    mp->pos = pos;
    mp->descriptor = desc.clone();
    points_.push_back(std::move(mp));
    return points_.back().get();
  }

  KeyFrame* CreateKeyFrame() {
    auto kf = std::make_unique<KeyFrame>();
    kf->id = next_kf_id_++;
    keyframes_.push_back(std::move(kf));
    return keyframes_.back().get();
  }

  ObjectMap* CreateObject(int cls, long frame_id, const ObjectConfig& cfg) {
    objects_.push_back(std::make_unique<ObjectMap>(cls, frame_id, cfg));
    return objects_.back().get();
  }

  std::vector<KeyFrame*> KeyFrames() const {
    std::vector<KeyFrame*> out;
    for (const auto& kf : keyframes_)
      if (!kf->bad) out.push_back(kf.get());
    return out;
  }
  // culled keyframes included — trajectory entries may still reference them
  std::vector<KeyFrame*> AllKeyFrames() const {
    std::vector<KeyFrame*> out;
    for (const auto& kf : keyframes_) out.push_back(kf.get());
    return out;
  }
  std::vector<MapPoint*> Points() const {
    std::vector<MapPoint*> out;
    for (const auto& p : points_)
      if (!p->bad) out.push_back(p.get());
    return out;
  }
  std::vector<ObjectMap*> Objects() const {
    std::vector<ObjectMap*> out;
    for (const auto& o : objects_)
      if (!o->IsBad()) out.push_back(o.get());
    return out;
  }
  size_t NumKeyFrames() const { return keyframes_.size(); }

  // Delete a map point everywhere: keyframe slots, observation map, object
  // memberships (ref MapPoint::SetBadFlag + object back-refs,
  // ref src/ObjectMap.cc:164-177).
  void EraseMapPoint(MapPoint* p) {
    if (p->bad) return;
    p->bad = true;
    for (auto& [kf, idx] : p->obs)
      if (kf->points[idx] == p) kf->points[idx] = nullptr;
    p->obs.clear();
    for (auto& [obj, fid] : p->objects) {
      auto& v = obj->points;
      v.erase(std::remove(v.begin(), v.end(), p), v.end());
    }
    p->objects.clear();
  }

  // Fuse `gone` into `keep`: observations, stats, object memberships
  // (ref MapPoint::Replace, used by ORBmatcher::Fuse).
  void MergePoints(MapPoint* keep, MapPoint* gone) {
    if (keep == gone || gone->bad || keep->bad) return;
    for (auto& [kf, idx] : gone->obs) {
      if (kf->points[idx] != gone) continue;
      if (keep->obs.count(kf)) {
        kf->points[idx] = nullptr;
      } else {
        kf->points[idx] = keep;
        keep->obs[kf] = idx;
      }
    }
    gone->obs.clear();
    keep->n_found += gone->n_found;
    keep->n_visible += gone->n_visible;
    for (auto& [obj, fid] : gone->objects) {
      auto& v = obj->points;
      bool has_keep = std::find(v.begin(), v.end(), keep) != v.end();
      auto it = std::find(v.begin(), v.end(), gone);
      if (it != v.end()) {
        if (has_keep) v.erase(it);
        else *it = keep;
      }
      keep->objects.emplace(obj, fid);
    }
    gone->objects.clear();
    gone->bad = true;
  }

  // Cull a redundant keyframe (ref KeyFrame::SetBadFlag): detach all its
  // observations; the frame object stays allocated (ids/history remain
  // valid) but no longer participates in BA or matching.
  void EraseKeyFrame(KeyFrame* kf) {
    if (kf->bad) return;
    kf->bad = true;
    for (size_t i = 0; i < kf->points.size(); ++i) {
      MapPoint* p = kf->points[i];
      if (p) p->obs.erase(kf);
      kf->points[i] = nullptr;
    }
  }

  void Clear() {
    keyframes_.clear();
    points_.clear();
    objects_.clear();
  }

 private:
  std::vector<std::unique_ptr<KeyFrame>> keyframes_;
  std::vector<std::unique_ptr<MapPoint>> points_;
  std::vector<std::unique_ptr<ObjectMap>> objects_;
  long next_point_id_ = 0;
  long next_kf_id_ = 0;
};

// Covisibility recomputed on demand (the reference maintains an incremental
// covisibility graph, ref KeyFrame::UpdateConnections; at object-mapping
// map sizes a recount per query is cheaper than the bookkeeping).
inline std::vector<KeyFrame*> KeyFrame::Covisible(int min_shared) const {
  std::map<KeyFrame*, int, ById> counts;
  for (const MapPoint* p : points) {
    if (!p || p->bad) continue;
    for (const auto& [kf, idx] : p->obs)
      if (kf != this && !kf->bad) counts[kf]++;
  }
  std::vector<std::pair<int, KeyFrame*>> ranked;
  for (auto& [kf, n] : counts)
    if (n >= min_shared) ranked.push_back({n, kf});
  // id tiebreak: equal-count keyframes must rank deterministically (see
  // ById in types.h — this ordering feeds BA windows and fuse targets)
  std::sort(ranked.begin(), ranked.end(), [](const auto& a, const auto& b) {
    return a.first != b.first ? a.first > b.first
                              : a.second->id < b.second->id;
  });
  std::vector<KeyFrame*> out;
  out.reserve(ranked.size());
  for (auto& [n, kf] : ranked) out.push_back(kf);
  return out;
}

}  // namespace romap
