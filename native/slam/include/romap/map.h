// Map structures of the rebuilt monocular SLAM: keyframes + map points +
// object landmarks. Behavior modeled on ORB-SLAM2's Map/KeyFrame
// (ref include/Map.h, include/KeyFrame.h) but lean: covisibility is
// recomputed on demand, ownership is explicit (the Map owns everything).
#pragma once

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

}  // namespace romap
