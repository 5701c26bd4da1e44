// Minimal map point: world position + object back-references. The reference
// MapPoint (include/MapPoint.h) carries descriptors/observations for ORB
// matching; the object layer only needs position, validity, and the
// object->first-associated-frame map used by the EIF age exemption
// (ref src/ObjectMap.cc:164-177).
#pragma once

#include <map>

#include <opencv2/core.hpp>

#include "romap/types.h"

namespace romap {

class ObjectMap;
class KeyFrame;

struct MapPoint {
  Vec3 pos{0, 0, 0};
  bool bad = false;
  // object -> frame id at which this point was associated with it
  std::map<ObjectMap*, long, ById> objects;

  // --- tracking-side state (unused by pure object-layer tests) ----------
  long id = -1;
  cv::Mat descriptor;                 // 1x32 ORB, representative
  std::map<KeyFrame*, int, ById> obs;  // keyframe -> keypoint index
  int n_found = 1, n_visible = 1;     // tracking statistics
  long last_seen_frame = -1;
  long first_kf_id = -1;

  // defined in object_map.h — ById needs ObjectMap::id complete
  void AddObject(ObjectMap* obj, long frame_id);
  void EraseObject(ObjectMap* obj);
  float FoundRatio() const {
    return n_visible > 0 ? float(n_found) / n_visible : 0.f;
  }
};

}  // namespace romap
