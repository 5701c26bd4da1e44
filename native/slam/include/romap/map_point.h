// Minimal map point: world position + object back-references. The reference
// MapPoint (include/MapPoint.h) carries descriptors/observations for ORB
// matching; the object layer only needs position, validity, and the
// object->first-associated-frame map used by the EIF age exemption
// (ref src/ObjectMap.cc:164-177).
#pragma once

#include <map>

#include "romap/types.h"

namespace romap {

class ObjectMap;

struct MapPoint {
  Vec3 pos{0, 0, 0};
  bool bad = false;
  // object -> frame id at which this point was associated with it
  std::map<ObjectMap*, long> objects;

  void AddObject(ObjectMap* obj, long frame_id) {
    objects.emplace(obj, frame_id);
  }
  void EraseObject(ObjectMap* obj) { objects.erase(obj); }
};

}  // namespace romap
