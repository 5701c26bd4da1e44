// The slice of a frame the object layer consumes: pose, camera, detected
// line segments, ids. (The full tracking Frame owns ORB features etc.;
// object algorithms only see this view.)
#pragma once

#include "romap/types.h"

namespace romap {

struct FrameContext {
  long id = 0;
  double timestamp = 0.0;
  SE3 tcw;  // world -> camera
  CameraModel cam;
  Lines lines;  // merged long line segments of the current frame
};

}  // namespace romap
