// A tracked monocular frame: ORB features, pose, per-feature map-point and
// detection-box assignments (ref include/Frame.h + the RO-MAP additions
// AssignFeaturesToBbox/AssignLinesToBbox, src/Frame.cc:747-805).
#pragma once

#include <vector>

#include <opencv2/core.hpp>

#include "romap/map_point.h"
#include "romap/object_frame.h"
#include "romap/types.h"

namespace romap {

struct Frame {
  long id = 0;
  double timestamp = 0;
  SE3 tcw;
  bool pose_valid = false;
  CameraModel cam;

  std::vector<cv::KeyPoint> keypoints;
  cv::Mat descriptors;             // N x 32 (ORB)
  std::vector<MapPoint*> points;   // per keypoint
  std::vector<bool> outlier;       // per keypoint (pose optimization)

  std::vector<ObjectFrame> detections;
  std::vector<int> bbox_assignment;  // per keypoint: detection idx or -1
  Lines lines;                       // merged segments of this frame

  cv::Point2f Project(const Vec3& world) const {
    return cam.Project(tcw * world);
  }

  // Assign each keypoint to the detection box containing it, gated by the
  // instance mask when present (ref Frame::AssignFeaturesToBbox :747-772);
  // also route line segments whose both endpoints fall in a (shrunk) box
  // (ref AssignLinesToBbox :772-805).
  void AssignFeaturesToBoxes(const cv::Mat& instance_mask);
  void AssignLinesToBoxes();
};

}  // namespace romap
