// Per-frame object detection: a 2D box + the map points and line segments
// that fall inside it, plus the statistics used by data association.
// Behavior spec: ref src/ObjectFrame.cc (box-plot depth filter, stats,
// reprojected bbox) and the CubeSLAM-style line merging.
#pragma once

#include <vector>

#include "romap/frame_context.h"
#include "romap/map_point.h"
#include "romap/types.h"

namespace romap {

struct ObjectFrame {
  Bbox bbox;
  bool bad = false;
  long frame_id = 0;
  std::vector<MapPoint*> points;
  Lines lines;  // segments inside the (shrunk) bbox

  Vec3 pos_mean{0, 0, 0};
  Vec3 pos_std{0, 0, 0};
  cv::Rect_<float> bbox_by_points;

  // Drop points whose camera-frame depth is a box-plot outlier
  // (Q1 - 1.5 IQR, Q3 + 1.5 IQR; ref src/ObjectFrame.cc:137-180).
  void FilterPointsByBoxPlot(const SE3& tcw);

  // Mean/stddev of member point positions (ref :182-210).
  void ComputeStats();

  // Tight reprojection rect of the member points, clamped to the image
  // (ref :213-250).
  void ProjectPointsBbox(const FrameContext& frame);
};

// Merge near-collinear, near-touching segments and drop short ones.
// Thresholds: merge dist 20 px, merge angle 5 deg, min length 30 px
// (ref Object_Frame::MergeLines src/ObjectFrame.cc:38-135, after CubeSLAM).
Lines MergeLines(const Lines& in, double merge_dist = 20.0,
                 double merge_angle_deg = 5.0, double min_len = 30.0);

}  // namespace romap
