#include "romap/object_frame.h"

#include <algorithm>
#include <cmath>

namespace romap {

void ObjectFrame::FilterPointsByBoxPlot(const SE3& tcw) {
  if (points.size() < 4) return;
  std::vector<float> depths;
  depths.reserve(points.size());
  for (const MapPoint* p : points) depths.push_back((tcw * p->pos)[2]);
  std::sort(depths.begin(), depths.end());
  float q1 = depths[depths.size() / 4];
  float q3 = depths[depths.size() * 3 / 4];
  float iqr = q3 - q1;
  float lo = q1 - 1.5f * iqr, hi = q3 + 1.5f * iqr;
  auto bad_depth = [&](MapPoint* p) {
    float z = (tcw * p->pos)[2];
    return z < lo || z > hi;
  };
  points.erase(std::remove_if(points.begin(), points.end(), bad_depth),
               points.end());
}

void ObjectFrame::ComputeStats() {
  if (bad || points.empty()) return;
  Vec3 sum{0, 0, 0};
  for (const MapPoint* p : points) sum += p->pos;
  pos_mean = sum * (1.0f / points.size());
  Vec3 var{0, 0, 0};
  for (const MapPoint* p : points) {
    Vec3 d = p->pos - pos_mean;
    var += Vec3(d[0] * d[0], d[1] * d[1], d[2] * d[2]);
  }
  for (int i = 0; i < 3; ++i) pos_std[i] = std::sqrt(var[i] / points.size());
}

void ObjectFrame::ProjectPointsBbox(const FrameContext& frame) {
  if (bad || points.empty()) return;
  float min_u = 1e9f, min_v = 1e9f, max_u = -1e9f, max_v = -1e9f;
  for (const MapPoint* p : points) {
    cv::Point2f uv = frame.cam.Project(frame.tcw * p->pos);
    min_u = std::min(min_u, uv.x);
    max_u = std::max(max_u, uv.x);
    min_v = std::min(min_v, uv.y);
    max_v = std::max(max_v, uv.y);
  }
  min_u = std::max(frame.cam.min_x, min_u);
  min_v = std::max(frame.cam.min_y, min_v);
  max_u = std::min(frame.cam.max_x, max_u);
  max_v = std::min(frame.cam.max_y, max_v);
  bbox_by_points = {min_u, min_v, max_u - min_u, max_v - min_v};
}

namespace {
inline double Angle(const cv::Vec4f& l) {
  return std::atan2(l[3] - l[1], l[2] - l[0]);
}
inline double AngDiff(double a, double b) {
  double d = std::abs(a - b);
  return std::min(d, M_PI - d);
}
}  // namespace

Lines MergeLines(const Lines& in, double merge_dist, double merge_angle_deg,
                 double min_len) {
  // All segments ordered left-to-right so angles live in [-pi/2, pi/2].
  Lines lines;
  lines.reserve(in.size());
  for (cv::Vec4f l : in) {
    if (l[0] > l[2]) l = {l[2], l[3], l[0], l[1]};
    lines.push_back(l);
  }
  const double ang_th = merge_angle_deg * M_PI / 180.0;

  // Repeatedly merge any compatible pair until a fixed point: two segments
  // merge when nearly parallel, their endpoints nearly touch, and the merged
  // span keeps the same direction.
  bool merged = true;
  int guard = 0;
  while (merged && guard++ < 500) {
    merged = false;
    for (size_t i = 0; i + 1 < lines.size() && !merged; ++i) {
      for (size_t j = i + 1; j < lines.size(); ++j) {
        if (AngDiff(Angle(lines[i]), Angle(lines[j])) >= ang_th) continue;
        auto d = [](float x1, float y1, float x2, float y2) {
          return std::hypot(x1 - x2, y1 - y2);
        };
        const cv::Vec4f &a = lines[i], &b = lines[j];
        bool touching = d(a[2], a[3], b[0], b[1]) < merge_dist ||
                        d(b[2], b[3], a[0], a[1]) < merge_dist;
        if (!touching) continue;
        cv::Vec2f start = a[0] < b[0] ? cv::Vec2f(a[0], a[1])
                                      : cv::Vec2f(b[0], b[1]);
        cv::Vec2f end = a[2] > b[2] ? cv::Vec2f(a[2], a[3])
                                    : cv::Vec2f(b[2], b[3]);
        cv::Vec4f candidate(start[0], start[1], end[0], end[1]);
        if (AngDiff(Angle(candidate), Angle(a)) >= ang_th) continue;
        lines[i] = candidate;
        lines[j] = lines.back();
        lines.pop_back();
        merged = true;
        break;
      }
    }
  }

  Lines out;
  for (const cv::Vec4f& l : lines)
    if (std::hypot(l[2] - l[0], l[3] - l[1]) > min_len) out.push_back(l);
  return out;
}

}  // namespace romap
