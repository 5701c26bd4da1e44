#include "romap/object_map.h"

#include <algorithm>
#include <cmath>
#include <functional>
#include <set>
#include <vector>

#include "romap/eif.h"

namespace romap {

long ObjectMap::next_id_ = 0;

ObjectMap::ObjectMap(int cls_in, long frame_id, const ObjectConfig& cfg)
    : cls(cls_in), created_frame_id(frame_id), latest_obs_frame_id(frame_id),
      cfg_(cfg) {
  id = next_id_++;
}

void ObjectMap::SetBad(const std::string& /*reason*/) {
  for (MapPoint* p : points) p->EraseObject(this);
  bad_ = true;
}

void ObjectMap::AddNewPoints(const std::vector<MapPoint*>& pts, long frame_id) {
  // distance gate (ref Tracking.cc:1725-1735): once the cloud is mature, a
  // candidate whose object-frame coordinate exceeds add_mps_dist_multiple x
  // the cloud's per-axis reach is a background point leaking through the
  // detection box — reject it instead of letting EIF clean up later.
  bool gate = points.size() >= 20;
  Vec3 maxd{0, 0, 0};
  if (gate) {
    for (const MapPoint* q : points) {
      Vec3 l = t_obj_w * q->pos;
      for (int a = 0; a < 3; ++a) maxd[a] = std::max(maxd[a], std::abs(l[a]));
    }
  }
  std::set<MapPoint*> have(points.begin(), points.end());
  for (MapPoint* p : pts) {
    if (have.count(p)) continue;
    if (gate) {
      Vec3 l = t_obj_w * p->pos;
      float m = cfg_.add_mps_dist_multiple;
      if (std::abs(l[0]) > m * maxd[0] || std::abs(l[1]) > m * maxd[1] ||
          std::abs(l[2]) > m * maxd[2])
        continue;
    }
    p->AddObject(this, frame_id);
    points.push_back(p);
    have.insert(p);
  }
}

void ObjectMap::ComputeMeanStd() {
  if (bad_ || points.empty()) return;
  Vec3 sum{0, 0, 0};
  for (const MapPoint* p : points) sum += p->pos;
  points_mean = sum * (1.0f / points.size());
}

void ObjectMap::EIFFilterOutliers() {
  // too little evidence to call anything an outlier (ref :106-107)
  if (keyframe_history_bbox.size() < 5 || points.size() < 20) return;

  std::vector<std::array<float, 3>> data;
  data.reserve(points.size());
  for (const MapPoint* p : points)
    data.push_back({p->pos[0], p->pos[1], p->pos[2]});

  double th = cfg_.eif_threshold;
  if (cls == 73 || cls == 46 || cls == 41) th += 0.02;  // low-texture classes
  double th_serious = th + 0.1;

  uint32_t sample = points.size() > 100
                        ? static_cast<uint32_t>(points.size() / 2)
                        : static_cast<uint32_t>(points.size() * 2 / 3);
  ExtendedIsolationForest<3> forest;
  forest.Build(data, /*n_trees=*/40, /*seed=*/12345, sample);
  std::vector<double> scores;
  forest.AnomalyScores(data, &scores);

  std::vector<MapPoint*> kept;
  kept.reserve(points.size());
  for (size_t i = 0; i < points.size(); ++i) {
    MapPoint* p = points[i];
    bool drop;
    if (cfg_.check_mps_obs) {
      // long-associated points are trusted unless seriously anomalous
      long assoc_frame = p->objects.count(this) ? p->objects[this] : 0;
      bool young = latest_obs_frame_id - assoc_frame < cfg_.eif_obs_numbers;
      drop = scores[i] > th_serious || (scores[i] > th && young);
    } else {
      drop = scores[i] > th;
    }
    if (drop)
      p->EraseObject(this);
    else
      kept.push_back(p);
  }
  points.swap(kept);
}

void ObjectMap::FilterOutliersReprojection(const FrameContext& frame) {
  bool reproject = latest_obs_frame_id == frame.id;
  const auto& cam = frame.cam;
  // bbox at the image edge or tiny -> reprojection unreliable (ref :198-207)
  if (last_bbox.rect.x < cam.min_x + 30 ||
      last_bbox.rect.x + last_bbox.rect.width > cam.max_x - 30 ||
      last_bbox.rect.y < cam.min_y + 30 ||
      last_bbox.rect.y + last_bbox.rect.height > cam.max_y - 30)
    reproject = false;
  if (last_bbox.rect.area() <
      (cam.max_x - cam.min_x) * (cam.max_y - cam.min_y) * 0.05f)
    reproject = false;

  auto it = points.begin();
  while (it != points.end()) {
    MapPoint* p = *it;
    bool drop = p->bad;
    if (!drop && reproject) {
      cv::Point2f uv = cam.Project(frame.tcw * p->pos);
      drop = !last_bbox.rect.contains(uv);
    }
    if (drop) {
      p->EraseObject(this);
      *it = points.back();
      points.pop_back();
    } else {
      ++it;
    }
  }
}

void ObjectMap::ComputeHistoryStats() {
  if (bad_ || history_pos.empty()) return;
  Vec3 sum{0, 0, 0};
  for (const Vec3& p : history_pos) sum += p;
  history_pos_mean = sum * (1.0f / history_pos.size());
  Vec3 var{0, 0, 0};
  for (const Vec3& p : history_pos) {
    Vec3 d = history_pos_mean - p;
    var += Vec3(d[0] * d[0], d[1] * d[1], d[2] * d[2]);
  }
  for (int i = 0; i < 3; ++i)
    history_pos_std[i] = std::sqrt(var[i] / history_pos.size());
}

namespace {
// angle of the projected segment p0 -> p1, measured left-to-right
inline float SegmentAngle(const cv::Point2f& p0, const cv::Point2f& p1) {
  if (p0.x < p1.x) return std::atan2(p1.y - p0.y, p1.x - p0.x);
  return std::atan2(p0.y - p1.y, p0.x - p1.x);
}
inline float AngErrDeg(float a, float b) {
  float d = std::abs((a - b) * 180.0f / static_cast<float>(M_PI));
  return std::min(d, 180.0f - d);
}
}  // namespace

float ObjectMap::YawError(const Mat3& sample_r, const Vec3& t_wobj,
                          const FrameContext& frame,
                          std::vector<std::vector<int>>* assoc_lines) const {
  // project object center + the three axis endpoints (ref :506-535)
  cv::Point2f pts2d[4];
  const Vec3 axes[4] = {{0, 0, 0},
                        {axis_length, 0, 0},
                        {0, axis_length, 0},
                        {0, 0, axis_length}};
  for (int k = 0; k < 4; ++k)
    pts2d[k] = frame.cam.Project(frame.tcw * (sample_r * axes[k] + t_wobj));

  float axis_angle[3];
  for (int a = 0; a < 3; ++a)
    axis_angle[a] = SegmentAngle(pts2d[0], pts2d[a + 1]);

  const float th = 5.0f;  // degrees
  float error = 0;
  int num = 0;
  std::vector<int> ass[3];
  for (size_t i = 0; i < latest_lines.size(); ++i) {
    const cv::Vec4f& l = latest_lines[i];
    float ang = std::atan2(l[3] - l[1], l[2] - l[0]);
    float e[3];
    for (int a = 0; a < 3; ++a) e[a] = AngErrDeg(ang, axis_angle[a]);
    int best = static_cast<int>(std::min_element(e, e + 3) - e);
    if (e[best] < th) {
      error += e[best];
      ++num;
      ass[best].push_back(static_cast<int>(i));
    }
  }
  if (num == 0) return 0.0f;
  assoc_lines->assign({ass[0], ass[1], ass[2]});
  // more associated lines + smaller mean error = better (ref :605-607)
  return (static_cast<float>(num) / latest_lines.size()) * (5.0f - error / num);
}

float RefineYaw(const ObjectMap& obj,
                const std::vector<std::vector<int>>& assoc_lines,
                float init_yaw, const Vec3& t_wobj, const FrameContext& frame) {
  // residuals: angular gap between each associated line and its axis
  auto residual_sum = [&](float yaw, float* sum_sq) -> float {
    Mat3 r = obj.r_up * YawRotation(yaw);
    cv::Point2f pts2d[4];
    const Vec3 axes[4] = {{0, 0, 0},
                          {obj.axis_length, 0, 0},
                          {0, obj.axis_length, 0},
                          {0, 0, obj.axis_length}};
    for (int k = 0; k < 4; ++k)
      pts2d[k] = frame.cam.Project(frame.tcw * (r * axes[k] + t_wobj));
    float total = 0, total_sq = 0;
    for (int a = 0; a < 3; ++a) {
      float axis_ang = SegmentAngle(pts2d[0], pts2d[a + 1]);
      for (int li : assoc_lines[a]) {
        const cv::Vec4f& l = obj.latest_lines[li];
        float ang = std::atan2(l[3] - l[1], l[2] - l[0]);
        float e = AngErrDeg(ang, axis_ang) * static_cast<float>(M_PI) / 180.0f;
        total += e;
        total_sq += e * e;
      }
    }
    if (sum_sq) *sum_sq = total_sq;
    return total;
  };

  // 1-D minimization of the squared angular error over the +/-5deg
  // acceptance window (the reference runs 5 LM iterations of a g2o 1-DoF
  // vertex and accepts the result only within 5deg of the sample,
  // ref OptimizeObject.cc:96, ObjectMap.cc:374-376). Ternary search is
  // exact for this unimodal 1-D objective and needs no tuning.
  const float half_window = 0.087266f;  // 5 degrees
  float lo = init_yaw - half_window, hi = init_yaw + half_window;
  for (int it = 0; it < 24; ++it) {
    float m1 = lo + (hi - lo) / 3.0f, m2 = hi - (hi - lo) / 3.0f;
    float f1, f2;
    residual_sum(m1, &f1);
    residual_sum(m2, &f2);
    if (f1 < f2)
      hi = m2;
    else
      lo = m1;
  }
  return (lo + hi) / 2.0f;
}

// Estimated scene-up base frame (beyond the reference). The 1-DoF cuboid
// yaw rotates about SLAM-world +z (ref Converter::eulerAnglesToMatrix
// usage, src/ObjectMap.cc:380) — but the monocular world frame is the
// initialization camera's frame, so with a pitched capture (our orbit
// sequences pitch 17-34 deg; handheld captures routinely pitch more) the
// cuboid bounds the object in a TILTED frame and every axis inflates
// toward the diagonal. Measured on a clean yawed box: sorted extent
// ratios 1.72/1.50/1.16 with the reference convention — spheres are
// rotation-invariant, which hid this for four rounds. Estimate world-up
// as the mean camera up (-y_cam, vision convention) over the object's
// observation history and rotate the yaw axis onto it.
// ROMAP_UP_ALIGN=0 restores the reference convention for A/B runs.
Mat3 ObjectMap::UpAlignedBase() const {
  static const bool enabled = [] {
    const char* e = std::getenv("ROMAP_UP_ALIGN");
    return !(e && e[0] == '0');
  }();
  if (!enabled || history_twc.size() < 8) return Mat3::eye();
  // A roll-free camera's RIGHT vector (its x-axis) is horizontal, so the
  // true up is the null direction of the scatter of camera x-axes over
  // the observation history — exact for look-at/turntable captures and
  // needing only modest azimuth spread. (Rejected alternatives, measured
  // on the clean-box arc: mean camera up = 22 deg residual tilt, the
  // pitch toward the object biases it on partial arcs; camera-centers
  // plane normal = 12-71 deg, the orbit's height modulation correlates
  // with the arc. The x-axis null space recovers up to 0.0 deg on every
  // subset of the same capture.) Sign from the mean camera up (-y_cam).
  cv::Matx33d m = cv::Matx33d::zeros();
  cv::Vec3d mean_up(0, 0, 0);
  for (const auto& kv : history_twc) {
    const Mat4& twc = kv.second;
    cv::Vec3d x(twc(0, 0), twc(1, 0), twc(2, 0));
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) m(i, j) += x[i] * x[j];
    mean_up -= cv::Vec3d(twc(0, 1), twc(1, 1), twc(2, 1));
  }
  cv::Mat evals, evecs;
  cv::eigen(cv::Mat(m), evals, evecs);  // rows of evecs, descending evals
  // degeneracy guard: a near-single-azimuth history leaves a 2D null
  // space (e1 ~ e2 ~ 0) where the smallest eigenvector is arbitrary
  double e0 = evals.at<double>(0), e1 = evals.at<double>(1),
         e2 = evals.at<double>(2);
  if (e1 < std::max(4.0 * e2, 0.05 * e0)) return Mat3::eye();
  cv::Vec3d n3(evecs.at<double>(2, 0), evecs.at<double>(2, 1),
               evecs.at<double>(2, 2));
  if (n3.dot(mean_up) < 0) n3 = -n3;
  Vec3 up(static_cast<float>(n3[0]), static_cast<float>(n3[1]),
          static_cast<float>(n3[2]));
  float n = static_cast<float>(cv::norm(up));
  if (n < 1e-6f) return Mat3::eye();
  up *= 1.0f / n;
  // minimal rotation taking ez to up (Rodrigues about ez x up)
  Vec3 v(-up[1], up[0], 0.0f);  // ez x up
  float s = static_cast<float>(cv::norm(v));
  float c = up[2];              // ez . up
  if (s < 1e-6f) {
    if (c > 0) return Mat3::eye();
    return Mat3(1, 0, 0, 0, -1, 0, 0, 0, -1);  // up = -ez: flip (extents
  }                                            // are sign-invariant)
  v *= 1.0f / s;
  Mat3 k(0, -v[2], v[1], v[2], 0, -v[0], -v[1], v[0], 0);
  return Mat3::eye() + k * s + (k * k) * (1 - c);
}

void ObjectMap::EstimatePose(const FrameContext& frame) {
  if (bad_ || points.empty()) return;
  r_up = UpAlignedBase();

  // translation = midpoint of the axis-aligned point extents (ref :286-315)
  float lo[3] = {1e9f, 1e9f, 1e9f}, hi[3] = {-1e9f, -1e9f, -1e9f};
  for (const MapPoint* p : points) {
    if (p->bad) continue;
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], p->pos[a]);
      hi[a] = std::max(hi[a], p->pos[a]);
    }
  }
  Vec3 t_wobj((lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, (lo[2] + hi[2]) / 2);
  axis_length = 0;
  for (int a = 0; a < 3; ++a)
    axis_length = std::max(axis_length, (hi[a] - lo[a]) / 2);

  // Silhouette-cone refinement (beyond reference): replace the visible-
  // surface-biased midpoint with the ray-bundle intersection when the
  // baseline conditions it and it lands near the point cloud.
  Vec3 sil;
  if (SilhouetteCenter(&sil) &&
      cv::norm(sil - t_wobj) < 2.0f * std::max(axis_length, 0.05f))
    t_wobj = sil;

  // yaw hypotheses scored against image lines (ref :328-396)
  if (latest_lines.size() > 2 && !last_bbox.edge_and_small) {
    float best_yaw = 0, best_score = 0;
    int best_idx = -1;
    std::vector<std::vector<int>> best_ass;
    for (int i = 0; i < 18; ++i) {
      float yaw = (i * 5.0f - 42.5f) / 180.0f * static_cast<float>(M_PI);
      std::vector<std::vector<int>> ass;
      float score = YawError(r_up * YawRotation(yaw), t_wobj, frame, &ass);
      if (score > best_score && !ass.empty() &&
          (!ass[0].empty() || !ass[1].empty())) {
        best_score = score;
        best_yaw = yaw;
        best_idx = i;
        best_ass = ass;
      }
    }
    if (best_score != 0) {
      float refined = RefineYaw(*this, best_ass, best_yaw, t_wobj, frame);
      if (std::abs(best_yaw - refined) < 0.087266f)  // 5 degrees
        best_yaw = refined;
      auto it = yaw_scores.find(best_idx);
      if (it != yaw_scores.end()) {
        cv::Vec3d& v = it->second;
        v[0] += 1.0;
        v[1] = v[1] * (1 - 1 / v[0]) + best_score / v[0];
        v[2] = v[2] * (1 - 1 / v[0]) + best_yaw / v[0];
      } else {
        yaw_scores[best_idx] = cv::Vec3d(1.0, best_score, best_yaw);
      }
    }
  } else if (n_obs > 50 && points.size() > 50) {
    // PCA fallback on the XY covariance (ref :398-458)
    double mx = 0, my = 0;
    for (const MapPoint* p : points) {
      mx += p->pos[0];
      my += p->pos[1];
    }
    mx /= points.size();
    my /= points.size();
    double cxx = 0, cxy = 0, cyy = 0;
    for (const MapPoint* p : points) {
      double dx = p->pos[0] - mx, dy = p->pos[1] - my;
      cxx += dx * dx;
      cxy += dx * dy;
      cyy += dy * dy;
    }
    cxx /= points.size();
    cxy /= points.size();
    cyy /= points.size();
    double ratio = std::max(cxx, cyy) / std::max(std::min(cxx, cyy), 1e-12);
    if (ratio > 1.21) {
      // principal eigenvector of [[cxx, cxy], [cxy, cyy]]
      double tr = cxx + cyy, det = cxx * cyy - cxy * cxy;
      double l1 = tr / 2 + std::sqrt(std::max(tr * tr / 4 - det, 0.0));
      double vx = (std::abs(cxy) > 1e-12) ? cxy : 1.0;
      double vy = (std::abs(cxy) > 1e-12) ? (l1 - cxx) : 0.0;
      double yaw_deg = std::atan2(vy, vx) * 180.0 / M_PI;
      // fold into [-45, 45] (ref :425-433)
      if (yaw_deg > 45.0 && yaw_deg < 135.0) yaw_deg -= 90.0;
      else if (yaw_deg >= 135.0) yaw_deg -= 180.0;
      else if (yaw_deg <= -135.0) yaw_deg += 180.0;
      else if (yaw_deg < -45.0 && yaw_deg > -135.0) yaw_deg += 90.0;
      int idx = static_cast<int>(std::abs(yaw_deg + 42.5) / 5.0);
      double yaw = yaw_deg / 180.0 * M_PI;
      double score = std::min(double(points.size()) / n_obs, 1.0);
      auto it = yaw_scores.find(idx);
      if (it != yaw_scores.end()) {
        cv::Vec3d& v = it->second;
        v[0] += 1.0;
        v[1] = v[1] * (1 - 1 / v[0]) + score / v[0];
        v[2] = v[2] * (1 - 1 / v[0]) + yaw / v[0];
      } else {
        yaw_scores[idx] = cv::Vec3d(1.0, score, yaw);
      }
    }
  }

  // pick the winning bucket (ref :462-491)
  float res_yaw = 0;
  if (!yaw_scores.empty()) {
    std::vector<cv::Vec3d> items;
    for (const auto& kv : yaw_scores) items.push_back(kv.second);
    if (items.size() > 1) {
      std::sort(items.begin(), items.end(),
                [](const cv::Vec3d& a, const cv::Vec3d& b) { return a[1] > b[1]; });
      if (items[0][0] > n_obs / 4.0) {
        res_yaw = static_cast<float>(items[0][2]);
      } else if (items[0][0] > n_obs / 6.0 && items[0][0] > items[1][0]) {
        res_yaw = static_cast<float>(items[0][2]);
      } else {
        std::sort(items.begin(), items.end(),
                  [](const cv::Vec3d& a, const cv::Vec3d& b) { return a[0] > b[0]; });
        res_yaw = static_cast<float>(items[0][2]);
      }
    } else {
      res_yaw = static_cast<float>(items[0][2]);
    }
  }

  // Cloud-yaw complement (beyond the reference): the line scorer needs
  // clean object edges; textured faces can mis-associate lines and leave
  // yaw tens of degrees off (measured 36 deg on the clean yawed box,
  // inflating both transverse extents ~1.3x). The minimum of the trimmed
  // bounding-rectangle AREA over yaw in the up-plane recovers a box's yaw
  // from the point cloud alone and is flat (harmless) for blobs/spheres.
  // Keep whichever candidate (line vs cloud) bounds the cloud tighter,
  // with hysteresis favoring the line/reference result.
  if (points.size() >= 30) {
    Mat3 rt = r_up.t();
    std::vector<cv::Vec2f> q;
    q.reserve(points.size());
    for (const MapPoint* p : points) {
      if (p->bad) continue;
      Vec3 v = rt * (p->pos - t_wobj);
      q.emplace_back(v[0], v[1]);
    }
    if (q.size() >= 30) {
      // near-max trim: the min-AREA yaw signal lives in the corner
      // points; the extent-grade n/50 trim blurs it enough that a
      // diagonal frame can tie an axis-aligned one on face-only clouds
      const int k = std::max(2, static_cast<int>(q.size()) / 200);
      std::vector<float> da, db;
      da.reserve(q.size());
      db.reserve(q.size());
      auto trimmed_area = [&](float yaw) {
        float cy = std::cos(yaw), sy = std::sin(yaw);
        da.clear();
        db.clear();
        for (const auto& v : q) {
          da.push_back(std::abs(cy * v[0] + sy * v[1]));
          db.push_back(std::abs(-sy * v[0] + cy * v[1]));
        }
        std::nth_element(da.begin(), da.begin() + (k - 1), da.end(),
                         std::greater<float>());
        std::nth_element(db.begin(), db.begin() + (k - 1), db.end(),
                         std::greater<float>());
        return da[k - 1] * db[k - 1];
      };
      float best_area = 1e18f, yaw_cloud = res_yaw;
      for (int i = 0; i < 45; ++i) {  // 2 deg steps over the 90deg gauge
        float yaw = i * static_cast<float>(M_PI / 90.0);
        float area = trimmed_area(yaw);
        if (area < best_area) {
          best_area = area;
          yaw_cloud = yaw;
        }
      }
      if (best_area < 0.92f * trimmed_area(res_yaw)) res_yaw = yaw_cloud;
    }
  }

  SE3 t_w_obj{r_up * YawRotation(res_yaw), t_wobj};
  t_obj_w = t_w_obj.inverse();
}

void ObjectMap::EstimateShape() {
  if (bad_ || points.empty()) return;
  if (first_init) {
    shape.t_obj_w = t_obj_w;
    first_init = false;
  }
  if (have_nerf) return;  // frozen once a NeRF owns the box (ref :661-662)
  Cuboid probe;
  if (ProbeShape(&probe)) shape = probe;
}

bool ObjectMap::ProbeShape(Cuboid* out) const {
  if (bad_ || points.empty()) return false;
  const Mat3& r = t_obj_w.R;

  // Mirrored extents about the (possibly silhouette-refined) centroid:
  // points live only on the visible surface, so raw lo/hi extents miss the
  // unseen half — the farther visible half, mirrored, is the symmetric
  // completion (with the plain midpoint center this reduces exactly to the
  // reference's (hi-lo)/2, ref src/ObjectMap.cc:613-672). Mirroring doubles
  // the leverage of stray points, so the extent uses the k-th largest
  // |q - c| per axis with k ~ n/50 (adaptive trimmed max): outlier
  // clusters up to k-1 points are ignored, while genuine extremal
  // structure (e.g. the front pole of a sphere, ~n/10 points) survives.
  Vec3 qc = r * t_obj_w.inverse().t;  // centroid in the rotated frame
  float ext[3];
  std::vector<float> dist;
  dist.reserve(points.size());
  for (int a = 0; a < 3; ++a) {
    dist.clear();
    for (const MapPoint* p : points) {
      if (p->bad) continue;
      dist.push_back(std::abs((r * p->pos)[a] - qc[a]));
    }
    const int n = static_cast<int>(dist.size());
    if (n == 0) return false;  // every point flagged bad between cullings
    const int k = (n >= 30) ? std::max(2, n / 50) : 1;
    std::nth_element(dist.begin(), dist.begin() + (k - 1), dist.end(),
                     std::greater<float>());
    ext[a] = dist[k - 1];
    if (std::getenv("ROMAP_EXT_DEBUG")) {
      std::sort(dist.begin(), dist.end(), std::greater<float>());
      std::printf("[ext] axis %d n=%d k=%d top:", a, n, k);
      for (int j = 0; j < std::min(n, 20); ++j) std::printf(" %.3f", dist[j]);
      std::printf("\n");
    }
  }
  // Silhouette correction: the trimmed point-cloud extent is biased short
  // wherever ORB features undersample the surface (e.g. sphere poles —
  // round 2 measured z 31% short) and biased long when a stray triangulation
  // survives the trim. The detection-box silhouettes constrain the true
  // extent from above in every view; their robust minimum is tight for any
  // axis some view sees transverse to the ray. Trust it within a sanity
  // band around the cloud estimate (detector boxes can be loose or span
  // occluders). Goes beyond the reference (cloud extents only,
  // ref src/ObjectMap.cc:613-672).
  float sil[3];
  bool tight[3];
  SilhouetteExtentBounds(r, t_obj_w.inverse().t, ext, sil, tight);
  for (int a = 0; a < 3; ++a) {
    if (tight[a]) {
      // enough near-transverse views: the silhouette bound carries the
      // full extent (incl. surface regions ORB never triangulates) where
      // the cloud is biased short. The cloud is a physical LOWER bound
      // (triangulated points exist at those coordinates), so take the max
      // — but only inside the promised sanity band: a silhouette >1.6x
      // the cloud extent means the detector boxes likely span an occluder
      // or a neighbor, so keep the cloud value and drop the tight flag
      // (downstream then keeps the cautious 1.8x NeRF margin).
      if (ext[a] > 0.0f && sil[a] <= 1.6f * ext[a]) {
        ext[a] = std::max(ext[a], sil[a]);
      } else {
        tight[a] = false;
      }
    }
    out->ext_tight[a] = tight[a];
    if (std::getenv("ROMAP_EXT_DEBUG"))
      std::printf("[ext] axis %d sil=%.3f tight=%d -> ext=%.3f\n", a,
                  tight[a] ? sil[a] : -1.0f, tight[a] ? 1 : 0, ext[a]);
  }
  // Unobservable-axis floor: along the viewing direction triangulation
  // noise swamps the object's own depth structure (measured: the cloud's
  // |z-c| tops out at ~0.6x the true half-extent even BEFORE trimming —
  // points never reach the front pole), and no silhouette is transverse
  // to that axis, so neither estimator can see it. The error costs are
  // asymmetric: an extent too SMALL clips the NeRF training volume and
  // truncates the field (the mesh-support refinement then rejects the
  // axis too), while an extent too LARGE only spends grid resolution on
  // empty space. So when both other axes are silhouette-confirmed, floor
  // the blind axis at 0.8x their minimum; the flag stays non-tight so
  // downstream keeps the cautious volume margin and the NeRF-mesh
  // refinement still owns the final number.
  for (int a = 0; a < 3; ++a) {
    if (tight[a]) continue;
    const int b = (a + 1) % 3, c2 = (a + 2) % 3;
    if (!(tight[b] && tight[c2])) continue;
    const float floor_ext = 0.8f * std::min(ext[b], ext[c2]);
    if (ext[a] < floor_ext) {
      if (std::getenv("ROMAP_EXT_DEBUG"))
        std::printf("[ext] axis %d blind-axis floor %.3f -> %.3f\n", a,
                    ext[a], floor_ext);
      ext[a] = floor_ext;
    }
  }
  Vec3 t_shape(-qc[0], -qc[1], -qc[2]);
  out->t_obj_w = SE3{r, t_shape};
  out->a1 = ext[0];
  out->a2 = ext[1];
  out->a3 = ext[2];
  out->max_dist = std::sqrt(out->a1 * out->a1 + out->a2 * out->a2 +
                            out->a3 * out->a3);
  return true;
}

bool ObjectMap::WhetherAssociation(const ObjectFrame& obj,
                                   const FrameContext& frame) const {
  float min_u = 1e9f, min_v = 1e9f, max_u = -1e9f, max_v = -1e9f;
  float mmin_u = 1e9f, mmin_v = 1e9f, mmax_u = -1e9f, mmax_v = -1e9f;
  auto add = [&](const MapPoint* p, bool mine) {
    if (p->bad) return;
    cv::Point2f uv = frame.cam.Project(frame.tcw * p->pos);
    if (mine) {
      min_u = std::min(min_u, uv.x);
      max_u = std::max(max_u, uv.x);
      min_v = std::min(min_v, uv.y);
      max_v = std::max(max_v, uv.y);
    }
    mmin_u = std::min(mmin_u, uv.x);
    mmax_u = std::max(mmax_u, uv.x);
    mmin_v = std::min(mmin_v, uv.y);
    mmax_v = std::max(mmax_v, uv.y);
  };
  for (const MapPoint* p : points) add(p, true);
  for (const MapPoint* p : obj.points) add(p, false);
  cv::Rect_<float> mine(min_u, min_v, max_u - min_u, max_v - min_v);
  cv::Rect_<float> mixed(mmin_u, mmin_v, mmax_u - mmin_u, mmax_v - mmin_v);
  float inter = (mine & mixed).area();
  float iou = inter / (mine.area() + mixed.area() - inter);
  return iou >= 0.4f;
}

void ObjectMap::ProjectPointsBbox(const FrameContext& frame) {
  if (bad_ || points.empty()) return;
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
  projected_rect = {min_u, min_v, max_u - min_u, max_v - min_v};
}

void ObjectMap::Merge(ObjectMap* other, double cur_keyframe_stamp) {
  if (other->IsBad()) return;
  if (other->created_frame_id < created_frame_id)
    created_frame_id = other->created_frame_id;
  if (other->latest_obs_frame_id > latest_obs_frame_id) {
    latest_obs_frame_id = other->latest_obs_frame_id;
    last_bbox = other->last_bbox;
    last_last_bbox = other->last_bbox;
    latest_lines = other->latest_lines;
  }
  n_obs += other->n_obs;

  // adopt the other's points, distance-gated by our cuboid (ref :826-873)
  bool check = points.size() > 10;
  SE3 gate_t;
  float gx = 0, gy = 0, gz = 0;
  if (check) {
    if (first_init) {
      gate_t = t_obj_w;
      gx = gy = gz = axis_length;
    } else {
      gate_t = shape.t_obj_w;
      gx = shape.a1;
      gy = shape.a2;
      gz = shape.a3;
    }
  }
  std::vector<MapPoint*> adopted;
  for (MapPoint* p : other->points) {
    if (p->bad) continue;
    if (check) {
      Vec3 q = gate_t * p->pos;
      float m = cfg_.merge_mps_dist_multiple;
      if (std::abs(q[0]) > m * gx || std::abs(q[1]) > m * gy ||
          std::abs(q[2]) > m * gz)
        continue;
    }
    adopted.push_back(p);
  }
  AddNewPoints(adopted, latest_obs_frame_id);
  EIFFilterOutliers();

  for (const Vec3& p : other->history_pos) history_pos.push_back(p);
  for (const auto& kv : other->appear_same_times)
    appear_same_times[kv.first] += kv.second;

  // union the detection histories (the reference only refreshes stamps both
  // objects share, ref :842-857, which silently discards the absorbed
  // object's keyframe boxes — a duplicate-then-merge lifecycle then starves
  // the NeRF trigger; we union instead)
  for (const auto& kv : other->history_bbox) {
    history_bbox[kv.first] = kv.second;
    history_twc[kv.first] = other->history_twc[kv.first];
  }
  for (const auto& kv : other->keyframe_history_bbox)
    keyframe_history_bbox[kv.first] = kv.second;
  for (const auto& kv : other->keyframe_bbox_pending)
    keyframe_bbox_pending[kv.first] = kv.second;
  if (history_bbox.count(cur_keyframe_stamp)) {
    keyframe_history_bbox[cur_keyframe_stamp] = history_bbox[cur_keyframe_stamp];
    keyframe_bbox_pending[cur_keyframe_stamp] = history_bbox[cur_keyframe_stamp];
  }
}

void ObjectMap::InsertHistoryBboxAndTwc(const FrameContext& frame,
                                        const Bbox& bbox) {
  history_bbox[frame.timestamp] = bbox;
  history_twc[frame.timestamp] = frame.tcw.inverse().matrix();
  hist_cam = frame.cam;
  have_hist_cam = true;
}

bool ObjectMap::SilhouetteExtentBounds(const Mat3& r, const Vec3& center_w,
                                       const float prior_ext[3],
                                       float out[3], bool tight[3]) const {
  tight[0] = tight[1] = tight[2] = false;
  if (!have_hist_cam || history_bbox.size() < 8) return false;
  std::vector<float> bounds[3];
  for (const auto& kv : history_bbox) {
    auto it = history_twc.find(kv.first);
    if (it == history_twc.end()) continue;
    const Bbox& bb = kv.second;
    if (bb.edge_and_small) continue;
    // a box clipped at the image border truncates the silhouette: its
    // support understates the extent, poisoning a minimum-style statistic
    const float m = 2.0f;
    if (bb.rect.x <= hist_cam.min_x + m || bb.rect.y <= hist_cam.min_y + m ||
        bb.rect.x + bb.rect.width >= hist_cam.max_x - m ||
        bb.rect.y + bb.rect.height >= hist_cam.max_y - m)
      continue;
    const Mat4& twc = it->second;
    // invert the stored camera-to-world pose
    Mat3 rcw;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) rcw(i, j) = twc(j, i);
    Vec3 t_wc(twc(0, 3), twc(1, 3), twc(2, 3));
    Vec3 tcw = -(rcw * t_wc);
    Vec3 cc = rcw * center_w + tcw;
    if (cc[2] < 1e-3f) continue;
    float z = cc[2];
    // image-space Jacobians of the projection along each object axis at
    // the center: du = fx*(dX*Z - X*dZ)/Z^2 (and the v analog)
    float gu3[3], gv3[3], g3[3];
    for (int a = 0; a < 3; ++a) {
      Vec3 w_a(r(a, 0), r(a, 1), r(a, 2));  // object axis a in world coords
      Vec3 dc = rcw * w_a;
      gu3[a] = hist_cam.fx * (dc[0] * z - cc[0] * dc[2]) / (z * z);
      gv3[a] = hist_cam.fy * (dc[1] * z - cc[1] * dc[2]) / (z * z);
      g3[a] = std::sqrt(gu3[a] * gu3[a] + gv3[a] * gv3[a]);
    }
    for (int a = 0; a < 3; ++a) {
      float gu = gu3[a], gv = gv3[a], g = g3[a];
      if (g < 1e-6f) continue;
      // foreshortening: px-per-unit relative to a fully transverse unit
      // vector at this depth. Only near-transverse views (phi >= 0.8)
      // yield a TIGHT bound — a foreshortened axis's support is dominated
      // by the other extents and says nothing about this one.
      float f_mean = 0.5f * (hist_cam.fx + hist_cam.fy);
      float phi = g * z / f_mean;
      if (phi < 0.8f) continue;
      // support of the ellipse inscribed in the detection rect along the
      // projected axis direction: exact for blob/sphere silhouettes, and
      // unlike the rect support it does NOT inflate by up to sqrt(2) when
      // the axis projects diagonally in the image (round 3 bug: the room
      // sequence's diagonal axes made every bound ~1.4x loose, so the
      // silhouette never engaged)
      float ux = gu / g, uy = gv / g;
      float sx = ux * 0.5f * bb.rect.width, sy = uy * 0.5f * bb.rect.height;
      float supp = std::sqrt(sx * sx + sy * sy);  // pixels
      // cross-term correction: a box's silhouette support along u_a also
      // carries the OTHER axes' corner projections, so the raw ellipse
      // support over-bounds box-like objects by up to ~1.7x per axis
      // (measured on the clean yawed box). Subtract the other axes'
      // contributions at the current cloud-extent priors IN QUADRATURE:
      // an ellipsoid's support is sqrt(sum_b (h_b proj_b.u)^2), so the
      // quadrature correction is exact for blobs/spheres (keeping the
      // sphere-pole raise intact) while removing most of the box
      // inflation (a box's support is the L1 sum — quadrature
      // under-corrects it, erring on the loose side).
      // p = 1.25 power mean: between the box-exact L1 subtraction (p=1,
      // best box ext_err 0.29 but shaves the sphere transverse axes ~2%
      // past the tracking_test z-floor gate) and the ellipsoid-exact
      // quadrature (p=2, sphere-safe but only 0.57 on the box). Measured
      // ladder on the clean yawed box: p=2 -> 0.57, 1.5 -> 0.45,
      // 1.25 -> 0.34 (sphere gates green), 1.1 -> 0.34 (sphere z gate
      // FAILS). The sphere is p-insensitive above 1.25 because its
      // raises come from views where the cross terms are ~0.
      const float p_exp = 1.25f;
      float cross_p = 0.0f;
      for (int b = 0; b < 3; ++b) {
        if (b == a) continue;
        float cb = prior_ext[b] * std::abs(gu3[b] * ux + gv3[b] * uy);
        cross_p += std::pow(cb, p_exp);
      }
      float corr = std::pow(
          std::max(std::pow(supp, p_exp) - cross_p, 0.0f), 1.0f / p_exp);
      bounds[a].push_back(corr / g);
    }
  }
  bool any = false;
  for (int a = 0; a < 3; ++a) {
    tight[a] = bounds[a].size() >= 5;
    if (!tight[a]) continue;
    size_t k = bounds[a].size() / 5;  // 20th percentile: robust minimum
    std::nth_element(bounds[a].begin(), bounds[a].begin() + k,
                     bounds[a].end());
    out[a] = bounds[a][k];
    any = true;
  }
  return any;
}

bool ObjectMap::SilhouetteCenter(Vec3* out) const {
  if (!have_hist_cam || history_bbox.size() < 8) return false;
  // x* = argmin sum_i || (I - d_i d_i^T)(x - o_i) ||^2  (closed form 3x3)
  cv::Matx33d A = cv::Matx33d::zeros();
  cv::Vec3d rhs(0, 0, 0);
  int n = 0;
  for (const auto& kv : history_bbox) {
    auto it = history_twc.find(kv.first);
    if (it == history_twc.end()) continue;
    const Bbox& bb = kv.second;
    if (bb.edge_and_small) continue;  // clipped box: center unreliable
    const Mat4& twc = it->second;
    float u = bb.rect.x + bb.rect.width * 0.5f;
    float v = bb.rect.y + bb.rect.height * 0.5f;
    cv::Vec3d d_cam((u - hist_cam.cx) / hist_cam.fx,
                    (v - hist_cam.cy) / hist_cam.fy, 1.0);
    cv::Vec3d d(0, 0, 0), o(twc(0, 3), twc(1, 3), twc(2, 3));
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) d[r] += twc(r, c) * d_cam[c];
    d /= cv::norm(d);
    cv::Matx33d p = cv::Matx33d::eye();
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) p(r, c) -= d[r] * d[c];
    A += p;
    for (int r = 0; r < 3; ++r) rhs[r] += p(r, 0) * o[0] + p(r, 1) * o[1] +
                                          p(r, 2) * o[2];
    ++n;
  }
  if (n < 8) return false;
  // conditioning: the smallest eigenvalue of A/n is ~sin^2 of the angular
  // spread of the ray bundle — with parallel rays the depth is unobservable
  cv::Matx33d an = A * (1.0 / n);
  cv::Vec3d eig;
  cv::eigen(cv::Mat(an), eig);
  if (eig[2] < 5e-3) return false;
  cv::Mat xm;
  if (!cv::solve(cv::Mat(A), cv::Mat(rhs), xm, cv::DECOMP_SVD)) return false;
  *out = Vec3(static_cast<float>(xm.at<double>(0)),
              static_cast<float>(xm.at<double>(1)),
              static_cast<float>(xm.at<double>(2)));
  return true;
}

float ObjectMap::CuboidOverlapRatio(const ObjectMap* other) const {
  // ref MergeOverlapObjects (src/LocalMapping.cc:959-1107): sample this
  // cuboid's volume on a lattice, count samples falling inside the other
  // cuboid. Both objects need estimated shapes (a refined cuboid exists
  // once first_init is false).
  if (first_init || other->first_init) return 0.f;
  const Cuboid& a = shape;
  const Cuboid& b = other->shape;
  if (a.a1 <= 0 || b.a1 <= 0) return 0.f;
  SE3 a_to_w = a.t_obj_w.inverse();
  const SE3& w_to_b = b.t_obj_w;
  constexpr int n = 6;
  int inside = 0;
  for (int ix = 0; ix < n; ++ix)
    for (int iy = 0; iy < n; ++iy)
      for (int iz = 0; iz < n; ++iz) {
        Vec3 local(a.a1 * (2.f * (ix + .5f) / n - 1.f),
                   a.a2 * (2.f * (iy + .5f) / n - 1.f),
                   a.a3 * (2.f * (iz + .5f) / n - 1.f));
        Vec3 q = w_to_b * (a_to_w * local);
        if (std::abs(q[0]) <= b.a1 && std::abs(q[1]) <= b.a2 &&
            std::abs(q[2]) <= b.a3)
          ++inside;
      }
  return static_cast<float>(inside) / (n * n * n);
}

}  // namespace romap
