#include "romap/matcher.h"

#include <algorithm>
#include <cmath>

#include "romap/features.h"

namespace romap {

namespace {

// grid index of keypoints for radius queries
struct Grid {
  static constexpr int kCell = 32;
  int cols = 0, rows = 0;
  std::vector<std::vector<int>> cells;

  explicit Grid(const Frame& f) {
    cols = static_cast<int>(f.cam.max_x / kCell) + 1;
    rows = static_cast<int>(f.cam.max_y / kCell) + 1;
    cells.resize(static_cast<size_t>(cols) * rows);
    for (size_t i = 0; i < f.keypoints.size(); ++i) {
      const auto& pt = f.keypoints[i].pt;
      int cx = static_cast<int>(pt.x) / kCell;
      int cy = static_cast<int>(pt.y) / kCell;
      if (cx < 0 || cy < 0 || cx >= cols || cy >= rows) continue;
      cells[static_cast<size_t>(cy) * cols + cx].push_back(static_cast<int>(i));
    }
  }

  void Query(const cv::Point2f& uv, float radius, std::vector<int>* out) const {
    out->clear();
    int x0 = std::max(0, static_cast<int>((uv.x - radius) / kCell));
    int x1 = std::min(cols - 1, static_cast<int>((uv.x + radius) / kCell));
    int y0 = std::max(0, static_cast<int>((uv.y - radius) / kCell));
    int y1 = std::min(rows - 1, static_cast<int>((uv.y + radius) / kCell));
    for (int cy = y0; cy <= y1; ++cy)
      for (int cx = x0; cx <= x1; ++cx)
        for (int i : cells[static_cast<size_t>(cy) * cols + cx])
          out->push_back(i);
  }
};

}  // namespace

int SearchForInitialization(const Frame& f1, const Frame& f2,
                            std::vector<int>* matches12, float window) {
  matches12->assign(f1.keypoints.size(), -1);
  if (f1.keypoints.empty() || f2.keypoints.empty()) return 0;
  Grid grid(f2);
  std::vector<int> owner2(f2.keypoints.size(), -1);
  std::vector<int> best_dist2(f2.keypoints.size(), kOrbDistLow + 1);
  std::vector<int> cand;
  int n = 0;
  for (size_t i1 = 0; i1 < f1.keypoints.size(); ++i1) {
    grid.Query(f1.keypoints[i1].pt, window, &cand);
    int best = kOrbDistLow, best2 = 256, best_idx = -1;
    for (int i2 : cand) {
      int d = DescriptorDistance(f1.descriptors.row(static_cast<int>(i1)),
                                 f2.descriptors.row(i2));
      if (d < best) {
        best2 = best;
        best = d;
        best_idx = i2;
      } else if (d < best2) {
        best2 = d;
      }
    }
    if (best_idx >= 0 && best < 0.9 * best2 && best < best_dist2[best_idx]) {
      if (owner2[best_idx] >= 0) {  // steal: previous owner loses its match
        (*matches12)[owner2[best_idx]] = -1;
        --n;
      }
      (*matches12)[i1] = best_idx;
      owner2[best_idx] = static_cast<int>(i1);
      best_dist2[best_idx] = best;
      ++n;
    }
  }
  return n;
}

int SearchByProjectionLastFrame(Frame& cur, const Frame& last, float radius) {
  Grid grid(cur);
  std::vector<int> cand;
  int n = 0;
  for (size_t i = 0; i < last.keypoints.size(); ++i) {
    MapPoint* mp = last.points[i];
    if (!mp || mp->bad) continue;
    Vec3 p_cam = cur.tcw * mp->pos;
    if (p_cam[2] <= 0.05f) continue;
    cv::Point2f uv = cur.cam.Project(p_cam);
    if (uv.x < cur.cam.min_x || uv.x >= cur.cam.max_x || uv.y < cur.cam.min_y ||
        uv.y >= cur.cam.max_y)
      continue;
    grid.Query(uv, radius, &cand);
    int best = kOrbDistHigh, best2 = 256, best_idx = -1;
    for (int j : cand) {
      if (cur.points[j]) continue;
      int d = DescriptorDistance(mp->descriptor, cur.descriptors.row(j));
      if (d < best) {
        best2 = best;
        best = d;
        best_idx = j;
      } else if (d < best2) {
        best2 = d;
      }
    }
    // ambiguity rejection: repetitive texture aliases under projection search
    if (best_idx >= 0 && best < 0.8 * best2) {
      cur.points[best_idx] = mp;
      ++n;
    }
  }
  return n;
}

int SearchByProjectionMapPoints(Frame& cur, const std::vector<MapPoint*>& pts,
                                float radius) {
  Grid grid(cur);
  std::vector<int> cand;
  int n = 0;
  for (MapPoint* mp : pts) {
    if (!mp || mp->bad || mp->last_seen_frame == cur.id) continue;
    Vec3 p_cam = cur.tcw * mp->pos;
    if (p_cam[2] <= 0.05f) continue;
    cv::Point2f uv = cur.cam.Project(p_cam);
    if (uv.x < cur.cam.min_x || uv.x >= cur.cam.max_x || uv.y < cur.cam.min_y ||
        uv.y >= cur.cam.max_y)
      continue;
    mp->n_visible++;
    grid.Query(uv, radius, &cand);
    int best = kOrbDistHigh, best2 = 256, best_idx = -1;
    for (int j : cand) {
      if (cur.points[j]) continue;
      int d = DescriptorDistance(mp->descriptor, cur.descriptors.row(j));
      if (d < best) {
        best2 = best;
        best = d;
        best_idx = j;
      } else if (d < best2) {
        best2 = d;
      }
    }
    if (best_idx >= 0 && best < 0.8 * best2) {
      cur.points[best_idx] = mp;
      mp->last_seen_frame = cur.id;
      ++n;
    }
  }
  return n;
}

int SearchForTriangulation(const KeyFrame& kf1, const KeyFrame& kf2,
                           std::vector<std::pair<int, int>>* matches) {
  matches->clear();
  // fundamental matrix from the relative pose: F = K2^-T [t]x R K1^-1
  SE3 t21 = kf2.tcw * kf1.tcw.inverse();
  const Mat3& r = t21.R;
  const Vec3& t = t21.t;
  Mat3 tx(0, -t[2], t[1], t[2], 0, -t[0], -t[1], t[0], 0);
  Mat3 e = tx * r;
  Mat3 k1(kf1.cam.fx, 0, kf1.cam.cx, 0, kf1.cam.fy, kf1.cam.cy, 0, 0, 1);
  Mat3 k2(kf2.cam.fx, 0, kf2.cam.cx, 0, kf2.cam.fy, kf2.cam.cy, 0, 0, 1);
  Mat3 f = k2.inv().t() * e * k1.inv();

  std::vector<int> used2(kf2.keypoints.size(), 0);
  for (size_t i1 = 0; i1 < kf1.keypoints.size(); ++i1) {
    if (kf1.points[i1]) continue;  // only unmatched features
    const auto& p1 = kf1.keypoints[i1].pt;
    cv::Vec3f l = f * Vec3(p1.x, p1.y, 1.0f);  // epipolar line in image 2
    float norm = std::sqrt(l[0] * l[0] + l[1] * l[1]);
    if (norm < 1e-9f) continue;
    int best = 75, best_idx = -1;
    for (size_t i2 = 0; i2 < kf2.keypoints.size(); ++i2) {
      if (kf2.points[i2] || used2[i2]) continue;
      const auto& p2 = kf2.keypoints[i2].pt;
      float dist_to_line = std::abs(l[0] * p2.x + l[1] * p2.y + l[2]) / norm;
      if (dist_to_line > 2.5f) continue;
      int d = DescriptorDistance(kf1.descriptors.row(static_cast<int>(i1)),
                                 kf2.descriptors.row(static_cast<int>(i2)));
      if (d < best) {
        best = d;
        best_idx = static_cast<int>(i2);
      }
    }
    if (best_idx >= 0) {
      used2[best_idx] = 1;
      matches->emplace_back(static_cast<int>(i1), best_idx);
    }
  }
  return static_cast<int>(matches->size());
}

int FuseByProjection(KeyFrame* kf, const std::vector<MapPoint*>& candidates,
                     float radius, Map* map) {
  int fused = 0;
  const auto& cam = kf->cam;
  for (MapPoint* p : candidates) {
    if (!p || p->bad || p->obs.count(kf)) continue;
    Vec3 c = kf->tcw * p->pos;
    if (c[2] <= 0.05f) continue;
    float u = cam.fx * c[0] / c[2] + cam.cx;
    float v = cam.fy * c[1] / c[2] + cam.cy;
    if (u < cam.min_x || u >= cam.max_x || v < cam.min_y || v >= cam.max_y)
      continue;
    int best = kOrbDistLow, best_idx = -1;
    for (size_t j = 0; j < kf->keypoints.size(); ++j) {
      const auto& pt = kf->keypoints[j].pt;
      if (std::abs(pt.x - u) > radius || std::abs(pt.y - v) > radius) continue;
      int d = DescriptorDistance(p->descriptor,
                                 kf->descriptors.row(static_cast<int>(j)));
      if (d < best) {
        best = d;
        best_idx = static_cast<int>(j);
      }
    }
    if (best_idx < 0) continue;
    MapPoint* existing = kf->points[best_idx];
    if (existing && existing != p && !existing->bad) {
      // duplicate landmark — keep the better-observed one
      if (existing->obs.size() >= p->obs.size())
        map->MergePoints(existing, p);
      else
        map->MergePoints(p, existing);
      ++fused;
    } else if (!existing) {
      kf->points[best_idx] = p;
      p->obs[kf] = best_idx;
      ++fused;
    }
  }
  return fused;
}

int SearchByBruteForce(Frame& cur, const KeyFrame& kf, int max_dist) {
  int n = 0;
  std::vector<int> owner(cur.keypoints.size(), max_dist + 1);
  for (size_t i = 0; i < kf.points.size(); ++i) {
    MapPoint* p = kf.points[i];
    if (!p || p->bad) continue;
    int best = max_dist, best2 = 256, best_idx = -1;
    for (size_t j = 0; j < cur.keypoints.size(); ++j) {
      int d = DescriptorDistance(p->descriptor,
                                 cur.descriptors.row(static_cast<int>(j)));
      if (d < best) {
        best2 = best;
        best = d;
        best_idx = static_cast<int>(j);
      } else if (d < best2) {
        best2 = d;
      }
    }
    // ratio test + better-owner check
    if (best_idx < 0 || best > static_cast<int>(0.75f * best2)) continue;
    if (best >= owner[best_idx]) continue;
    if (owner[best_idx] > max_dist) ++n;  // a steal replaces, not adds
    owner[best_idx] = best;
    cur.points[best_idx] = p;
  }
  return n;
}

int SearchByBow(Frame& cur, const std::vector<int>& cur_words,
                const KeyFrame& kf, int max_dist) {
  if (cur_words.size() != cur.keypoints.size() ||
      kf.bow_words.size() != kf.points.size())
    return 0;
  // bucket the current frame's keypoints by word
  std::map<int, std::vector<int>> cur_by_word;
  for (size_t j = 0; j < cur_words.size(); ++j)
    cur_by_word[cur_words[j]].push_back(static_cast<int>(j));
  int n = 0;
  std::vector<int> owner(cur.keypoints.size(), max_dist + 1);
  for (size_t i = 0; i < kf.points.size(); ++i) {
    MapPoint* p = kf.points[i];
    if (!p || p->bad) continue;
    auto it = cur_by_word.find(kf.bow_words[i]);
    if (it == cur_by_word.end()) continue;
    int best = max_dist, best2 = 256, best_idx = -1;
    for (int j : it->second) {
      int d = DescriptorDistance(p->descriptor, cur.descriptors.row(j));
      if (d < best) {
        best2 = best;
        best = d;
        best_idx = j;
      } else if (d < best2) {
        best2 = d;
      }
    }
    if (best_idx < 0 || best > static_cast<int>(0.75f * best2)) continue;
    if (best >= owner[best_idx]) continue;
    if (owner[best_idx] > max_dist) ++n;  // a steal replaces, not adds
    owner[best_idx] = best;
    cur.points[best_idx] = p;
  }
  return n;
}

}  // namespace romap
