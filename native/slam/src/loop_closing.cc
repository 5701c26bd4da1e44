#include "romap/loop_closing.h"

#include <algorithm>
#include <array>
#include <cstdio>
#include <cstring>

#include "romap/matcher.h"
#include "romap/optimizer.h"

namespace romap {

namespace {

inline int Hamming32(const uint8_t* a, const uint8_t* b) {
  uint64_t x[4], y[4];
  std::memcpy(x, a, 32);
  std::memcpy(y, b, 32);
  return __builtin_popcountll(x[0] ^ y[0]) + __builtin_popcountll(x[1] ^ y[1]) +
         __builtin_popcountll(x[2] ^ y[2]) + __builtin_popcountll(x[3] ^ y[3]);
}

inline cv::Vec3d ToD(const Vec3& v) { return {v[0], v[1], v[2]}; }
inline Vec3 ToF(const cv::Vec3d& v) {
  return {static_cast<float>(v[0]), static_cast<float>(v[1]),
          static_cast<float>(v[2])};
}

// Word-bucketed mutual-best descriptor matching between two keyframes,
// restricted to keypoints that carry map points — the 3D-3D correspondences
// the Sim3 solver consumes (the reference's ORBmatcher::SearchByBoW between
// keyframes, ref src/LoopClosing.cc:253-265).
std::vector<std::pair<int, int>> MatchByWord(const KeyFrame& k1,
                                             const KeyFrame& k2,
                                             int max_dist) {
  std::vector<std::pair<int, int>> out;
  if (k1.bow_words.empty() || k2.bow_words.empty()) return out;
  std::array<std::vector<int>, BowVocabulary::kWords> buckets;
  for (size_t j = 0; j < k2.bow_words.size(); ++j) {
    const MapPoint* p = k2.points[j];
    if (p && !p->bad) buckets[k2.bow_words[j]].push_back(static_cast<int>(j));
  }
  std::vector<int> best12(k1.bow_words.size(), -1);
  std::vector<int> best21(k2.bow_words.size(), -1);
  std::vector<int> dist21(k2.bow_words.size(), 257);
  for (size_t i = 0; i < k1.bow_words.size(); ++i) {
    const MapPoint* p = k1.points[i];
    if (!p || p->bad) continue;
    const auto& bucket = buckets[k1.bow_words[i]];
    int best = -1, bd = max_dist + 1, bd2 = 257;
    for (int j : bucket) {
      const int d = Hamming32(k1.descriptors.ptr<uint8_t>(i),
                              k2.descriptors.ptr<uint8_t>(j));
      if (d < bd) {
        bd2 = bd;
        bd = d;
        best = j;
      } else if (d < bd2) {
        bd2 = d;
      }
    }
    if (best < 0) continue;
    if (bd > static_cast<int>(0.9f * bd2)) continue;  // Lowe ratio test
    best12[i] = best;
    if (bd < dist21[best]) {
      dist21[best] = bd;
      best21[best] = static_cast<int>(i);
    }
  }
  for (size_t i = 0; i < best12.size(); ++i) {
    const int j = best12[i];
    if (j >= 0 && best21[j] == static_cast<int>(i))
      out.push_back({static_cast<int>(i), j});
  }
  return out;
}

}  // namespace

std::vector<LoopCloser::Candidate> LoopCloser::DetectCandidates(KeyFrame* kf) {
  std::vector<Candidate> out;
  // query wide: the exclusions below (covisible neighborhood + recency)
  // eat the top slots on a live map, and true loop candidates rank after
  // them — a tight top-k here would starve detection as the map grows
  auto scored = kfdb_->QueryScored(kf->descriptors, cfg_.max_candidates + 56);
  if (scored.empty()) return out;

  // exclude the query's own covisible neighborhood and anything too recent
  // (those always score high and are not loops,
  // ref KeyFrameDatabase::DetectLoopCandidates src/KeyFrameDatabase.cc:64-96)
  std::set<KeyFrame*, ById> excluded;
  excluded.insert(kf);
  // ANY shared map point disqualifies a candidate: after a closure's fuse the
  // old loop side is genuinely the same place as the current one, and firing
  // a second Sim3 between two views of an already-consistent region injects
  // its estimation noise (observed: scale 1.12 re-tearing a closed map)
  for (KeyFrame* nb : kf->Covisible(1)) excluded.insert(nb);

  float best = 0;
  for (const auto& [score, cand] : scored) {
    if (excluded.count(cand) || cand->bad) continue;
    if (kf->id - cand->id < cfg_.min_gap_from_current) continue;
    best = std::max(best, score);
    out.push_back({cand, score});
  }
  // relative score gate (the reference gates on the minimum covisible-
  // neighbor BoW score; the relative-to-best form is the same rule this
  // codebase's relocalization already uses, tracking.cc kMaxCandidates)
  out.erase(std::remove_if(out.begin(), out.end(),
                           [&](const Candidate& c) {
                             return c.score < cfg_.relative_score_gate * best;
                           }),
            out.end());
  if (static_cast<int>(out.size()) > cfg_.max_candidates)
    out.resize(cfg_.max_candidates);
  return out;
}

LoopCloser::Result LoopCloser::Process(KeyFrame* kf) {
  Result res;
  if (!kf || kf->bad || kf->bow_words.empty()) return res;
  if (kf->id < last_loop_kf_id_ + cfg_.min_kfs_between_loops) return res;

  auto candidates = DetectCandidates(kf);
  if (candidates.empty()) {
    prev_groups_.clear();  // a gap breaks temporal consistency (ref :150-153)
    return res;
  }

  // temporal consistency: a candidate only fires after its covisibility
  // group intersects the previous keyframes' candidate groups
  // `consistency_needed` times in a row (ref src/LoopClosing.cc:156-221)
  std::vector<Group> cur_groups;
  std::vector<std::pair<KeyFrame*, float>> consistent;
  for (const auto& c : candidates) {
    Group g;
    g.kfs.insert(c.kf);
    for (KeyFrame* nb : c.kf->Covisible(15)) g.kfs.insert(nb);
    int best_count = 0;
    for (const auto& prev : prev_groups_) {
      bool hit = false;
      for (KeyFrame* m : g.kfs)
        if (prev.kfs.count(m)) {
          hit = true;
          break;
        }
      if (hit) best_count = std::max(best_count, prev.count);
    }
    g.count = best_count + 1;
    cur_groups.push_back(g);
    if (g.count >= cfg_.consistency_needed)
      consistent.push_back({c.kf, c.score});
  }
  prev_groups_ = std::move(cur_groups);
  if (consistent.empty()) return res;

  for (const auto& [cand, score] : consistent) {
    std::vector<std::pair<MapPoint*, MapPoint*>> pairs;
    if (std::getenv("ROMAP_SLAM_DEBUG"))
      std::printf("[loop try kf=%ld t=%.1f] cand kf=%ld t=%.1f score=%.3f\n",
                  kf->id, kf->timestamp, cand->id, cand->timestamp, score);
    if (!ComputeSim3(kf, cand, &res, &pairs)) continue;
    res.matched = cand;
    CorrectLoop(kf, cand, res.s12, pairs);
    res.corrected = true;
    last_loop_kf_id_ = kf->id;
    prev_groups_.clear();
    return res;
  }
  return res;
}

bool LoopCloser::ComputeSim3(
    KeyFrame* kf, KeyFrame* cand, Result* out,
    std::vector<std::pair<MapPoint*, MapPoint*>>* pairs) {
  const auto matches = MatchByWord(*kf, *cand, kOrbDistLow);
  const bool dbg = std::getenv("ROMAP_SLAM_DEBUG") != nullptr;
  if (dbg) std::printf("[loop sim3] bow_matches=%zu\n", matches.size());
  if (static_cast<int>(matches.size()) < cfg_.min_bow_matches) return false;

  std::vector<cv::Vec3d> x1, x2;
  std::vector<cv::Point2f> px1, px2;
  std::vector<std::pair<MapPoint*, MapPoint*>> mps;
  for (const auto& [i, j] : matches) {
    MapPoint *p1 = kf->points[i], *p2 = cand->points[j];
    x1.push_back(ToD(kf->tcw * p1->pos));
    x2.push_back(ToD(cand->tcw * p2->pos));
    px1.push_back(kf->keypoints[i].pt);
    px2.push_back(cand->keypoints[j].pt);
    mps.push_back({p1, p2});
  }

  const auto ransac =
      SolveSim3Ransac(x1, x2, px1, px2, kf->cam, cand->cam, cfg_.ransac_iters,
                      cfg_.ransac_px, static_cast<uint32_t>(kf->id) * 2654435761u);
  if (dbg)
    std::printf("[loop sim3] ransac inliers=%d scale=%.4f\n", ransac.n_inliers,
                ransac.s12.s);
  if (ransac.n_inliers < cfg_.min_sim3_inliers) return false;

  // First rotation/translation polish of the RANSAC estimate over its
  // inliers (ref Optimizer::OptimizeSim3, src/LoopClosing.cc:327-341);
  // the scale keeps the consensus Umeyama value, see RefineSim3's header.
  Sim3 s12_refined = ransac.s12;
  RefineSim3(&s12_refined, x1, x2, px1, px2, ransac.inliers, kf->cam,
             cand->cam);

  // second stage (ref SearchBySim3 + second OptimizeSim3 + the >= 40 gate,
  // src/LoopClosing.cc:343-399): project the WIDER loop neighborhood's map
  // points through the polished estimate into the current keyframe, re-match
  // by descriptor, and polish rotation/translation again over the expanded
  // correspondence set (the scale stays the RANSAC-consensus Umeyama value
  // throughout — see RefineSim3's header for why reprojection cannot
  // observe it at a loop junction). The match count is the verification
  // gate: a marginal RANSAC consensus on a degenerate point set dies here.
  std::set<MapPoint*, ById> loop_points;
  for (MapPoint* p : cand->points)
    if (p && !p->bad) loop_points.insert(p);
  for (KeyFrame* nb : cand->Covisible(15))
    for (MapPoint* p : nb->points)
      if (p && !p->bad) loop_points.insert(p);
  const SE3 t1w_corr = (s12_refined * Sim3::FromSE3(cand->tcw)).ToSE3();
  std::map<int, std::pair<int, MapPoint*>> hit;  // keypoint -> (dist, point)
  const float r2 = cfg_.projection_radius_px * cfg_.projection_radius_px;
  // cell-bucketed keypoint index: querying a 3x3 cell neighborhood per
  // projection keeps this O(|loop points| x window) instead of
  // O(|loop points| x |keypoints|) — this runs on the mapping thread for
  // every surviving candidate
  const float cell = std::max(8.0f, cfg_.projection_radius_px);
  const int gw = static_cast<int>(kf->cam.max_x / cell) + 1;
  const int gh = static_cast<int>(kf->cam.max_y / cell) + 1;
  std::vector<std::vector<int>> grid(static_cast<size_t>(gw) * gh);
  for (size_t i = 0; i < kf->keypoints.size(); ++i) {
    const cv::Point2f& pt = kf->keypoints[i].pt;
    const int cx = std::min(gw - 1, std::max(0, static_cast<int>(pt.x / cell)));
    const int cy = std::min(gh - 1, std::max(0, static_cast<int>(pt.y / cell)));
    grid[static_cast<size_t>(cy) * gw + cx].push_back(static_cast<int>(i));
  }
  for (MapPoint* p : loop_points) {
    const Vec3 c = t1w_corr * p->pos;
    if (c[2] <= 1e-6f) continue;
    const cv::Point2f proj = kf->cam.Project(c);
    if (proj.x < 0 || proj.y < 0 || proj.x >= kf->cam.max_x ||
        proj.y >= kf->cam.max_y)
      continue;
    int best = -1, bd = kOrbDistLow + 1;
    const int pcx = static_cast<int>(proj.x / cell);
    const int pcy = static_cast<int>(proj.y / cell);
    for (int cy = std::max(0, pcy - 1); cy <= std::min(gh - 1, pcy + 1); ++cy)
      for (int cx = std::max(0, pcx - 1); cx <= std::min(gw - 1, pcx + 1);
           ++cx)
        for (int i : grid[static_cast<size_t>(cy) * gw + cx]) {
          const cv::Point2f d = kf->keypoints[i].pt - proj;
          if (d.x * d.x + d.y * d.y > r2) continue;
          const int dist = Hamming32(kf->descriptors.ptr<uint8_t>(i),
                                     p->descriptor.ptr<uint8_t>(0));
          if (dist < bd) {
            bd = dist;
            best = i;
          }
        }
    if (best < 0) continue;
    auto it = hit.find(best);
    if (it == hit.end() || bd < it->second.first) hit[best] = {bd, p};
  }
  if (dbg)
    std::printf("[loop sim3] guided hits=%zu (of %zu loop points)\n",
                hit.size(), loop_points.size());
  if (static_cast<int>(hit.size()) < cfg_.min_projection_matches) return false;

  // expanded correspondences: bidirectional where the current keypoint has
  // its own map point and the loop point is observed in cand; forward-only
  // otherwise
  std::vector<cv::Vec3d> ex1, ex2, x2f;
  std::vector<cv::Point2f> epx1, epx2, px1f;
  std::vector<std::pair<MapPoint*, MapPoint*>> ex_pairs;
  for (const auto& [kp_idx, dp] : hit) {
    MapPoint* p2 = dp.second;
    MapPoint* p1 = kf->points[kp_idx];
    const auto it2 = p2->obs.find(cand);
    if (p1 && !p1->bad && it2 != p2->obs.end()) {
      ex1.push_back(ToD(kf->tcw * p1->pos));
      ex2.push_back(ToD(cand->tcw * p2->pos));
      epx1.push_back(kf->keypoints[kp_idx].pt);
      epx2.push_back(cand->keypoints[it2->second].pt);
      ex_pairs.push_back({p1, p2});
    } else {
      x2f.push_back(ToD(cand->tcw * p2->pos));
      px1f.push_back(kf->keypoints[kp_idx].pt);
    }
  }
  const int n_refined = RefineSim3(&s12_refined, ex1, ex2, epx1, epx2, {},
                                   kf->cam, cand->cam, x2f, px1f);
  if (dbg)
    std::printf("[loop sim3] refined inliers=%d scale=%.4f\n", n_refined,
                s12_refined.s);
  if (n_refined < cfg_.min_sim3_inliers) return false;
  // a monocular loop's scale drift is a few percent; a refined estimate far
  // from 1 is a failed/degenerate solve (observed 0.54 on repetitive
  // texture), and applying it would warp the map worse than any drift
  if (std::abs(std::log(s12_refined.s)) > cfg_.max_abs_log_scale) return false;
  if (std::getenv("ROMAP_LOOP_FORCE_UNIT_SCALE")) s12_refined.s = 1.0;

  // pre-correction drift diagnostic: where the loop-side points land in the
  // current image under the DRIFTED pose vs where they were matched
  double drift = 0;
  int n_drift = 0;
  for (size_t k = 0; k < mps.size(); ++k) {
    if (!ransac.inliers[k]) continue;
    const Vec3 c = kf->tcw * mps[k].second->pos;
    if (c[2] <= 1e-6f) continue;
    const cv::Point2f proj = kf->cam.Project(c);
    drift += cv::norm(proj - px1[k]);
    ++n_drift;
  }
  out->drift_px = n_drift ? drift / n_drift : 0;
  out->s12 = s12_refined;
  out->inliers = n_refined;
  pairs->clear();
  for (size_t k = 0; k < mps.size(); ++k)
    if (ransac.inliers[k]) pairs->push_back(mps[k]);
  // guided matches that fit the final transform are merge pairs too (the
  // reference merges the SearchBySim3 set the same way, ref :506-520)
  std::set<MapPoint*, ById> already;
  for (const auto& [a, b] : *pairs) already.insert(a);
  for (size_t k = 0; k < ex_pairs.size(); ++k) {
    if (already.count(ex_pairs[k].first)) continue;
    const cv::Vec3d y = s12_refined * ex2[k];
    if (y[2] <= 1e-6) continue;
    const cv::Point2f proj = kf->cam.Project(ToF(y));
    const cv::Point2f d = proj - epx1[k];
    if (d.dot(d) <= 9.0f) pairs->push_back(ex_pairs[k]);
  }
  return true;
}

void LoopCloser::CorrectLoop(
    KeyFrame* kf, KeyFrame* cand, const Sim3& s12,
    const std::vector<std::pair<MapPoint*, MapPoint*>>& pairs) {
  // pre-correction pose snapshot — essential-graph edge measurements come
  // from the odometry AS TRACKED (the reference's NonCorrectedSim3 map)
  auto vertices = map_->KeyFrames();
  std::vector<Sim3> snapshot(vertices.size());
  std::map<KeyFrame*, int, ById> index;
  for (size_t v = 0; v < vertices.size(); ++v) {
    index[vertices[v]] = static_cast<int>(v);
    snapshot[v] = Sim3::FromSE3(vertices[v]->tcw);
  }

  // ---- 1. propagate the loop transform to the current covisible group
  // (ref src/LoopClosing.cc:438-504): the loop side's geometry is trusted,
  // the current side moves onto it. S1w_corr = S12 * S2w.
  const Sim3 s1w_corr = s12 * Sim3::FromSE3(cand->tcw);
  const SE3 t_w1 = kf->Twc();

  std::vector<KeyFrame*> group;
  group.push_back(kf);
  for (KeyFrame* nb : kf->Covisible(15)) group.push_back(nb);

  std::map<KeyFrame*, Sim3, ById> corrected, noncorrected;
  for (KeyFrame* g : group) {
    noncorrected[g] = Sim3::FromSE3(g->tcw);
    corrected[g] = Sim3::FromSE3(g->tcw * t_w1) * s1w_corr;
  }

  // move every map point observed by the group once, through its first
  // observer's correction (ref :461-480 mnCorrectedByKF bookkeeping)
  std::set<MapPoint*, ById> moved;
  for (KeyFrame* g : group) {
    const Sim3 transport = corrected[g].inverse() * noncorrected[g];
    for (MapPoint* p : g->points) {
      if (!p || p->bad || moved.count(p)) continue;
      p->pos = ToF(transport * ToD(p->pos));
      moved.insert(p);
    }
  }
  for (KeyFrame* g : group) g->tcw = corrected[g].ToSE3();

  // ---- 2. merge the Sim3 inlier pairs (loop side survives) and fuse the
  // loop neighborhood's points into the corrected group
  // (ref :506-520 + SearchAndFuse :587-614). Covisibility existing BEFORE
  // the fuse is recorded so the new group<->loop-side connections the fuse
  // creates can be told apart (they become loop edges below,
  // ref LoopConnections src/LoopClosing.cc:522-545).
  std::map<KeyFrame*, std::set<KeyFrame*, ById>, ById> pre_covis;
  for (KeyFrame* g : group) {
    auto& s = pre_covis[g];
    for (KeyFrame* nb : g->Covisible(cfg_.covis_edge_min_shared)) s.insert(nb);
  }
  const bool no_fuse = std::getenv("ROMAP_LOOP_NO_FUSE") != nullptr;
  if (!no_fuse)
    for (const auto& [p_cur, p_loop] : pairs)
      if (p_cur != p_loop && !p_cur->bad && !p_loop->bad)
        map_->MergePoints(p_loop, p_cur);

  std::set<MapPoint*, ById> loop_points;
  std::vector<KeyFrame*> loop_side;
  loop_side.push_back(cand);
  for (KeyFrame* nb : cand->Covisible(15)) loop_side.push_back(nb);
  for (KeyFrame* l : loop_side)
    for (MapPoint* p : l->points)
      if (p && !p->bad) loop_points.insert(p);
  std::vector<MapPoint*> loop_vec(loop_points.begin(), loop_points.end());
  if (!no_fuse)
    for (KeyFrame* g : group)
      FuseByProjection(g, loop_vec, cfg_.fuse_radius_px, map_);

  // ---- 3. essential-graph optimization over every keyframe. Vertex init:
  // the loop-propagated Sim3s (WITH scale — folding to SE3 before the graph
  // would desync the group's rescaled odometry from the pre-correction
  // measurements) for the group, the untouched poses elsewhere. Edge
  // measurements come from the pre-correction snapshot, so the boundary
  // edges between the moved group and the rest carry the loop discrepancy
  // and the optimizer spreads it around the cycle.
  std::vector<Sim3> init = snapshot;
  for (KeyFrame* g : group) {
    auto it = index.find(g);
    if (it != index.end()) init[it->second] = corrected[g];
  }
  std::vector<Sim3Edge> loop_edges;
  if (index.count(kf) && index.count(cand)) {
    Sim3Edge e;
    e.i = index[cand];
    e.j = index[kf];
    e.s_ji = init[e.j] * init[e.i].inverse();  // == s12 by construction
    e.weight = 4.0;  // the verified constraint out-pulls drifted odometry
    loop_edges.push_back(e);
  }
  // new group<->loop-side covisibility created by the fuse: loop edges too,
  // measured from the CORRECTED relatives (pre-correction odometry between
  // the two sides is exactly the drift being removed)
  std::set<KeyFrame*, ById> in_group(group.begin(), group.end());
  for (KeyFrame* g : group) {
    auto ig = index.find(g);
    if (ig == index.end()) continue;
    for (KeyFrame* nb : g->Covisible(cfg_.covis_edge_min_shared)) {
      if (in_group.count(nb) || pre_covis[g].count(nb)) continue;
      auto inb = index.find(nb);
      if (inb == index.end()) continue;
      Sim3Edge e;
      e.i = inb->second;
      e.j = ig->second;
      e.s_ji = init[e.j] * init[e.i].inverse();
      loop_edges.push_back(e);
    }
  }
  std::set<int> fixed;
  if (index.count(cand)) fixed.insert(index[cand]);
  OptimizeEssentialGraph(loop_edges, vertices, init, snapshot, fixed);

  // ---- 4. global BA (ref RunGlobalBundleAdjustment :645-749): the graph
  // made the map topologically consistent; reprojection BA over the merged
  // observations snaps the geometry. The loop keyframe plus one covisible
  // neighbor pin the monocular gauge (pose + scale).
  if (cfg_.run_global_ba) {
    std::set<KeyFrame*> ba_fixed{cand};
    auto nbs = cand->Covisible(15);
    if (!nbs.empty()) ba_fixed.insert(nbs.front());
    // two-phase (the reference's g2o GBA runs a robust kernel then drops
    // chi2 outliers the same way): phase 1 descends from the torn
    // post-graph state WITHOUT stripping — large residuals there are the
    // loop constraint itself, not wrong data; once converged (median
    // sub-pixel), anything still far out IS a wrong association (fuse
    // mismatch), so strip and polish
    const BAStats s1 =
        LocalBundleAdjust(map_->KeyFrames(), ba_fixed, cfg_.global_ba_iters,
                          /*huber_px=*/5.0f, /*strip_outliers=*/false);
    const BAStats s2 =
        LocalBundleAdjust(map_->KeyFrames(), ba_fixed,
                          cfg_.global_ba_iters,
                          /*huber_px=*/3.0f, /*strip_outliers=*/true);
    if (std::getenv("ROMAP_SLAM_DEBUG"))
      std::printf(
          "[loop gba] poses=%d pts=%d obs=%d rmse %.2f -> %.2f "
          "-> %.2f px (med %.2f p95 %.2f)\n",
          s1.n_poses, s1.n_points, s1.n_obs, s1.initial_rmse_px,
          s1.final_rmse_px, s2.final_rmse_px, s2.final_med_px,
          s2.final_p95_px);
  }
}

void LoopCloser::OptimizeEssentialGraph(const std::vector<Sim3Edge>& loop_edges,
                                        const std::vector<KeyFrame*>& vertices,
                                        const std::vector<Sim3>& init,
                                        const std::vector<Sim3>& meas,
                                        const std::set<int>& fixed) {
  const int V = static_cast<int>(vertices.size());
  if (V < 2) return;
  std::vector<Sim3> poses = init;

  // Edge set (ref Optimizer::OptimizeEssentialGraph): the sequential chain
  // (our spanning tree — keyframes are created along the trajectory) plus
  // strong covisibility edges, measured from the pre-correction pose set.
  std::vector<Sim3Edge> edges = loop_edges;
  for (int v = 1; v < V; ++v) {
    Sim3Edge e;
    e.i = v - 1;
    e.j = v;
    e.s_ji = meas[v] * meas[v - 1].inverse();
    edges.push_back(e);
  }
  std::map<KeyFrame*, int, ById> index;
  for (int v = 0; v < V; ++v) index[vertices[v]] = v;
  std::set<std::pair<int, int>> seen;
  for (const auto& e : loop_edges) {  // don't re-measure loop pairs from meas
    const auto key = std::minmax(e.i, e.j);
    seen.insert({key.first, key.second});
  }
  for (int v = 0; v < V; ++v) {
    auto covis = vertices[v]->Covisible(cfg_.covis_edge_min_shared);
    int added = 0;
    for (KeyFrame* nb : covis) {
      if (added >= cfg_.covis_edges_per_kf) break;
      auto it = index.find(nb);
      if (it == index.end()) continue;
      const int u = it->second;
      if (std::abs(u - v) <= 1) continue;  // chain already covers it
      const auto key = std::minmax(u, v);
      if (!seen.insert({key.first, key.second}).second) continue;
      Sim3Edge e;
      e.i = std::min(u, v);
      e.j = std::max(u, v);
      e.s_ji = meas[e.j] * meas[e.i].inverse();
      edges.push_back(e);
      ++added;
    }
  }

  OptimizeSim3Graph(&poses, edges, fixed, cfg_.pose_graph_iters);

  // transport every map point through its first observer's pose change,
  // then write the optimized poses back (ref :545-576)
  std::set<MapPoint*, ById> done;
  for (int v = 0; v < V; ++v) {
    const Sim3 transport = poses[v].inverse() * init[v];
    for (MapPoint* p : vertices[v]->points) {
      if (!p || p->bad || done.count(p)) continue;
      p->pos = ToF(transport * ToD(p->pos));
      done.insert(p);
    }
  }
  for (int v = 0; v < V; ++v) vertices[v]->tcw = poses[v].ToSE3();

  // object landmarks re-derive their shape from the (corrected) member
  // points; their bbox-history statistics are time-keyed and stay valid.
  // (The reference's loop closer predates its object layer and never runs,
  // so there is no reference behavior to match here.)
  for (ObjectMap* obj : map_->Objects()) obj->EstimateShape();
}

}  // namespace romap
