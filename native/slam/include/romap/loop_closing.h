// Loop closing: BoW place recognition with temporal-consistency gating,
// Sim(3) loop-transform estimation, map correction and essential-graph
// optimization — the rebuilt equivalent of the reference's LoopClosing
// thread (ref src/LoopClosing.cc:57-614: DetectLoop / ComputeSim3 /
// CorrectLoop) + Sim3Solver + Optimizer::OptimizeEssentialGraph.
//
// The reference ships this component but deliberately STARVES it (keyframe
// insertion into the loop queue is commented out, ref src/LocalMapping.cc:
// 100-101), so it never fires there. This rebuild makes it functional and
// opt-in: `TrackingConfig::enable_loop_closing` (default off = reference
// behavioral parity). Synchronous by design — the caller (the mapping step)
// already runs on its own thread, so a third thread buys nothing here.
#pragma once

#include <set>
#include <vector>

#include "romap/bow.h"
#include "romap/map.h"
#include "romap/sim3.h"

namespace romap {

struct LoopClosingConfig {
  // detection (ref src/LoopClosing.cc:103-228)
  int min_kfs_between_loops = 10;  // ref: mLastLoopKFid + 10 gate
  int min_gap_from_current = 10;   // candidate must be this many KFs old
  int consistency_needed = 3;      // ref mnCovisibilityConsistencyTh
  float relative_score_gate = 0.75f;  // keep candidates >= gate * best
  int max_candidates = 8;
  // Sim3 verification (ref src/LoopClosing.cc:231-400)
  int min_bow_matches = 20;
  int min_sim3_inliers = 20;
  int ransac_iters = 300;
  float ransac_px = 4.0f;
  // second verification stage (ref src/LoopClosing.cc:343-399): project the
  // loop neighborhood's map points through the Sim3-corrected pose into the
  // current keyframe and count descriptor agreements — a marginal RANSAC
  // consensus on a locally-degenerate point set dies here
  int min_projection_matches = 40;
  float projection_radius_px = 8.0f;
  // reject refined Sim3s whose |log scale| exceeds this — monocular scale
  // drift over one loop is a few percent, a far-from-1 scale is a failed
  // estimate whose application would warp the map worse than the drift
  float max_abs_log_scale = 0.35f;
  // correction (ref src/LoopClosing.cc:402-585, src/Optimizer.cc
  // OptimizeEssentialGraph)
  int covis_edge_min_shared = 30;  // essential-graph covisibility edges
  int covis_edges_per_kf = 10;
  int pose_graph_iters = 10;
  float fuse_radius_px = 4.0f;
  // full-map BA after the essential graph (the reference's
  // RunGlobalBundleAdjustment, ref src/LoopClosing.cc:645-749) — the pose
  // graph closes the loop topologically; BA then snaps points + poses onto
  // the merged observations
  bool run_global_ba = true;
  int global_ba_iters = 40;
};

class LoopCloser {
 public:
  LoopCloser(Map* map, const KeyFrameDatabase* kfdb,
             const LoopClosingConfig& cfg = {})
      : map_(map), kfdb_(kfdb), cfg_(cfg) {}

  struct Result {
    bool corrected = false;
    KeyFrame* matched = nullptr;  // the loop keyframe (old side)
    Sim3 s12;                     // current-cam <- loop-cam similarity
    int inliers = 0;
    double drift_px = 0;  // pre-correction reproj. error of loop points
  };

  // Run detection (+ correction when a loop verifies) for a freshly mapped
  // keyframe. Call under the map lock — correction rewrites keyframe poses
  // and map-point positions in place.
  Result Process(KeyFrame* kf);

  // Sim(3) essential-graph relaxation + map-point transport, exposed for
  // direct use/testing. `loop_edges` are extra constraints beyond the
  // sequential chain + covisibility edges derived from the map. `init` is
  // the per-vertex starting estimate (the loop-propagated Sim3s, WITH their
  // scale, for the corrected group); `meas` is the pose set edge
  // measurements are computed from (the PRE-correction odometry — the
  // reference's NonCorrectedSim3, ref src/Optimizer.cc
  // OptimizeEssentialGraph). Points transport through init -> optimized.
  void OptimizeEssentialGraph(const std::vector<Sim3Edge>& loop_edges,
                              const std::vector<KeyFrame*>& vertices,
                              const std::vector<Sim3>& init,
                              const std::vector<Sim3>& meas,
                              const std::set<int>& fixed);

  long last_loop_kf_id() const { return last_loop_kf_id_; }

 private:
  struct Candidate {
    KeyFrame* kf;
    float score;
  };
  std::vector<Candidate> DetectCandidates(KeyFrame* kf);
  bool ComputeSim3(KeyFrame* kf, KeyFrame* cand, Result* out,
                   std::vector<std::pair<MapPoint*, MapPoint*>>* pairs);
  void CorrectLoop(KeyFrame* kf, KeyFrame* cand, const Sim3& s12,
                   const std::vector<std::pair<MapPoint*, MapPoint*>>& pairs);

  Map* map_;
  const KeyFrameDatabase* kfdb_;
  LoopClosingConfig cfg_;

  // temporal consistency state (ref mvConsistentGroups)
  struct Group {
    std::set<KeyFrame*, ById> kfs;
    int count = 0;
  };
  std::vector<Group> prev_groups_;
  long last_loop_kf_id_ = -1000000;
};

}  // namespace romap
