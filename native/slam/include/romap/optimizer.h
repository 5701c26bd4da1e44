// Local bundle adjustment: Gauss-Newton over keyframe poses + map-point
// positions with the point block eliminated by Schur complement — the
// rebuilt equivalent of the reference's g2o-based
// Optimizer::LocalBundleAdjustment (ref src/Optimizer.cc), ~an order of
// magnitude smaller because the problem is dense-small (a handful of poses).
#pragma once

#include <set>
#include <vector>

#include "romap/map.h"

namespace romap {

struct BAStats {
  int n_poses = 0, n_points = 0, n_obs = 0;
  float initial_rmse_px = 0, final_rmse_px = 0;
  float final_med_px = 0, final_p95_px = 0;  // robust residual percentiles
};

// Optimizes the poses of `kfs` (members of `fixed` stay put; at least one
// must be fixed to pin the gauge) and every well-observed point they see.
// Huber-robustified reprojection error; `iters` GN steps. `strip_outliers`
// removes >2x-huber observations afterwards (the windowed-BA default);
// callers starting from a far-from-converged state (loop-closure global BA)
// disable it — residuals that survive a partial descent are not wrong data
// associations there, and stripping them amputates the loop constraint.
BAStats LocalBundleAdjust(const std::vector<KeyFrame*>& kfs,
                          const std::set<KeyFrame*>& fixed, int iters = 5,
                          float huber_px = 3.0f, bool strip_outliers = true);

}  // namespace romap
