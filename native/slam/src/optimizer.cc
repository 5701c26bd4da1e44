#include <algorithm>
#include "romap/optimizer.h"

#include <cmath>
#include <map>

#include <opencv2/core.hpp>

namespace romap {

namespace {

Mat3 Skew(const Vec3& v) {
  return Mat3(0, -v[2], v[1], v[2], 0, -v[0], -v[1], v[0], 0);
}

// Rodrigues for a small rotation vector.
Mat3 ExpSO3(const Vec3& w) {
  float th = std::sqrt(w.dot(w));
  Mat3 wx = Skew(w);
  if (th < 1e-8f) return Mat3::eye() + wx;
  return Mat3::eye() + wx * (std::sin(th) / th) +
         (wx * wx) * ((1 - std::cos(th)) / (th * th));
}

}  // namespace

BAStats LocalBundleAdjust(const std::vector<KeyFrame*>& kfs,
                          const std::set<KeyFrame*>& fixed, int iters,
                          float huber_px, bool strip_outliers) {
  BAStats stats;
  // variable pose index per keyframe (-1 = fixed)
  std::map<KeyFrame*, int> pose_idx;
  std::vector<KeyFrame*> var_kfs;
  for (KeyFrame* kf : kfs) {
    if (fixed.count(kf)) {
      pose_idx[kf] = -1;
    } else {
      pose_idx[kf] = static_cast<int>(var_kfs.size());
      var_kfs.push_back(kf);
    }
  }
  if (var_kfs.empty()) return stats;

  // collect points with >= 2 observations among the given keyframes
  std::map<MapPoint*, int> point_idx;
  std::vector<MapPoint*> pts;
  for (KeyFrame* kf : kfs) {
    for (MapPoint* p : kf->points) {
      if (!p || p->bad || point_idx.count(p)) continue;
      int n_in = 0;
      for (const auto& kv : p->obs)
        if (pose_idx.count(kv.first)) ++n_in;
      if (n_in >= 2) {
        point_idx[p] = static_cast<int>(pts.size());
        pts.push_back(p);
      }
    }
  }
  if (pts.empty()) return stats;
  stats.n_poses = static_cast<int>(var_kfs.size());
  stats.n_points = static_cast<int>(pts.size());

  const int np = static_cast<int>(var_kfs.size()) * 6;

  auto compute_rmse = [&]() {
    double se = 0;
    int n = 0;
    for (MapPoint* p : pts) {
      for (const auto& [kf, idx] : p->obs) {
        if (!pose_idx.count(kf)) continue;
        cv::Point2f r = kf->cam.Project(kf->tcw * p->pos) -
                        kf->keypoints[idx].pt;
        se += r.dot(r);
        ++n;
      }
    }
    return n ? static_cast<float>(std::sqrt(se / n)) : 0.0f;
  };
  stats.initial_rmse_px = compute_rmse();
  stats.n_obs = 0;

  // robust (Huber-rho) total cost — Levenberg-Marquardt step control needs
  // the actual objective, not the linearized one
  auto compute_chi2 = [&]() {
    double chi2 = 0;
    // Behind-camera cost is mode-dependent. In no-strip mode (loop-closure
    // global BA) it must exceed any plausible Huber cost: a torn-map
    // residual of e px costs ~2*huber*e, so a cheap constant is undercut
    // once e is large, and an LM step that shoves those points behind
    // their cameras would be "accepted" while the linearization (which
    // skips z<0.05) can never pull them back — silently amputating exactly
    // the loop-constraint residuals no-strip mode exists to preserve. In
    // strip mode (the windowed-BA polish) behind-camera observations are
    // wrong associations about to be stripped; a prohibitive wall there
    // only vetoes steps that fix everything else.
    const double behind_cost = strip_outliers
                                   ? 4.0 * huber_px * huber_px
                                   : huber_px * (2.0 * 20000.0 - huber_px);
    for (MapPoint* p : pts) {
      for (const auto& [kf, idx] : p->obs) {
        if (!pose_idx.count(kf)) continue;
        Vec3 pc = kf->tcw * p->pos;
        if (pc[2] < 0.05f) {
          chi2 += behind_cost;
          continue;
        }
        cv::Point2f r = kf->cam.Project(pc) - kf->keypoints[idx].pt;
        double e = std::sqrt(static_cast<double>(r.dot(r)));
        chi2 += e <= huber_px ? e * e : huber_px * (2 * e - huber_px);
      }
    }
    return chi2;
  };

  double lambda = 1e-5;
  double chi2 = compute_chi2();
  for (int it = 0; it < iters; ++it) {
    cv::Mat hcc = cv::Mat::zeros(np, np, CV_64F);
    cv::Mat bc = cv::Mat::zeros(np, 1, CV_64F);
    // per-point accumulators
    std::vector<cv::Matx33d> hpp(pts.size(), cv::Matx33d::zeros());
    std::vector<cv::Vec3d> bp(pts.size(), cv::Vec3d(0, 0, 0));
    // off-diagonal blocks Hcp: (pose var, point) -> 6x3
    std::map<std::pair<int, int>, cv::Matx<double, 6, 3>> hcp;

    int n_obs = 0;
    for (size_t pi = 0; pi < pts.size(); ++pi) {
      MapPoint* p = pts[pi];
      for (const auto& [kf, idx] : p->obs) {
        auto itp = pose_idx.find(kf);
        if (itp == pose_idx.end()) continue;
        int ci = itp->second;
        Vec3 pc = kf->tcw * p->pos;
        if (pc[2] < 0.05f) continue;
        cv::Point2f proj = kf->cam.Project(pc);
        cv::Point2f res = proj - kf->keypoints[idx].pt;
        double err = std::sqrt(static_cast<double>(res.dot(res)));
        double w = 1.0;  // Huber weight
        if (err > huber_px) w = huber_px / err;
        ++n_obs;

        // J wrt camera point
        double z_inv = 1.0 / pc[2];
        double fx = kf->cam.fx, fy = kf->cam.fy;
        cv::Matx23d jp(fx * z_inv, 0, -fx * pc[0] * z_inv * z_inv, 0,
                       fy * z_inv, -fy * pc[1] * z_inv * z_inv);
        // pose: left perturbation  pc' = exp(w^) pc + dt
        cv::Matx33d neg_skew(0, pc[2], -pc[1], -pc[2], 0, pc[0], pc[1],
                             -pc[0], 0);
        cv::Matx<double, 2, 6> jc;
        if (ci >= 0) {
          cv::Matx23d jw = jp * neg_skew;
          for (int r = 0; r < 2; ++r) {
            for (int c = 0; c < 3; ++c) {
              jc(r, c) = jw(r, c);          // omega
              jc(r, c + 3) = jp(r, c);       // translation
            }
          }
        }
        // point: dpc/dp_world = Rcw
        cv::Matx33d rcw;
        for (int r = 0; r < 3; ++r)
          for (int c = 0; c < 3; ++c) rcw(r, c) = kf->tcw.R(r, c);
        cv::Matx23d jl = jp * rcw;

        cv::Vec2d r2(res.x, res.y);
        // accumulate
        hpp[pi] += (jl.t() * jl) * w;
        bp[pi] += (jl.t() * r2) * w;
        if (ci >= 0) {
          cv::Matx<double, 6, 6> jcc = (jc.t() * jc) * w;
          cv::Matx<double, 6, 1> jcr = (jc.t() * r2) * w;
          for (int r = 0; r < 6; ++r) {
            bc.at<double>(ci * 6 + r) += jcr(r, 0);
            for (int c = 0; c < 6; ++c)
              hcc.at<double>(ci * 6 + r, ci * 6 + c) += jcc(r, c);
          }
          hcp[{ci, static_cast<int>(pi)}] += (jc.t() * jl) * w;
        }
      }
    }
    stats.n_obs = n_obs;

    // LM damping on the point blocks (the pose blocks get theirs below,
    // after the Schur complement is formed from these damped inverses)
    cv::Mat s = hcc.clone();
    cv::Mat rhs = bc.clone();
    std::vector<cv::Matx33d> hpp_inv(pts.size());
    for (size_t pi = 0; pi < pts.size(); ++pi) {
      cv::Matx33d h = hpp[pi];
      for (int d = 0; d < 3; ++d) h(d, d) = h(d, d) * (1.0 + lambda) + 1e-6;
      hpp_inv[pi] = h.inv();
    }
    // group hcp by point for the cross terms
    std::map<int, std::vector<std::pair<int, const cv::Matx<double, 6, 3>*>>>
        by_point;
    for (const auto& kv : hcp)
      by_point[kv.first.second].emplace_back(kv.first.first, &kv.second);
    for (const auto& [pi, blocks] : by_point) {
      const cv::Matx33d& hinv = hpp_inv[pi];
      cv::Vec3d hb = hinv * bp[pi];
      for (const auto& [ci, blk] : blocks) {
        // rhs -= Hcp Hpp^-1 bp
        cv::Matx<double, 6, 1> d = (*blk) * hb;
        for (int r = 0; r < 6; ++r) rhs.at<double>(ci * 6 + r) -= d(r, 0);
        for (const auto& [cj, blk2] : blocks) {
          cv::Matx<double, 6, 6> m = (*blk) * hinv * blk2->t();
          for (int r = 0; r < 6; ++r)
            for (int c = 0; c < 6; ++c)
              s.at<double>(ci * 6 + r, cj * 6 + c) -= m(r, c);
        }
      }
    }
    // LM damping on the pose blocks
    for (int d = 0; d < np; ++d)
      s.at<double>(d, d) = s.at<double>(d, d) * (1.0 + lambda) + 1e-8;

    cv::Mat dx;
    if (!cv::solve(s, -rhs, dx, cv::DECOMP_CHOLESKY)) {
      lambda *= 10.0;
      if (lambda > 1e4) break;
      continue;
    }

    // snapshot so a cost-increasing step can be rejected (LM)
    std::vector<SE3> pose_backup(var_kfs.size());
    for (size_t k = 0; k < var_kfs.size(); ++k) pose_backup[k] = var_kfs[k]->tcw;
    std::vector<Vec3> point_backup(pts.size());
    for (size_t pi = 0; pi < pts.size(); ++pi) point_backup[pi] = pts[pi]->pos;

    // update poses
    for (size_t k = 0; k < var_kfs.size(); ++k) {
      Vec3 w(static_cast<float>(dx.at<double>(k * 6 + 0)),
             static_cast<float>(dx.at<double>(k * 6 + 1)),
             static_cast<float>(dx.at<double>(k * 6 + 2)));
      Vec3 dt(static_cast<float>(dx.at<double>(k * 6 + 3)),
              static_cast<float>(dx.at<double>(k * 6 + 4)),
              static_cast<float>(dx.at<double>(k * 6 + 5)));
      SE3& tcw = var_kfs[k]->tcw;
      Mat3 dr = ExpSO3(w);
      tcw.R = dr * tcw.R;
      tcw.t = dr * tcw.t + dt;
    }
    // back-substitute points: dp = Hpp^-1 (-bp - Hpc dxc)
    for (const auto& [pi, blocks] : by_point) {
      cv::Vec3d acc = -bp[pi];
      for (const auto& [ci, blk] : blocks) {
        cv::Matx<double, 6, 1> dxc;
        for (int r = 0; r < 6; ++r) dxc(r, 0) = dx.at<double>(ci * 6 + r);
        acc -= blk->t() * dxc;
      }
      cv::Vec3d dp = hpp_inv[pi] * acc;
      pts[pi]->pos += Vec3(static_cast<float>(dp[0]), static_cast<float>(dp[1]),
                           static_cast<float>(dp[2]));
    }
    // points observed ONLY by fixed poses still get their pure-point update
    for (size_t pi = 0; pi < pts.size(); ++pi) {
      if (by_point.count(static_cast<int>(pi))) continue;
      cv::Vec3d dp = hpp_inv[pi] * (-bp[pi]);
      pts[pi]->pos += Vec3(static_cast<float>(dp[0]), static_cast<float>(dp[1]),
                           static_cast<float>(dp[2]));
    }

    // LM accept/reject on the robust objective
    const double new_chi2 = compute_chi2();
    if (new_chi2 > chi2) {
      for (size_t k = 0; k < var_kfs.size(); ++k)
        var_kfs[k]->tcw = pose_backup[k];
      for (size_t pi = 0; pi < pts.size(); ++pi)
        pts[pi]->pos = point_backup[pi];
      lambda *= 10.0;
      if (lambda > 1e4) break;
    } else {
      const bool converged = chi2 - new_chi2 < 1e-9 * std::max(1.0, chi2);
      chi2 = new_chi2;
      lambda = std::max(lambda * 0.5, 1e-7);
      if (converged) break;
    }
  }

  // strip gross-outlier observations (wrong data associations drag the
  // window; the reference removes chi2 outliers after LocalBA the same way)
  int stripped = 0;
  for (MapPoint* p : pts) {
    if (!strip_outliers) break;
    for (auto it = p->obs.begin(); it != p->obs.end();) {
      KeyFrame* kf = it->first;
      if (!pose_idx.count(kf)) {
        ++it;
        continue;
      }
      Vec3 pc = kf->tcw * p->pos;
      bool bad = pc[2] < 0.05f;
      if (!bad) {
        cv::Point2f r = kf->cam.Project(pc) - kf->keypoints[it->second].pt;
        bad = r.dot(r) > (2 * huber_px) * (2 * huber_px);
      }
      if (bad) {
        kf->points[it->second] = nullptr;
        it = p->obs.erase(it);
        ++stripped;
      } else {
        ++it;
      }
    }
    if (p->obs.size() < 2) p->bad = true;
  }
  (void)stripped;

  stats.final_rmse_px = compute_rmse();
  {
    std::vector<float> errs;
    for (MapPoint* p : pts)
      for (const auto& [kf, idx] : p->obs) {
        if (!pose_idx.count(kf)) continue;
        cv::Point2f r =
            kf->cam.Project(kf->tcw * p->pos) - kf->keypoints[idx].pt;
        errs.push_back(std::sqrt(r.dot(r)));
      }
    if (!errs.empty()) {
      auto mid = errs.begin() + errs.size() / 2;
      std::nth_element(errs.begin(), mid, errs.end());
      stats.final_med_px = *mid;
      auto p95 = errs.begin() + static_cast<size_t>(errs.size() * 0.95);
      std::nth_element(errs.begin(), p95, errs.end());
      stats.final_p95_px = *p95;
    }
  }
  return stats;
}

}  // namespace romap
