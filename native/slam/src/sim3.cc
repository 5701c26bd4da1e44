#include "romap/sim3.h"

#include <algorithm>
#include <cmath>
#include <limits>
#include <random>

namespace romap {

namespace {

cv::Matx33d Skew(const cv::Vec3d& w) {
  return {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
}

cv::Matx33d ExpSO3(const cv::Vec3d& w) {
  const double th2 = w.dot(w);
  const double th = std::sqrt(th2);
  const cv::Matx33d W = Skew(w);
  if (th < 1e-9) return cv::Matx33d::eye() + W + 0.5 * (W * W);
  return cv::Matx33d::eye() + (std::sin(th) / th) * W +
         ((1.0 - std::cos(th)) / th2) * (W * W);
}

cv::Vec3d LogSO3(const cv::Matx33d& R) {
  const double tr = R(0, 0) + R(1, 1) + R(2, 2);
  const double c = std::max(-1.0, std::min(1.0, (tr - 1.0) * 0.5));
  const double th = std::acos(c);
  const cv::Vec3d v(R(2, 1) - R(1, 2), R(0, 2) - R(2, 0), R(1, 0) - R(0, 1));
  if (th < 1e-9) return 0.5 * v;
  if (th > M_PI - 1e-6) {
    // near pi the skew part vanishes; recover the axis from R+I ~ 2*a*a^T
    const cv::Matx33d A = 0.5 * (R + cv::Matx33d::eye());
    int i = 0;
    if (A(1, 1) > A(0, 0)) i = 1;
    if (A(2, 2) > A(i, i)) i = 2;
    cv::Vec3d axis(A(0, i), A(1, i), A(2, i));
    axis /= std::sqrt(std::max(A(i, i), 1e-12));
    const double n = cv::norm(axis);
    if (n > 1e-12) axis /= n;
    if (axis.dot(v) < 0) axis = -axis;
    return th * axis;
  }
  return (th / (2.0 * std::sin(th))) * v;
}

// W = sum_{n>=0} A^n / (n+1)!  with A = lambda*I + [w]x — the matrix mapping
// the tangent translation u to the group translation t (t = W u). The series
// converges fast for |w| <= pi and realistic log-scales; the closed form has
// several removable singularities this avoids.
cv::Matx33d Sim3W(double lambda, const cv::Vec3d& w) {
  const cv::Matx33d A = lambda * cv::Matx33d::eye() + Skew(w);
  cv::Matx33d term = cv::Matx33d::eye();  // A^0 / 1!
  cv::Matx33d W = term;
  for (int n = 1; n <= 40; ++n) {
    term = term * A * (1.0 / (n + 1));
    W += term;
    double mag = 0;
    for (int k = 0; k < 9; ++k) mag = std::max(mag, std::abs(term.val[k]));
    if (mag < 1e-17) break;
  }
  return W;
}

}  // namespace

Sim3 Sim3Exp(const Sim3Tangent& v) {
  const cv::Vec3d u(v[0], v[1], v[2]);
  const cv::Vec3d w(v[3], v[4], v[5]);
  const double lambda = v[6];
  Sim3 out;
  out.s = std::exp(lambda);
  out.R = ExpSO3(w);
  out.t = Sim3W(lambda, w) * u;
  return out;
}

Sim3Tangent Sim3Log(const Sim3& S) {
  const cv::Vec3d w = LogSO3(S.R);
  const double lambda = std::log(S.s);
  cv::Vec3d u;
  cv::solve(cv::Mat(Sim3W(lambda, w)), cv::Mat(S.t), u, cv::DECOMP_LU);
  return {u[0], u[1], u[2], w[0], w[1], w[2], lambda};
}

bool SolveSim3(const std::vector<cv::Vec3d>& src,
               const std::vector<cv::Vec3d>& dst, Sim3* out) {
  const size_t n = src.size();
  if (n < 3 || dst.size() != n) return false;
  cv::Vec3d cs(0, 0, 0), cd(0, 0, 0);
  for (size_t i = 0; i < n; ++i) {
    cs += src[i];
    cd += dst[i];
  }
  cs *= 1.0 / n;
  cd *= 1.0 / n;

  cv::Matx33d sigma = cv::Matx33d::zeros();
  double var_src = 0;
  for (size_t i = 0; i < n; ++i) {
    const cv::Vec3d qs = src[i] - cs, qd = dst[i] - cd;
    sigma += qd * qs.t();
    var_src += qs.dot(qs);
  }
  sigma *= 1.0 / n;
  var_src /= n;
  if (var_src < 1e-12) return false;

  cv::Mat u, d, vt;
  cv::SVD::compute(cv::Mat(sigma), d, u, vt, cv::SVD::FULL_UV);
  cv::Matx33d U(u.ptr<double>()), Vt(vt.ptr<double>());
  cv::Vec3d D(d.ptr<double>());
  cv::Matx33d Sfix = cv::Matx33d::eye();
  if (cv::determinant(cv::Mat(U)) * cv::determinant(cv::Mat(Vt)) < 0) {
    Sfix(2, 2) = -1;
    D[2] = -D[2];
  }
  Sim3 result;
  result.R = U * Sfix * Vt;
  result.s = (D[0] + D[1] + D[2]) / var_src;
  if (!(result.s > 1e-9)) return false;
  result.t = cd - result.s * (result.R * cs);
  *out = result;
  return true;
}

Sim3RansacResult SolveSim3Ransac(const std::vector<cv::Vec3d>& x1,
                                 const std::vector<cv::Vec3d>& x2,
                                 const std::vector<cv::Point2f>& px1,
                                 const std::vector<cv::Point2f>& px2,
                                 const CameraModel& cam1,
                                 const CameraModel& cam2, int iters,
                                 float px_thresh, uint32_t seed) {
  Sim3RansacResult best;
  const size_t n = x1.size();
  best.inliers.assign(n, 0);
  if (n < 3) return best;

  const double th2 = static_cast<double>(px_thresh) * px_thresh;
  auto count_inliers = [&](const Sim3& s12, std::vector<char>* mask) {
    const Sim3 s21 = s12.inverse();
    int count = 0;
    for (size_t k = 0; k < n; ++k) {
      (*mask)[k] = 0;
      const cv::Vec3d a = s12 * x2[k];  // candidate in camera-1 frame
      const cv::Vec3d b = s21 * x1[k];  // and back in camera-2
      if (a[2] <= 1e-6 || b[2] <= 1e-6) continue;
      const cv::Point2f p1 = cam1.Project(
          Vec3(static_cast<float>(a[0]), static_cast<float>(a[1]),
               static_cast<float>(a[2])));
      const cv::Point2f p2 = cam2.Project(
          Vec3(static_cast<float>(b[0]), static_cast<float>(b[1]),
               static_cast<float>(b[2])));
      const double e1 = (p1.x - px1[k].x) * (p1.x - px1[k].x) +
                        (p1.y - px1[k].y) * (p1.y - px1[k].y);
      const double e2 = (p2.x - px2[k].x) * (p2.x - px2[k].x) +
                        (p2.y - px2[k].y) * (p2.y - px2[k].y);
      if (e1 < th2 && e2 < th2) {
        (*mask)[k] = 1;
        ++count;
      }
    }
    return count;
  };

  std::mt19937 rng(seed);
  std::uniform_int_distribution<size_t> pick(0, n - 1);
  std::vector<char> mask(n, 0);
  std::vector<cv::Vec3d> s_src(3), s_dst(3);
  for (int it = 0; it < iters; ++it) {
    size_t a = pick(rng), b = pick(rng), c = pick(rng);
    if (a == b || a == c || b == c) continue;
    s_src = {x2[a], x2[b], x2[c]};
    s_dst = {x1[a], x1[b], x1[c]};
    Sim3 cand;
    if (!SolveSim3(s_src, s_dst, &cand)) continue;
    const int count = count_inliers(cand, &mask);
    if (count > best.n_inliers) {
      best.n_inliers = count;
      best.s12 = cand;
      best.inliers = mask;
    }
  }
  if (best.n_inliers < 3) return best;

  // refine on the consensus set, then recount
  std::vector<cv::Vec3d> in_src, in_dst;
  for (size_t k = 0; k < n; ++k) {
    if (!best.inliers[k]) continue;
    in_src.push_back(x2[k]);
    in_dst.push_back(x1[k]);
  }
  Sim3 refined;
  if (SolveSim3(in_src, in_dst, &refined)) {
    const int count = count_inliers(refined, &mask);
    if (count >= best.n_inliers) {
      best.s12 = refined;
      best.n_inliers = count;
      best.inliers = mask;
    }
  }
  return best;
}

double OptimizeSim3Graph(std::vector<Sim3>* poses,
                         const std::vector<Sim3Edge>& edges,
                         const std::set<int>& fixed, int iters) {
  std::vector<Sim3>& S = *poses;
  const int V = static_cast<int>(S.size());
  const int dim = 7 * V;
  if (V == 0 || edges.empty()) return 0.0;

  auto residual = [&](const Sim3Edge& e) {
    return Sim3Log(e.s_ji * S[e.i] * S[e.j].inverse());
  };
  auto total_chi2 = [&]() {
    double c = 0;
    for (const auto& e : edges) {
      const Sim3Tangent r = residual(e);
      c += e.weight * r.dot(r);
    }
    return c;
  };

  const double fd_eps = 1e-6;
  double chi2 = total_chi2();
  for (int it = 0; it < iters; ++it) {
    cv::Mat H = cv::Mat::zeros(dim, dim, CV_64F);
    cv::Mat g = cv::Mat::zeros(dim, 1, CV_64F);
    for (const auto& e : edges) {
      const Sim3Tangent r0 = residual(e);
      // numeric Jacobian wrt left-multiplicative perturbations of both
      // endpoint poses: S_v <- Exp(delta) * S_v
      cv::Matx<double, 7, 14> J;
      for (int side = 0; side < 2; ++side) {
        const int v = side == 0 ? e.i : e.j;
        const Sim3 saved = S[v];
        for (int k = 0; k < 7; ++k) {
          Sim3Tangent d;
          d[k] = fd_eps;
          S[v] = Sim3Exp(d) * saved;
          const Sim3Tangent rp = residual(e);
          S[v] = saved;
          for (int r = 0; r < 7; ++r)
            J(r, 7 * side + k) = (rp[r] - r0[r]) / fd_eps;
        }
      }
      // accumulate into the two 7x7 diagonal blocks + off-diagonals
      const int base[2] = {7 * e.i, 7 * e.j};
      for (int sa = 0; sa < 2; ++sa) {
        for (int sb = 0; sb < 2; ++sb) {
          for (int a = 0; a < 7; ++a)
            for (int b = 0; b < 7; ++b) {
              double h = 0;
              for (int r = 0; r < 7; ++r)
                h += J(r, 7 * sa + a) * J(r, 7 * sb + b);
              H.at<double>(base[sa] + a, base[sb] + b) += e.weight * h;
            }
        }
        for (int a = 0; a < 7; ++a) {
          double gv = 0;
          for (int r = 0; r < 7; ++r) gv += J(r, 7 * sa + a) * r0[r];
          g.at<double>(base[sa] + a) += e.weight * gv;
        }
      }
    }
    // pin fixed vertices (gauge + scale) and add light LM damping
    for (int v : fixed) {
      for (int k = 0; k < 7; ++k) {
        const int idx = 7 * v + k;
        H.row(idx).setTo(0);
        H.col(idx).setTo(0);
        H.at<double>(idx, idx) = 1.0;
        g.at<double>(idx) = 0;
      }
    }
    for (int d = 0; d < dim; ++d) H.at<double>(d, d) += 1e-8;

    cv::Mat delta;
    if (!cv::solve(H, -g, delta, cv::DECOMP_CHOLESKY)) break;
    std::vector<Sim3> backup = S;
    for (int v = 0; v < V; ++v) {
      if (fixed.count(v)) continue;
      Sim3Tangent d;
      for (int k = 0; k < 7; ++k) d[k] = delta.at<double>(7 * v + k);
      S[v] = Sim3Exp(d) * S[v];
    }
    const double new_chi2 = total_chi2();
    if (new_chi2 > chi2) {  // diverged — keep the previous estimate and stop
      S = backup;
      break;
    }
    const bool converged = chi2 - new_chi2 < 1e-12 * std::max(1.0, chi2);
    chi2 = new_chi2;
    if (converged) break;
  }
  return chi2;
}

int RefineSim3(Sim3* s12, const std::vector<cv::Vec3d>& x1,
               const std::vector<cv::Vec3d>& x2,
               const std::vector<cv::Point2f>& px1,
               const std::vector<cv::Point2f>& px2,
               const std::vector<char>& use, const CameraModel& cam1,
               const CameraModel& cam2, const std::vector<cv::Vec3d>& x2f,
               const std::vector<cv::Point2f>& px1f, int iters,
               float huber_px) {
  Sim3 S = *s12;
  const double hub = huber_px;

  // drop correspondences without positive depth on both sides at the
  // initial estimate; during optimization a step that pushes a survivor
  // behind a camera makes the cost infinite (step rejected). Without the
  // wall the objective has a gradient-free escape valley: scale -> inf
  // saturates every reverse residual while the forward projection
  // degenerates to a rotation-only fit (observed: a 1.27-scale loop
  // "refined" to 5.9e12).
  const Sim3 S21_0 = S.inverse();
  std::vector<cv::Vec3d> bx1, bx2, fx2_v;
  std::vector<cv::Point2f> bpx1, bpx2, fpx1_v;
  for (size_t k = 0; k < x1.size(); ++k) {
    if (!use.empty() && !use[k]) continue;
    if ((S * x2[k])[2] < 1e-3 || (S21_0 * x1[k])[2] < 1e-3) continue;
    bx1.push_back(x1[k]);
    bx2.push_back(x2[k]);
    bpx1.push_back(px1[k]);
    bpx2.push_back(px2[k]);
  }
  for (size_t k = 0; k < x2f.size(); ++k) {
    if ((S * x2f[k])[2] < 1e-3) continue;
    fx2_v.push_back(x2f[k]);
    fpx1_v.push_back(px1f[k]);
  }
  if (bx1.empty() && fx2_v.empty()) return 0;

  // one residual block: point y = T(x), observed at `obs` through `cam`.
  // jx = d(T(x))/d(delta) columns [omega | nu | sigma]; accumulates the
  // Huber-weighted normal equations and returns the robust cost.
  auto accumulate = [&](const cv::Vec3d& y, const cv::Point2f& obs,
                        const CameraModel& cam, const cv::Matx33d& jw,
                        const cv::Matx33d& jn, const cv::Vec3d& js,
                        cv::Matx<double, 7, 7>* H, cv::Vec<double, 7>* g,
                        double* chi2, int* n_in) {
    if (y[2] < 1e-4) {
      *chi2 = std::numeric_limits<double>::infinity();
      return;
    }
    const double zi = 1.0 / y[2];
    const cv::Matx23d jp(cam.fx * zi, 0, -cam.fx * y[0] * zi * zi, 0,
                         cam.fy * zi, -cam.fy * y[1] * zi * zi);
    const cv::Vec2d r(cam.fx * y[0] * zi + cam.cx - obs.x,
                      cam.fy * y[1] * zi + cam.cy - obs.y);
    const double e = cv::norm(r);
    const double w = e <= hub ? 1.0 : hub / e;
    *chi2 += e <= hub ? e * e : hub * (2 * e - hub);
    if (n_in && e <= hub) ++(*n_in);
    cv::Matx<double, 2, 7> J;
    const cv::Matx23d jrw = jp * jw, jrn = jp * jn;
    const cv::Vec2d jrs = jp * js;
    for (int rr = 0; rr < 2; ++rr) {
      for (int c = 0; c < 3; ++c) {
        J(rr, c) = jrw(rr, c);
        J(rr, c + 3) = jrn(rr, c);
      }
      J(rr, 6) = jrs[rr];
    }
    *H += (J.t() * J) * w;
    *g += (J.t() * r) * w;
  };

  // robust cost + normal equations at a candidate transform.
  // forward: y = Exp(delta) * St * x2 -> cam1 vs px1
  //   d y/d omega = -[y]x, /d nu = I, /d sigma = y      (left perturbation)
  // reverse: z = St21 * Exp(-delta) * x1 -> cam2 vs px2
  //   d z/d omega = s21*R21*[x1]x, /d nu = -s21*R21, /d sigma = -s21*R21*x1
  auto build = [&](const Sim3& St, cv::Matx<double, 7, 7>* H,
                   cv::Vec<double, 7>* g, int* n_in) {
    double cur = 0;
    const Sim3 St21 = St.inverse();
    const cv::Matx33d mR21 = St21.s * St21.R;
    for (size_t k = 0; k < bx1.size() && std::isfinite(cur); ++k) {
      const cv::Vec3d y = St * bx2[k];
      accumulate(y, bpx1[k], cam1, -Skew(y), cv::Matx33d::eye(), y, H, g,
                 &cur, n_in);
      const cv::Vec3d z = St21 * bx1[k];
      accumulate(z, bpx2[k], cam2, mR21 * Skew(bx1[k]), -mR21,
                 -(mR21 * bx1[k]), H, g, &cur, nullptr);
    }
    for (size_t k = 0; k < fx2_v.size() && std::isfinite(cur); ++k) {
      const cv::Vec3d y = St * fx2_v[k];
      accumulate(y, fpx1_v[k], cam1, -Skew(y), cv::Matx33d::eye(), y, H, g,
                 &cur, n_in);
    }
    return cur;
  };

  // Levenberg-Marquardt: every candidate step's cost is evaluated before
  // acceptance, so an ill-conditioned system (gauge-weak directions are
  // common when all matches lie on a shallow surface patch) raises lambda
  // instead of propagating a divergent/NaN update into the result.
  cv::Matx<double, 7, 7> H = cv::Matx<double, 7, 7>::zeros();
  cv::Vec<double, 7> g;
  for (int k = 0; k < 7; ++k) g[k] = 0;
  int n_inliers = 0;
  double chi2 = build(S, &H, &g, &n_inliers);
  if (!std::isfinite(chi2)) return 0;
  double lambda = 1e-4;
  for (int it = 0; it < iters; ++it) {
    cv::Matx<double, 7, 7> Hd = H;
    cv::Vec<double, 7> gd = g;
    for (int d = 0; d < 7; ++d) Hd(d, d) = H(d, d) * (1.0 + lambda) + 1e-12;
    // the scale stays PINNED at the input (3D-3D Umeyama consensus) value:
    // loop-view pairs have nearly coincident camera centers, so the
    // reprojection objective is almost flat in scale (the reverse residual
    // is EXACTLY scale-invariant: proj(lambda*v) = proj(v)), and even a
    // strong log-scale prior loses to the Huber-linear cost of wrong guided
    // matches (observed 1.27 "refined" to 29.6, then 8.7 with a 5% prior).
    // The 3D-3D alignment is the one scale-observable measurement; this
    // polish spends its freedom on rotation/translation only.
    for (int d = 0; d < 7; ++d) Hd(6, d) = Hd(d, 6) = 0.0;
    Hd(6, 6) = 1.0;
    gd[6] = 0.0;
    bool ok = false;
    const cv::Vec<double, 7> delta = -(Hd.inv(cv::DECOMP_CHOLESKY, &ok) * gd);
    if (!ok || !std::isfinite(cv::norm(delta))) {
      lambda *= 10.0;
      if (lambda > 1e8) break;
      continue;
    }
    Sim3Tangent tang;  // [u, w, lambda_scale] ordering of Sim3Exp
    for (int k = 0; k < 3; ++k) {
      tang[k] = delta[k + 3];  // nu
      tang[k + 3] = delta[k];  // omega
    }
    tang[6] = delta[6];
    const Sim3 S_try = Sim3Exp(tang) * S;
    cv::Matx<double, 7, 7> H2 = cv::Matx<double, 7, 7>::zeros();
    cv::Vec<double, 7> g2;
    for (int k = 0; k < 7; ++k) g2[k] = 0;
    int n2 = 0;
    const double c2 = build(S_try, &H2, &g2, &n2);
    if (std::isfinite(c2) && c2 < chi2) {
      const bool converged = chi2 - c2 < 1e-10 * std::max(1.0, chi2);
      S = S_try;
      chi2 = c2;
      H = H2;
      g = g2;
      n_inliers = n2;
      lambda = std::max(lambda * 0.3, 1e-7);
      if (converged) break;
    } else {
      lambda *= 10.0;
      if (lambda > 1e8) break;
    }
  }
  *s12 = S;
  return n_inliers;
}

}  // namespace romap
