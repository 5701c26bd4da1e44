// Unit tests of the object-layer algorithms on synthetic data:
// EIF outlier detection, box-plot depth filter, line merging, cuboid pose
// (yaw from lines + PCA fallback), shape, association, merging.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <random>

#include "romap/eif.h"
#include "romap/mesh_extents.h"
#include "romap/object_frame.h"
#include "romap/object_map.h"
#include "romap/t_table.h"
#include "romap/types.h"

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      return 1;                                                         \
    }                                                                   \
  } while (0)

using namespace romap;

namespace {

std::mt19937 g_rng(42);

std::vector<MapPoint> MakeCluster(int n, Vec3 center, float spread,
                                  int n_outliers = 0, float outlier_dist = 3.f) {
  std::normal_distribution<float> d(0.0f, spread);
  std::vector<MapPoint> pts;
  for (int i = 0; i < n; ++i)
    pts.push_back({center + Vec3(d(g_rng), d(g_rng), d(g_rng)), false, {}});
  for (int i = 0; i < n_outliers; ++i)
    pts.push_back({center + Vec3(outlier_dist + d(g_rng), d(g_rng), d(g_rng)),
                   false, {}});
  return pts;
}

FrameContext MakeFrame(Vec3 cam_pos, long id = 0) {
  FrameContext f;
  f.id = id;
  f.timestamp = id * 0.1;
  // camera at cam_pos looking along +x toward the origin region
  // build Twc with z toward origin:
  Vec3 z = -cam_pos;
  float zn = std::sqrt(z.dot(z));
  z *= 1.0f / zn;
  Vec3 up(0, 0, 1);
  Vec3 x = z.cross(up);
  x *= 1.0f / std::sqrt(x.dot(x));
  Vec3 y = z.cross(x);
  Mat3 rwc(x[0], y[0], z[0], x[1], y[1], z[1], x[2], y[2], z[2]);
  SE3 twc{rwc, cam_pos};
  f.tcw = twc.inverse();
  f.cam = {320, 320, 320, 240, 0, 0, 640, 480};
  return f;
}

int TestEIF() {
  auto pts = MakeCluster(120, {0, 0, 0}, 0.2f, 8, 4.0f);
  std::vector<std::array<float, 3>> data;
  for (auto& p : pts) data.push_back({p.pos[0], p.pos[1], p.pos[2]});
  ExtendedIsolationForest<3> forest;
  forest.Build(data, 40, 12345, 64);
  std::vector<double> scores;
  forest.AnomalyScores(data, &scores);
  double mean_in = 0, mean_out = 0;
  for (int i = 0; i < 120; ++i) mean_in += scores[i];
  for (int i = 120; i < 128; ++i) mean_out += scores[i];
  mean_in /= 120;
  mean_out /= 8;
  CHECK(mean_out > mean_in + 0.1);
  CHECK(mean_out > 0.6);
  CHECK(mean_in < 0.6);
  return 0;
}

int TestObjectMapEIFFilter() {
  ObjectConfig cfg;
  cfg.eif_threshold = 0.6f;
  ObjectMap obj(1, 0, cfg);
  auto pts = MakeCluster(120, {0, 0, 0}, 0.2f, 6, 5.0f);
  std::vector<MapPoint*> ptrs;
  for (auto& p : pts) ptrs.push_back(&p);
  obj.AddNewPoints(ptrs, 0);
  for (int i = 0; i < 6; ++i) obj.keyframe_history_bbox[i * 0.1] = Bbox{};
  size_t before = obj.points.size();
  obj.EIFFilterOutliers();
  CHECK(obj.points.size() < before);
  // most inliers survive, most outliers die
  int out_kept = 0;
  for (MapPoint* p : obj.points)
    if (p->pos[0] > 2.5f) ++out_kept;
  CHECK(out_kept <= 2);
  CHECK(obj.points.size() > 100);
  // dropped points lost their back-reference
  int refs = 0;
  for (auto& p : pts) refs += p.objects.count(&obj);
  CHECK(refs == static_cast<int>(obj.points.size()));
  return 0;
}

int TestBoxPlotFilter() {
  ObjectFrame of;
  auto pts = MakeCluster(60, {0, 0, 4}, 0.1f);
  // far-depth contaminants ("background through the bbox")
  auto far_pts = MakeCluster(5, {0, 0, 12}, 0.1f);
  for (auto& p : pts) of.points.push_back(&p);
  for (auto& p : far_pts) of.points.push_back(&p);
  SE3 identity;  // camera at origin looking +z
  of.FilterPointsByBoxPlot(identity);
  CHECK(of.points.size() == 60);
  return 0;
}

int TestMergeLines() {
  Lines in = {
      {0, 0, 40, 1},     // long-ish, nearly horizontal
      {42, 1.5, 90, 2},  // continuation -> should merge with the first
      {10, 50, 12, 90},  // near-vertical long line (kept)
      {5, 5, 12, 7},     // short noise (dropped)
  };
  Lines out = MergeLines(in);
  CHECK(out.size() == 2);
  bool found_merged = false;
  for (auto& l : out)
    if (l[0] <= 0.5f && l[2] >= 89.5f) found_merged = true;
  CHECK(found_merged);
  return 0;
}

int TestPoseFromLinesAndShape() {
  // a box-shaped cloud rotated by 20 degrees about z
  float yaw_true = 20.0f * static_cast<float>(M_PI) / 180.0f;
  Mat3 r = YawRotation(yaw_true);
  std::vector<MapPoint> pts;
  std::uniform_real_distribution<float> ux(-0.6f, 0.6f), uy(-0.35f, 0.35f),
      uz(-0.25f, 0.25f);
  for (int i = 0; i < 300; ++i) {
    Vec3 local(ux(g_rng), uy(g_rng), uz(g_rng));
    pts.push_back({r * local + Vec3(0, 0, 0), false, {}});
  }
  ObjectConfig cfg;
  ObjectMap obj(1, 5, cfg);
  std::vector<MapPoint*> ptrs;
  for (auto& p : pts) ptrs.push_back(&p);
  obj.AddNewPoints(ptrs, 5);
  obj.n_obs = 10;

  FrameContext frame = MakeFrame({-2.5f, 0.5f, 1.2f}, 5);
  obj.latest_obs_frame_id = 5;
  obj.last_bbox.rect = {200, 150, 240, 180};

  // synthesize image lines = projections of the true object x/y axes
  auto project_axis = [&](Vec3 a, Vec3 b) {
    cv::Point2f p0 = frame.cam.Project(frame.tcw * a);
    cv::Point2f p1 = frame.cam.Project(frame.tcw * b);
    if (p0.x > p1.x) std::swap(p0, p1);
    return cv::Vec4f(p0.x, p0.y, p1.x, p1.y);
  };
  Vec3 ex = r * Vec3(0.6f, 0, 0), ey = r * Vec3(0, 0.35f, 0);
  obj.latest_lines = {
      project_axis(-ex - ey, ex - ey), project_axis(-ex + ey, ex + ey),
      project_axis(-ex - ey, -ex + ey), project_axis(ex - ey, ex + ey),
  };

  for (int rep = 0; rep < 3; ++rep) obj.EstimatePose(frame);
  obj.EstimateShape();

  // recovered rotation maps the cloud into an axis-aligned box of roughly
  // the true half extents
  CHECK(std::abs(obj.shape.a1 - 0.6f) < 0.12f);
  CHECK(std::abs(obj.shape.a2 - 0.35f) < 0.12f);
  CHECK(std::abs(obj.shape.a3 - 0.25f) < 0.1f);
  // yaw recovered up to axis symmetry: the estimated R^T must align with
  // the true rotation up to a multiple of 90 degrees around z
  // NOTE: the line-alignment method carries an inherent perspective bias
  // (it compares box-EDGE projections against CENTER-axis projections), so
  // a few degrees of error is expected — the reference shares this
  // approximation. Accept < 0.15 rad (~8.6 deg) mod 90-degree symmetry.
  Mat3 rel = obj.t_obj_w.R * r;  // should be ~identity (mod 90-degree flips)
  float ang = std::atan2(rel(1, 0), rel(0, 0));
  float folded = std::fmod(std::abs(ang) + static_cast<float>(M_PI) / 4,
                           static_cast<float>(M_PI) / 2) -
                 static_cast<float>(M_PI) / 4;
  CHECK(std::abs(folded) < 0.15f);
  return 0;
}


int TestUpAlignedFrameAndCloudYaw() {
  // Box yawed 20 deg about WORLD z, observed from a PITCHED orbit (the
  // cameras sit above the object and look down ~31 deg). With the
  // reference convention the cuboid frame would be the SLAM-world z =
  // tilted camera frame and every extent inflates toward the diagonal;
  // the up-aligned base (camera x-axis null space) + cloud yaw (no line
  // evidence here) must recover the true frame and extents.
  float yaw_true = 20.0f * static_cast<float>(M_PI) / 180.0f;
  Mat3 r = YawRotation(yaw_true);
  const Vec3 half(0.6f, 0.35f, 0.25f);
  // SURFACE samples (like triangulated points): random box faces
  std::vector<MapPoint> pts;
  std::uniform_real_distribution<float> u01(0.0f, 1.0f);
  for (int i = 0; i < 400; ++i) {
    int face = static_cast<int>(u01(g_rng) * 6) % 6;
    Vec3 local((u01(g_rng) * 2 - 1) * half[0], (u01(g_rng) * 2 - 1) * half[1],
               (u01(g_rng) * 2 - 1) * half[2]);
    local[face / 2] = (face % 2 ? 1.0f : -1.0f) * half[face / 2];
    pts.push_back({r * local, false, {}});
  }
  ObjectConfig cfg;
  ObjectMap obj(1, 5, cfg);
  std::vector<MapPoint*> ptrs;
  for (auto& p : pts) ptrs.push_back(&p);
  obj.AddNewPoints(ptrs, 5);
  obj.n_obs = 12;
  obj.latest_obs_frame_id = 5;

  // pitched look-at orbit over a 120-deg arc; history bboxes are the
  // projected bounding rects of the true box corners (exact silhouettes)
  FrameContext last_frame;
  for (int k = 0; k < 12; ++k) {
    float th = (k / 11.0f) * 2.1f;
    Vec3 cam_pos(2.5f * std::cos(th), 2.5f * std::sin(th), 1.5f);
    FrameContext f = MakeFrame(cam_pos, 10 + k);
    float x0 = 1e9f, y0 = 1e9f, x1 = -1e9f, y1 = -1e9f;
    for (int c = 0; c < 8; ++c) {
      Vec3 corner((c & 1 ? 1 : -1) * half[0], (c & 2 ? 1 : -1) * half[1],
                  (c & 4 ? 1 : -1) * half[2]);
      cv::Point2f uv = f.cam.Project(f.tcw * (r * corner));
      x0 = std::min(x0, uv.x); y0 = std::min(y0, uv.y);
      x1 = std::max(x1, uv.x); y1 = std::max(y1, uv.y);
    }
    Bbox bb;
    bb.rect = {x0, y0, x1 - x0, y1 - y0};
    obj.InsertHistoryBboxAndTwc(f, bb);
    last_frame = f;
  }

  obj.latest_lines.clear();  // no line evidence: the cloud yaw must carry
  for (int rep = 0; rep < 3; ++rep) obj.EstimatePose(last_frame);
  obj.EstimateShape();

  // the cuboid's yaw axis must be the WORLD up, not the tilted camera z
  Vec3 obj_z(obj.t_obj_w.R(2, 0), obj.t_obj_w.R(2, 1), obj.t_obj_w.R(2, 2));
  CHECK(std::abs(obj_z[2]) > 0.996f);  // within ~5 deg of world up
  // yaw recovered mod the box's 90-deg symmetry
  Mat3 rel = obj.t_obj_w.R * r;
  float ang = std::atan2(rel(1, 0), rel(0, 0));
  float folded = std::fmod(std::abs(ang) + static_cast<float>(M_PI) / 4,
                           static_cast<float>(M_PI) / 2) -
                 static_cast<float>(M_PI) / 4;
  CHECK(std::abs(folded) < 0.12f);
  // extents within 20% (sorted: the yaw gauge may swap x/y)
  float est[3] = {obj.shape.a1, obj.shape.a2, obj.shape.a3};
  float want[3] = {half[0], half[1], half[2]};
  std::sort(est, est + 3);
  std::sort(want, want + 3);
  std::printf("up-aligned cuboid: est %.3f %.3f %.3f want %.3f %.3f %.3f\n",
              est[0], est[1], est[2], want[0], want[1], want[2]);
  // extents tolerance is deliberately loose here: with only 12 views the
  // blind-axis floor (0.8x transverse) and the corner-rect silhouettes
  // dominate the small axes (measured est 0.35/0.44/0.68 vs true
  // 0.25/0.35/0.60). The guarded regression is the TILTED-FRAME failure,
  // which put two axes at 1.5-1.8x — the frame checks above are the
  // teeth; this bound just keeps the estimator inside the NeRF-volume
  // sanity band.
  for (int a = 0; a < 3; ++a)
    CHECK(est[a] < 1.45f * want[a] && est[a] > 0.6f * want[a]);
  return 0;
}

int TestAssociationAndMerge() {
  ObjectConfig cfg;
  auto pts_a = MakeCluster(80, {0, 0, 0}, 0.2f);
  auto pts_b = MakeCluster(80, {0.05f, 0, 0}, 0.2f);  // same object, re-seen
  auto pts_c = MakeCluster(80, {4, 4, 0}, 0.2f);      // different object

  ObjectMap obj(1, 0, cfg);
  std::vector<MapPoint*> pa;
  for (auto& p : pts_a) pa.push_back(&p);
  obj.AddNewPoints(pa, 0);

  FrameContext frame = MakeFrame({-3, 0, 1});
  ObjectFrame same, other;
  for (auto& p : pts_b) same.points.push_back(&p);
  for (auto& p : pts_c) other.points.push_back(&p);
  CHECK(obj.WhetherAssociation(same, frame));
  CHECK(!obj.WhetherAssociation(other, frame));

  // merging absorbs gated points and histories
  ObjectMap objc(1, 3, cfg);
  std::vector<MapPoint*> pc;
  for (auto& p : pts_b) pc.push_back(&p);
  objc.AddNewPoints(pc, 3);
  objc.n_obs = 4;
  objc.history_pos.push_back({0.05f, 0, 0});
  obj.n_obs = 6;
  obj.EstimatePose(frame);
  obj.EstimateShape();
  size_t before = obj.points.size();
  obj.Merge(&objc, /*cur_keyframe_stamp=*/0.0);
  CHECK(obj.points.size() > before);
  CHECK(obj.n_obs == 10);
  CHECK(obj.history_pos.size() == 1);
  return 0;
}

int TestTTable() {
  // spot checks vs standard two-sided critical values
  CHECK(std::abs(t_critical(10, 0) - 2.228f) < 0.01f);   // dof 10, a=.05
  CHECK(std::abs(t_critical(30, 1) - 2.750f) < 0.01f);   // dof 30, a=.01
  CHECK(std::abs(t_critical(100, 2) - 3.390f) < 0.01f);  // dof 100, a=.001
  CHECK(t_critical(0, 0) == t_critical(1, 0));           // clamped
  CHECK(t_critical(500, 0) == t_critical(101, 0));
  return 0;
}

int TestSilhouetteCenter() {
  // bbox-center rays from cameras on an arc around a known object center
  // must intersect at that center; with near-parallel rays (no baseline)
  // the solver must refuse (conditioning gate).
  ObjectConfig cfg;
  Vec3 true_c(0.2f, -0.1f, 0.0f);
  float r = 0.4f;

  auto run = [&](float arc, int n_views, bool expect_ok) {
    ObjectMap obj(63, 0, cfg);
    for (int i = 0; i < n_views; ++i) {
      float a = arc * (i / std::max(1.0f, n_views - 1.0f) - 0.5f);
      Vec3 cam_pos(true_c[0] + 4.0f * std::sin(a), true_c[1],
                   true_c[2] - 4.0f * std::cos(a));
      FrameContext f = MakeFrame(cam_pos, i);
      // aim the camera at the object (MakeFrame aims at the origin; the
      // offset center projects off-axis, which is exactly the general case)
      Vec3 c_cam = f.tcw * true_c;
      cv::Point2f uv = f.cam.Project(c_cam);
      float radius_px = f.cam.fx * r / c_cam[2];
      Bbox bb;
      bb.rect = {uv.x - radius_px, uv.y - radius_px, 2 * radius_px,
                 2 * radius_px};
      bb.cls = 63;
      obj.InsertHistoryBboxAndTwc(f, bb);
    }
    Vec3 est;
    bool ok = obj.SilhouetteCenter(&est);
    if (ok != expect_ok) {
      std::printf("silhouette: ok=%d want %d (arc %.2f)\n", ok, expect_ok, arc);
      return 1;
    }
    if (ok) {
      float err = static_cast<float>(cv::norm(est - true_c));
      std::printf("silhouette center err %.4f (arc %.2f rad)\n", err, arc);
      if (err > 0.05f) return 1;
    }
    return 0;
  };

  int rc = 0;
  rc |= run(0.9f, 12, true);    // wide arc: well conditioned
  rc |= run(0.002f, 12, false); // parallel rays: depth unobservable -> refuse
  rc |= run(0.9f, 5, false);    // too few views -> refuse
  return rc;
}

int TestMeshExtentRefine() {
  // Dense box-surface mesh, half-extents (0.5, 0.4, 0.3), center shifted
  // +0.1 along z, plus 1% far outliers the q01/q99 support must reject.
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> u(-1.f, 1.f);
  std::vector<float> verts;
  const float he[3] = {0.5f, 0.4f, 0.3f};
  for (int i = 0; i < 3000; ++i) {
    float p[3] = {u(rng) * he[0], u(rng) * he[1], u(rng) * he[2]};
    p[i % 3] = (i % 2 ? 1.f : -1.f) * he[i % 3];  // snap to a face
    verts.insert(verts.end(), {p[0], p[1], p[2] + 0.1f});
  }
  for (int i = 0; i < 30; ++i)  // floater blobs far outside the object
    verts.insert(verts.end(), {2.5f, -2.5f, 2.5f});
  std::array<float, 3> aabb = {1.5f, 1.5f, 1.5f};
  std::array<float, 3> slam = {0.45f, 0.45f, 0.2f};
  MeshExtentRefine r = RefineExtentsFromMesh(verts, aabb, slam);
  CHECK(r.accepted == 3);
  CHECK(std::fabs(r.ext[0] - 0.5f) < 0.03f);
  CHECK(std::fabs(r.ext[1] - 0.4f) < 0.03f);
  CHECK(std::fabs(r.ext[2] - 0.3f) < 0.03f);  // depth axis recovered
  CHECK(std::fabs(r.off[2] - 0.1f) < 0.03f);  // center shift recovered
  CHECK(std::fabs(r.off[0]) < 0.03f && std::fabs(r.off[1]) < 0.03f);

  // Axis clipped by the training volume -> falls back to the SLAM extent.
  std::array<float, 3> tight = {1.5f, 1.5f, 0.40f};  // mesh hi 0.4 > 0.95*0.40
  MeshExtentRefine rc2 = RefineExtentsFromMesh(verts, tight, slam);
  CHECK(rc2.accepted == 2);
  CHECK(std::fabs(rc2.ext[2] - slam[2]) < 1e-6f && rc2.off[2] == 0.f);

  // Too few vertices -> reject everything.
  std::vector<float> tiny(verts.begin(), verts.begin() + 3 * 50);
  MeshExtentRefine rt = RefineExtentsFromMesh(tiny, aabb, slam);
  CHECK(rt.accepted == 0);

  // With face topology the support comes from the largest connected
  // component: the floater blob (disconnected) cannot stretch the interval
  // even though it is 1% of vertices, and the true min/max keeps the axis
  // poles the q01/q99 path shaves (calibrated -6..-8% on study meshes).
  const size_t n_obj = 3000, n_blob = 30;
  std::vector<uint32_t> idx;
  for (uint32_t v = 0; v + 2 < n_obj; ++v)
    idx.insert(idx.end(), {v, v + 1, v + 2});  // one chained component
  for (uint32_t v = 0; v + 2 < n_blob; ++v)
    idx.insert(idx.end(),
               {(uint32_t)n_obj + v, (uint32_t)n_obj + v + 1,
                (uint32_t)n_obj + v + 2});
  MeshExtentRefine rcc = RefineExtentsFromMesh(verts, aabb, slam, &idx);
  CHECK(rcc.accepted == 3);
  CHECK(std::fabs(rcc.ext[0] - 0.5f) < 0.01f);  // exact min/max, no trim
  CHECK(std::fabs(rcc.ext[1] - 0.4f) < 0.01f);
  CHECK(std::fabs(rcc.ext[2] - 0.3f) < 0.01f);
  CHECK(std::fabs(rcc.off[2] - 0.1f) < 0.01f);
  // Degenerate topology (too few connected verts) falls back to quantiles.
  std::vector<uint32_t> idx3 = {0, 1, 2};
  MeshExtentRefine rfb = RefineExtentsFromMesh(verts, aabb, slam, &idx3);
  CHECK(rfb.accepted == 3 && std::fabs(rfb.ext[0] - 0.5f) < 0.03f);
  std::printf("mesh extents: %.3f %.3f %.3f (off %.3f %.3f %.3f) | cc: "
              "%.3f %.3f %.3f\n",
              r.ext[0], r.ext[1], r.ext[2], r.off[0], r.off[1], r.off[2],
              rcc.ext[0], rcc.ext[1], rcc.ext[2]);
  return 0;
}

}  // namespace

int main() {
  int rc = 0;
  rc |= TestEIF();
  rc |= TestObjectMapEIFFilter();
  rc |= TestBoxPlotFilter();
  rc |= TestMergeLines();
  rc |= TestPoseFromLinesAndShape();
  rc |= TestUpAlignedFrameAndCloudYaw();
  rc |= TestAssociationAndMerge();
  rc |= TestTTable();
  rc |= TestSilhouetteCenter();
  rc |= TestMeshExtentRefine();
  if (rc == 0) std::printf("object_layer_test: ALL OK\n");
  return rc;
}
