// Persistent object landmark: point cloud, class, lifecycle, cuboid
// pose/shape estimation, data-association helpers, merging.
// Behavior spec: ref src/ObjectMap.cc + include/ObjectMap.h; redesigned as a
// lock-free value-ish class (threading is the caller's concern — the rebuilt
// pipeline runs tracking-side object updates on one thread).
#pragma once

#include <map>
#include <vector>

#include "romap/frame_context.h"
#include "romap/map_point.h"
#include "romap/object_frame.h"
#include "romap/types.h"

namespace romap {

struct ObjectConfig {
  // ref src/Tracking.cc:139-195 config keys
  float eif_threshold = 0.58f;
  int eif_obs_numbers = 10;
  bool check_mps_obs = false;
  float add_mps_dist_multiple = 2.0f;  // ref Add.MPs.distance.multiple
  float merge_mps_dist_multiple = 3.0f;
  bool merge_different_class = false;
};

class ObjectMap {
 public:
  explicit ObjectMap(int cls, long frame_id, const ObjectConfig& cfg);

  // ---- point management -------------------------------------------------
  void AddNewPoints(const std::vector<MapPoint*>& pts, long frame_id);
  void ComputeMeanStd();  // over member points (ref CalculateMeanAndStandard)

  // EIF outlier removal: 40 trees, subsample n/2 (n>100) else 2n/3; class
  // 73/46/41 threshold +0.02; serious threshold +0.1; age exemption when
  // check_mps_obs (ref EIFFilterOutlier src/ObjectMap.cc:98-186).
  void EIFFilterOutliers();

  // Reprojection filter vs the latest bbox (gated on bbox not at the image
  // edge, bbox area >= 5% of image; ref FilterOutlier :189-246).
  void FilterOutliersReprojection(const FrameContext& frame);

  // History-position statistics (ref CalculatePosMeanAndStandard :249-277).
  void ComputeHistoryStats();

  // Pose: translation = extent midpoint of the point cloud; yaw from 18
  // sampled hypotheses scored by 2D line alignment (+1-DoF refinement) or
  // the PCA fallback; result voted through the 5-degree yaw histogram
  // (ref CalculateObjectPose :280-497 + CalculateYawError :499-611).
  void EstimatePose(const FrameContext& frame);

  // Shape: extents of the rotated cloud -> Cuboid (ref CalculateObjectShape
  // :613-672). Frozen once a NeRF owns the object.
  void EstimateShape();
  // Compute the current cuboid estimate WITHOUT mutating the stored shape
  // (which freezes once a NeRF owns the box, ref ObjectMap.cc:661-662) —
  // the grow-triggered training-volume update compares this live probe
  // against the frozen box. false when no usable points exist.
  bool ProbeShape(Cuboid* out) const;

  // Association: does absorbing ObjFrame's points keep the reprojected
  // point-cloud rect stable (IoU > 0.4)? (ref whetherAssociation :693-757).
  bool WhetherAssociation(const ObjectFrame& obj, const FrameContext& frame) const;

  // Reprojected rect of member points (ref ConstructBboxByMapPoints :759-795).
  void ProjectPointsBbox(const FrameContext& frame);

  // Absorb another object (distance-gated point adoption, history union;
  // ref MergeObject :797-891).
  void Merge(ObjectMap* other, double cur_keyframe_stamp);

  // Fraction of this object's cuboid volume lying inside `other`'s cuboid,
  // estimated on a 6x6x6 lattice of interior sample points (ref
  // MergeOverlapObjects samples the cuboid volume, src/LocalMapping.cc:
  // 959-1107). Requires both shapes estimated; returns 0 otherwise.
  float CuboidOverlapRatio(const ObjectMap* other) const;

  void InsertHistoryBboxAndTwc(const FrameContext& frame, const Bbox& bbox);

  // Silhouette-cone center: least-squares intersection of the bbox-center
  // viewing rays across the observation history. Corrects the depth bias of
  // the point-extent midpoint (triangulated points all lie on the VISIBLE
  // surface, so the midpoint sits in front of the true centroid). Fails —
  // returns false — when the ray bundle has too little angular baseline to
  // condition the depth. Goes beyond the reference (which keeps the biased
  // midpoint, ref src/ObjectMap.cc:286-315).
  bool SilhouetteCenter(Vec3* out) const;

  // Per-axis silhouette extent estimates: in each history observation with
  // the axis near-transverse to the ray (foreshortening phi = g*z/f >=
  // 0.8), the support of the ellipse inscribed in the detection rect along
  // the projected axis direction bounds extent x (pixels per unit length);
  // the 20th percentile over such views is a robust minimum. tight[a] is
  // set when >= 5 qualifying (unclipped, transverse) views exist — out[a]
  // is only meaningful then; axes foreshortened in every view stay
  // point-cloud-only. Beyond the reference (cloud extents only,
  // ref src/ObjectMap.cc:613-672).
  bool SilhouetteExtentBounds(const Mat3& r, const Vec3& center_w,
                              const float prior_ext[3], float out[3],
                              bool tight[3]) const;

  void SetBad(const std::string& reason);
  bool IsBad() const { return bad_; }

  // ---- public state (the pipeline reads these directly) ------------------
  long id = 0;
  int cls = -1;
  long created_frame_id = 0;
  long latest_obs_frame_id = 0;
  int n_obs = 0;
  bool have_nerf = false;
  int nerf_index = -1;

  std::vector<MapPoint*> points;
  Vec3 points_mean{0, 0, 0};

  std::vector<Vec3> history_pos;  // per-observation frame centers
  Vec3 history_pos_mean{0, 0, 0};
  Vec3 history_pos_std{0, 0, 0};

  Bbox last_bbox;
  Bbox last_last_bbox;
  long last_bbox_frame = -1;       // frame ids of the two latest detections
  long last_last_bbox_frame = -1;  // (for motion-extrapolated bbox IoU)
  Lines latest_lines;
  cv::Rect_<float> projected_rect;

  SE3 t_obj_w;       // world -> object (translation = cloud midpoint)
  Cuboid shape;      // refined cuboid (own rotation-aligned translation)
  bool first_init = true;
  float axis_length = 0;  // largest half-extent (axis projection length)

  std::map<double, Bbox> history_bbox;          // stamp -> detection
  std::map<double, Mat4> history_twc;           // stamp -> camera pose
  CameraModel hist_cam;                          // intrinsics of the history
  bool have_hist_cam = false;
  std::map<double, Bbox> keyframe_history_bbox;  // stamps that became KFs
  std::map<double, Bbox> keyframe_bbox_pending;  // not yet sent to the NeRF
  std::map<ObjectMap*, int, ById> appear_same_times;  // covisibility counts

  // yaw histogram: bucket -> (count, mean score, mean yaw)
  std::map<int, cv::Vec3d> yaw_scores;

  // base frame rotating the cuboid's yaw axis onto the estimated scene-up
  // (identity = reference convention, see UpAlignedBase in object_map.cc)
  Mat3 r_up = Mat3::eye();

 private:
  Mat3 UpAlignedBase() const;
  float YawError(const Mat3& sample_r, const Vec3& t_wobj,
                 const FrameContext& frame,
                 std::vector<std::vector<int>>* assoc_lines) const;
  friend float RefineYaw(const ObjectMap&, const std::vector<std::vector<int>>&,
                         float, const Vec3&, const FrameContext&);

  ObjectConfig cfg_;
  bool bad_ = false;
  static long next_id_;
};

// out-of-line from map_point.h: the ById comparator on the objects map
// needs ObjectMap::id, which is incomplete there
inline void MapPoint::AddObject(ObjectMap* obj, long frame_id) {
  objects.emplace(obj, frame_id);
}
inline void MapPoint::EraseObject(ObjectMap* obj) { objects.erase(obj); }

// 1-DoF yaw refinement: minimizes the summed angular error between detected
// lines and the projected object axes, Gauss-Newton with numeric derivative
// (replaces the reference's g2o VertexYaw/EdgeRotationLine,
// ref src/OptimizeObject.cc:23-111; 5 iterations).
float RefineYaw(const ObjectMap& obj,
                const std::vector<std::vector<int>>& assoc_lines,
                float init_yaw, const Vec3& t_wobj, const FrameContext& frame);

}  // namespace romap
