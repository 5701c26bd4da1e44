// NeRF-mesh cuboid refinement (beyond the reference): the SLAM depth axis
// is observability-limited — only the VISIBLE surface carries map points,
// so a monocular cuboid is biased short along the viewing direction —
// while the trained field integrates every view of the object. Per axis,
// take the mesh's robust support interval in the object frame and accept
// it when the mesh is trustworthy there: enough vertices and not clipped
// by the training volume itself. Consumed by the mono_tum shutdown path
// (objects.txt, ref System::SaveObjects src/System.cc:529-563 format).
#pragma once

#include <algorithm>
#include <array>
#include <cstddef>
#include <vector>

namespace romap {

struct MeshExtentRefine {
  std::array<float, 3> ext;  // refined half-extents (object frame)
  std::array<float, 3> off;  // object-frame center shift
  int accepted = 0;          // axes taken from the mesh (0 = reject all)
};

// verts: xyz-interleaved object-frame mesh vertices. aabb_half: per-axis
// training-volume half-widths (every margin included) — axes whose mesh
// support reaches >clip_frac of the volume edge are rejected (the field
// was truncated there, so its support says nothing about the object).
// slam_ext: the SLAM cuboid half-extents kept for rejected axes.
// The robust support interval is [q01, q99]: its half-WIDTH is the extent
// and the interval midpoint refines the center along that axis (a SLAM
// center offset must not masquerade as extra extent).
inline MeshExtentRefine RefineExtentsFromMesh(
    const std::vector<float>& verts, const std::array<float, 3>& aabb_half,
    const std::array<float, 3>& slam_ext, size_t min_verts = 100,
    float clip_frac = 0.95f) {
  MeshExtentRefine r;
  r.ext = slam_ext;
  r.off = {0.f, 0.f, 0.f};
  size_t nv = verts.size() / 3;
  if (nv < min_verts) return r;
  std::vector<float> c(nv);
  for (int a = 0; a < 3; ++a) {
    for (size_t k = 0; k < nv; ++k) c[k] = verts[3 * k + a];
    size_t qlo = static_cast<size_t>(0.01 * static_cast<double>(nv - 1));
    size_t qhi = static_cast<size_t>(0.99 * static_cast<double>(nv - 1));
    std::nth_element(c.begin(), c.begin() + qlo, c.end());
    float lo = c[qlo];
    std::nth_element(c.begin() + qlo, c.begin() + qhi, c.end());
    float hi = c[qhi];
    bool clipped =
        hi > clip_frac * aabb_half[a] || lo < -clip_frac * aabb_half[a];
    if (!clipped) {
      r.ext[a] = 0.5f * (hi - lo);
      r.off[a] = 0.5f * (hi + lo);
      ++r.accepted;
    }
  }
  return r;
}

}  // namespace romap
