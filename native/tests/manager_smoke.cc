// End-to-end smoke test of the C++ shim against a live runtime server:
// synthesizes a moving bright square over a dark background, feeds keyframes
// + bboxes through the reference-shaped API, trains, and checks that losses
// come back finite and a mesh materializes.
//
// usage: manager_smoke <socket_path>

#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "monerf/nerf_manager.h"

namespace {

constexpr int kRes = 48;
constexpr int kFrames = 14;

struct Frame {
  std::vector<uint8_t> rgb;
  std::vector<uint8_t> instance;
  monerf::Mat4 twc;
  monerf::FrameIdAndBbox box;
};

// Look-at pose on a circle around the origin (camera +z toward origin).
monerf::Mat4 OrbitPose(float theta, float radius) {
  float eye[3] = {radius * std::cos(theta), radius * std::sin(theta), 0.6f};
  float z[3] = {-eye[0], -eye[1], -eye[2]};
  float zn = std::sqrt(z[0] * z[0] + z[1] * z[1] + z[2] * z[2]);
  for (float& v : z) v /= zn;
  float up[3] = {0, 0, 1};
  float x[3] = {z[1] * up[2] - z[2] * up[1], z[2] * up[0] - z[0] * up[2],
                z[0] * up[1] - z[1] * up[0]};
  float xn = std::sqrt(x[0] * x[0] + x[1] * x[1] + x[2] * x[2]);
  for (float& v : x) v /= xn;
  float y[3] = {z[1] * x[2] - z[2] * x[1], z[2] * x[0] - z[0] * x[2],
                z[0] * x[1] - z[1] * x[0]};
  monerf::Mat4 m = monerf::Mat4::Identity();
  for (int r = 0; r < 3; ++r) {
    m.m[r * 4 + 0] = x[r];
    m.m[r * 4 + 1] = y[r];
    m.m[r * 4 + 2] = z[r];
    m.m[r * 4 + 3] = eye[r];
  }
  return m;
}

// Rasterize a sphere at the origin (radius 0.4) by ray marching per pixel —
// a minimal analytic scene the NeRF can actually learn.
Frame MakeFrame(int i) {
  Frame f;
  f.rgb.assign(kRes * kRes * 3, 255);  // white background
  f.instance.assign(kRes * kRes, 0);
  float theta = 2.0f * static_cast<float>(M_PI) * i / kFrames;
  f.twc = OrbitPose(theta, 2.0f);
  const float fx = kRes * 0.9f, fy = kRes * 0.9f, cx = kRes / 2.0f,
              cy = kRes / 2.0f;
  int min_x = kRes, min_y = kRes, max_x = -1, max_y = -1;
  for (int py = 0; py < kRes; ++py) {
    for (int px = 0; px < kRes; ++px) {
      float d_cam[3] = {(px - cx) / fx, (py - cy) / fy, 1.0f};
      float dn = std::sqrt(d_cam[0] * d_cam[0] + d_cam[1] * d_cam[1] + 1.0f);
      for (float& v : d_cam) v /= dn;
      float d[3], o[3];
      for (int r = 0; r < 3; ++r) {
        d[r] = f.twc.m[r * 4 + 0] * d_cam[0] + f.twc.m[r * 4 + 1] * d_cam[1] +
               f.twc.m[r * 4 + 2] * d_cam[2];
        o[r] = f.twc.m[r * 4 + 3];
      }
      float b = o[0] * d[0] + o[1] * d[1] + o[2] * d[2];
      float c = o[0] * o[0] + o[1] * o[1] + o[2] * o[2] - 0.4f * 0.4f;
      float disc = b * b - c;
      if (disc > 0) {
        float t = -b - std::sqrt(disc);
        if (t > 1e-3f) {
          float p[3] = {o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2]};
          int idx = py * kRes + px;
          f.instance[idx] = 1;
          f.rgb[idx * 3 + 0] =
              static_cast<uint8_t>(128 + 120 * p[0] / 0.4f);
          f.rgb[idx * 3 + 1] =
              static_cast<uint8_t>(128 + 120 * p[1] / 0.4f);
          f.rgb[idx * 3 + 2] = 60;
          min_x = std::min(min_x, px);
          max_x = std::max(max_x, px);
          min_y = std::min(min_y, py);
          max_y = std::max(max_y, py);
        }
      }
    }
  }
  f.box = {static_cast<uint32_t>(i), static_cast<uint32_t>(min_x),
           static_cast<uint32_t>(min_y), static_cast<uint32_t>(max_y - min_y + 1),
           static_cast<uint32_t>(max_x - min_x + 1)};
  return f;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <socket>\n", argv[0]);
    return 2;
  }
  try {
    monerf::NerfManagerOnline mgr(argv[1], /*use_sparse_depth=*/false,
                                  /*train_step_iterations=*/10,
                                  /*capacity=*/2, /*mesh_enabled=*/true);
    mgr.Init();
    mgr.DatasetInit(kRes * 0.9f, kRes * 0.9f, kRes / 2.0f, kRes / 2.0f, kRes,
                    kRes, kFrames);

    std::vector<monerf::FrameIdAndBbox> boxes;
    for (int i = 0; i < kFrames; ++i) {
      Frame f = MakeFrame(i);
      char stamp[32];
      std::snprintf(stamp, sizeof(stamp), "%06d.0000", i);
      mgr.NewFrameToDataset(i, stamp, f.rgb.data(), f.instance.data(), nullptr,
                            f.twc);
      boxes.push_back(f.box);
    }
    if (mgr.GetFrameIdx("000003.0000") != 3) {
      std::fprintf(stderr, "FAIL: GetFrameIdx\n");
      return 1;
    }

    monerf::BoundingBox bb{{-0.35f, -0.35f, -0.35f}, {0.35f, 0.35f, 0.35f}};
    std::size_t idx = mgr.CreateNeRF(1, monerf::Mat4::Identity(), bb);
    mgr.UpdateNeRFBbox(idx, boxes, /*train_step=*/2);
    mgr.Pump(-1);
    // grow-triggered volume replacement: new half-widths come back with the
    // runtime's 1.1x inflation, and the slot retrains (spent waves
    // re-credited) — the post-update loss/mesh checks below cover it
    monerf::BoundingBox bb2{{-0.4f, -0.4f, -0.4f}, {0.4f, 0.4f, 0.4f}};
    float half[3] = {0, 0, 0};
    mgr.UpdateNeRFVolume(idx, monerf::Mat4::Identity(), bb2, half);
    if (std::abs(half[0] - 0.44f) > 1e-4f) {
      std::fprintf(stderr, "FAIL: UpdateNeRFVolume half %f\n", half[0]);
      return 1;
    }
    int waves = mgr.Pump(-1);
    mgr.WaitThreadsEnd();

    std::vector<float> losses = mgr.GetLosses();
    if (losses.empty() || !std::isfinite(losses[0]) || losses[0] > 0.5f) {
      std::fprintf(stderr, "FAIL: loss %f\n",
                   losses.empty() ? -1.0f : losses[0]);
      return 1;
    }
    monerf::MeshData mesh;
    if (!mgr.GetMesh(idx, &mesh) || mesh.verts.size() < 30) {
      std::fprintf(stderr, "FAIL: mesh (%zu verts)\n", mesh.verts.size() / 3);
      return 1;
    }
    std::printf("OK waves=%d loss=%f verts=%zu tris=%zu\n", waves, losses[0],
                mesh.verts.size() / 3, mesh.indices.size() / 3);
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "EXCEPTION: %s\n", e.what());
    return 1;
  }
}
