#include "monerf/nerf_manager.h"

#include <cstring>

#include "monerf/client.h"
#include "monerf/ipc.h"

namespace monerf {

Mat4 Mat4::Identity() {
  Mat4 out{};
  for (int i = 0; i < 4; ++i) out.m[i * 4 + i] = 1.0f;
  return out;
}

NerfManagerOnline::NerfManagerOnline(const std::string& socket_path,
                                     bool use_sparse_depth,
                                     int train_step_iterations, int capacity,
                                     bool mesh_enabled)
    : client_(new RuntimeClient(socket_path)),
      use_depth_(use_sparse_depth),
      iters_(train_step_iterations),
      capacity_(capacity),
      mesh_enabled_(mesh_enabled) {}

NerfManagerOnline::~NerfManagerOnline() = default;

bool NerfManagerOnline::Init() {
  Writer w;
  w.u8(use_depth_ ? 1 : 0);
  w.i32(iters_);
  w.i32(capacity_);
  w.u8(mesh_enabled_ ? 1 : 0);
  client_->call(Op::kInit, w);
  return true;
}

void NerfManagerOnline::DatasetInit(float fx, float fy, float cx, float cy,
                                    int h, int w_img, std::size_t imgs) {
  h_ = h;
  w_ = w_img;
  Writer w;
  w.f32(fx);
  w.f32(fy);
  w.f32(cx);
  w.f32(cy);
  w.i32(h);
  w.i32(w_img);
  w.i32(static_cast<int32_t>(imgs));
  client_->call(Op::kDatasetInit, w);
}

void NerfManagerOnline::NewFrameToDataset(unsigned int img_id,
                                          const std::string& timestamp,
                                          const uint8_t* rgb,
                                          const uint8_t* instance,
                                          const float* depth,
                                          const Mat4& pose_twc) {
  Writer w;
  w.i32(static_cast<int32_t>(img_id));
  w.str(timestamp);
  w.u8(depth != nullptr ? 1 : 0);
  w.bytes(rgb, static_cast<size_t>(h_) * w_ * 3);
  w.bytes(instance, static_cast<size_t>(h_) * w_);
  if (depth != nullptr) w.bytes(depth, static_cast<size_t>(h_) * w_ * 4);
  w.bytes(pose_twc.m, sizeof(pose_twc.m));
  client_->call(Op::kNewFrame, w);
}

void NerfManagerOnline::UpdateDataset(unsigned int cur_id,
                                      unsigned int frame_num,
                                      const std::vector<Mat4>& poses) {
  Writer w;
  w.i32(static_cast<int32_t>(cur_id));
  w.i32(static_cast<int32_t>(frame_num));
  for (const auto& p : poses) w.bytes(p.m, sizeof(p.m));
  client_->call(Op::kUpdatePoses, w);
}

std::size_t NerfManagerOnline::CreateNeRF(int cls, const Mat4& obj_tow,
                                          const BoundingBox& box,
                                          float* aabb_half) {
  Writer w;
  w.i32(cls);
  w.bytes(obj_tow.m, sizeof(obj_tow.m));
  w.bytes(box.min, sizeof(box.min));
  w.bytes(box.max, sizeof(box.max));
  Reader r = client_->call(Op::kCreateNerf, w);
  std::size_t idx = static_cast<std::size_t>(r.i32());
  float half[3] = {r.f32(), r.f32(), r.f32()};
  if (aabb_half) {
    aabb_half[0] = half[0];
    aabb_half[1] = half[1];
    aabb_half[2] = half[2];
  }
  return idx;
}

void NerfManagerOnline::UpdateNeRFVolume(std::size_t idx, const Mat4& obj_tow,
                                         const BoundingBox& box,
                                         float* aabb_half) {
  Writer w;
  w.i32(static_cast<int32_t>(idx));
  w.bytes(obj_tow.m, sizeof(obj_tow.m));
  w.bytes(box.min, sizeof(box.min));
  w.bytes(box.max, sizeof(box.max));
  Reader r = client_->call(Op::kUpdateVolume, w);
  float half[3] = {r.f32(), r.f32(), r.f32()};
  if (aabb_half) {
    aabb_half[0] = half[0];
    aabb_half[1] = half[1];
    aabb_half[2] = half[2];
  }
}

void NerfManagerOnline::UpdateNeRFBbox(std::size_t idx,
                                       const std::vector<FrameIdAndBbox>& boxes,
                                       int train_step) {
  Writer w;
  w.i32(static_cast<int32_t>(idx));
  w.i32(train_step);
  w.i32(static_cast<int32_t>(boxes.size()));
  for (const auto& b : boxes) {
    int32_t row[5] = {static_cast<int32_t>(b.frame_id),
                      static_cast<int32_t>(b.x), static_cast<int32_t>(b.y),
                      static_cast<int32_t>(b.h), static_cast<int32_t>(b.w)};
    w.bytes(row, sizeof(row));
  }
  client_->call(Op::kUpdateBbox, w);
}

int NerfManagerOnline::GetFrameIdx(const std::string& timestamp) {
  Writer w;
  w.str(timestamp);
  return client_->call(Op::kGetFrameIdx, w).i32();
}

bool NerfManagerOnline::WaitThreadsEnd() {
  client_->call(Op::kWaitEnd, Writer());
  return true;
}

void NerfManagerOnline::RenderNeRFsTest(
    const std::string& out_path, std::size_t idx,
    const std::vector<std::string>& timestamps,
    const std::vector<FrameIdAndBbox>& boxes, const std::vector<Mat4>& twcs,
    float radius, bool video,
    const std::vector<std::vector<uint8_t>>* view_rgb,
    const std::vector<std::vector<uint8_t>>* view_mask) {
  Writer w;
  w.i32(static_cast<int32_t>(idx));
  w.f32(radius);
  w.u8(video ? 1 : 0);
  w.str(out_path);
  w.i32(static_cast<int32_t>(timestamps.size()));
  for (std::size_t i = 0; i < timestamps.size(); ++i) {
    w.str(timestamps[i]);
    int32_t box[4] = {static_cast<int32_t>(boxes[i].x),
                      static_cast<int32_t>(boxes[i].y),
                      static_cast<int32_t>(boxes[i].h),
                      static_cast<int32_t>(boxes[i].w)};
    w.bytes(box, sizeof(box));
    w.bytes(twcs[i].m, sizeof(twcs[i].m));
    const size_t px = static_cast<size_t>(boxes[i].h) * boxes[i].w;
    bool have = view_rgb && view_mask && i < view_rgb->size() &&
                (*view_rgb)[i].size() == px * 3 &&
                (*view_mask)[i].size() == px;
    w.u8(have ? 1 : 0);
    if (have) {
      w.bytes((*view_rgb)[i].data(), px * 3);
      w.bytes((*view_mask)[i].data(), px);
    }
  }
  client_->call(Op::kRenderTest, w);
}

bool NerfManagerOnline::GetMesh(std::size_t idx, MeshData* out) {
  Writer w;
  w.i32(static_cast<int32_t>(idx));
  Reader r = client_->call(Op::kGetMesh, w);
  int32_t nv = r.i32();
  int32_t nf = r.i32();
  if (nv == 0) return false;
  out->verts.resize(static_cast<size_t>(nv) * 3);
  out->normals.resize(static_cast<size_t>(nv) * 3);
  out->colors.resize(static_cast<size_t>(nv) * 3);
  out->indices.resize(static_cast<size_t>(nf) * 3);
  r.bytes(out->verts.data(), out->verts.size() * 4);
  r.bytes(out->normals.data(), out->normals.size() * 4);
  r.bytes(out->colors.data(), out->colors.size());
  r.bytes(out->indices.data(), out->indices.size() * 4);
  return true;
}

void NerfManagerOnline::StartBackgroundTraining() {
  client_->call(Op::kStart, Writer());
}

int NerfManagerOnline::Pump(int max_waves) {
  Writer w;
  w.i32(max_waves);
  return client_->call(Op::kPump, w).i32();
}

std::vector<float> NerfManagerOnline::GetLosses() {
  Reader r = client_->call(Op::kGetLosses, Writer());
  int32_t n = r.i32();
  std::vector<float> out(static_cast<size_t>(n));
  if (n > 0) r.bytes(out.data(), out.size() * 4);
  return out;
}

}  // namespace monerf
