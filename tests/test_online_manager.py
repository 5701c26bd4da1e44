"""Online manager: SLAM-like drive, training gates, slot growth, replay
determinism, artifact rendering — without a SLAM frontend (SURVEY §4d)."""

import os

import jax
import numpy as np
import pytest

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.synthetic import Camera, make_scene, make_sequence
from romap_tpu.runtime.manager import NerfManagerOnline
from romap_tpu.runtime.replay import TraceRecorder, replay
from romap_tpu.utils.camera import invert_pose


def tiny_cfg():
    return NerfConfig(
        encoding=EncodingConfig(kind="mxgrid", mx_levels=3, mx_max_resolution=64,
                                mx_features=16, mx_plane_res=32, mx_plane_features=8),
        train=TrainConfig(rays_per_batch=512, samples_per_ray=16, mc_resolution=17),
    )


def make_world(res=48, n_frames=16, n_objects=1):
    cam = Camera(fx=res * 0.9, fy=res * 0.9, cx=res / 2, cy=res / 2, h=res, w=res)
    objects = make_scene(n_objects)
    frames = make_sequence(cam, objects, n_frames,
                           radius=2.2 if n_objects == 1 else 5.5)
    return cam, objects, frames


def drive_slam_like(mgr, cam, objects, frames, iters_per_wave):
    """Feed keyframes + bbox waves the way LocalMapping does (ref
    LocalMapping.cc:1181-1269): create the NeRF once >10 bboxes pend, then
    push incremental batches."""
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    obj_ids: dict[int, int] = {}
    pending: dict[int, list] = {o.instance_id: [] for o in objects}
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
        for obj in objects:
            bb = f["bboxes"][obj.instance_id]
            if bb is None:
                continue
            pending[obj.instance_id].append((fi, *bb))
            n_pend = len(pending[obj.instance_id])
            if obj.instance_id not in obj_ids and n_pend > 10:
                tow = np.eye(4, dtype=np.float32)
                tow[:3, 3] = -obj.center
                half = obj.aabb_half_extents()
                idx = mgr.create_nerf(int(obj.instance_id), tow, -half, half)
                obj_ids[obj.instance_id] = idx
                mgr.update_nerf_bbox(idx, pending[obj.instance_id], 1)
                pending[obj.instance_id] = []
            elif obj.instance_id in obj_ids and n_pend >= 2:
                mgr.update_nerf_bbox(obj_ids[obj.instance_id],
                                     pending[obj.instance_id], 1)
                pending[obj.instance_id] = []
        mgr.pump()
    return obj_ids


def test_online_manager_end_to_end(tmp_path):
    cam, objects, frames = make_world()
    mgr = NerfManagerOnline(tiny_cfg(), use_sparse_depth=False,
                            train_step_iterations=15, capacity=2)
    rec = TraceRecorder(mgr)
    obj_ids = drive_slam_like(rec, cam, objects, frames, 15)
    assert len(obj_ids) == 1
    rec.wait_threads_end()
    rec.save(str(tmp_path / "trace.pkl"))

    losses = mgr.losses()
    assert np.isfinite(losses).all() and losses[0] < 0.3
    steps = int(np.asarray(mgr.state.step)[0])
    assert steps >= 30  # several waves ran
    mesh = mgr.get_mesh(0)
    assert mesh is not None and len(mesh.verts) > 0

    # artifacts (no video for test speed)
    test_frame = frames[-2]
    bb = test_frame["bboxes"][objects[0].instance_id]
    mgr.render_nerfs_test(str(tmp_path / "out"), 0, [test_frame["stamp"]],
                          [bb], [test_frame["twc"]], radius=1.5, video=False)
    base = tmp_path / "out" / "0"
    assert (base / "obj.ply").exists()
    assert (base / "test_img" / f"{test_frame['stamp']}.png").exists()
    lines = [l for l in open(base / "train.txt") if not l.startswith("#")]
    assert len(lines) >= 10

    # replay determinism: a fresh manager fed the recorded trace converges to
    # bit-identical state
    mgr2 = NerfManagerOnline(tiny_cfg(), use_sparse_depth=False,
                             train_step_iterations=15, capacity=2)
    replay(str(tmp_path / "trace.pkl"), mgr2)
    np.testing.assert_array_equal(mgr.losses(), mgr2.losses())
    for la, lb in zip(jax.tree.leaves(mgr.state.params),
                      jax.tree.leaves(mgr2.state.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_bbox_gate_blocks_training():
    cam, objects, frames = make_world(n_frames=14)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=5, capacity=2)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
    obj = objects[0]
    tow = np.eye(4, dtype=np.float32)
    tow[:3, 3] = -obj.center
    half = obj.aabb_half_extents()
    idx = mgr.create_nerf(1, tow, -half, half)
    # only 6 bboxes (< MIN_BBOXES_TO_TRAIN): pump must do nothing
    rows = [(fi, *frames[fi]["bboxes"][obj.instance_id]) for fi in range(6)]
    mgr.update_nerf_bbox(idx, rows, 3)
    assert mgr.pump() == 0
    assert int(np.asarray(mgr.state.step)[idx]) == 0
    # crossing the gate releases the pending waves
    rows = [(fi, *frames[fi]["bboxes"][obj.instance_id]) for fi in range(6, 12)]
    mgr.update_nerf_bbox(idx, rows, 0)  # 12 total bboxes
    assert mgr.pump() == 3
    assert int(np.asarray(mgr.state.step)[idx]) == 15


def test_update_nerf_volume_reinits_slot_and_recredits():
    """Grow-triggered volume replacement (beyond ref nerf.cu:155-176, which
    freezes SetAttributes): the slot's field re-inits, the new box sticks,
    the spent training budget is re-credited, and the OTHER slot's params
    are untouched."""
    cam, objects, frames = make_world(n_frames=14, n_objects=2)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=5, capacity=2)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
    idxs = []
    for obj in objects:
        tow = np.eye(4, dtype=np.float32)
        tow[:3, 3] = -obj.center
        half = obj.aabb_half_extents()
        idx = mgr.create_nerf(1, tow, -half, half)
        rows = [(fi, *frames[fi]["bboxes"][obj.instance_id])
                for fi in range(14) if frames[fi]["bboxes"][obj.instance_id]]
        mgr.update_nerf_bbox(idx, rows[:12], 2)
        idxs.append(idx)
    assert mgr.pump() == 2
    steps = np.asarray(mgr.state.step).copy()
    assert steps[idxs[0]] == 10 and steps[idxs[1]] == 10
    p_before = np.asarray(jax.tree.leaves(mgr.state.params)[0]).copy()

    # the object "outgrew" its box: push a 1.5x larger volume
    obj = objects[0]
    tow = np.eye(4, dtype=np.float32)
    tow[:3, 3] = -obj.center
    half = obj.aabb_half_extents() * 1.5
    mgr.update_nerf_volume(idxs[0], tow, -half, half)

    np.testing.assert_allclose(mgr._objs["aabb_max"][idxs[0]], half * 1.1,
                               rtol=1e-6)
    steps2 = np.asarray(mgr.state.step)
    assert steps2[idxs[0]] == 0  # field re-initialized
    assert steps2[idxs[1]] == 10  # other slot untouched
    p_after = np.asarray(jax.tree.leaves(mgr.state.params)[0])
    assert not np.allclose(p_after[idxs[0]], p_before[idxs[0]])
    np.testing.assert_array_equal(p_after[idxs[1]], p_before[idxs[1]])
    # spent waves re-credited: the slot retrains to its old step count
    assert mgr.pump() == 2
    assert int(np.asarray(mgr.state.step)[idxs[0]]) == 10


def test_update_nerf_volume_budget_does_not_compound():
    """Repeated volume updates must re-credit exactly the waves SPENT SINCE
    the last reinit, not a doubling counter (ADVICE r4 medium: the spent
    counter was left set after crediting, so every reinit handed out 2x)."""
    cam, objects, frames = make_world(n_frames=14)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=5, capacity=2)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
    obj = objects[0]
    tow = np.eye(4, dtype=np.float32)
    tow[:3, 3] = -obj.center
    half = obj.aabb_half_extents()
    idx = mgr.create_nerf(1, tow, -half, half)
    rows = [(fi, *frames[fi]["bboxes"][obj.instance_id])
            for fi in range(14) if frames[fi]["bboxes"][obj.instance_id]]
    mgr.update_nerf_bbox(idx, rows[:12], 2)
    assert mgr.pump() == 2

    p_first = None
    for round_ in range(3):  # grow, grow again, grow a third time
        mgr.update_nerf_volume(idx, tow, -half * (1.1 ** (round_ + 1)),
                               half * (1.1 ** (round_ + 1)))
        # exactly the 2 earned waves are pending — not 4, 8, ...
        assert int(mgr._pending_waves[idx]) == 2
        if round_ == 0:
            p_first = np.asarray(jax.tree.leaves(mgr.state.params)[0]).copy()
        elif round_ == 1:
            # fresh init draw per reinit (ADVICE r4 low: key was constant)
            p_now = np.asarray(jax.tree.leaves(mgr.state.params)[0])
            assert not np.allclose(p_now[idx], p_first[idx])
        assert mgr.pump() == 2
        assert int(np.asarray(mgr.state.step)[idx]) == 10

    # shutdown retrain also credits the earned (not compounded) budget
    mgr.final_retrain = True
    mgr.wait_threads_end()
    # 10 retrain iters + final_waves(1) x 5
    assert int(np.asarray(mgr.state.step)[idx]) == 15


def test_update_nerf_volume_out_of_range_is_noop():
    """A stale slot index (e.g. after a SLAM reset) must be rejected, not
    crash the runtime (ADVICE r4 low)."""
    cam, objects, frames = make_world(n_frames=6)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=2, capacity=2)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    tow = np.eye(4, dtype=np.float32)
    assert mgr.update_nerf_volume(0, tow, -np.ones(3), np.ones(3)) is False
    assert mgr.update_nerf_volume(-1, tow, -np.ones(3), np.ones(3)) is False
    idx = mgr.create_nerf(1, tow, -np.ones(3), np.ones(3))
    assert mgr.update_nerf_volume(idx, tow, -np.ones(3), np.ones(3)) is True
    assert mgr.update_nerf_volume(idx + 1, tow, -np.ones(3),
                                  np.ones(3)) is False


def test_bbox_table_grows_instead_of_dropping(capsys):
    """Overflowing the per-object bbox prealloc must GROW the table (like
    the frame store), never silently drop supervision rows (VERDICT r4
    weak #6)."""
    cam, objects, frames = make_world(n_frames=6)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=1, capacity=2)
    # tiny prealloc: 4 bbox rows/object
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, 4)
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
    obj = objects[0]
    tow = np.eye(4, dtype=np.float32)
    tow[:3, 3] = -obj.center
    half = obj.aabb_half_extents()
    idx = mgr.create_nerf(1, tow, -half, half)
    rows = [(fi % 6, *frames[fi % 6]["bboxes"][obj.instance_id])
            for fi in range(12)]
    mgr.update_nerf_bbox(idx, rows, 1)
    assert int(mgr._objs["n_bbox"][idx]) == 12  # nothing dropped
    assert mgr._max_bboxes >= 12
    np.testing.assert_array_equal(
        mgr._objs["bboxes"][idx, :12], np.asarray(rows, np.int32))
    assert "bbox table grown" in capsys.readouterr().out
    # training still runs at the grown shape
    assert mgr.pump() == 1
    assert int(np.asarray(mgr.state.step)[idx]) == 1


def test_capacity_growth():
    cam, objects, frames = make_world(n_frames=6, n_objects=3)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=2, capacity=2)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
    for i, obj in enumerate(objects):
        tow = np.eye(4, dtype=np.float32)
        tow[:3, 3] = -obj.center
        half = obj.aabb_half_extents()
        idx = mgr.create_nerf(41 if i == 0 else 1, tow, -half, half)
        assert idx == i
    assert mgr.capacity == 4  # grew from 2
    # class-41 inflation is 1.2x, others 1.1x (ref nerf.cu:162-172)
    h0 = objects[0].aabb_half_extents()
    np.testing.assert_allclose(mgr._objs["aabb_max"][0], h0 * 1.2, rtol=1e-6)
    h1 = objects[1].aabb_half_extents()
    np.testing.assert_allclose(mgr._objs["aabb_max"][1], h1 * 1.1, rtol=1e-6)


def test_background_pump_thread():
    cam, objects, frames = make_world(n_frames=14)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=5, capacity=2,
                            mesh_enabled=False)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    mgr.start()
    obj = objects[0]
    rows = []
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
        bb = f["bboxes"][obj.instance_id]
        if bb is not None:
            rows.append((fi, *bb))
    tow = np.eye(4, dtype=np.float32)
    tow[:3, 3] = -obj.center
    half = obj.aabb_half_extents()
    idx = mgr.create_nerf(1, tow, -half, half)
    mgr.update_nerf_bbox(idx, rows, 2)
    mgr.wait_threads_end()
    assert int(np.asarray(mgr.state.step)[idx]) >= 10
    assert np.isfinite(mgr.losses()).all()


def test_concurrent_grow_during_background_training():
    """create_nerf that triggers _grow while the background pump has a wave
    in flight must not desynchronize _objs capacity from the TrainState
    (pump would otherwise publish its pre-grow state over the grown one —
    ADVICE r1 high)."""
    cam, objects, frames = make_world(n_objects=3)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=3, capacity=1,
                            mesh_enabled=False)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
    mgr.start()
    try:
        idxs = []
        for obj in objects:  # grows 1 -> 2 -> 4 while waves run
            tow = np.eye(4, dtype=np.float32)
            tow[:3, 3] = -obj.center
            half = obj.aabb_half_extents()
            idx = mgr.create_nerf(int(obj.instance_id), tow, -half, half)
            idxs.append(idx)
            rows = [(fi, *f["bboxes"][obj.instance_id])
                    for fi, f in enumerate(frames)
                    if f["bboxes"][obj.instance_id] is not None]
            mgr.update_nerf_bbox(idx, rows, 2)
            mgr.losses()  # concurrent state reader mid-wave
    finally:
        mgr.wait_threads_end()
    assert mgr.capacity >= 3
    # state capacity tracks the grown slot table
    assert mgr.state.loss.shape[0] == mgr.capacity
    losses = mgr.losses()
    assert len(losses) == 3 and np.isfinite(losses).all()
    # every slot actually trained
    assert all(int(mgr.state.step[i]) > 0 for i in idxs)


def test_final_waves_polish():
    """final_waves > 1 runs extra shutdown waves: the step counter advances
    final_waves x iters beyond a parity manager fed the same drive."""
    cam, objects, frames = make_world()

    def run(final_waves):
        mgr = NerfManagerOnline(tiny_cfg(), use_sparse_depth=False,
                                train_step_iterations=15, capacity=2,
                                final_waves=final_waves)
        drive_slam_like(mgr, cam, objects, frames, 15)
        mgr.wait_threads_end()
        return int(np.asarray(mgr.state.step)[0]), float(mgr.losses()[0])

    steps1, _ = run(1)
    steps3, loss3 = run(3)
    assert steps3 == steps1 + 2 * 15
    assert np.isfinite(loss3)


def test_sparse_depth_supervision_changes_training():
    """NeRF.UseSparseDepth end-to-end at the manager level: a manager fed
    sparse depth maps (zeros = unsupervised, ref KeyFrame::
    GenerateSparseDepthImg src/KeyFrame.cc:665-695) must actually consume
    them — identical drives with the knob on/off diverge, and the depth
    arrays land in the store."""
    cam, objects, frames = make_world()
    rng = np.random.default_rng(3)

    def run(use_depth):
        mgr = NerfManagerOnline(tiny_cfg(), use_sparse_depth=use_depth,
                                train_step_iterations=15, capacity=2)
        mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w,
                         len(frames))
        obj = objects[0]
        rows = []
        for fi, f in enumerate(frames):
            # sparsify GT depth to ~2% of pixels, like projected map points
            keep = rng.random(f["depth"].shape) < 0.02
            sparse = np.where(keep, f["depth"], 0.0).astype(np.float32)
            mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                     depth=sparse if use_depth else None,
                                     pose=f["twc"])
            bb = f["bboxes"][obj.instance_id]
            if bb is not None:
                rows.append((fi, *bb))
        tow = np.eye(4, dtype=np.float32)
        tow[:3, 3] = -obj.center
        half = obj.aabb_half_extents()
        idx = mgr.create_nerf(1, tow, -half, half)
        mgr.update_nerf_bbox(idx, rows, 2)
        mgr.pump()
        mgr.wait_threads_end()
        return mgr

    rng = np.random.default_rng(3)
    m_on = run(True)
    rng = np.random.default_rng(3)
    m_off = run(False)
    assert m_on.store.arrays().has_depth
    assert float(np.asarray(m_on.store.arrays().depth).max()) > 0
    assert not m_off.store.arrays().has_depth
    # same steps ran on both
    assert int(m_on.state.step[0]) == int(m_off.state.step[0]) > 0
    # the depth channel changed the optimization trajectory
    p_on = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
        jax.tree.map(np.asarray, m_on.state.params))])
    p_off = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
        jax.tree.map(np.asarray, m_off.state.params))])
    assert not np.allclose(p_on, p_off)
    assert np.isfinite(m_on.losses()).all()


def test_joint_ba_shutdown_rewrites_poses():
    """Shutdown joint photometric BA (joint_ba_iters > 0): wait_threads_end
    must run the joint (field, keyframe-pose) block, fold the SE(3)
    corrections into the frame store's poses, and leave training healthy.
    Off by default (reference parity); A/B-measured on the online demo."""
    cam, objects, frames = make_world()
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=25, capacity=2,
                            mesh_enabled=False, joint_ba_iters=40)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    obj = objects[0]
    rows = []
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
        bb = f["bboxes"][obj.instance_id]
        if bb is not None:
            rows.append((fi, *bb))
    tow = np.eye(4, dtype=np.float32)
    tow[:3, 3] = -obj.center
    half = obj.aabb_half_extents()
    idx = mgr.create_nerf(1, tow, -half, half)
    mgr.update_nerf_bbox(idx, rows, 6)
    mgr.pump()
    before = [np.array(mgr.store._poses[i]) for i in range(len(frames))]
    mgr.wait_threads_end()
    after = [np.array(mgr.store._poses[i]) for i in range(len(frames))]
    moved = sum(not np.allclose(a, b) for a, b in zip(after, before))
    assert moved > 0  # the BA rewrote poses
    for a, b in zip(after, before):
        # SE(3) corrections stay small (it is a POLISH) and valid
        assert np.linalg.norm(a[:3, 3] - b[:3, 3]) < 0.2
        np.testing.assert_allclose(a[:3, :3] @ a[:3, :3].T, np.eye(3),
                                   atol=1e-4)
    assert np.isfinite(mgr.losses()).all()


def test_final_retrain_full_budget_after_late_volume_update():
    """A volume update zeroes the since-reinit wave counter; the shutdown
    retrain must still credit the slot's FULL lifetime budget (round-5 seed
    study measured -1.0 dB when a late reinit starved the from-scratch
    retrain to its post-reinit waves)."""
    cam, objects, frames = make_world(n_frames=14)
    mgr = NerfManagerOnline(tiny_cfg(), train_step_iterations=5, capacity=2)
    mgr.dataset_init(cam.fx, cam.fy, cam.cx, cam.cy, cam.h, cam.w, len(frames))
    for fi, f in enumerate(frames):
        mgr.new_frame_to_dataset(fi, f["stamp"], f["rgb"], f["instance"],
                                 pose=f["twc"])
    obj = objects[0]
    tow = np.eye(4, dtype=np.float32)
    tow[:3, 3] = -obj.center
    half = obj.aabb_half_extents()
    idx = mgr.create_nerf(1, tow, -half, half)
    rows = [(fi, *frames[fi]["bboxes"][obj.instance_id])
            for fi in range(14) if frames[fi]["bboxes"][obj.instance_id]]
    mgr.update_nerf_bbox(idx, rows[:12], 3)   # lifetime budget: 3 waves
    assert mgr.pump() == 3

    # late grow: counter zeroes, full budget re-credited and drained
    mgr.update_nerf_volume(idx, tow, -half * 1.3, half * 1.3)
    assert int(mgr._pending_waves[idx]) == 3
    assert mgr.pump() == 3

    # shutdown retrain: re-credits the LIFETIME 3 waves (not the 3-since-
    # reinit by accident of this timeline — distinguish via a second late
    # reinit with NO waves run after it: since-reinit count is 0, lifetime
    # is still 3)
    mgr.update_nerf_volume(idx, tow, -half * 1.4, half * 1.4)
    assert int(mgr._wave_count[idx]) == 0
    mgr.final_retrain = True
    mgr.wait_threads_end()
    # 3 retrain waves x 5 iters + final_waves(1) x 5 = 20
    assert int(np.asarray(mgr.state.step)[idx]) == 20
