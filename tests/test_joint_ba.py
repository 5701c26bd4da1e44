"""Joint photometric bundle adjustment (field + keyframe poses).

What joint BA measurably provides (and what these tests pin): the shared
pose table converges to MUTUAL consistency — photometric loss drops and
the gauge-aligned pose error (residual after Sim3 alignment) improves.
Raw truth error need NOT improve: the field+poses drift together as a
gauge freedom (measured: raw 0.0286 -> 0.0311 while aligned 0.0262 ->
0.0215 and matched-budget PSNR 25.99 -> 26.25 dB). The online eval is
invariant to the gauge because held-out views are themselves
photometrically refined against the field (runtime/pose_refine.py)."""

import numpy as np

import jax

from romap_tpu.config import EncodingConfig, NerfConfig, TrainConfig
from romap_tpu.data.world import build_synthetic_world
from romap_tpu.models import nerf


def _cfg():
    return NerfConfig(
        encoding=EncodingConfig(kind="mxgrid", mx_levels=3,
                                mx_max_resolution=64, mx_features=16,
                                mx_plane_res=32, mx_plane_features=8),
        train=TrainConfig(rays_per_batch=1024, samples_per_ray=16),
    )


def _umeyama_err(est, true):
    """Residual per-frame camera-center error after Sim3 alignment."""
    X = np.stack([p[:3, 3] for p in est])
    Y = np.stack([p[:3, 3] for p in true])
    mx, my = X.mean(0), Y.mean(0)
    Xc, Yc = X - mx, Y - my
    U, S, Vt = np.linalg.svd(Yc.T @ Xc / len(X))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1, 1, d])
    R = U @ D @ Vt
    var = (Xc ** 2).sum() / len(X)
    s = np.trace(np.diag(S) @ D) / var
    t = my - s * R @ mx
    Xa = (s * (R @ X.T)).T + t
    return float(np.linalg.norm(Xa - Y, axis=1).mean())


def test_joint_ba_improves_consistency_of_perturbed_poses():
    cfg = _cfg()
    spec = nerf.make_field_spec(cfg)
    cam, objects, seq, store, objs = build_synthetic_world(
        n_objects=1, n_frames=16, res=64
    )
    true_poses = np.array(store._poses[: len(seq)])
    rng = np.random.default_rng(2)
    for fi in range(1, len(seq)):  # frame 0 = gauge anchor, exact
        pert = np.eye(4, dtype=np.float32)
        ang = rng.normal(0, 0.02)
        c, s = np.cos(ang), np.sin(ang)
        pert[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        pert[:3, 3] = rng.normal(0, 0.02, 3)
        store._poses[fi] = (store._poses[fi] @ pert).astype(np.float32)
    store.mark_poses_dirty()
    pert_poses = np.array(store._poses[: len(seq)])
    frames = store.arrays()

    # field first adapts to the WRONG poses (the online situation)
    state = nerf.init_train_state(jax.random.PRNGKey(0), 1, cfg, spec)
    state = nerf.train_objects(state, objs, frames, cfg, spec, 150, False)
    loss_before = float(state.loss[0])

    ps = nerf.init_pose_ba_state(frames.poses.shape[0])
    state, ps = nerf.train_objects_joint_ba(
        state, ps, objs, frames, cfg, spec, 400, False
    )
    assert np.isfinite(np.asarray(ps.delta)).all()
    assert int(ps.step) == 400
    np.testing.assert_array_equal(np.asarray(ps.delta[0]), np.zeros(6))
    # trust region: no coordinate may escape the pose_clip bound (0.03
    # default) — this is what prevents the unclipped failure mode measured
    # on the room demo (Adam random-walk to |dt| 1.4, eval collapse to 6 dB)
    assert np.abs(np.asarray(ps.delta)).max() <= 0.03 + 1e-6

    fixed = nerf.apply_pose_ba(np.asarray(frames.poses), ps)[: len(seq)]

    # 1) joint training keeps driving the photometric loss down
    loss_after = float(state.loss[0])
    assert np.isfinite(loss_after) and loss_after < loss_before

    # 2) the pose table actually moved (deltas are being optimized)
    moved = np.linalg.norm(np.asarray(ps.delta)[1: len(seq)], axis=1)
    assert (moved > 1e-4).any()

    # 3) gauge-aligned consistency improves: residual error after Sim3
    #    alignment drops vs the perturbed poses. (Raw error is allowed to
    #    drift — the gauge freedom; see module docstring.)
    e_pert = _umeyama_err(pert_poses, true_poses)
    e_ba = _umeyama_err(fixed, true_poses)
    assert e_ba < e_pert, (e_pert, e_ba)
